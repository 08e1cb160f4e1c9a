"""Workbook/sheet serialization: JSON / YAML / TOON payloads and writers.

Semantics parity: /root/reference/src/exstruct/io/__init__.py:92-178,539-664
and io/serialize.py:52-91 — model_dump(exclude_none) → empty-value strip →
compact (or pretty) output; backend metadata stripped by default (ADR-0003);
per-sheet exports sanitize sheet names for the filesystem.
"""

from __future__ import annotations

import json
from pathlib import Path
import re

from ..functions.canonical import dict_without_empty_values
from ..models import SheetData, WorkbookData


def sheet_payload(sheet: SheetData, *, include_backend_metadata: bool = False) -> dict:
    payload: dict = {
        "rows": [r.to_payload() for r in sheet.rows],
        "shapes": [
            s.to_payload(include_backend_metadata=include_backend_metadata)
            for s in sheet.shapes
        ],
        "charts": [
            c.to_payload(include_backend_metadata=include_backend_metadata)
            for c in sheet.charts
        ],
        "table_candidates": list(sheet.table_candidates),
        "print_areas": [a.to_payload() for a in sheet.print_areas],
        "auto_print_areas": [a.to_payload() for a in sheet.auto_print_areas],
        "formulas_map": {
            k: [list(p) for p in v] for k, v in sheet.formulas_map.items()
        },
        "colors_map": {k: [list(p) for p in v] for k, v in sheet.colors_map.items()},
    }
    if sheet.merged_cells is not None:
        from ..models import merged_cells_payload

        payload["merged_cells"] = merged_cells_payload(sheet.merged_cells)
    if sheet.merged_ranges:
        payload["merged_ranges"] = list(sheet.merged_ranges)
    return dict_without_empty_values(payload)  # type: ignore[return-value]


def workbook_payload(
    workbook: WorkbookData, *, include_backend_metadata: bool = False
) -> dict:
    return dict_without_empty_values(
        {
            "book_name": workbook.book_name,
            "sheets": {
                name: sheet_payload(
                    sheet, include_backend_metadata=include_backend_metadata
                )
                for name, sheet in workbook.sheets.items()
            },
        }
    )  # type: ignore[return-value]


def serialize_workbook(
    workbook: WorkbookData,
    fmt: str = "json",
    *,
    pretty: bool = False,
    indent: int | None = None,
    include_backend_metadata: bool = False,
) -> str:
    payload = workbook_payload(
        workbook, include_backend_metadata=include_backend_metadata
    )
    if fmt == "json":
        indent_val = 2 if pretty and indent is None else indent
        return json.dumps(payload, ensure_ascii=False, indent=indent_val)
    if fmt in ("yaml", "yml"):
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError("pyyaml is required for YAML output") from exc
        return str(
            yaml.safe_dump(payload, allow_unicode=True, sort_keys=False, indent=2)
        )
    if fmt == "toon":
        from ..functions.toon import encode as toon_encode

        return toon_encode(payload)
    raise ValueError(f"Unsupported export format: {fmt}")


def sanitize_sheet_filename(name: str) -> str:
    safe = re.sub(r"[\\/:*?\"<>|]", "_", name)
    return safe or "sheet"


def save_workbook(workbook: WorkbookData, path: str | Path, **kwargs: object) -> Path:
    dest = Path(path)
    fmt = (dest.suffix.lstrip(".") or "json").lower()
    dest.write_text(serialize_workbook(workbook, fmt=fmt, **kwargs), encoding="utf-8")
    return dest


def save_sheets(
    workbook: WorkbookData,
    out_dir: str | Path,
    fmt: str = "json",
    *,
    include_backend_metadata: bool = False,
) -> list[Path]:
    """One file per sheet (reference `save_sheets`, io/__init__.py:621-664)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    for name, sheet in workbook.sheets.items():
        payload = sheet_payload(
            sheet, include_backend_metadata=include_backend_metadata
        )
        dest = out / f"{sanitize_sheet_filename(name)}.{fmt}"
        if fmt == "json":
            dest.write_text(
                json.dumps(payload, ensure_ascii=False), encoding="utf-8"
            )
        elif fmt in ("yaml", "yml"):
            import yaml

            dest.write_text(
                yaml.safe_dump(payload, allow_unicode=True, sort_keys=False),
                encoding="utf-8",
            )
        elif fmt == "toon":
            from ..functions.toon import encode as toon_encode

            dest.write_text(toon_encode(payload), encoding="utf-8")
        else:
            raise ValueError(f"Unsupported export format: {fmt}")
        written.append(dest)
    return written
