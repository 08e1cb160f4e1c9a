"""MCP (Model Context Protocol) stdio server — from-scratch JSON-RPC 2.0.

Re-derives the reference's MCP surface (/root/reference/src/exstruct/mcp/
server.py tool registry: exstruct_extract, read_json_chunk, read_range,
read_cells, read_formulas, validate_input, patch, make, list_ops,
describe_op, get_runtime_info; capture_sheet_images serves this engine's
light PNG renderer — approximate layout, the reference's COM print
fidelity stays out of scope) without the ``mcp`` SDK: newline-delimited
JSON-RPC over
stdio, the 2024-11-05 MCP handshake (initialize / notifications/initialized
/ tools/list / tools/call / ping), and a path-policy sandbox limiting file
access to explicitly allowed roots (reference mcp/io.py PathPolicy).

Run:  python -m exstruct_ray.mcp_server --root /data --root /tmp
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Callable

PROTOCOL_VERSION = "2024-11-05"


class PathPolicy:
    """Sandbox: every file path must resolve inside an allowed root."""

    def __init__(self, roots: list[str]):
        self._roots = [os.path.realpath(r) for r in roots] or [os.getcwd()]

    def resolve(self, path: str) -> str:
        real = os.path.realpath(path)
        for root in self._roots:
            if real == root or real.startswith(root + os.sep):
                return real
        raise ValueError(f"path outside allowed roots: {path}")


# ---------------------------------------------------------------------------
# Artifact helpers (extracted-JSON readers)
# ---------------------------------------------------------------------------


def _load_artifact(policy: PathPolicy, out_path: str) -> dict:
    with open(policy.resolve(out_path), encoding="utf-8") as fh:
        return json.load(fh)


def _resolve_sheet(payload: dict, sheet: str | None) -> tuple[str, dict]:
    sheets = payload.get("sheets", {})
    if not sheets:
        raise ValueError("artifact has no sheets")
    if sheet is None:
        if len(sheets) == 1:
            name = next(iter(sheets))
            return name, sheets[name]
        raise ValueError(
            f"sheet is required; workbook has {len(sheets)} sheets: "
            f"{sorted(sheets)}"
        )
    if sheet not in sheets:
        raise ValueError(f"sheet not found: {sheet}")
    return sheet, sheets[sheet]


def _read_range(payload: dict, range_ref: str, sheet: str | None) -> dict:
    from .functions.a1 import parse_range_zero_based

    name, data = _resolve_sheet(payload, sheet)
    bounds = parse_range_zero_based(range_ref)
    if bounds is None:
        raise ValueError(f"invalid range: {range_ref}")
    rows = []
    for row in data.get("rows", []):
        r = row.get("r", 0)
        if not (bounds.r1 + 1 <= r <= bounds.r2 + 1):
            continue
        cells = {
            c: v
            for c, v in (row.get("c") or {}).items()
            if bounds.c1 <= int(c) <= bounds.c2
        }
        if cells:
            rows.append({"r": r, "c": cells})
    return {"sheet_name": name, "range": range_ref, "rows": rows}


def _formula_lookup(data: dict) -> dict[tuple[int, int], str]:
    out: dict[tuple[int, int], str] = {}
    for formula, positions in (data.get("formulas_map") or {}).items():
        for r, c in positions:
            out[(int(r), int(c))] = formula
    return out


def _read_cells(
    payload: dict, addresses: list[str], sheet: str | None,
    include_formulas: bool,
) -> dict:
    from .functions.a1 import _parse_cell

    name, data = _resolve_sheet(payload, sheet)
    by_row = {row.get("r"): (row.get("c") or {}) for row in data.get("rows", [])}
    formulas = _formula_lookup(data) if include_formulas else {}
    cells = []
    for addr in addresses:
        parsed = _parse_cell(addr)
        if parsed is None:
            raise ValueError(f"invalid address: {addr}")
        r0, c0 = parsed
        entry: dict[str, Any] = {
            "address": addr.upper(),
            "value": by_row.get(r0 + 1, {}).get(str(c0)),
        }
        if include_formulas:
            entry["formula"] = formulas.get((r0 + 1, c0))
        cells.append(entry)
    return {"sheet_name": name, "cells": cells}


def _read_formulas(payload: dict, range_ref: str | None, sheet: str | None) -> dict:
    from .functions.a1 import parse_range_zero_based

    name, data = _resolve_sheet(payload, sheet)
    bounds = parse_range_zero_based(range_ref) if range_ref else None
    out = []
    for formula, positions in (data.get("formulas_map") or {}).items():
        for r, c in positions:
            if bounds is not None and not (
                bounds.r1 + 1 <= r <= bounds.r2 + 1 and bounds.c1 <= c <= bounds.c2
            ):
                continue
            out.append({"r": int(r), "c": int(c), "formula": formula})
    out.sort(key=lambda e: (e["r"], e["c"]))
    return {"sheet_name": name, "formulas": out}


def _read_json_chunk(
    payload: dict, sheet: str | None, max_bytes: int,
    row_col_filter: dict | None, cursor: str | None,
) -> dict:
    name, data = _resolve_sheet(payload, sheet)
    rows = data.get("rows", [])
    if row_col_filter:
        r_lo, r_hi = (row_col_filter.get("rows") or [1, 1 << 30])[:2]
        c_lo, c_hi = (row_col_filter.get("cols") or [1, 1 << 30])[:2]
        filtered = []
        for row in rows:
            if not (r_lo <= row.get("r", 0) <= r_hi):
                continue
            cells = {
                c: v
                for c, v in (row.get("c") or {}).items()
                if c_lo <= int(c) + 1 <= c_hi
            }
            if cells:
                filtered.append({"r": row["r"], "c": cells})
        rows = filtered
    start = int(cursor) if cursor else 0
    selected: list[dict] = []
    size = 0
    next_cursor: str | None = None
    for idx in range(start, len(rows)):
        encoded = json.dumps(rows[idx], ensure_ascii=False)
        if selected and size + len(encoded) > max_bytes:
            next_cursor = str(idx)
            break
        selected.append(rows[idx])
        size += len(encoded)
    return {
        "sheet_name": name,
        "rows": selected,
        "cursor": next_cursor,
        "eof": next_cursor is None,
    }


# ---------------------------------------------------------------------------
# Tool registry
# ---------------------------------------------------------------------------


def _schema(properties: dict, required: list[str]) -> dict:
    return {"type": "object", "properties": properties, "required": required}


def build_tools(policy: PathPolicy) -> dict[str, tuple[dict, Callable[..., Any]]]:
    """name → (descriptor, handler)."""

    def t_extract(
        input_path: str, mode: str = "light", out_path: str | None = None,
        fmt: str = "json",
    ) -> dict:
        """Extract an .xlsx/.xlsm/.xls workbook to structured JSON/YAML/TOON (cells, tables, merges, shapes, charts); writes an artifact when out_path is given."""
        from .api import ExtractEngine
        from .config import ExtractOptions
        from .extract.serialize import serialize_workbook

        engine = ExtractEngine(ExtractOptions(mode=mode))
        workbook = engine.extract(policy.resolve(input_path))
        text = serialize_workbook(workbook, fmt=fmt)
        if out_path:
            resolved = policy.resolve(out_path)
            with open(resolved, "w", encoding="utf-8") as fh:
                fh.write(text)
            return {"out_path": resolved, "bytes": len(text)}
        return {"payload": json.loads(text) if fmt == "json" else text}

    def t_read_json_chunk(
        out_path: str, sheet: str | None = None, max_bytes: int = 50_000,
        filter: dict | None = None, cursor: str | None = None,
    ) -> dict:
        """Read a byte-bounded chunk of an extracted JSON artifact with cursor pagination and optional 1-based row/col filters."""
        return _read_json_chunk(
            _load_artifact(policy, out_path), sheet, max_bytes, filter, cursor
        )

    def t_read_range(out_path: str, range: str, sheet: str | None = None) -> dict:
        """Read a rectangular A1 range (e.g. A1:C10) from an extracted JSON artifact."""
        return _read_range(_load_artifact(policy, out_path), range, sheet)

    def t_read_cells(
        out_path: str, addresses: list[str], sheet: str | None = None,
        include_formulas: bool = True,
    ) -> dict:
        """Read specific A1 cells from an extracted JSON artifact, optionally with their formulas."""
        return _read_cells(
            _load_artifact(policy, out_path), addresses, sheet, include_formulas
        )

    def t_read_formulas(
        out_path: str, range: str | None = None, sheet: str | None = None
    ) -> dict:
        """List formulas (position + text) in an extracted JSON artifact, optionally limited to an A1 range."""
        return _read_formulas(_load_artifact(policy, out_path), range, sheet)

    def t_validate_input(ops: list[dict]) -> dict:
        """Validate a patch-op list without applying it; reports per-op spec issues AND formula lint findings (ref/name/div0/value/na tokens, duplicated '=', suspected self-reference)."""
        from .edit.model import PatchOp

        issues = []
        parsed: list[tuple[int, PatchOp]] = []
        for i, op in enumerate(ops):
            try:
                parsed.append((i, PatchOp.from_dict(op)))
            except Exception as exc:
                issues.append({"op_index": i, "message": str(exc)})
        # Formula content lint over the ops that would write formulas —
        # the reference's FormulaIssueCode vocabulary (edit/types.py:37-45)
        # surfaced at validate time so a typo'd formula fails before patch.
        from .edit.lint import lint_formula_text

        formula_issues = []
        for i, op in parsed:
            texts = []
            if op.formula is not None:
                texts.append(op.formula)
            if op.op in ("set_value", "set_value_if", "set_range_values"):
                vals = [op.value] if op.value is not None else []
                for row in op.values or []:
                    vals.extend(row)
                texts.extend(
                    v for v in vals if isinstance(v, str) and v.startswith("=")
                )
            for text in texts:
                for level, code, message in lint_formula_text(text):
                    formula_issues.append(
                        {
                            "op_index": i,
                            "level": level,
                            "code": code,
                            "message": message,
                        }
                    )
        hard_errors = issues or [
            f for f in formula_issues if f["level"] == "error"
        ]
        return {
            "valid": not hard_errors,
            "issues": issues,
            "formula_issues": formula_issues,
        }

    def _result_payload(result) -> dict:
        import dataclasses

        def strip(obj):
            return {
                k: v for k, v in dataclasses.asdict(obj).items() if v is not None
            }

        payload = {
            "out_path": result.out_path,
            "patch_diff": [strip(d) for d in result.patch_diff],
            "warnings": result.warnings,
            "error": strip(result.error) if result.error else None,
        }
        if result.formula_issues:
            payload["formula_issues"] = [
                dataclasses.asdict(i) for i in result.formula_issues
            ]
        return payload

    def t_patch(
        xlsx_path: str, ops: list[dict], out_path: str | None = None,
        auto_formula: bool = False, dry_run: bool = False,
        on_conflict: str = "overwrite", preflight_formula_check: bool = False,
    ) -> dict:
        """Apply patch operations to an existing workbook (set_value, styles, merges, ...); supports dry_run, conflict policies, and a preflight formula health check."""
        from .edit import apply_patch

        return _result_payload(
            apply_patch(
                policy.resolve(xlsx_path), ops,
                out_path=policy.resolve(out_path) if out_path else None,
                auto_formula=auto_formula, dry_run=dry_run,
                on_conflict=on_conflict,
                preflight_formula_check=preflight_formula_check,
            )
        )

    def t_make(
        out_path: str, ops: list[dict] | None = None, sheet: str = "Sheet1",
        auto_formula: bool = False, on_conflict: str = "overwrite",
        preflight_formula_check: bool = False,
    ) -> dict:
        """Create a new workbook from a patch-op list and write it to out_path; optional preflight formula health check."""
        from .edit import make_workbook

        return _result_payload(
            make_workbook(
                ops or [], sheet=sheet, out_path=policy.resolve(out_path),
                auto_formula=auto_formula, on_conflict=on_conflict,
                preflight_formula_check=preflight_formula_check,
            )
        )

    def t_list_ops() -> dict:
        """List the supported patch operation names."""
        from .edit.model import PATCH_OP_TYPES

        return {"ops": list(PATCH_OP_TYPES)}

    def t_describe_op(op: str) -> dict:
        """Describe one patch operation (accepted field aliases)."""
        from .edit.model import OP_ALIASES, PATCH_OP_TYPES

        if op not in PATCH_OP_TYPES:
            raise ValueError(f"unknown op: {op}")
        return {"op": op, "aliases": OP_ALIASES.get(op, {})}

    def t_runtime_info() -> dict:
        """Report engine name, version, and available backends."""
        from . import __version__

        return {
            "engine": "exstruct_ray",
            "version": __version__,
            "backends": ["light"],
            "com_available": False,
        }

    def t_capture_sheet_images(
        xlsx_path: str, output_dir: str, sheet: str | None = None
    ) -> dict:
        """Capture one PNG per sheet via the LIGHT renderer (grid + cell text + merged/table outlines) — an approximate layout sketch, not COM print fidelity."""
        from .render import export_sheet_images

        paths = export_sheet_images(
            policy.resolve(xlsx_path), policy.resolve(output_dir), sheet=sheet
        )
        return {
            "paths": paths,
            "renderer": "light",
            "note": (
                "approximate light rendering (the reference's COM/Excel "
                "print-fidelity backend is not available in this engine)"
            ),
        }

    path_prop = {"type": "string"}
    return {
        "exstruct_extract": (
            _schema(
                {
                    "input_path": path_prop,
                    "mode": {"type": "string", "enum": ["light", "verbose"]},
                    "out_path": path_prop,
                    "fmt": {"type": "string", "enum": ["json", "yaml", "toon"]},
                },
                ["input_path"],
            ),
            t_extract,
        ),
        "exstruct_read_json_chunk": (
            _schema(
                {
                    "out_path": path_prop,
                    "sheet": path_prop,
                    "max_bytes": {"type": "integer"},
                    "filter": {"type": "object"},
                    "cursor": path_prop,
                },
                ["out_path"],
            ),
            t_read_json_chunk,
        ),
        "exstruct_read_range": (
            _schema(
                {"out_path": path_prop, "range": path_prop, "sheet": path_prop},
                ["out_path", "range"],
            ),
            t_read_range,
        ),
        "exstruct_read_cells": (
            _schema(
                {
                    "out_path": path_prop,
                    "addresses": {"type": "array", "items": {"type": "string"}},
                    "sheet": path_prop,
                    "include_formulas": {"type": "boolean"},
                },
                ["out_path", "addresses"],
            ),
            t_read_cells,
        ),
        "exstruct_read_formulas": (
            _schema(
                {"out_path": path_prop, "range": path_prop, "sheet": path_prop},
                ["out_path"],
            ),
            t_read_formulas,
        ),
        "exstruct_validate_input": (
            _schema({"ops": {"type": "array"}}, ["ops"]),
            t_validate_input,
        ),
        "exstruct_patch": (
            _schema(
                {
                    "xlsx_path": path_prop,
                    "ops": {"type": "array"},
                    "out_path": path_prop,
                    "auto_formula": {"type": "boolean"},
                    "dry_run": {"type": "boolean"},
                    "on_conflict": {"type": "string"},
                },
                ["xlsx_path", "ops"],
            ),
            t_patch,
        ),
        "exstruct_make": (
            _schema(
                {
                    "out_path": path_prop,
                    "ops": {"type": "array"},
                    "sheet": path_prop,
                    "auto_formula": {"type": "boolean"},
                    "on_conflict": {"type": "string"},
                },
                ["out_path"],
            ),
            t_make,
        ),
        "exstruct_list_ops": (_schema({}, []), t_list_ops),
        "exstruct_describe_op": (
            _schema({"op": path_prop}, ["op"]),
            t_describe_op,
        ),
        "exstruct_get_runtime_info": (_schema({}, []), t_runtime_info),
        "exstruct_capture_sheet_images": (
            _schema(
                {
                    "xlsx_path": path_prop,
                    "output_dir": path_prop,
                    "sheet": path_prop,
                },
                ["xlsx_path", "output_dir"],
            ),
            t_capture_sheet_images,
        ),
    }


# ---------------------------------------------------------------------------
# JSON-RPC loop
# ---------------------------------------------------------------------------


def handle_message(msg: dict, tools: dict) -> dict | None:
    """One JSON-RPC request → response dict (None for notifications)."""
    method = msg.get("method")
    msg_id = msg.get("id")

    def ok(result: dict) -> dict:
        return {"jsonrpc": "2.0", "id": msg_id, "result": result}

    def err(code: int, message: str) -> dict:
        return {
            "jsonrpc": "2.0",
            "id": msg_id,
            "error": {"code": code, "message": message},
        }

    if method == "initialize":
        return ok(
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "exstruct_ray", "version": "0.1.0"},
            }
        )
    if method in ("notifications/initialized", "notifications/cancelled"):
        return None
    if method == "ping":
        return ok({})
    if method == "tools/list":
        return ok(
            {
                "tools": [
                    {
                        "name": name,
                        "description": (handler.__doc__ or name).strip(),
                        "inputSchema": schema,
                    }
                    for name, (schema, handler) in sorted(tools.items())
                ]
            }
        )
    if method == "tools/call":
        params = msg.get("params") or {}
        name = params.get("name")
        if name not in tools:
            return err(-32602, f"unknown tool: {name}")
        _, handler = tools[name]
        try:
            result = handler(**(params.get("arguments") or {}))
            return ok(
                {
                    "content": [
                        {
                            "type": "text",
                            "text": json.dumps(result, ensure_ascii=False),
                        }
                    ],
                    "isError": False,
                }
            )
        except Exception as exc:
            return ok(
                {
                    "content": [{"type": "text", "text": str(exc)}],
                    "isError": True,
                }
            )
    if msg_id is None:
        return None  # unknown notification: ignore
    return err(-32601, f"method not found: {method}")


def serve(stdin=None, stdout=None, roots: list[str] | None = None) -> None:
    """Newline-delimited JSON-RPC loop (the MCP stdio transport)."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    tools = build_tools(PathPolicy(roots or []))
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError:
            response = {
                "jsonrpc": "2.0",
                "id": None,
                "error": {"code": -32700, "message": "parse error"},
            }
        else:
            response = handle_message(msg, tools)
        if response is not None:
            stdout.write(json.dumps(response, ensure_ascii=False) + "\n")
            stdout.flush()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="exstruct_ray.mcp_server")
    parser.add_argument(
        "--root",
        action="append",
        default=[],
        help="allowed filesystem root (repeatable); default: cwd",
    )
    args = parser.parse_args(argv)
    serve(roots=args.root)
    return 0


if __name__ == "__main__":
    sys.exit(main())
