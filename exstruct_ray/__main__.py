"""CLI: extract one workbook to structured JSON (reference CLI parity).

    python -m exstruct_ray input.xlsx --mode light -o out.json
    python -m exstruct_ray input.xlsx --spans            # span-sequence JSONL

Mirrors /root/reference/src/exstruct/cli/main.py's extraction surface
(light/verbose modes, include flags, alpha columns, per-sheet export);
COM-only flags are intentionally absent.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="exstruct_ray", description="Extract an .xlsx/.xlsm workbook"
    )
    p.add_argument("input", help="workbook path (.xlsx/.xlsm)")
    p.add_argument("-o", "--output", default=None, help="output file (default stdout)")
    p.add_argument("--mode", default="light", choices=["light", "verbose"])
    p.add_argument(
        "--format", default="json", choices=["json", "yaml", "yml", "toon"],
        help="output serialization format",
    )
    p.add_argument("--pretty", action="store_true")
    p.add_argument("--alpha-col", action="store_true")
    p.add_argument("--spans", action="store_true", help="emit span JSONL instead")
    p.add_argument("--include-links", action="store_true", default=None)
    p.add_argument("--include-colors-map", action="store_true", default=None)
    p.add_argument("--include-formulas-map", action="store_true", default=None)
    p.add_argument("--include-merged-cells", action="store_true", default=None)
    p.add_argument(
        "--exclude-merged-values", action="store_true",
        help="drop cell values that fall inside merged ranges",
    )
    p.add_argument("--sheets-dir", default=None, help="write one file per sheet")
    p.add_argument("--print-areas-dir", default=None)
    p.add_argument("--include-backend-metadata", action="store_true")
    return p


def run_edit_cli(argv: list[str]) -> int:
    """Edit subcommands: patch / make / ops list (reference cli/edit.py).

    Payload JSON mirrors the reference's request models: for `patch`,
    {"xlsx_path": ..., "ops": [...], "out_path": ..., "dry_run": false,
    "auto_formula": false, "return_inverse_ops": false, "on_conflict":
    "overwrite"}; for `make`, {"out_path": ..., "ops": [...], "sheet": ...}.
    """
    import dataclasses

    from .edit import apply_patch, make_workbook
    from .edit.model import PATCH_OP_TYPES

    parser = argparse.ArgumentParser(prog="exstruct_ray edit")
    sub = parser.add_subparsers(dest="command", required=True)
    patch_p = sub.add_parser("patch", help="Edit an existing workbook.")
    patch_p.add_argument("payload", help="JSON payload file (- for stdin)")
    make_p = sub.add_parser("make", help="Create and edit a workbook.")
    make_p.add_argument("payload", help="JSON payload file (- for stdin)")
    ops_p = sub.add_parser("ops", help="Patch-op catalogue.")
    ops_p.add_argument("action", choices=["list"])
    validate_p = sub.add_parser(
        "validate", help="Validate a patch payload without applying it."
    )
    validate_p.add_argument("payload", help="JSON payload file (- for stdin)")
    args = parser.parse_args(argv)

    if args.command == "ops":
        print(json.dumps(list(PATCH_OP_TYPES), indent=2))
        return 0

    if args.command == "validate":
        from .edit.model import PatchOp as _PatchOp

        raw = (
            sys.stdin.read()
            if args.payload == "-"
            else open(args.payload, encoding="utf-8").read()
        )
        payload = json.loads(raw)
        from .edit.lint import lint_formula_text

        issues = []
        formula_issues = []
        for i, op in enumerate(payload.get("ops", [])):
            try:
                parsed = _PatchOp.from_dict(op)
            except Exception as exc:
                issues.append({"op_index": i, "message": str(exc)})
                continue
            texts = [parsed.formula] if parsed.formula else []
            vals = [parsed.value] if parsed.value is not None else []
            for row in parsed.values or []:
                vals.extend(row)
            texts.extend(
                v for v in vals if isinstance(v, str) and v.startswith("=")
            )
            for text in texts:
                for level, code, message in lint_formula_text(text):
                    formula_issues.append(
                        {"op_index": i, "level": level, "code": code,
                         "message": message}
                    )
        hard = bool(issues) or any(
            f["level"] == "error" for f in formula_issues
        )
        print(
            json.dumps(
                {"valid": not hard, "issues": issues,
                 "formula_issues": formula_issues},
                indent=2,
            )
        )
        return 1 if hard else 0

    raw = (
        sys.stdin.read()
        if args.payload == "-"
        else open(args.payload, encoding="utf-8").read()
    )
    payload = json.loads(raw)
    common = {
        "auto_formula": payload.get("auto_formula", False),
        "dry_run": payload.get("dry_run", False),
        "return_inverse_ops": payload.get("return_inverse_ops", False),
        "on_conflict": payload.get("on_conflict", "overwrite"),
        "preflight_formula_check": payload.get("preflight_formula_check", False),
    }
    if args.command == "patch":
        result = apply_patch(
            payload["xlsx_path"],
            payload.get("ops", []),
            out_path=payload.get("out_path"),
            **common,
        )
    else:
        result = make_workbook(
            payload.get("ops", []),
            sheet=payload.get("sheet", "Sheet1"),
            out_path=payload.get("out_path"),
            **common,
        )

    def encode(obj):
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return {
                k: v
                for k, v in dataclasses.asdict(obj).items()
                if v is not None
            }
        return str(obj)

    summary = {
        "out_path": result.out_path,
        "patch_diff": result.patch_diff,
        "inverse_ops": result.inverse_ops,
        "warnings": result.warnings,
        "error": result.error,
    }
    if result.formula_issues:
        summary["formula_issues"] = result.formula_issues
    print(json.dumps(summary, default=encode, ensure_ascii=False, indent=2))
    return 1 if result.error is not None else 0


def run_render_cli(argv: list[str]) -> int:
    """Render subcommand: light PDF / sheet PNGs (reference render/ parity
    minus COM print fidelity — an approximate layout sketch)."""
    parser = argparse.ArgumentParser(prog="exstruct_ray render")
    parser.add_argument("input", help="workbook path (.xlsx/.xlsm/.xls)")
    parser.add_argument("--pdf", default=None, help="write a whole-book PDF here")
    parser.add_argument(
        "--images-dir", default=None, help="write one PNG per sheet here"
    )
    parser.add_argument("--sheet", default=None, help="single sheet for --images-dir")
    args = parser.parse_args(argv)
    if not args.pdf and not args.images_dir:
        parser.error("need --pdf and/or --images-dir")
    from .render import export_pdf, export_sheet_images

    out: dict = {}
    if args.pdf:
        out["pdf"] = args.pdf
        out["sheets"] = export_pdf(args.input, args.pdf)
    if args.images_dir:
        out["images"] = export_sheet_images(
            args.input, args.images_dir, sheet=args.sheet
        )
    print(json.dumps(out, ensure_ascii=False, indent=2))
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "edit":
        return run_edit_cli(argv[1:])
    if argv and argv[0] == "render":
        return run_render_cli(argv[1:])
    args = build_parser().parse_args(argv)

    from .api import ExtractEngine
    from .config import ExtractOptions

    options = ExtractOptions(
        mode=args.mode,
        include_cell_links=args.include_links,
        include_colors_map=args.include_colors_map,
        include_formulas_map=args.include_formulas_map,
        include_merged_cells=args.include_merged_cells,
        include_merged_values_in_rows=not args.exclude_merged_values,
        alpha_col=args.alpha_col,
        include_backend_metadata=args.include_backend_metadata,
    )
    engine = ExtractEngine(options)

    if args.spans:
        spans = engine.extract_spans(args.input)
        lines = "\n".join(
            json.dumps(
                {
                    "kind": s.kind,
                    "text": s.text,
                    "media_ref": s.media_ref,
                    "offset": s.offset,
                },
                ensure_ascii=False,
            )
            for s in spans
        )
        if args.output:
            open(args.output, "w", encoding="utf-8").write(lines + "\n")
        else:
            print(lines)
        return 0

    workbook = engine.extract(args.input)
    from .extract.serialize import serialize_workbook, save_sheets

    text = serialize_workbook(
        workbook,
        fmt=args.format,
        pretty=args.pretty,
        include_backend_metadata=args.include_backend_metadata,
    )
    if args.output:
        open(args.output, "w", encoding="utf-8").write(text)
    else:
        print(text)
    if args.sheets_dir:
        save_sheets(workbook, args.sheets_dir, fmt=args.format if args.format != "yml" else "yaml")
    if args.print_areas_dir:
        engine.export_print_area_views(workbook, args.print_areas_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
