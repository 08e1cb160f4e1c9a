"""Patch-op application engine (openpyxl-backend semantics re-derived).

Behavioral parity targets, all re-implemented against the edit model:
/root/reference/src/exstruct/edit/internal.py:2822-2930 (cell ops,
auto_formula, conditional skip), :2302-2330 (fill_formula row/col
constraint + per-target translation), :2534-2644 (auto-fit estimation
``max_len + 2`` / 8.43 default, merge overlap error + value-loss warning,
unmerge-intersecting), :3530-3556 (condition equality, inverse cell ops).
``create_chart`` is COM-only in the reference and raises here exactly like
its openpyxl backend does.
"""

from __future__ import annotations

from dataclasses import replace

from ..functions.formulas import translate_formula
from .model import (
    MAX_STYLE_TARGET_CELLS,
    BorderSide,
    EditSheet,
    EditWorkbook,
    HORIZONTAL_ALIGNS,
    VERTICAL_ALIGNS,
    PatchDiffItem,
    PatchErrorDetail,
    PatchOp,
    PatchResult,
    PatchValue,
    col_index_to_label,
    col_label_to_index,
    normalize_hex_color,
    parse_a1,
    parse_range,
    range_ref,
)

_THIN_BLACK = BorderSide(style="thin", color="#000000")


def _cell_patch_value(sheet: EditSheet, r: int, c: int) -> PatchValue | None:
    cell = sheet.peek(r, c)
    if cell is None or (cell.value is None and cell.formula is None):
        return None
    if cell.formula is not None:
        return PatchValue(kind="formula", value=cell.formula)
    return PatchValue(kind="value", value=cell.value)


def _primitive(value: PatchValue | None) -> object:
    return None if value is None else value.value


def _target_cells(op: PatchOp) -> list[tuple[int, int]]:
    """Cells addressed by a style op (cell or range), bounded."""
    if op.range is not None:
        r1, c1, r2, c2 = parse_range(op.range)
    elif op.cell is not None:
        r, c = parse_a1(op.cell)
        r1, c1, r2, c2 = r, c, r, c
    else:
        raise ValueError(f"{op.op} requires cell or range.")
    count = (r2 - r1 + 1) * (c2 - c1 + 1)
    if count > MAX_STYLE_TARGET_CELLS:
        raise ValueError(
            f"{op.op} targets {count} cells (max {MAX_STYLE_TARGET_CELLS})."
        )
    return [(r, c) for r in range(r1, r2 + 1) for c in range(c1, c2 + 1)]


def _style_snapshot(sheet: EditSheet, targets: list[tuple[int, int]]) -> dict:
    """Design snapshot for the inverse restore op.

    Previously-empty cells are recorded with the DEFAULT style — a style op
    creates them, so the inverse must reset them to default, not skip them.
    """
    from .model import EditStyle

    cells = {}
    for r, c in targets:
        cell = sheet.peek(r, c)
        cells[f"{col_index_to_label(c)}{r}"] = (
            cell.style if cell is not None else EditStyle()
        )
    return {"cells": cells}


def _set_cell_value(
    sheet: EditSheet, r: int, c: int, value: object, auto_formula: bool, op_name: str
) -> PatchValue:
    if isinstance(value, str) and value.startswith("="):
        if not auto_formula:
            raise ValueError(f"{op_name} rejects values starting with '='.")
        cell = sheet.cell(r, c)
        cell.formula = value
        cell.value = None
        return PatchValue(kind="formula", value=value)
    cell = sheet.cell(r, c)
    cell.value = value
    cell.formula = None
    return PatchValue(kind="value", value=value)


def _require_formula(formula: str | None, op_name: str) -> str:
    if formula is None or not formula.startswith("="):
        raise ValueError(f"{op_name} requires a formula starting with '='.")
    return formula


def _coerce_style(style):
    """Accept EditStyle objects AND their JSON dict form (inverse ops that
    round-tripped through `edit patch --return-inverse-ops` output)."""
    from .model import BorderSide, EditStyle

    if isinstance(style, EditStyle):
        return style
    if isinstance(style, dict):
        data = dict(style)
        for side in ("border_top", "border_bottom", "border_left", "border_right"):
            raw = data.get(side)
            if isinstance(raw, dict):
                data[side] = BorderSide(**raw)
            elif raw is None:
                data[side] = BorderSide()
        known = {f for f in EditStyle.__dataclass_fields__}
        return EditStyle(**{k: v for k, v in data.items() if k in known})
    raise ValueError(f"unsupported style payload: {type(style)!r}")


def _inverse_cell_op(op: PatchOp, cell_ref: str, before: PatchValue | None) -> PatchOp:
    if before is None:
        return PatchOp(op="set_value", sheet=op.sheet, cell=cell_ref, value=None)
    if before.kind == "formula":
        return PatchOp(
            op="set_formula", sheet=op.sheet, cell=cell_ref,
            formula=str(before.value),
        )
    return PatchOp(op="set_value", sheet=op.sheet, cell=cell_ref, value=before.value)


def _restore_op(sheet_name: str, snapshot: dict) -> PatchOp:
    return PatchOp(
        op="restore_design_snapshot", sheet=sheet_name, design_snapshot=snapshot
    )


def _ranges_intersect(a: tuple[int, int, int, int], b: tuple[int, int, int, int]) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


class PatchEngine:
    """Applies a patch-op list to an EditWorkbook with diff/inverse records."""

    def __init__(self, workbook: EditWorkbook, *, auto_formula: bool = False):
        self.workbook = workbook
        self.auto_formula = auto_formula
        self.diff: list[PatchDiffItem] = []
        self.inverse_ops: list[PatchOp] = []
        self.warnings: list[str] = []

    # -- entry ---------------------------------------------------------------

    def apply(self, ops: list[PatchOp]) -> PatchErrorDetail | None:
        for index, op in enumerate(ops):
            try:
                self._apply_one(op, index)
            except Exception as exc:
                return PatchErrorDetail(
                    op_index=index, op=op.op, sheet=op.sheet,
                    cell=op.cell or op.range, message=str(exc),
                )
        return None

    def _apply_one(self, op: PatchOp, index: int) -> None:
        if op.op == "add_sheet":
            self.workbook.add_sheet(op.sheet)
            self._record(index, op, None, None, PatchValue("sheet", op.sheet))
            return
        if op.op == "create_chart":
            raise ValueError(
                "create_chart is supported only on COM backend; "
                "this engine has no COM."
            )
        sheet = self.workbook.sheet(op.sheet)
        handler = getattr(self, f"_op_{op.op}")
        handler(sheet, op, index)

    def _record(
        self,
        index: int,
        op: PatchOp,
        cell: str | None,
        before: PatchValue | None,
        after: PatchValue | None,
        status: str = "applied",
    ) -> None:
        self.diff.append(
            PatchDiffItem(
                op_index=index, op=op.op, sheet=op.sheet, cell=cell,
                before=before, after=after, status=status,
            )
        )

    # -- cell value ops ------------------------------------------------------

    def _op_set_value(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.cell is None:
            raise ValueError("set_value requires cell.")
        r, c = parse_a1(op.cell)
        before = _cell_patch_value(sheet, r, c)
        after = _set_cell_value(sheet, r, c, op.value, self.auto_formula, "set_value")
        self._record(index, op, op.cell, before, after)
        self.inverse_ops.append(_inverse_cell_op(op, op.cell, before))

    def _op_set_formula(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.cell is None:
            raise ValueError("set_formula requires cell.")
        formula = _require_formula(op.formula, "set_formula")
        r, c = parse_a1(op.cell)
        before = _cell_patch_value(sheet, r, c)
        cell = sheet.cell(r, c)
        cell.formula = formula
        cell.value = None
        self._record(index, op, op.cell, before, PatchValue("formula", formula))
        self.inverse_ops.append(_inverse_cell_op(op, op.cell, before))

    def _op_set_value_if(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.cell is None:
            raise ValueError("set_value_if requires cell.")
        r, c = parse_a1(op.cell)
        before = _cell_patch_value(sheet, r, c)
        if _primitive(before) != op.expected:
            self._record(index, op, op.cell, before, before, status="skipped")
            return
        after = _set_cell_value(
            sheet, r, c, op.value, self.auto_formula, "set_value_if"
        )
        self._record(index, op, op.cell, before, after)
        self.inverse_ops.append(_inverse_cell_op(op, op.cell, before))

    def _op_set_formula_if(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.cell is None:
            raise ValueError("set_formula_if requires cell.")
        formula = _require_formula(op.formula, "set_formula_if")
        r, c = parse_a1(op.cell)
        before = _cell_patch_value(sheet, r, c)
        if _primitive(before) != op.expected:
            self._record(index, op, op.cell, before, before, status="skipped")
            return
        cell = sheet.cell(r, c)
        cell.formula = formula
        cell.value = None
        self._record(index, op, op.cell, before, PatchValue("formula", formula))
        self.inverse_ops.append(_inverse_cell_op(op, op.cell, before))

    # -- range ops -----------------------------------------------------------

    def _op_set_range_values(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.range is None or op.values is None:
            raise ValueError("set_range_values requires range and values.")
        r1, c1, r2, c2 = parse_range(op.range)
        n_rows, n_cols = r2 - r1 + 1, c2 - c1 + 1
        if len(op.values) != n_rows or any(len(row) != n_cols for row in op.values):
            raise ValueError(
                f"values shape {len(op.values)}x"
                f"{len(op.values[0]) if op.values else 0} does not match "
                f"range {op.range} ({n_rows}x{n_cols})."
            )
        inverses: list[PatchOp] = []
        for ri, row in enumerate(op.values):
            for ci, value in enumerate(row):
                ref = (
                    f"{col_index_to_label(c1 + ci)}{r1 + ri}"
                )
                before = _cell_patch_value(sheet, r1 + ri, c1 + ci)
                inverses.append(_inverse_cell_op(op, ref, before))
                _set_cell_value(
                    sheet, r1 + ri, c1 + ci, value, self.auto_formula,
                    "set_range_values",
                )
        self._record(
            index, op, op.range, None,
            PatchValue("value", f"{n_rows}x{n_cols} values"),
        )
        self.inverse_ops.extend(inverses)

    def _op_fill_formula(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.range is None or op.formula is None or op.base_cell is None:
            raise ValueError("fill_formula requires range, base_cell and formula.")
        formula = _require_formula(op.formula, "fill_formula")
        r1, c1, r2, c2 = parse_range(op.range)
        if r1 != r2 and c1 != c2:
            raise ValueError(
                "fill_formula range must be a single row or a single column."
            )
        base_r, base_c = parse_a1(op.base_cell)
        body = formula[1:]
        inverses: list[PatchOp] = []
        for r in range(r1, r2 + 1):
            for c in range(c1, c2 + 1):
                ref = f"{col_index_to_label(c)}{r}"
                inverses.append(
                    _inverse_cell_op(op, ref, _cell_patch_value(sheet, r, c))
                )
                translated = translate_formula(body, r - base_r, c - base_c)
                cell = sheet.cell(r, c)
                cell.formula = f"={translated}"
                cell.value = None
        self._record(
            index, op, op.range, None, PatchValue("formula", formula)
        )
        self.inverse_ops.extend(inverses)

    # -- style ops -----------------------------------------------------------

    def _style_op(
        self, sheet: EditSheet, op: PatchOp, index: int, changes: dict,
        summary: str,
    ) -> None:
        targets = _target_cells(op)
        snapshot = _style_snapshot(sheet, targets)
        for r, c in targets:
            sheet.restyle(r, c, **changes)
        self._record(
            index, op, op.cell or op.range, None, PatchValue("style", summary)
        )
        self.inverse_ops.append(_restore_op(op.sheet, snapshot))

    def _op_set_bold(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        bold = True if op.bold is None else op.bold
        self._style_op(sheet, op, index, {"bold": bold}, f"bold={bold}")

    def _op_set_font_size(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.font_size is None or op.font_size <= 0:
            raise ValueError("set_font_size requires font_size > 0.")
        self._style_op(
            sheet, op, index, {"font_size": float(op.font_size)},
            f"font_size={op.font_size:g}",
        )

    def _op_set_font_color(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.color is None:
            raise ValueError("set_font_color requires color.")
        color = normalize_hex_color(op.color, "color")
        self._style_op(sheet, op, index, {"font_color": color}, f"color={color}")

    def _op_set_fill_color(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.fill_color is None:
            raise ValueError("set_fill_color requires fill_color.")
        color = normalize_hex_color(op.fill_color, "fill_color")
        self._style_op(
            sheet, op, index, {"fill_color": color}, f"fill_color={color}"
        )

    def _op_set_alignment(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        changes: dict = {}
        parts = []
        if op.horizontal_align is not None:
            if op.horizontal_align not in HORIZONTAL_ALIGNS:
                raise ValueError(
                    f"Invalid horizontal_align: {op.horizontal_align}"
                )
            changes["horizontal"] = op.horizontal_align
            parts.append(f"horizontal={op.horizontal_align}")
        if op.vertical_align is not None:
            if op.vertical_align not in VERTICAL_ALIGNS:
                raise ValueError(f"Invalid vertical_align: {op.vertical_align}")
            changes["vertical"] = op.vertical_align
            parts.append(f"vertical={op.vertical_align}")
        if op.wrap_text is not None:
            changes["wrap_text"] = op.wrap_text
            parts.append(f"wrap_text={op.wrap_text}")
        if not changes:
            raise ValueError(
                "set_alignment requires horizontal_align, vertical_align, "
                "or wrap_text."
            )
        self._style_op(sheet, op, index, changes, ", ".join(parts))

    def _op_set_style(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        changes: dict = {}
        parts = []
        if op.bold is not None:
            changes["bold"] = op.bold
            parts.append(f"bold={op.bold}")
        if op.font_size is not None:
            if op.font_size <= 0:
                raise ValueError("set_style requires font_size > 0.")
            changes["font_size"] = float(op.font_size)
            parts.append(f"font_size={op.font_size:g}")
        if op.color is not None:
            changes["font_color"] = normalize_hex_color(op.color, "color")
            parts.append(f"color={changes['font_color']}")
        if op.fill_color is not None:
            changes["fill_color"] = normalize_hex_color(
                op.fill_color, "fill_color"
            )
            parts.append(f"fill_color={changes['fill_color']}")
        if op.horizontal_align is not None:
            if op.horizontal_align not in HORIZONTAL_ALIGNS:
                raise ValueError(
                    f"Invalid horizontal_align: {op.horizontal_align}"
                )
            changes["horizontal"] = op.horizontal_align
            parts.append(f"horizontal={op.horizontal_align}")
        if op.vertical_align is not None:
            if op.vertical_align not in VERTICAL_ALIGNS:
                raise ValueError(f"Invalid vertical_align: {op.vertical_align}")
            changes["vertical"] = op.vertical_align
            parts.append(f"vertical={op.vertical_align}")
        if op.wrap_text is not None:
            changes["wrap_text"] = op.wrap_text
            parts.append(f"wrap_text={op.wrap_text}")
        if not changes:
            raise ValueError("set_style requires at least one style attribute.")
        self._style_op(sheet, op, index, changes, ", ".join(parts))

    def _op_draw_grid_border(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.cell is None or op.row_count is None or op.col_count is None:
            raise ValueError(
                "draw_grid_border requires cell, row_count and col_count."
            )
        if op.row_count <= 0 or op.col_count <= 0:
            raise ValueError("draw_grid_border counts must be positive.")
        r1, c1 = parse_a1(op.cell)
        targets = [
            (r, c)
            for r in range(r1, r1 + op.row_count)
            for c in range(c1, c1 + op.col_count)
        ]
        if len(targets) > MAX_STYLE_TARGET_CELLS:
            raise ValueError(
                f"draw_grid_border targets {len(targets)} cells "
                f"(max {MAX_STYLE_TARGET_CELLS})."
            )
        snapshot = _style_snapshot(sheet, targets)
        for r, c in targets:
            sheet.restyle(
                r, c,
                border_top=_THIN_BLACK, border_bottom=_THIN_BLACK,
                border_left=_THIN_BLACK, border_right=_THIN_BLACK,
            )
        area = range_ref(r1, c1, r1 + op.row_count - 1, c1 + op.col_count - 1)
        self._record(
            index, op, op.cell, None, PatchValue("style", f"grid_border={area}")
        )
        self.inverse_ops.append(_restore_op(op.sheet, snapshot))

    # -- dimensions ----------------------------------------------------------

    def _op_set_dimensions(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if not op.rows and not op.columns:
            raise ValueError("set_dimensions requires rows and/or columns.")
        parts = []
        snapshot: dict = {"row_heights": {}, "col_widths": {}}
        if op.rows:
            if op.row_height is None or op.row_height <= 0:
                raise ValueError("set_dimensions rows require row_height > 0.")
            for row in op.rows:
                snapshot["row_heights"][int(row)] = sheet.row_heights.get(int(row))
                sheet.row_heights[int(row)] = float(op.row_height)
            parts.append(f"rows={op.rows} height={op.row_height:g}")
        if op.columns:
            if op.column_width is None or op.column_width <= 0:
                raise ValueError(
                    "set_dimensions columns require column_width > 0."
                )
            for col in op.columns:
                idx = (
                    col_label_to_index(col) if isinstance(col, str) else int(col)
                )
                if idx <= 0:
                    raise ValueError(f"Invalid column identifier: {col!r}")
                snapshot["col_widths"][idx] = sheet.col_widths.get(idx)
                sheet.col_widths[idx] = float(op.column_width)
            parts.append(f"columns={op.columns} width={op.column_width:g}")
        self._record(
            index, op, None, None, PatchValue("dimension", ", ".join(parts))
        )
        self.inverse_ops.append(_restore_op(op.sheet, snapshot))

    def _op_auto_fit_columns(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.columns:
            indexes = [
                col_label_to_index(col) if isinstance(col, str) else int(col)
                for col in op.columns
            ]
        else:
            indexes = sorted({c for _, c in sheet.cells})
        if not indexes:
            raise ValueError("auto_fit_columns could not resolve target columns.")
        max_lengths: dict[int, int] = {}
        for (r, c), cell in sheet.cells.items():
            if c not in indexes:
                continue
            content = cell.formula if cell.formula is not None else cell.value
            if content is None or content == "":
                continue
            text = str(content)
            length = max((len(line) for line in text.splitlines()), default=0)
            if length > max_lengths.get(c, 0):
                max_lengths[c] = length
        snapshot: dict = {"col_widths": {}}
        for idx in indexes:
            snapshot["col_widths"][idx] = sheet.col_widths.get(idx)
            max_len = max_lengths.get(idx, 0)
            if max_len <= 0:
                current = sheet.col_widths.get(idx)
                width = current if current and current > 0 else 8.43
            else:
                width = float(max_len + 2)
            if op.min_width is not None and width < op.min_width:
                width = op.min_width
            if op.max_width is not None and width > op.max_width:
                width = op.max_width
            sheet.col_widths[idx] = float(width)
        labels = [col_index_to_label(i) for i in indexes]
        self._record(
            index, op, None, None,
            PatchValue("dimension", f"columns={labels}"),
        )
        self.inverse_ops.append(_restore_op(op.sheet, snapshot))

    # -- merge ops -----------------------------------------------------------

    def _op_merge_cells(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.range is None:
            raise ValueError("merge_cells requires range.")
        bounds = parse_range(op.range)
        overlapped = [
            m for m in sheet.merged if _ranges_intersect(bounds, parse_range(m))
        ]
        if overlapped:
            raise ValueError(
                "merge_cells range overlaps existing merged ranges: "
                + ", ".join(overlapped) + "."
            )
        r1, c1, r2, c2 = bounds
        risky = []
        for r in range(r1, r2 + 1):
            for c in range(c1, c2 + 1):
                if (r, c) == (r1, c1):
                    continue
                cell = sheet.peek(r, c)
                if cell is not None and (
                    cell.value not in (None, "") or cell.formula is not None
                ):
                    risky.append(f"{col_index_to_label(c)}{r}")
                    cell.value = None
                    cell.formula = None
        if risky:
            self.warnings.append(
                f"merge_cells cleared non-top-left values at "
                f"{op.sheet}!{op.range}: {', '.join(risky)}"
            )
        normalized = range_ref(r1, c1, r2, c2)
        sheet.merged.append(normalized)
        self._record(
            index, op, op.range, None, PatchValue("style", f"merged={normalized}")
        )
        self.inverse_ops.append(
            _restore_op(op.sheet, {"merge_remove": [normalized]})
        )

    def _op_unmerge_cells(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.range is None:
            raise ValueError("unmerge_cells requires range.")
        bounds = parse_range(op.range)
        removed = [
            m for m in sheet.merged if _ranges_intersect(bounds, parse_range(m))
        ]
        sheet.merged = [m for m in sheet.merged if m not in removed]
        self._record(
            index, op, op.range, None,
            PatchValue("style", f"unmerged={len(removed)}"),
        )
        self.inverse_ops.append(_restore_op(op.sheet, {"merge_add": removed}))

    # -- tables --------------------------------------------------------------

    def _op_apply_table_style(self, sheet: EditSheet, op: PatchOp, index: int) -> None:
        if op.range is None:
            raise ValueError("apply_table_style requires range.")
        parse_range(op.range)  # validation
        name = op.table_name or f"Table{len(sheet.tables) + 1}"
        if any(t.name == name for t in sheet.tables):
            raise ValueError(f"Table already exists: {name}")
        from .model import EditTable

        sheet.tables.append(
            EditTable(name=name, ref=op.range, style=op.style)
        )
        self._record(
            index, op, op.range, None,
            PatchValue("style", f"table={name} style={op.style}"),
        )
        self.inverse_ops.append(
            _restore_op(op.sheet, {"table_remove": [name]})
        )

    # -- snapshot restore ----------------------------------------------------

    def _op_restore_design_snapshot(
        self, sheet: EditSheet, op: PatchOp, index: int
    ) -> None:
        snapshot = op.design_snapshot or {}
        for ref, style in snapshot.get("cells", {}).items():
            r, c = parse_a1(ref)
            cell = sheet.cell(r, c)
            cell.style = _coerce_style(style)
        for row, height in snapshot.get("row_heights", {}).items():
            if height is None:
                sheet.row_heights.pop(int(row), None)
            else:
                sheet.row_heights[int(row)] = float(height)
        for col, width in snapshot.get("col_widths", {}).items():
            if width is None:
                sheet.col_widths.pop(int(col), None)
            else:
                sheet.col_widths[int(col)] = float(width)
        for m in snapshot.get("merge_remove", []):
            if m in sheet.merged:
                sheet.merged.remove(m)
        for m in snapshot.get("merge_add", []):
            if m not in sheet.merged:
                sheet.merged.append(m)
        for name in snapshot.get("table_remove", []):
            sheet.tables = [t for t in sheet.tables if t.name != name]
        self._record(
            index, op, None, None, PatchValue("style", "snapshot restored")
        )


def apply_ops(
    workbook: EditWorkbook,
    ops: list[PatchOp | dict],
    *,
    auto_formula: bool = False,
) -> PatchResult:
    """Apply ops to the model in place; first error aborts (model may be
    partially mutated — callers wanting atomicity apply to a copy)."""
    normalized = [
        op if isinstance(op, PatchOp) else PatchOp.from_dict(op) for op in ops
    ]
    engine = PatchEngine(workbook, auto_formula=auto_formula)
    error = engine.apply(normalized)
    return PatchResult(
        patch_diff=engine.diff,
        inverse_ops=list(reversed(engine.inverse_ops)),
        warnings=engine.warnings,
        error=error,
    )
