"""Edit-model data structures for the workbook patch subsystem.

Re-derivation of the reference's editing contract
(/root/reference/src/exstruct/edit/types.py:7-29 op vocabulary,
edit/models.py:368-520 PatchOp fields, :1421-1448 diff records) on the
engine's own span-based workbook representation — ops mutate a plain
in-memory model (no openpyxl / COM) which then re-emits OOXML parts.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
import re

PATCH_OP_TYPES = (
    "set_value",
    "set_formula",
    "add_sheet",
    "set_range_values",
    "fill_formula",
    "set_value_if",
    "set_formula_if",
    "draw_grid_border",
    "set_bold",
    "set_font_size",
    "set_font_color",
    "set_fill_color",
    "set_dimensions",
    "auto_fit_columns",
    "merge_cells",
    "unmerge_cells",
    "set_alignment",
    "set_style",
    "apply_table_style",
    "create_chart",
    "restore_design_snapshot",
)

# Field-name aliases accepted during op normalization (edit/specs.py:19-53).
OP_ALIASES: dict[str, dict[str, str]] = {
    "add_sheet": {"name": "sheet"},
    "set_fill_color": {"color": "fill_color"},
    "set_dimensions": {
        "row": "rows",
        "col": "columns",
        "height": "row_height",
        "width": "column_width",
    },
    "set_alignment": {
        "horizontal": "horizontal_align",
        "vertical": "vertical_align",
    },
}

HORIZONTAL_ALIGNS = (
    "general", "left", "center", "right", "fill", "justify",
    "centerContinuous", "distributed",
)
VERTICAL_ALIGNS = ("top", "center", "bottom", "justify", "distributed")

MAX_STYLE_TARGET_CELLS = 10_000

_A1_RE = re.compile(r"^([A-Za-z]{1,3})([1-9][0-9]*)$")
_A1_RANGE_RE = re.compile(
    r"^[A-Za-z]{1,3}[1-9][0-9]*:[A-Za-z]{1,3}[1-9][0-9]*$"
)
_HEX_COLOR_RE = re.compile(r"^#?(?:[0-9A-Fa-f]{6}|[0-9A-Fa-f]{8})$")


def col_label_to_index(label: str) -> int:
    """'A' → 1, 'AA' → 27 (1-based)."""
    n = 0
    for ch in label.upper():
        n = n * 26 + (ord(ch) - 64)
    return n


def col_index_to_label(idx: int) -> str:
    """1 → 'A' (1-based)."""
    out = []
    n = idx
    while n > 0:
        n, rem = divmod(n - 1, 26)
        out.append(chr(65 + rem))
    return "".join(reversed(out))


def parse_a1(ref: str) -> tuple[int, int]:
    """A1 → (row 1-based, col 1-based); raises ValueError on bad refs."""
    m = _A1_RE.match(ref.strip())
    if not m:
        raise ValueError(f"Invalid cell reference: {ref!r}")
    return int(m.group(2)), col_label_to_index(m.group(1))


def parse_range(ref: str) -> tuple[int, int, int, int]:
    """'A1:C3' → (r1, c1, r2, c2) all 1-based inclusive, normalized."""
    text = ref.strip()
    if not _A1_RANGE_RE.match(text):
        raise ValueError(f"Invalid range reference: {ref!r}")
    start, end = text.split(":")
    r1, c1 = parse_a1(start)
    r2, c2 = parse_a1(end)
    return min(r1, r2), min(c1, c2), max(r1, r2), max(c1, c2)


def range_ref(r1: int, c1: int, r2: int, c2: int) -> str:
    return f"{col_index_to_label(c1)}{r1}:{col_index_to_label(c2)}{r2}"


def normalize_hex_color(value: str, field_name: str) -> str:
    """'ff0000' / '#FF0000' / 'AARRGGBB' → '#RRGGBB'/'#AARRGGBB' upper."""
    text = value.strip().upper()
    if not _HEX_COLOR_RE.match(text):
        raise ValueError(
            f"Invalid {field_name} format. Use 'RRGGBB', 'AARRGGBB', "
            "'#RRGGBB', or '#AARRGGBB'."
        )
    return text if text.startswith("#") else f"#{text}"


@dataclass(frozen=True)
class BorderSide:
    style: str | None = None  # e.g. "thin"
    color: str | None = None  # "#RRGGBB"


@dataclass(frozen=True)
class EditStyle:
    """Per-cell style attributes the edit engine tracks.

    Frozen + hashable: the emitter dedups the distinct attribute sets into
    styles.xml cellXfs.
    """

    bold: bool | None = None
    font_size: float | None = None
    font_color: str | None = None  # "#RRGGBB" / "#AARRGGBB"
    fill_color: str | None = None
    horizontal: str | None = None
    vertical: str | None = None
    wrap_text: bool | None = None
    border_top: BorderSide = BorderSide()
    border_bottom: BorderSide = BorderSide()
    border_left: BorderSide = BorderSide()
    border_right: BorderSide = BorderSide()
    date_fmt: bool = False

    @property
    def is_default(self) -> bool:
        return self == _DEFAULT_EDIT_STYLE


_DEFAULT_EDIT_STYLE = EditStyle()


@dataclass
class EditCell:
    value: object = None  # str | int | float | bool | None
    formula: str | None = None  # with leading "="
    style: EditStyle = _DEFAULT_EDIT_STYLE


@dataclass
class EditTable:
    name: str
    ref: str
    style: str | None = None


@dataclass
class EditSheet:
    name: str
    cells: dict[tuple[int, int], EditCell] = field(default_factory=dict)
    merged: list[str] = field(default_factory=list)
    row_heights: dict[int, float] = field(default_factory=dict)  # 1-based
    col_widths: dict[int, float] = field(default_factory=dict)  # 1-based
    tables: list[EditTable] = field(default_factory=list)

    def cell(self, r: int, c: int) -> EditCell:
        got = self.cells.get((r, c))
        if got is None:
            got = EditCell()
            self.cells[(r, c)] = got
        return got

    def peek(self, r: int, c: int) -> EditCell | None:
        return self.cells.get((r, c))

    def restyle(self, r: int, c: int, **changes) -> None:
        cell = self.cell(r, c)
        cell.style = replace(cell.style, **changes)


@dataclass
class EditWorkbook:
    sheets: dict[str, EditSheet] = field(default_factory=dict)  # ordered

    def sheet(self, name: str) -> EditSheet:
        got = self.sheets.get(name)
        if got is None:
            raise KeyError(f"Sheet not found: {name}")
        return got

    def add_sheet(self, name: str) -> EditSheet:
        if name in self.sheets:
            raise ValueError(f"Sheet already exists: {name}")
        sheet = EditSheet(name=name)
        self.sheets[name] = sheet
        return sheet


# ---------------------------------------------------------------------------
# Patch op / result records
# ---------------------------------------------------------------------------


@dataclass
class PatchOp:
    """One patch operation (field set mirrors the reference contract)."""

    op: str
    sheet: str
    cell: str | None = None
    range: str | None = None
    base_cell: str | None = None
    expected: object = None
    value: object = None
    values: list[list[object]] | None = None
    formula: str | None = None
    row_count: int | None = None
    col_count: int | None = None
    bold: bool | None = None
    font_size: float | None = None
    color: str | None = None
    fill_color: str | None = None
    rows: list[int] | None = None
    columns: list[object] | None = None
    row_height: float | None = None
    column_width: float | None = None
    min_width: float | None = None
    max_width: float | None = None
    horizontal_align: str | None = None
    vertical_align: str | None = None
    wrap_text: bool | None = None
    style: str | None = None
    table_name: str | None = None
    design_snapshot: dict | None = None
    # create_chart fields — accepted by validation, rejected at apply time
    # (COM-only in the reference; this engine has no COM).
    chart_type: str | None = None
    data_range: object = None
    category_range: str | None = None
    anchor_cell: str | None = None
    title: str | None = None
    chart_name: str | None = None

    @staticmethod
    def from_dict(raw: dict) -> "PatchOp":
        data = dict(raw)
        op_name = data.get("op")
        if op_name not in PATCH_OP_TYPES:
            raise ValueError(f"Unknown patch op: {op_name!r}")
        for alias, target in OP_ALIASES.get(op_name, {}).items():
            if alias in data and target not in data:
                data[target] = data.pop(alias)
        known = {f for f in PatchOp.__dataclass_fields__}
        unknown = set(data) - known
        if unknown:
            raise ValueError(
                f"Unknown fields for op {op_name}: {sorted(unknown)}"
            )
        if "sheet" not in data:
            raise ValueError(f"op {op_name} requires 'sheet'")
        return PatchOp(**data)


@dataclass
class PatchValue:
    kind: str  # value | formula | sheet | style | dimension
    value: object


@dataclass
class PatchDiffItem:
    op_index: int
    op: str
    sheet: str
    cell: str | None = None
    before: PatchValue | None = None
    after: PatchValue | None = None
    status: str = "applied"  # applied | skipped


@dataclass
class PatchErrorDetail:
    op_index: int
    op: str
    sheet: str
    cell: str | None
    message: str


@dataclass
class PatchResult:
    patch_diff: list[PatchDiffItem] = field(default_factory=list)
    inverse_ops: list[PatchOp] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    error: PatchErrorDetail | None = None
    out_path: str | None = None
    # The patched workbook's OOXML parts ({path: xml}); None on error/dry_run
    # when no output is produced.
    parts: dict[str, str] | None = None
    # Formula health-check findings (populated when preflight_formula_check
    # is requested; reference internal.py:1655 PatchResult.formula_issues).
    formula_issues: list = field(default_factory=list)
