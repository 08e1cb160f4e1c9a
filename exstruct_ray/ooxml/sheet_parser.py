"""Worksheet XML parsing: cell grid, merged ranges, hyperlinks, metrics.

Replaces the reference's pandas/openpyxl readers
(/root/reference/src/exstruct/core/cells.py:701-797) with a single pass over
the sheet XML part. Value rendering matches the reference's
``pd.read_excel(dtype=str)`` semantics: every cell is rendered to the string
pandas would have produced (numbers via int/float str(), booleans
"True"/"False", date-formatted numbers as "YYYY-MM-DD HH:MM:SS"), then
numerically re-coerced downstream by ``coerce_numeric_preserve_format``.

Sheet sizing metrics parity: core/ooxml_drawing.py:746-860
(`_read_sheet_metrics`, `_column_width_to_points`, prefix-sum offsets).
"""

from __future__ import annotations

from dataclasses import dataclass, field
import datetime as _dt
import re
import xml.etree.ElementTree as ET

from ..functions.geometry import column_width_to_points
from .package import HYPERLINK_REL_TYPE, VirtualPackage
from .styles import Stylesheet

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_CELL_REF_RE = re.compile(r"^([A-Z]+)(\d+)$")

DEFAULT_COLUMN_WIDTH_POINTS = 48.0
DEFAULT_ROW_HEIGHT_POINTS = 15.0

_EXCEL_EPOCH_1900 = _dt.datetime(1899, 12, 30)
_EXCEL_EPOCH_1904 = _dt.datetime(1904, 1, 1)


def _col_letters_to_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


@dataclass
class Cell:
    value: str  # rendered string value ("" when empty)
    style: int | None = None
    formula: str | None = None  # raw formula text without leading "="


@dataclass
class SheetMetrics:
    """Row/column sizing used to resolve drawing anchors (prefix sums)."""

    default_column_width_points: float = DEFAULT_COLUMN_WIDTH_POINTS
    default_row_height_points: float = DEFAULT_ROW_HEIGHT_POINTS
    column_width_points: dict[int, float] = field(default_factory=dict)
    row_height_points: dict[int, float] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self._col_offsets = [0.0]
        self._row_offsets = [0.0]

    def column_offset_points(self, col_index: int) -> float:
        return self._offset(
            col_index,
            self.column_width_points,
            self.default_column_width_points,
            self._col_offsets,
        )

    def row_offset_points(self, row_index: int) -> float:
        return self._offset(
            row_index,
            self.row_height_points,
            self.default_row_height_points,
            self._row_offsets,
        )

    @staticmethod
    def _offset(
        index: int,
        explicit: dict[int, float],
        default: float,
        prefix: list[float],
    ) -> float:
        if index <= 0:
            return 0.0
        while len(prefix) <= index:
            nxt = len(prefix) - 1
            prefix.append(prefix[-1] + explicit.get(nxt, default))
        return prefix[index]


@dataclass
class SheetGrid:
    """Parsed worksheet: sparse cell map keyed by (row 1-based, col 0-based)."""

    name: str
    cells: dict[tuple[int, int], Cell] = field(default_factory=dict)
    merged_refs: list[str] = field(default_factory=list)
    hyperlinks: dict[tuple[int, int], str] = field(default_factory=dict)
    table_part_rids: list[str] = field(default_factory=list)
    metrics: SheetMetrics = field(default_factory=SheetMetrics)
    # Used-range bounds: rows/cols 1-based inclusive; (1, 1, 0, 0) when empty.
    min_row: int = 1
    min_col: int = 1
    max_row: int = 0
    max_col: int = 0

    def value_at(self, row: int, col0: int) -> str:
        cell = self.cells.get((row, col0))
        return cell.value if cell is not None else ""


def _render_number(text: str) -> str:
    """Render a numeric XML token the way openpyxl+str() would."""
    try:
        if "." not in text and "e" not in text and "E" not in text:
            return str(int(text))
        return str(float(text))
    except ValueError:
        return text


def _render_date(serial: float, date1904: bool = False) -> str:
    """Render an Excel date serial the way pandas' Timestamp str() does.

    1900 system: Excel pretends 1900-02-29 exists (serial 60), so serials
    below 60 are shifted +1 day — matching openpyxl/pandas (the reference's
    reader). The 1904 system has no such bug.
    """
    try:
        epoch = _EXCEL_EPOCH_1904 if date1904 else _EXCEL_EPOCH_1900
        if not date1904 and 1 <= serial < 60:
            serial += 1
        dt = epoch + _dt.timedelta(days=serial)
    except OverflowError:
        return str(serial)
    # Round to the nearest second to absorb float serial error.
    if dt.microsecond >= 500000:
        dt += _dt.timedelta(seconds=1)
    dt = dt.replace(microsecond=0)
    return dt.strftime("%Y-%m-%d %H:%M:%S")


_FAST_CELL_RE = re.compile(
    r'<c r="([A-Z]+)(\d+)"((?:\s+[a-zA-Z]+="[^"]*")*)\s*(?:/>|>(.*?)</c>)', re.S
)
_FAST_ATTR_RE = re.compile(r'([a-zA-Z]+)="([^"]*)"')
_FAST_ROW_OPEN_RE = re.compile(r"<row\b([^>]*?)/?>")
_FAST_ROW_R_RE = re.compile(r'<row[^>]*\br="')
_FAST_F_RE = re.compile(r"<f(\s[^>]*)?(?:/>|>(.*?)</f>)", re.S)
_FAST_V_RE = re.compile(r"<v(?:\s[^>]*)?>(.*?)</v>", re.S)

# Counts every cell opening regardless of attribute spacing — the guard
# comparing this against the canonical-form matches must never share the
# match regex's blind spots, or divergent inputs skip the ET fallback.
_FAST_CELL_OPEN_RE = re.compile(r"<c[\s/>]")


def _unescape(text: str) -> str:
    if "&" not in text:
        return text
    import html

    return html.unescape(text)


def parse_sheet(
    package: VirtualPackage,
    sheet_path: str,
    sheet_name: str,
    shared_strings: list[str],
    styles: Stylesheet,
    *,
    allow_fast_path: bool = True,
    date1904: bool = False,
) -> SheetGrid:
    """Parse one worksheet part into a SheetGrid.

    Uses a regex fast scanner for the dominant sheetData shapes when the
    part is default-namespaced and every cell matches the canonical form
    (measured ~4.5× faster than ElementTree on dense sheets); anything
    unusual — namespace prefixes, unmatched cells, inline rich strings —
    falls back to the full ElementTree path, cell-wise or wholesale.
    """
    if allow_fast_path:
        raw = package.read_text(sheet_path)
        # Small parts: ElementTree's C parser wins; the regex path pays off
        # once the sheetData dominates the part.
        if len(raw) >= 8192:
            grid = _parse_sheet_fast(
                package, sheet_path, sheet_name, raw, shared_strings, styles,
                date1904=date1904,
            )
            if grid is not None:
                return grid
    return _parse_sheet_et(
        package, sheet_path, sheet_name, shared_strings, styles, date1904=date1904
    )


def _parse_sheet_fast(
    package: VirtualPackage,
    sheet_path: str,
    sheet_name: str,
    raw: str,
    shared_strings: list[str],
    styles: Stylesheet,
    date1904: bool = False,
) -> SheetGrid | None:
    """Regex scan of <sheetData>; None when preconditions fail."""
    root_at = raw.find("<worksheet")
    if root_at < 0:
        return None  # prefixed or unusual root → ET path
    start = raw.find("<sheetData")
    if start < 0:
        # No cells at all — the ET path handles metadata-only sheets.
        return None
    end = raw.find("</sheetData>")
    if end < 0:
        # <sheetData/> self-closing
        close = raw.find(">", start)
        if close < 0 or raw[close - 1] != "/":
            return None
        sheet_data = ""
        remainder = raw
    else:
        sheet_data = raw[raw.find(">", start) + 1 : end]
        remainder = raw[:start] + "<sheetData/>" + raw[end + len("</sheetData>") :]

    # Precondition: every <c occurrence must be matched by the canonical
    # cell regex, else semantics could silently diverge → ET fallback.
    # XML comments could hide (or fabricate) cells from the regex → ET.
    if "<!--" in sheet_data:
        return None
    matches = _FAST_CELL_RE.findall(sheet_data)
    if len(matches) != len(_FAST_CELL_OPEN_RE.findall(sheet_data)):
        return None
    # Rows lacking an r attribute imply positions (and row heights) the
    # fast regexes cannot see — let the ET path reconstruct them.
    if sheet_data.count("<row") != len(_FAST_ROW_R_RE.findall(sheet_data)):
        return None

    # Metadata (format, cols, merges, links) parsed via ET on the remainder
    # — tiny compared to sheetData.
    grid = _parse_sheet_et_from_root(
        package, sheet_path, sheet_name, ET.fromstring(remainder), shared_strings,
        styles, date1904=date1904,
    )

    # Row heights: attributes may appear in any order within <row ...>, so
    # scan every row open tag and decode attrs with the generic attr regex
    # (the ET path reads attrib dicts and is likewise order-independent).
    for row_match in _FAST_ROW_OPEN_RE.finditer(sheet_data):
        attrs_str = row_match.group(1)
        if 'ht="' not in attrs_str:
            continue
        row_idx: int | None = None
        ht: float | None = None
        for attr_name, attr_value in _FAST_ATTR_RE.findall(attrs_str):
            try:
                if attr_name == "r":
                    row_idx = int(attr_value)
                elif attr_name == "ht":
                    ht = float(attr_value)
            except ValueError:
                pass
        if row_idx is not None and row_idx > 0 and ht is not None and ht > 0:
            grid.metrics.row_height_points[row_idx - 1] = ht

    cells = grid.cells
    date_styles = styles.date_style_ids()
    shared_formulas: dict[str, tuple[str, int, int]] = {}
    min_r = min_c = None
    max_r = max_c = 0
    # Attr strings and column letters repeat massively on dense sheets —
    # memoize their decoding (bounded by distinct styles / columns).
    attr_cache: dict[str, tuple[int | None, str]] = {"": (None, "n")}
    col_cache: dict[str, int] = {}
    for letters, row_str, attrs_str, inner in matches:
        col0 = col_cache.get(letters)
        if col0 is None:
            col0 = _col_letters_to_index(letters)
            col_cache[letters] = col0
        row1 = int(row_str)
        decoded = attr_cache.get(attrs_str)
        if decoded is None:
            style_idx = None
            cell_type = "n"
            for attr_name, attr_value in _FAST_ATTR_RE.findall(attrs_str):
                if attr_name == "s":
                    try:
                        style_idx = int(attr_value)
                    except ValueError:
                        style_idx = None
                elif attr_name == "t":
                    cell_type = attr_value
            decoded = (style_idx, cell_type)
            attr_cache[attrs_str] = decoded
        style_idx, cell_type = decoded

        formula: str | None = None
        v_text = ""
        if inner:
            f_match = _FAST_F_RE.search(inner)
            if f_match is not None:
                f_attrs = f_match.group(1) or ""
                f_text = _unescape(f_match.group(2) or "")
                if 't="shared"' in f_attrs:
                    si_match = re.search(r'si="([^"]*)"', f_attrs)
                    if si_match is not None:
                        si = si_match.group(1)
                        if f_text:
                            shared_formulas[si] = (f_text, row1, col0)
                        else:
                            master = shared_formulas.get(si)
                            if master is not None:
                                from ..functions.formulas import translate_formula

                                f_text = translate_formula(
                                    master[0], row1 - master[1], col0 - master[2]
                                )
                formula = f_text
            v_match = _FAST_V_RE.search(inner)
            if v_match is not None:
                v_text = _unescape(v_match.group(1))

        if cell_type == "n":
            if v_text == "":
                value = ""
            elif style_idx is not None and style_idx in date_styles:
                try:
                    value = _render_date(float(v_text), date1904)
                except ValueError:
                    value = v_text
            else:
                value = _render_number(v_text)
        elif cell_type == "s":
            try:
                value = shared_strings[int(v_text)]
            except (ValueError, IndexError):
                value = ""
        elif cell_type == "inlineStr":
            # Rich/phonetic structure possible → parse this cell via ET.
            try:
                frag = ET.fromstring(
                    f'<c xmlns="{_MAIN_NS[1:-1]}">{inner}</c>'
                )
            except ET.ParseError:
                return None
            is_el = frag.find(f"{_MAIN_NS}is")
            value = _rich_text(is_el) if is_el is not None else ""
        elif cell_type == "str":
            value = v_text
        elif cell_type == "b":
            value = "True" if v_text.strip() == "1" else "False"
        elif cell_type == "e":
            value = v_text
        else:
            return None  # unknown cell type → ET path

        if value == "" and style_idx is None and formula is None:
            continue
        cells[(row1, col0)] = Cell(value=value, style=style_idx, formula=formula)
        c1 = col0 + 1
        if min_r is None or row1 < min_r:
            min_r = row1
        if min_c is None or c1 < min_c:
            min_c = c1
        if row1 > max_r:
            max_r = row1
        if c1 > max_c:
            max_c = c1

    if min_r is not None and min_c is not None:
        grid.min_row, grid.min_col = min_r, min_c
        grid.max_row, grid.max_col = max_r, max_c
    return grid


def _parse_sheet_et(
    package: VirtualPackage,
    sheet_path: str,
    sheet_name: str,
    shared_strings: list[str],
    styles: Stylesheet,
    date1904: bool = False,
) -> SheetGrid:
    # Parse uncached: a sheet part is consumed exactly once, and caching the
    # full element tree in the package would pin every sheet's tree in
    # worker memory for the document's lifetime.
    root = ET.fromstring(package.read_text(sheet_path))
    return _parse_sheet_et_from_root(
        package, sheet_path, sheet_name, root, shared_strings, styles,
        date1904=date1904,
    )


def _parse_sheet_et_from_root(
    package: VirtualPackage,
    sheet_path: str,
    sheet_name: str,
    root: ET.Element,
    shared_strings: list[str],
    styles: Stylesheet,
    date1904: bool = False,
) -> SheetGrid:
    """Full ElementTree worksheet parse (single pass)."""
    grid = SheetGrid(name=sheet_name)
    metrics = grid.metrics
    shared_formulas: dict[str, tuple[str, int, int]] = {}

    fmt = root.find(f"{_MAIN_NS}sheetFormatPr")
    if fmt is not None:
        drh = _float_attr(fmt, "defaultRowHeight")
        if drh is not None and drh > 0:
            metrics.default_row_height_points = drh
        dcw = _float_attr(fmt, "defaultColWidth")
        if dcw is not None and dcw > 0:
            metrics.default_column_width_points = column_width_to_points(dcw)

    cols_node = root.find(f"{_MAIN_NS}cols")
    if cols_node is not None:
        for col in cols_node.findall(f"{_MAIN_NS}col"):
            mn = _int_attr(col, "min")
            mx = _int_attr(col, "max")
            width = _float_attr(col, "width")
            if mn is None or mx is None or width is None or mn <= 0 or mx < mn or width <= 0:
                continue
            wpts = column_width_to_points(width)
            for idx in range(mn - 1, mx):
                metrics.column_width_points[idx] = wpts

    sheet_data = root.find(f"{_MAIN_NS}sheetData")
    min_r = min_c = None
    max_r = max_c = 0
    if sheet_data is not None:
        cell_tag = f"{_MAIN_NS}c"
        row_tag = f"{_MAIN_NS}row"
        f_tag = f"{_MAIN_NS}f"
        v_tag = f"{_MAIN_NS}v"
        match_ref = _CELL_REF_RE.match
        cells = grid.cells
        date_styles = styles.date_style_ids()
        # OOXML allows implicit positions: a row without r continues after
        # the previous row; a cell without r sits right of the previous cell
        # (openpyxl — the reference's reader — reconstructs both).
        implicit_row = 0
        for row_el in sheet_data:
            if row_el.tag != row_tag:
                continue
            attrs = row_el.attrib
            row_r = _int_attr(row_el, "r")
            implicit_row = row_r if row_r is not None else implicit_row + 1
            if "ht" in attrs:
                ht = _float_attr(row_el, "ht")
                if implicit_row > 0 and ht is not None and ht > 0:
                    metrics.row_height_points[implicit_row - 1] = ht
            implicit_col = -1
            for c_el in row_el:
                if c_el.tag != cell_tag:
                    continue
                c_attrs = c_el.attrib
                ref = c_attrs.get("r")
                if ref:
                    m = match_ref(ref)
                    if not m:
                        continue
                    col0 = _col_letters_to_index(m.group(1))
                    row1 = int(m.group(2))
                else:
                    col0 = implicit_col + 1
                    row1 = implicit_row
                implicit_col = col0
                s_raw = c_attrs.get("s")
                style_idx = None
                if s_raw is not None:
                    try:
                        style_idx = int(s_raw)
                    except ValueError:
                        style_idx = None
                cell_type = c_attrs.get("t", "n")

                formula: str | None = None
                v_text = ""
                for child in c_el:
                    tag = child.tag
                    if tag == v_tag:
                        if child.text is not None:
                            v_text = child.text
                    elif tag == f_tag:
                        f_text = child.text or ""
                        si = child.attrib.get("si")
                        if child.attrib.get("t") == "shared" and si is not None:
                            if f_text:
                                shared_formulas[si] = (f_text, row1, col0)
                            else:
                                master = shared_formulas.get(si)
                                if master is not None:
                                    from ..functions.formulas import translate_formula

                                    f_text = translate_formula(
                                        master[0],
                                        row1 - master[1],
                                        col0 - master[2],
                                    )
                        formula = f_text

                # Inline fast path for the two dominant cases.
                if cell_type == "n":
                    if v_text == "":
                        value = ""
                    elif style_idx is not None and style_idx in date_styles:
                        try:
                            value = _render_date(float(v_text), date1904)
                        except ValueError:
                            value = v_text
                    else:
                        value = _render_number(v_text)
                elif cell_type == "s":
                    try:
                        value = shared_strings[int(v_text)]
                    except (ValueError, IndexError):
                        value = ""
                else:
                    value = _render_value(
                        cell_type, v_text, c_el, style_idx, shared_strings, styles,
                        date1904,
                    )

                if value == "" and style_idx is None and formula is None:
                    continue
                cells[(row1, col0)] = Cell(
                    value=value, style=style_idx, formula=formula
                )
                c1 = col0 + 1
                if min_r is None or row1 < min_r:
                    min_r = row1
                if min_c is None or c1 < min_c:
                    min_c = c1
                if row1 > max_r:
                    max_r = row1
                if c1 > max_c:
                    max_c = c1

    if min_r is not None and min_c is not None:
        grid.min_row, grid.min_col = min_r, min_c
        grid.max_row, grid.max_col = max_r, max_c

    merged_node = root.find(f"{_MAIN_NS}mergeCells")
    if merged_node is not None:
        for mc in merged_node.findall(f"{_MAIN_NS}mergeCell"):
            ref = mc.attrib.get("ref")
            if ref:
                grid.merged_refs.append(ref)

    links_node = root.find(f"{_MAIN_NS}hyperlinks")
    if links_node is not None:
        rel_map = package.relationships(sheet_path)
        for link in links_node.findall(f"{_MAIN_NS}hyperlink"):
            ref = link.attrib.get("ref")
            rel_id = link.attrib.get(f"{_R_NS}id")
            if not ref or not rel_id:
                continue  # location-only (internal) links have no target
            rel = rel_map.get(rel_id)
            if rel is None or rel.relationship_type != HYPERLINK_REL_TYPE:
                continue
            m = _CELL_REF_RE.match(ref.split(":", 1)[0])
            if not m:
                continue
            grid.hyperlinks[
                (int(m.group(2)), _col_letters_to_index(m.group(1)))
            ] = rel.target

    table_parts = root.find(f"{_MAIN_NS}tableParts")
    if table_parts is not None:
        r_id_attr = f"{_R_NS}id"
        for part in table_parts.findall(f"{_MAIN_NS}tablePart"):
            rid = part.attrib.get(r_id_attr)
            if rid:
                grid.table_part_rids.append(rid)
    return grid


def _render_value(
    cell_type: str,
    v_text: str,
    c_el: ET.Element,
    style_idx: int | None,
    shared_strings: list[str],
    styles: Stylesheet,
    date1904: bool = False,
) -> str:
    if cell_type == "s":
        try:
            return shared_strings[int(v_text)]
        except (ValueError, IndexError):
            return ""
    if cell_type == "inlineStr":
        is_el = c_el.find(f"{_MAIN_NS}is")
        if is_el is None:
            return ""
        return _rich_text(is_el)
    if cell_type == "str":
        return v_text
    if cell_type == "b":
        return "True" if v_text.strip() == "1" else "False"
    if cell_type == "e":
        return v_text
    # numeric (default)
    if v_text == "":
        return ""
    if styles.style(style_idx).is_date:
        try:
            return _render_date(float(v_text), date1904)
        except ValueError:
            return v_text
    return _render_number(v_text)


def _rich_text(container: ET.Element) -> str:
    """Text of an <si>/<is> element: plain <t> or rich <r><t> runs only.

    Phonetic ruby runs (<rPh>) and <phoneticPr> are metadata, not cell text —
    openpyxl (and therefore the reference's pandas reader) excludes them.
    """
    t_tag = f"{_MAIN_NS}t"
    r_tag = f"{_MAIN_NS}r"
    parts: list[str] = []
    for child in container:
        if child.tag == t_tag:
            parts.append(child.text or "")
        elif child.tag == r_tag:
            run_t = child.find(t_tag)
            if run_t is not None and run_t.text:
                parts.append(run_t.text)
    return "".join(parts)


def parse_shared_strings(package: VirtualPackage) -> list[str]:
    """Parse xl/sharedStrings.xml into an indexed string table."""
    path = "xl/sharedStrings.xml"
    if path not in package:
        return []
    root = package.read_xml(path)
    return [_rich_text(si) for si in root.findall(f"{_MAIN_NS}si")]


def _int_attr(node: ET.Element, attr: str) -> int | None:
    raw = node.attrib.get(attr)
    if raw is None:
        return None
    try:
        return int(raw)
    except ValueError:
        return None


def _float_attr(node: ET.Element, attr: str) -> float | None:
    raw = node.attrib.get(attr)
    if raw is None:
        return None
    try:
        return float(raw)
    except ValueError:
        return None
