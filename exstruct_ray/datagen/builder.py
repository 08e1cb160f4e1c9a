"""Deterministic OOXML workbook-part builder.

Produces the interleaved-span representation of a workbook — the engine's
input format per BASELINE.json's input_hint — without any Excel library.
Mirrors the reference test strategy of building synthetic workbooks in-test
(/root/reference/tests/core/test_cells_and_tables.py:20-62) and hand-crafted
OOXML zip parts (/root/reference/tests/core/test_ooxml_drawing.py:34-100).

All XML is emitted with sorted, explicit ordering so the same inputs always
produce byte-identical parts (seeded determinism, no external data).
"""

from __future__ import annotations

from dataclasses import dataclass, field
import datetime as _dt
from xml.sax.saxutils import escape, quoteattr

_EXCEL_EPOCH = _dt.datetime(1899, 12, 30)

_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_XDR = "http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_C = "http://schemas.openxmlformats.org/drawingml/2006/chart"

WORKSHEET_TYPE = f"{_R}/worksheet"
DRAWING_TYPE = f"{_R}/drawing"
CHART_TYPE = f"{_R}/chart"
HYPERLINK_TYPE = f"{_R}/hyperlink"
TABLE_TYPE = f"{_R}/table"

EMU_PER_POINT = 12700


def col_letter(col0: int) -> str:
    out = []
    n = col0
    while True:
        n, rem = divmod(n, 26)
        out.append(chr(65 + rem))
        if n == 0:
            break
        n -= 1
    return "".join(reversed(out))


def cell_ref(row1: int, col0: int) -> str:
    return f"{col_letter(col0)}{row1}"


@dataclass(frozen=True)
class StyleSpec:
    """A cell style: border edges, fill color, date format."""

    border: tuple[bool, bool, bool, bool] = (False, False, False, False)  # t,b,l,r
    fill_rgb: str | None = None  # e.g. "FFFF0000"
    fill_theme: int | None = None
    fill_tint: float | None = None
    date_fmt: bool = False  # numFmtId 22 (yyyy-mm-dd hh:mm)

    @property
    def is_default(self) -> bool:
        return (
            self.border == (False, False, False, False)
            and self.fill_rgb is None
            and self.fill_theme is None
            and not self.date_fmt
        )


BOX = StyleSpec(border=(True, True, True, True))


@dataclass
class _Cell:
    value: object
    style: StyleSpec | None = None
    formula: str | None = None


@dataclass
class _Shape:
    text: str
    prst: str
    x_emu: int
    y_emu: int
    cx_emu: int
    cy_emu: int
    rot: float | None = None
    flip_h: bool = False
    flip_v: bool = False
    text_box: bool = False
    # anchor: "absolute" (pos+ext), "oneCell" (from marker + ext) or
    # "twoCell" (from + to markers); markers are (col, colOff, row, rowOff).
    anchor: str = "absolute"
    from_marker: tuple[int, int, int, int] | None = None
    to_marker: tuple[int, int, int, int] | None = None
    with_xfrm: bool = True


@dataclass
class _Connector:
    x_emu: int
    y_emu: int
    cx_emu: int
    cy_emu: int
    start_id: int | None = None
    end_id: int | None = None
    head: bool = False
    tail: bool = True
    flip_h: bool = False
    flip_v: bool = False
    rot: float | None = None


@dataclass
class _ChartSeries:
    name: str | None = None
    name_range: str | None = None
    cat_range: str | None = None
    val_range: str | None = None
    scatter: bool = False


@dataclass
class _Chart:
    name: str
    chart_tag: str  # barChart / lineChart / scatterChart / pieChart ...
    bar_dir: str | None = None
    title: str | None = None
    y_axis_title: str | None = None
    y_min: float | None = None
    y_max: float | None = None
    series: list[_ChartSeries] = field(default_factory=list)
    x_emu: int = 0
    y_emu: int = 0
    cx_emu: int = 3000000
    cy_emu: int = 2000000


class SheetBuilder:
    def __init__(self, name: str, index: int):
        self.name = name
        self.index = index
        self.cells: dict[tuple[int, int], _Cell] = {}
        self.merged: list[str] = []
        self.hyperlinks: list[tuple[int, int, str]] = []
        self.shapes: list[_Shape] = []
        self.connectors: list[_Connector] = []
        self.charts: list[_Chart] = []
        self.declared_tables: list[str] = []
        self.col_widths: dict[int, float] = {}  # 0-based -> width attr
        self.row_heights: dict[int, float] = {}  # 1-based -> points
        self.default_row_height: float | None = None
        self.default_col_width: float | None = None

    def set(
        self,
        row1: int,
        col0: int,
        value: object,
        style: StyleSpec | None = None,
        formula: str | None = None,
    ) -> "SheetBuilder":
        self.cells[(row1, col0)] = _Cell(value=value, style=style, formula=formula)
        return self

    def fill_block(
        self,
        top: int,
        left: int,
        values: list[list[object]],
        style: StyleSpec | None = None,
    ) -> "SheetBuilder":
        for i, row in enumerate(values):
            for j, v in enumerate(row):
                if v is None:
                    continue
                self.set(top + i, left + j, v, style=style)
        return self

    def merge(self, ref: str) -> "SheetBuilder":
        self.merged.append(ref)
        return self

    def link(self, row1: int, col0: int, target: str) -> "SheetBuilder":
        self.hyperlinks.append((row1, col0, target))
        return self

    def add_shape(
        self,
        text: str,
        prst: str = "flowChartProcess",
        x_pt: float = 100,
        y_pt: float = 100,
        w_pt: float = 80,
        h_pt: float = 40,
        rot: float | None = None,
        flip_h: bool = False,
        flip_v: bool = False,
        text_box: bool = False,
    ) -> int:
        """Add a shape; returns its drawing id (1-based within the sheet)."""
        self.shapes.append(
            _Shape(
                text=text,
                prst=prst,
                x_emu=int(x_pt * EMU_PER_POINT),
                y_emu=int(y_pt * EMU_PER_POINT),
                cx_emu=int(w_pt * EMU_PER_POINT),
                cy_emu=int(h_pt * EMU_PER_POINT),
                rot=rot,
                flip_h=flip_h,
                flip_v=flip_v,
                text_box=text_box,
            )
        )
        return len(self.shapes) + len(self.connectors)

    def add_cell_anchored_shape(
        self,
        text: str,
        prst: str = "rect",
        anchor: str = "oneCell",
        from_marker: tuple[int, int, int, int] = (0, 0, 0, 0),
        to_marker: tuple[int, int, int, int] | None = None,
        w_pt: float = 80,
        h_pt: float = 40,
        with_xfrm: bool = False,
    ) -> int:
        """Add a one/two-cell-anchored shape; markers are (col, colOffEmu,
        row, rowOffEmu). With ``with_xfrm=False`` geometry comes purely from
        the anchor + sheet metrics (exercises the marker→points path)."""
        self.shapes.append(
            _Shape(
                text=text,
                prst=prst,
                x_emu=0,
                y_emu=0,
                cx_emu=int(w_pt * EMU_PER_POINT),
                cy_emu=int(h_pt * EMU_PER_POINT),
                anchor=anchor,
                from_marker=from_marker,
                to_marker=to_marker,
                with_xfrm=with_xfrm,
            )
        )
        return len(self.shapes) + len(self.connectors)

    def add_connector(
        self,
        x_pt: float,
        y_pt: float,
        w_pt: float,
        h_pt: float,
        start_id: int | None = None,
        end_id: int | None = None,
        head: bool = False,
        tail: bool = True,
        flip_h: bool = False,
        flip_v: bool = False,
        rot: float | None = None,
    ) -> int:
        self.connectors.append(
            _Connector(
                x_emu=int(x_pt * EMU_PER_POINT),
                y_emu=int(y_pt * EMU_PER_POINT),
                cx_emu=int(w_pt * EMU_PER_POINT),
                cy_emu=int(h_pt * EMU_PER_POINT),
                start_id=start_id,
                end_id=end_id,
                head=head,
                tail=tail,
                flip_h=flip_h,
                flip_v=flip_v,
                rot=rot,
            )
        )
        return len(self.shapes) + len(self.connectors)

    def add_chart(
        self,
        name: str,
        chart_tag: str = "lineChart",
        bar_dir: str | None = None,
        title: str | None = None,
        y_axis_title: str | None = None,
        y_min: float | None = None,
        y_max: float | None = None,
        series: list[dict] | None = None,
        x_pt: float = 300,
        y_pt: float = 20,
        w_pt: float = 240,
        h_pt: float = 160,
    ) -> "SheetBuilder":
        self.charts.append(
            _Chart(
                name=name,
                chart_tag=chart_tag,
                bar_dir=bar_dir,
                title=title,
                y_axis_title=y_axis_title,
                y_min=y_min,
                y_max=y_max,
                series=[_ChartSeries(**s) for s in (series or [])],
                x_emu=int(x_pt * EMU_PER_POINT),
                y_emu=int(y_pt * EMU_PER_POINT),
                cx_emu=int(w_pt * EMU_PER_POINT),
                cy_emu=int(h_pt * EMU_PER_POINT),
            )
        )
        return self

    def declare_table(self, ref: str) -> "SheetBuilder":
        self.declared_tables.append(ref)
        return self


class WorkbookBuilder:
    """Assembles sheets into OOXML part spans."""

    def __init__(self) -> None:
        self.sheets: list[SheetBuilder] = []
        self.print_areas: list[tuple[str, str]] = []  # (sheet name, range list str)
        self._styles: list[StyleSpec] = []
        self._style_index: dict[StyleSpec, int] = {}
        self.use_shared_strings: bool = False
        self._shared: list[str] = []
        self._shared_index: dict[str, int] = {}

    def sheet(self, name: str) -> SheetBuilder:
        sb = SheetBuilder(name, len(self.sheets) + 1)
        self.sheets.append(sb)
        return sb

    def print_area(self, sheet_name: str, ranges: str) -> "WorkbookBuilder":
        self.print_areas.append((sheet_name, ranges))
        return self

    # ---- XML emission -----------------------------------------------------

    def _style_id(self, spec: StyleSpec | None) -> int | None:
        if spec is None:
            return None
        idx = self._style_index.get(spec)
        if idx is None:
            self._styles.append(spec)
            idx = len(self._styles)  # cellXfs[0] is the default xf
            self._style_index[spec] = idx
        return idx

    def _shared_id(self, text: str) -> int:
        idx = self._shared_index.get(text)
        if idx is None:
            idx = len(self._shared)
            self._shared.append(text)
            self._shared_index[text] = idx
        return idx

    def build_parts(self) -> list[dict]:
        """Return spans [{kind, text, media_ref, offset}] for this workbook."""
        parts: list[tuple[str, str, str]] = []  # (kind, path, xml)

        # Per-sheet parts (built first so the style/shared tables fill up).
        sheet_parts: list[tuple[str, str, str]] = []
        for sb in self.sheets:
            i = sb.index
            sheet_path = f"xl/worksheets/sheet{i}.xml"
            sheet_rels: list[tuple[str, str, str, bool]] = []  # id, type, target, ext
            drawing_xml = None
            chart_parts: list[tuple[str, str]] = []
            table_parts: list[tuple[str, str]] = []

            rid = 0
            link_rids: dict[tuple[int, int], str] = {}
            for row1, col0, target in sb.hyperlinks:
                rid += 1
                link_rids[(row1, col0)] = f"rId{rid}"
                sheet_rels.append((f"rId{rid}", HYPERLINK_TYPE, target, True))
            drawing_rid = None
            if sb.shapes or sb.connectors or sb.charts:
                rid += 1
                drawing_rid = f"rId{rid}"
                drawing_path = f"xl/drawings/drawing{i}.xml"
                sheet_rels.append(
                    (drawing_rid, DRAWING_TYPE, f"../drawings/drawing{i}.xml", False)
                )
                drawing_xml, chart_parts = self._drawing_xml(sb, i)
            table_rids: list[str] = []
            for t_idx, ref in enumerate(sb.declared_tables, start=1):
                rid += 1
                table_rids.append(f"rId{rid}")
                tpath = f"xl/tables/table{i}_{t_idx}.xml"
                sheet_rels.append(
                    (f"rId{rid}", TABLE_TYPE, f"../tables/table{i}_{t_idx}.xml", False)
                )
                table_parts.append(
                    (
                        tpath,
                        f'<table xmlns="{_MAIN}" id="{t_idx}" name="T{i}_{t_idx}" '
                        f'displayName="T{i}_{t_idx}" ref={quoteattr(ref)}/>',
                    )
                )

            sheet_parts.append(
                ("sheet_xml", sheet_path, self._sheet_xml(sb, link_rids, table_rids, drawing_rid))
            )
            if sheet_rels:
                sheet_parts.append(
                    (
                        "rels",
                        f"xl/worksheets/_rels/sheet{i}.xml.rels",
                        self._rels_xml(sheet_rels),
                    )
                )
            if drawing_xml is not None:
                sheet_parts.append(
                    ("drawing_xml", f"xl/drawings/drawing{i}.xml", drawing_xml)
                )
                chart_rels = []
                for c_idx, (cpath, cxml) in enumerate(chart_parts, start=1):
                    chart_rels.append(
                        (f"rId{c_idx}", CHART_TYPE, f"../charts/{cpath.rsplit('/', 1)[-1]}", False)
                    )
                    sheet_parts.append(("chart_xml", cpath, cxml))
                if chart_rels:
                    sheet_parts.append(
                        (
                            "rels",
                            f"xl/drawings/_rels/drawing{i}.xml.rels",
                            self._rels_xml(chart_rels),
                        )
                    )
            for tpath, txml in table_parts:
                sheet_parts.append(("sheet_xml", tpath, txml))

        # Workbook-level parts.
        parts.append(("workbook_xml", "xl/workbook.xml", self._workbook_xml()))
        parts.append(
            (
                "rels",
                "xl/_rels/workbook.xml.rels",
                self._rels_xml(
                    [
                        (
                            f"rId{sb.index}",
                            WORKSHEET_TYPE,
                            f"worksheets/sheet{sb.index}.xml",
                            False,
                        )
                        for sb in self.sheets
                    ]
                ),
            )
        )
        parts.append(("styles_xml", "xl/styles.xml", self._styles_xml()))
        if self._shared:
            parts.append(
                ("shared_strings", "xl/sharedStrings.xml", self._shared_strings_xml())
            )
        parts.extend(sheet_parts)

        return [
            {"kind": kind, "text": xml, "media_ref": path, "offset": off}
            for off, (kind, path, xml) in enumerate(parts)
        ]

    def _workbook_xml(self) -> str:
        sheets = "".join(
            f'<sheet name={quoteattr(sb.name)} sheetId="{sb.index}" r:id="rId{sb.index}"/>'
            for sb in self.sheets
        )
        defined = ""
        if self.print_areas:
            names_by_sheet = {sb.name: idx for idx, sb in enumerate(self.sheets)}
            entries = []
            for sheet_name, ranges in self.print_areas:
                local_id = names_by_sheet.get(sheet_name, 0)
                qualified = ",".join(
                    f"{sheet_name}!{part.strip()}" if "!" not in part else part.strip()
                    for part in ranges.split(",")
                )
                entries.append(
                    f'<definedName name="_xlnm.Print_Area" localSheetId="{local_id}">'
                    f"{escape(qualified)}</definedName>"
                )
            defined = f"<definedNames>{''.join(entries)}</definedNames>"
        return (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_MAIN}" xmlns:r="{_R}">'
            f"<sheets>{sheets}</sheets>{defined}</workbook>"
        )

    def _rels_xml(self, rels: list[tuple[str, str, str, bool]] | list[tuple[str, str, str]]) -> str:
        entries = []
        for rel in rels:
            rel_id, rel_type, target = rel[0], rel[1], rel[2]
            external = len(rel) > 3 and bool(rel[3])
            mode = ' TargetMode="External"' if external else ""
            entries.append(
                f"<Relationship Id={quoteattr(rel_id)} Type={quoteattr(rel_type)} "
                f"Target={quoteattr(target)}{mode}/>"
            )
        return (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_REL}">{"".join(entries)}</Relationships>'
        )

    def _styles_xml(self) -> str:
        fills = ['<fill><patternFill patternType="none"/></fill>']
        borders = ["<border/>"]
        xfs = ['<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>']
        fill_ids: dict[tuple, int] = {}
        border_ids: dict[tuple, int] = {}
        for spec in self._styles:
            fill_id = 0
            fkey = (spec.fill_rgb, spec.fill_theme, spec.fill_tint)
            if spec.fill_rgb is not None or spec.fill_theme is not None:
                fill_id = fill_ids.get(fkey, 0)
                if fill_id == 0:
                    if spec.fill_rgb is not None:
                        color = f'<fgColor rgb="{spec.fill_rgb}"/>'
                    else:
                        tint = (
                            f' tint="{spec.fill_tint}"' if spec.fill_tint is not None else ""
                        )
                        color = f'<fgColor theme="{spec.fill_theme}"{tint}/>'
                    fills.append(
                        f'<fill><patternFill patternType="solid">{color}'
                        f'<bgColor indexed="64"/></patternFill></fill>'
                    )
                    fill_id = len(fills) - 1
                    fill_ids[fkey] = fill_id
            border_id = 0
            if any(spec.border):
                border_id = border_ids.get(spec.border, 0)
                if border_id == 0:
                    t, b, lft, r = spec.border
                    edges = (
                        (f'<left style="thin"/>' if lft else "<left/>")
                        + (f'<right style="thin"/>' if r else "<right/>")
                        + (f'<top style="thin"/>' if t else "<top/>")
                        + (f'<bottom style="thin"/>' if b else "<bottom/>")
                    )
                    borders.append(f"<border>{edges}</border>")
                    border_id = len(borders) - 1
                    border_ids[spec.border] = border_id
            num_fmt = 22 if spec.date_fmt else 0
            xfs.append(
                f'<xf numFmtId="{num_fmt}" fontId="0" fillId="{fill_id}" '
                f'borderId="{border_id}" applyFill="1" applyBorder="1" '
                f'applyNumberFormat="1"/>'
            )
        return (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<styleSheet xmlns="{_MAIN}">'
            f'<fills count="{len(fills)}">{"".join(fills)}</fills>'
            f'<borders count="{len(borders)}">{"".join(borders)}</borders>'
            f'<cellXfs count="{len(xfs)}">{"".join(xfs)}</cellXfs>'
            f"</styleSheet>"
        )

    def _shared_strings_xml(self) -> str:
        items = "".join(
            f'<si><t xml:space="preserve">{escape(s)}</t></si>' for s in self._shared
        )
        return (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<sst xmlns="{_MAIN}" count="{len(self._shared)}" '
            f'uniqueCount="{len(self._shared)}">{items}</sst>'
        )

    def _cell_xml(self, row1: int, col0: int, cell: _Cell) -> str:
        ref = cell_ref(row1, col0)
        style_id = self._style_id(cell.style)
        s_attr = f' s="{style_id}"' if style_id is not None else ""
        f_xml = f"<f>{escape(cell.formula)}</f>" if cell.formula is not None else ""
        v = cell.value
        if v is None:
            return f'<c r="{ref}"{s_attr}>{f_xml}</c>'
        if isinstance(v, bool):
            return f'<c r="{ref}"{s_attr} t="b">{f_xml}<v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"{s_attr}>{f_xml}<v>{v!r}</v></c>'
        if isinstance(v, (_dt.datetime, _dt.date)):
            if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                v = _dt.datetime(v.year, v.month, v.day)
            serial = (v - _EXCEL_EPOCH).total_seconds() / 86400.0
            spec = cell.style or StyleSpec()
            if not spec.date_fmt:
                spec = StyleSpec(
                    border=spec.border,
                    fill_rgb=spec.fill_rgb,
                    fill_theme=spec.fill_theme,
                    fill_tint=spec.fill_tint,
                    date_fmt=True,
                )
            style_id = self._style_id(spec)
            return f'<c r="{ref}" s="{style_id}">{f_xml}<v>{serial!r}</v></c>'
        text = str(v)
        if self.use_shared_strings:
            sid = self._shared_id(text)
            return f'<c r="{ref}"{s_attr} t="s">{f_xml}<v>{sid}</v></c>'
        return (
            f'<c r="{ref}"{s_attr} t="inlineStr">{f_xml}'
            f'<is><t xml:space="preserve">{escape(text)}</t></is></c>'
        )

    def _sheet_xml(
        self,
        sb: SheetBuilder,
        link_rids: dict[tuple[int, int], str],
        table_rids: list[str],
        drawing_rid: str | None,
    ) -> str:
        fmt = ""
        fmt_attrs = []
        if sb.default_row_height is not None:
            fmt_attrs.append(f'defaultRowHeight="{sb.default_row_height}"')
        if sb.default_col_width is not None:
            fmt_attrs.append(f'defaultColWidth="{sb.default_col_width}"')
        if fmt_attrs:
            fmt = f"<sheetFormatPr {' '.join(fmt_attrs)}/>"
        cols = ""
        if sb.col_widths:
            col_entries = "".join(
                f'<col min="{c0 + 1}" max="{c0 + 1}" width="{w}" customWidth="1"/>'
                for c0, w in sorted(sb.col_widths.items())
            )
            cols = f"<cols>{col_entries}</cols>"
        rows_xml = []
        by_row: dict[int, list[tuple[int, _Cell]]] = {}
        for (row1, col0), cell in sb.cells.items():
            by_row.setdefault(row1, []).append((col0, cell))
        for row1 in sorted(by_row):
            ht = sb.row_heights.get(row1)
            ht_attr = f' ht="{ht}" customHeight="1"' if ht is not None else ""
            cells_xml = "".join(
                self._cell_xml(row1, col0, cell)
                for col0, cell in sorted(by_row[row1])
            )
            rows_xml.append(f'<row r="{row1}"{ht_attr}>{cells_xml}</row>')
        merged = ""
        if sb.merged:
            entries = "".join(f"<mergeCell ref={quoteattr(m)}/>" for m in sb.merged)
            merged = f'<mergeCells count="{len(sb.merged)}">{entries}</mergeCells>'
        links = ""
        if link_rids:
            entries = "".join(
                f'<hyperlink ref="{cell_ref(row1, col0)}" r:id="{rid}"/>'
                for (row1, col0), rid in sorted(link_rids.items())
            )
            links = f"<hyperlinks>{entries}</hyperlinks>"
        drawing = f'<drawing r:id="{drawing_rid}"/>' if drawing_rid else ""
        tables = ""
        if table_rids:
            entries = "".join(f'<tablePart r:id="{rid}"/>' for rid in table_rids)
            tables = f'<tableParts count="{len(table_rids)}">{entries}</tableParts>'
        return (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_MAIN}" xmlns:r="{_R}">'
            f"{fmt}{cols}<sheetData>{''.join(rows_xml)}</sheetData>"
            f"{merged}{links}{drawing}{tables}</worksheet>"
        )

    def _drawing_xml(self, sb: SheetBuilder, sheet_index: int) -> tuple[str, list[tuple[str, str]]]:
        anchors: list[str] = []
        drawing_id = 0
        for shp in sb.shapes:
            drawing_id += 1
            rot_attr = f' rot="{int(shp.rot * 60000)}"' if shp.rot is not None else ""
            flips = (' flipH="1"' if shp.flip_h else "") + (
                ' flipV="1"' if shp.flip_v else ""
            )
            tx_box = ' txBox="1"' if shp.text_box else ""
            xfrm = ""
            if shp.with_xfrm:
                xfrm = (
                    f"<a:xfrm{rot_attr}{flips}>"
                    f'<a:off x="{shp.x_emu}" y="{shp.y_emu}"/>'
                    f'<a:ext cx="{shp.cx_emu}" cy="{shp.cy_emu}"/></a:xfrm>'
                )
            body = (
                f'<xdr:sp><xdr:nvSpPr><xdr:cNvPr id="{drawing_id}" '
                f'name="Shape {drawing_id}"/><xdr:cNvSpPr{tx_box}/></xdr:nvSpPr>'
                f"<xdr:spPr>{xfrm}"
                f'<a:prstGeom prst="{shp.prst}"/></xdr:spPr>'
                f"<xdr:txBody><a:bodyPr/><a:p><a:r><a:t>{escape(shp.text)}</a:t>"
                f"</a:r></a:p></xdr:txBody></xdr:sp>"
            )
            if shp.anchor == "oneCell" and shp.from_marker is not None:
                anchors.append(
                    self._one_cell_anchor(shp.from_marker, shp.cx_emu, shp.cy_emu, body)
                )
            elif shp.anchor == "twoCell" and shp.from_marker is not None:
                anchors.append(
                    self._two_cell_anchor(
                        shp.from_marker, shp.to_marker or shp.from_marker, body
                    )
                )
            else:
                anchors.append(
                    self._absolute_anchor(
                        shp.x_emu, shp.y_emu, shp.cx_emu, shp.cy_emu, body
                    )
                )
        for conn in sb.connectors:
            drawing_id += 1
            rot_attr = f' rot="{int(conn.rot * 60000)}"' if conn.rot is not None else ""
            flips = (' flipH="1"' if conn.flip_h else "") + (
                ' flipV="1"' if conn.flip_v else ""
            )
            st = (
                f'<a:stCxn id="{conn.start_id}" idx="0"/>'
                if conn.start_id is not None
                else ""
            )
            en = (
                f'<a:endCxn id="{conn.end_id}" idx="0"/>'
                if conn.end_id is not None
                else ""
            )
            head = '<a:headEnd type="triangle"/>' if conn.head else ""
            tail = '<a:tailEnd type="triangle"/>' if conn.tail else ""
            body = (
                f'<xdr:cxnSp><xdr:nvCxnSpPr><xdr:cNvPr id="{drawing_id}" '
                f'name="Connector {drawing_id}"/><xdr:cNvCxnSpPr>{st}{en}'
                f"</xdr:cNvCxnSpPr></xdr:nvCxnSpPr>"
                f"<xdr:spPr><a:xfrm{rot_attr}{flips}>"
                f'<a:off x="{conn.x_emu}" y="{conn.y_emu}"/>'
                f'<a:ext cx="{conn.cx_emu}" cy="{conn.cy_emu}"/></a:xfrm>'
                f'<a:prstGeom prst="straightConnector1"/>'
                f"<a:ln>{head}{tail}</a:ln></xdr:spPr></xdr:cxnSp>"
            )
            anchors.append(
                self._absolute_anchor(conn.x_emu, conn.y_emu, conn.cx_emu, conn.cy_emu, body)
            )
        chart_parts: list[tuple[str, str]] = []
        for c_idx, chart in enumerate(sb.charts, start=1):
            drawing_id += 1
            body = (
                f"<xdr:graphicFrame><xdr:nvGraphicFramePr>"
                f'<xdr:cNvPr id="{drawing_id}" name={quoteattr(chart.name)}/>'
                f"<xdr:cNvGraphicFramePr/></xdr:nvGraphicFramePr>"
                f'<xdr:xfrm><a:off x="{chart.x_emu}" y="{chart.y_emu}"/>'
                f'<a:ext cx="{chart.cx_emu}" cy="{chart.cy_emu}"/></xdr:xfrm>'
                f'<a:graphic><a:graphicData uri="{_C}">'
                f'<c:chart xmlns:c="{_C}" r:id="rId{c_idx}"/>'
                f"</a:graphicData></a:graphic></xdr:graphicFrame>"
            )
            anchors.append(
                self._absolute_anchor(chart.x_emu, chart.y_emu, chart.cx_emu, chart.cy_emu, body)
            )
            chart_parts.append(
                (
                    f"xl/charts/chart{sheet_index}_{c_idx}.xml",
                    self._chart_xml(chart),
                )
            )
        xml = (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<xdr:wsDr xmlns:xdr="{_XDR}" xmlns:a="{_A}" xmlns:r="{_R}">'
            f"{''.join(anchors)}</xdr:wsDr>"
        )
        return xml, chart_parts

    @staticmethod
    def _marker_xml(tag: str, marker: tuple[int, int, int, int]) -> str:
        col, col_off, row, row_off = marker
        return (
            f"<xdr:{tag}><xdr:col>{col}</xdr:col><xdr:colOff>{col_off}</xdr:colOff>"
            f"<xdr:row>{row}</xdr:row><xdr:rowOff>{row_off}</xdr:rowOff></xdr:{tag}>"
        )

    @classmethod
    def _one_cell_anchor(
        cls, from_marker: tuple[int, int, int, int], cx: int, cy: int, body: str
    ) -> str:
        return (
            f"<xdr:oneCellAnchor>{cls._marker_xml('from', from_marker)}"
            f'<xdr:ext cx="{cx}" cy="{cy}"/>{body}'
            f"<xdr:clientData/></xdr:oneCellAnchor>"
        )

    @classmethod
    def _two_cell_anchor(
        cls,
        from_marker: tuple[int, int, int, int],
        to_marker: tuple[int, int, int, int],
        body: str,
    ) -> str:
        return (
            f"<xdr:twoCellAnchor>{cls._marker_xml('from', from_marker)}"
            f"{cls._marker_xml('to', to_marker)}{body}"
            f"<xdr:clientData/></xdr:twoCellAnchor>"
        )

    @staticmethod
    def _absolute_anchor(x: int, y: int, cx: int, cy: int, body: str) -> str:
        return (
            f'<xdr:absoluteAnchor><xdr:pos x="{x}" y="{y}"/>'
            f'<xdr:ext cx="{cx}" cy="{cy}"/>{body}'
            f"<xdr:clientData/></xdr:absoluteAnchor>"
        )

    @staticmethod
    def _chart_xml(chart: _Chart) -> str:
        series_xml = []
        for s_idx, ser in enumerate(chart.series):
            tx = ""
            if ser.name_range is not None:
                cache = (
                    f'<c:strCache><c:ptCount val="1"/><c:pt idx="0">'
                    f"<c:v>{escape(ser.name)}</c:v></c:pt></c:strCache>"
                    if ser.name
                    else ""
                )
                tx = (
                    f"<c:tx><c:strRef><c:f>{escape(ser.name_range)}</c:f>{cache}"
                    f"</c:strRef></c:tx>"
                )
            elif ser.name:
                tx = f"<c:tx><c:v>{escape(ser.name)}</c:v></c:tx>"
            if ser.scatter:
                cat = (
                    f"<c:xVal><c:numRef><c:f>{escape(ser.cat_range)}</c:f></c:numRef></c:xVal>"
                    if ser.cat_range
                    else ""
                )
                val = (
                    f"<c:yVal><c:numRef><c:f>{escape(ser.val_range)}</c:f></c:numRef></c:yVal>"
                    if ser.val_range
                    else ""
                )
            else:
                cat = (
                    f"<c:cat><c:numRef><c:f>{escape(ser.cat_range)}</c:f></c:numRef></c:cat>"
                    if ser.cat_range
                    else ""
                )
                val = (
                    f"<c:val><c:numRef><c:f>{escape(ser.val_range)}</c:f></c:numRef></c:val>"
                    if ser.val_range
                    else ""
                )
            series_xml.append(
                f'<c:ser><c:idx val="{s_idx}"/><c:order val="{s_idx}"/>{tx}{cat}{val}</c:ser>'
            )
        bar_dir = f'<c:barDir val="{chart.bar_dir}"/>' if chart.bar_dir else ""
        title = ""
        if chart.title:
            title = (
                f"<c:title><c:tx><c:rich><a:bodyPr/><a:p><a:r>"
                f"<a:t>{escape(chart.title)}</a:t></a:r></a:p></c:rich></c:tx></c:title>"
            )
        axis_title = ""
        if chart.y_axis_title:
            axis_title = (
                f"<c:title><c:tx><c:rich><a:bodyPr/><a:p><a:r>"
                f"<a:t>{escape(chart.y_axis_title)}</a:t></a:r></a:p></c:rich></c:tx></c:title>"
            )
        scaling = "<c:scaling/>"
        if chart.y_min is not None and chart.y_max is not None:
            scaling = (
                f'<c:scaling><c:max val="{chart.y_max}"/>'
                f'<c:min val="{chart.y_min}"/></c:scaling>'
            )
        val_ax = f'<c:valAx><c:axId val="2"/>{scaling}{axis_title}</c:valAx>'
        cat_ax = '<c:catAx><c:axId val="1"/></c:catAx>'
        return (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<c:chartSpace xmlns:c="{_C}" xmlns:a="{_A}" xmlns:r="{_R}">'
            f"<c:chart>{title}<c:plotArea><c:layout/>"
            f"<c:{chart.chart_tag}>{bar_dir}{''.join(series_xml)}</c:{chart.chart_tag}>"
            f"{cat_ax}{val_ax}</c:plotArea></c:chart></c:chartSpace>"
        )
