"""EditWorkbook → OOXML parts / spans / xlsx bytes.

Deterministic XML emission in the same style as the datagen builder
(datagen/builder.py): sorted explicit ordering so identical models always
produce byte-identical parts. Values are written with their natural OOXML
cell types (numbers ``n``, booleans ``b``, strings as inline ``<is>`` —
no shared-strings table needed for edited output).
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape, quoteattr

from .model import (
    BorderSide,
    EditSheet,
    EditStyle,
    EditWorkbook,
    col_index_to_label,
)

_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_CT = "http://schemas.openxmlformats.org/package/2006/content-types"

_EDGE_ORDER = ("left", "right", "top", "bottom")


def _rgb_attr(color: str) -> str:
    """'#RRGGBB' → 'FFRRGGBB'; '#AARRGGBB' → 'AARRGGBB'."""
    hexpart = color.lstrip("#")
    return hexpart if len(hexpart) == 8 else f"FF{hexpart}"


def _font_xml(style: EditStyle) -> str:
    bits = []
    if style.bold:
        bits.append("<b/>")
    if style.font_size is not None:
        bits.append(f'<sz val="{style.font_size:g}"/>')
    if style.font_color is not None:
        bits.append(f'<color rgb="{_rgb_attr(style.font_color)}"/>')
    return f"<font>{''.join(bits)}</font>"


def _fill_xml(style: EditStyle) -> str:
    if style.fill_color is None:
        return '<fill><patternFill patternType="none"/></fill>'
    return (
        '<fill><patternFill patternType="solid">'
        f'<fgColor rgb="{_rgb_attr(style.fill_color)}"/>'
        "</patternFill></fill>"
    )


def _border_xml(style: EditStyle) -> str:
    sides = {
        "left": style.border_left,
        "right": style.border_right,
        "top": style.border_top,
        "bottom": style.border_bottom,
    }
    bits = []
    for name in _EDGE_ORDER:
        side: BorderSide = sides[name]
        if side.style is None:
            bits.append(f"<{name}/>")
        else:
            color = (
                f'<color rgb="{_rgb_attr(side.color)}"/>'
                if side.color is not None
                else ""
            )
            bits.append(f'<{name} style="{side.style}">{color}</{name}>')
    return f"<border>{''.join(bits)}<diagonal/></border>"


def _alignment_xml(style: EditStyle) -> str | None:
    attrs = []
    if style.horizontal is not None:
        attrs.append(f'horizontal="{style.horizontal}"')
    if style.vertical is not None:
        attrs.append(f'vertical="{style.vertical}"')
    if style.wrap_text:
        attrs.append('wrapText="1"')
    if not attrs:
        return None
    return f"<alignment {' '.join(attrs)}/>"


class _StyleTable:
    """Dedup EditStyles into styles.xml component + cellXf ids."""

    def __init__(self) -> None:
        self._styles: list[EditStyle] = [EditStyle()]
        self._index: dict[EditStyle, int] = {EditStyle(): 0}

    def xf_id(self, style: EditStyle) -> int | None:
        if style.is_default:
            return None
        idx = self._index.get(style)
        if idx is None:
            idx = len(self._styles)
            self._styles.append(style)
            self._index[style] = idx
        return idx

    def styles_xml(self) -> str:
        fonts: list[str] = []
        fills: list[str] = [
            '<fill><patternFill patternType="none"/></fill>',
            '<fill><patternFill patternType="gray125"/></fill>',
        ]
        borders: list[str] = ["<border><left/><right/><top/><bottom/><diagonal/></border>"]
        font_ids: dict[str, int] = {}
        fill_ids: dict[str, int] = {fills[0]: 0, fills[1]: 1}
        border_ids: dict[str, int] = {borders[0]: 0}

        def intern(table: list[str], ids: dict[str, int], xml: str) -> int:
            got = ids.get(xml)
            if got is None:
                got = len(table)
                table.append(xml)
                ids[xml] = got
            return got

        xfs = []
        for style in self._styles:
            font_id = intern(fonts, font_ids, _font_xml(style))
            fill_id = intern(fills, fill_ids, _fill_xml(style))
            border_id = intern(borders, border_ids, _border_xml(style))
            num_fmt = 22 if style.date_fmt else 0
            attrs = [
                f'numFmtId="{num_fmt}"',
                f'fontId="{font_id}"',
                f'fillId="{fill_id}"',
                f'borderId="{border_id}"',
            ]
            if style.date_fmt:
                attrs.append('applyNumberFormat="1"')
            if fill_id > 1:
                attrs.append('applyFill="1"')
            if border_id > 0:
                attrs.append('applyBorder="1"')
            alignment = _alignment_xml(style)
            if alignment is not None:
                attrs.append('applyAlignment="1"')
                xfs.append(f"<xf {' '.join(attrs)}>{alignment}</xf>")
            else:
                xfs.append(f"<xf {' '.join(attrs)}/>")

        return (
            f'<styleSheet xmlns="{_MAIN}">'
            f'<fonts count="{len(fonts)}">{"".join(fonts)}</fonts>'
            f'<fills count="{len(fills)}">{"".join(fills)}</fills>'
            f'<borders count="{len(borders)}">{"".join(borders)}</borders>'
            '<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" '
            'borderId="0"/></cellStyleXfs>'
            f'<cellXfs count="{len(xfs)}">{"".join(xfs)}</cellXfs>'
            "</styleSheet>"
        )


def _cell_xml(r: int, c: int, cell, style_id: int | None) -> str:
    ref = f"{col_index_to_label(c)}{r}"
    s_attr = f' s="{style_id}"' if style_id is not None else ""
    if cell.formula is not None:
        formula = escape(cell.formula.lstrip("="))
        return f'<c r="{ref}"{s_attr}><f>{formula}</f></c>'
    value = cell.value
    if value is None or value == "":
        if s_attr:
            return f'<c r="{ref}"{s_attr}/>'
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}"{s_attr} t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        num = repr(value) if isinstance(value, float) else str(value)
        return f'<c r="{ref}"{s_attr}><v>{num}</v></c>'
    text = escape(str(value))
    space = ' xml:space="preserve"' if str(value) != str(value).strip() else ""
    return f'<c r="{ref}"{s_attr} t="inlineStr"><is><t{space}>{text}</t></is></c>'


def _sheet_xml(sheet: EditSheet, styles: _StyleTable, table_rids: list[str]) -> str:
    parts = [f'<worksheet xmlns="{_MAIN}" xmlns:r="{_R}">']
    if sheet.col_widths:
        cols = "".join(
            f'<col min="{c}" max="{c}" width="{w:g}" customWidth="1"/>'
            for c, w in sorted(sheet.col_widths.items())
        )
        parts.append(f"<cols>{cols}</cols>")
    parts.append("<sheetData>")
    rows: dict[int, list[tuple[int, str]]] = {}
    # Canonical (row, col) order: xf ids are assigned in first-encounter
    # order, so emission must not depend on the model's dict insertion
    # order — load→emit must be a fixed point (property-tested).
    for (r, c) in sorted(sheet.cells):
        cell = sheet.cells[(r, c)]
        xml = _cell_xml(r, c, cell, styles.xf_id(cell.style))
        if xml:
            rows.setdefault(r, []).append((c, xml))
    all_rows = set(rows) | set(sheet.row_heights)
    for r in sorted(all_rows):
        ht = sheet.row_heights.get(r)
        ht_attr = f' ht="{ht:g}" customHeight="1"' if ht is not None else ""
        cells_xml = "".join(x for _, x in sorted(rows.get(r, [])))
        parts.append(f'<row r="{r}"{ht_attr}>{cells_xml}</row>')
    parts.append("</sheetData>")
    if sheet.merged:
        merges = "".join(
            f"<mergeCell ref={quoteattr(m)}/>" for m in sheet.merged
        )
        parts.append(
            f'<mergeCells count="{len(sheet.merged)}">{merges}</mergeCells>'
        )
    if table_rids:
        tp = "".join(f'<tablePart r:id="{rid}"/>' for rid in table_rids)
        parts.append(f'<tableParts count="{len(table_rids)}">{tp}</tableParts>')
    parts.append("</worksheet>")
    return "".join(parts)


def _table_xml(table_id: int, name: str, ref: str, style: str | None) -> str:
    from .model import parse_range

    r1, c1, r2, c2 = parse_range(ref)
    columns = "".join(
        f'<tableColumn id="{i + 1}" name="Column{i + 1}"/>'
        for i in range(c2 - c1 + 1)
    )
    style_xml = (
        f'<tableStyleInfo name={quoteattr(style)} showFirstColumn="0" '
        'showLastColumn="0" showRowStripes="1" showColumnStripes="0"/>'
        if style
        else ""
    )
    return (
        f'<table xmlns="{_MAIN}" id="{table_id}" name={quoteattr(name)} '
        f"displayName={quoteattr(name)} ref={quoteattr(ref)}>"
        f'<autoFilter ref={quoteattr(ref)}/>'
        f'<tableColumns count="{c2 - c1 + 1}">{columns}</tableColumns>'
        f"{style_xml}</table>"
    )


def emit_parts(workbook: EditWorkbook) -> dict[str, str]:
    """Emit the full OOXML part set ({path: xml text})."""
    styles = _StyleTable()
    parts: dict[str, str] = {}

    sheet_entries = []
    table_counter = 0
    for idx, (name, sheet) in enumerate(workbook.sheets.items(), start=1):
        table_rids = []
        sheet_rels = []
        for table in sheet.tables:
            table_counter += 1
            rid = f"rId{len(sheet_rels) + 1}"
            table_rids.append(rid)
            table_path = f"xl/tables/table{table_counter}.xml"
            parts[table_path] = _table_xml(
                table_counter, table.name, table.ref, table.style
            )
            sheet_rels.append((rid, f"{_R}/table", f"../tables/table{table_counter}.xml"))
        parts[f"xl/worksheets/sheet{idx}.xml"] = _sheet_xml(
            sheet, styles, table_rids
        )
        if sheet_rels:
            rels = "".join(
                f'<Relationship Id="{rid}" Type="{rtype}" Target={quoteattr(target)}/>'
                for rid, rtype, target in sheet_rels
            )
            parts[f"xl/worksheets/_rels/sheet{idx}.xml.rels"] = (
                f'<Relationships xmlns="{_REL}">{rels}</Relationships>'
            )
        sheet_entries.append((name, idx))

    sheets_xml = "".join(
        f"<sheet name={quoteattr(name)} sheetId=\"{idx}\" r:id=\"rId{idx}\"/>"
        for name, idx in sheet_entries
    )
    parts["xl/workbook.xml"] = (
        f'<workbook xmlns="{_MAIN}" xmlns:r="{_R}">'
        f"<sheets>{sheets_xml}</sheets></workbook>"
    )
    wb_rels = "".join(
        f'<Relationship Id="rId{idx}" Type="{_R}/worksheet" '
        f'Target="worksheets/sheet{idx}.xml"/>'
        for _, idx in sheet_entries
    )
    style_rid = len(sheet_entries) + 1
    wb_rels += (
        f'<Relationship Id="rId{style_rid}" Type="{_R}/styles" '
        f'Target="styles.xml"/>'
    )
    parts["xl/_rels/workbook.xml.rels"] = (
        f'<Relationships xmlns="{_REL}">{wb_rels}</Relationships>'
    )
    # styles.xml LAST — xf table fills up while sheets emit.
    parts["xl/styles.xml"] = styles.styles_xml()
    return parts


def parts_to_spans(parts: dict[str, str]) -> list[dict]:
    """Parts dict → interleaved span dicts (the engine's corpus row format)."""
    kind_of = {"xl/workbook.xml": "workbook", "xl/styles.xml": "styles"}
    spans = []
    for offset, (path, text) in enumerate(sorted(parts.items())):
        if path in kind_of:
            kind = kind_of[path]
        elif path.endswith(".rels"):
            kind = "rels"
        elif "/tables/" in path:
            kind = "table_xml"
        else:
            kind = "sheet_xml"
        spans.append(
            {"kind": kind, "text": text, "media_ref": path, "offset": offset}
        )
    return spans


def emit_spans(workbook: EditWorkbook) -> list[dict]:
    """Emit a workbook straight to interleaved spans."""
    return parts_to_spans(emit_parts(workbook))


def emit_xlsx_bytes(workbook: EditWorkbook) -> bytes:
    """Emit a real .xlsx zip (deterministic entry order/timestamps)."""
    parts = emit_parts(workbook)
    overrides = []
    for path in sorted(parts):
        if path == "xl/workbook.xml":
            ctype = (
                "application/vnd.openxmlformats-officedocument"
                ".spreadsheetml.sheet.main+xml"
            )
        elif path == "xl/styles.xml":
            ctype = (
                "application/vnd.openxmlformats-officedocument"
                ".spreadsheetml.styles+xml"
            )
        elif "/tables/" in path:
            ctype = (
                "application/vnd.openxmlformats-officedocument"
                ".spreadsheetml.table+xml"
            )
        elif path.endswith(".rels"):
            continue
        else:
            ctype = (
                "application/vnd.openxmlformats-officedocument"
                ".spreadsheetml.worksheet+xml"
            )
        overrides.append(
            f'<Override PartName="/{path}" ContentType="{ctype}"/>'
        )
    content_types = (
        f'<Types xmlns="{_CT}">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        f"{''.join(overrides)}</Types>"
    )
    root_rels = (
        f'<Relationships xmlns="{_REL}">'
        f'<Relationship Id="rId1" Type="{_R}/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    header = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        entries = [("[Content_Types].xml", content_types), ("_rels/.rels", root_rels)]
        entries.extend(sorted(parts.items()))
        for path, text in entries:
            info = zipfile.ZipInfo(path, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, header + text)
    return buf.getvalue()
