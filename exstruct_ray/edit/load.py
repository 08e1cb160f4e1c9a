"""Load an EditWorkbook from a VirtualPackage (existing workbook → model).

Reuses the extraction engine's parsers for cell values/formulas/merges
(ooxml/sheet_parser.py) and imports the style attributes the edit model
tracks (bold / size / colors / fill / alignment / borders) straight from
styles.xml. Numeric strings re-coerce to int/float with the same rules the
extractor applies, so patch → extract round trips are value-stable.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..functions.coerce import coerce_numeric_preserve_format
from ..ooxml.package import VirtualPackage
from ..ooxml.sheet_parser import parse_shared_strings, parse_sheet
from ..ooxml.styles import parse_styles
from ..ooxml.workbook_parser import parse_workbook
from .model import (
    BorderSide,
    EditCell,
    EditSheet,
    EditStyle,
    EditTable,
    EditWorkbook,
)

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _color_attr(node: ET.Element | None) -> str | None:
    if node is None:
        return None
    rgb = node.attrib.get("rgb")
    if rgb is None:
        return None
    rgb = rgb.upper()
    if len(rgb) == 8 and rgb.startswith("FF"):
        return f"#{rgb[2:]}"
    return f"#{rgb}"


def _parse_rich_styles(package: VirtualPackage) -> list[EditStyle]:
    """cellXf index → EditStyle with the attributes the edit model tracks."""
    if "xl/styles.xml" not in package:
        return []
    root = package.read_xml("xl/styles.xml")
    date_ids = parse_styles(root).date_style_ids()

    fonts: list[tuple[bool | None, float | None, str | None]] = []
    fonts_node = root.find(f"{_MAIN_NS}fonts")
    if fonts_node is not None:
        for font in fonts_node.findall(f"{_MAIN_NS}font"):
            bold = font.find(f"{_MAIN_NS}b") is not None or None
            sz_el = font.find(f"{_MAIN_NS}sz")
            size = None
            if sz_el is not None:
                try:
                    size = float(sz_el.attrib.get("val", ""))
                except ValueError:
                    size = None
            color = _color_attr(font.find(f"{_MAIN_NS}color"))
            fonts.append((bold, size, color))

    fills: list[str | None] = []
    fills_node = root.find(f"{_MAIN_NS}fills")
    if fills_node is not None:
        for fill in fills_node.findall(f"{_MAIN_NS}fill"):
            pattern = fill.find(f"{_MAIN_NS}patternFill")
            key = None
            if pattern is not None and pattern.attrib.get("patternType") == "solid":
                key = _color_attr(pattern.find(f"{_MAIN_NS}fgColor"))
            fills.append(key)

    borders: list[dict[str, BorderSide]] = []
    borders_node = root.find(f"{_MAIN_NS}borders")
    if borders_node is not None:
        for border in borders_node.findall(f"{_MAIN_NS}border"):
            sides = {}
            for name in ("top", "bottom", "left", "right"):
                edge = border.find(f"{_MAIN_NS}{name}")
                if edge is None or edge.attrib.get("style") in (None, "none"):
                    sides[name] = BorderSide()
                else:
                    sides[name] = BorderSide(
                        style=edge.attrib.get("style"),
                        color=_color_attr(edge.find(f"{_MAIN_NS}color")),
                    )
            borders.append(sides)

    styles: list[EditStyle] = []
    cell_xfs = root.find(f"{_MAIN_NS}cellXfs")
    if cell_xfs is not None:
        for idx, xf in enumerate(cell_xfs.findall(f"{_MAIN_NS}xf")):
            font_id = int(xf.attrib.get("fontId", 0) or 0)
            fill_id = int(xf.attrib.get("fillId", 0) or 0)
            border_id = int(xf.attrib.get("borderId", 0) or 0)
            bold = size = color = None
            if 0 <= font_id < len(fonts):
                bold, size, color = fonts[font_id]
            fill = fills[fill_id] if 0 <= fill_id < len(fills) else None
            sides = (
                borders[border_id]
                if 0 <= border_id < len(borders)
                else {n: BorderSide() for n in ("top", "bottom", "left", "right")}
            )
            horizontal = vertical = None
            wrap = None
            alignment = xf.find(f"{_MAIN_NS}alignment")
            if alignment is not None:
                horizontal = alignment.attrib.get("horizontal")
                vertical = alignment.attrib.get("vertical")
                if alignment.attrib.get("wrapText") in ("1", "true"):
                    wrap = True
            styles.append(
                EditStyle(
                    bold=bold,
                    font_size=size,
                    font_color=color,
                    fill_color=fill,
                    horizontal=horizontal,
                    vertical=vertical,
                    wrap_text=wrap,
                    border_top=sides["top"],
                    border_bottom=sides["bottom"],
                    border_left=sides["left"],
                    border_right=sides["right"],
                    date_fmt=idx in date_ids,
                )
            )
    return styles


def _parse_table_part(package: VirtualPackage, path: str) -> EditTable | None:
    try:
        root = package.read_xml(path)
    except Exception:
        return None
    ref = root.attrib.get("ref")
    name = root.attrib.get("displayName") or root.attrib.get("name")
    if not ref or not name:
        return None
    style = None
    info = root.find(f"{_MAIN_NS}tableStyleInfo")
    if info is not None:
        style = info.attrib.get("name")
    return EditTable(name=name, ref=ref, style=style)


def load_workbook(package: VirtualPackage) -> EditWorkbook:
    """Parse a workbook package into the mutable edit model."""
    info = parse_workbook(package)
    shared = parse_shared_strings(package)
    base_styles = parse_styles(
        package.read_xml("xl/styles.xml") if "xl/styles.xml" in package else None
    )
    rich = _parse_rich_styles(package)

    workbook = EditWorkbook()
    for ref in info.sheets:
        grid = parse_sheet(
            package, ref.path, ref.name, shared, base_styles,
            date1904=info.date1904,
        )
        sheet = EditSheet(name=ref.name)
        for (row1, col0), cell in grid.cells.items():
            style = (
                rich[cell.style]
                if cell.style is not None and 0 <= cell.style < len(rich)
                else EditStyle()
            )
            value: object = None
            if cell.value != "":
                value = coerce_numeric_preserve_format(cell.value)
            formula = f"={cell.formula}" if cell.formula else None
            sheet.cells[(row1, col0 + 1)] = EditCell(
                value=value, formula=formula, style=style
            )
        sheet.merged = list(grid.merged_refs)
        for row0, points in grid.metrics.row_height_points.items():
            sheet.row_heights[row0 + 1] = points
        for col0, points in grid.metrics.column_width_points.items():
            # invert column_width_to_points: (w*7+5)*72/96 → w
            sheet.col_widths[col0 + 1] = round((points * 96 / 72 - 5) / 7, 6)
        rels = package.relationships(ref.path)
        for rid in grid.table_part_rids:
            rel = rels.get(rid)
            if rel is not None and rel.target in package:
                table = _parse_table_part(package, rel.target)
                if table is not None:
                    sheet.tables.append(table)
        workbook.sheets[ref.name] = sheet
    return workbook
