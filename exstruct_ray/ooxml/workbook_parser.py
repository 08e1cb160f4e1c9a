"""workbook.xml parsing: sheet order and print-area defined names.

Sheet-order parity: /root/reference/src/exstruct/core/ooxml_drawing.py:217-233
(`_iter_sheet_xml_paths`). Print-area parity:
core/backends/openpyxl_backend.py:143-217 — `_xlnm.Print_Area` defined names,
comma-split multi-ranges, rows re-based to 1-based / columns 0-based.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.a1 import parse_range_zero_based
from ..models import PrintArea
from .package import VirtualPackage, WORKSHEET_REL_TYPE

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


@dataclass(frozen=True)
class SheetRef:
    name: str
    path: str  # e.g. "xl/worksheets/sheet1.xml"


@dataclass
class WorkbookInfo:
    sheets: list[SheetRef] = field(default_factory=list)
    # sheet name -> ordered print areas
    print_areas: dict[str, list[PrintArea]] = field(default_factory=dict)
    # Mac-origin workbooks use the 1904 date system (workbookPr date1904);
    # date serials are offset by 1462 days vs the default 1900 system.
    date1904: bool = False


def parse_workbook(package: VirtualPackage) -> WorkbookInfo:
    info = WorkbookInfo()
    if "xl/workbook.xml" not in package:
        return info
    root = package.read_xml("xl/workbook.xml")
    rel_map = package.relationships("xl/workbook.xml")

    wb_pr = root.find(f"{_MAIN_NS}workbookPr")
    if wb_pr is not None:
        info.date1904 = wb_pr.attrib.get("date1904", "").lower() in {"1", "true"}

    # localSheetId indexes the FULL <sheets> order (chartsheets included),
    # not the worksheet-only list we keep in info.sheets.
    all_sheet_names: list[str | None] = []
    sheets_node = root.find(f"{_MAIN_NS}sheets")
    if sheets_node is not None:
        for sheet in sheets_node.findall(f"{_MAIN_NS}sheet"):
            name = sheet.attrib.get("name")
            all_sheet_names.append(name)
            rel_id = sheet.attrib.get(f"{_R_NS}id")
            if not name or not rel_id or rel_id not in rel_map:
                continue
            rel = rel_map[rel_id]
            if rel.relationship_type != WORKSHEET_REL_TYPE:
                continue
            info.sheets.append(SheetRef(name=name, path=rel.target))

    sheet_names = {s.name for s in info.sheets}
    defined_names = root.find(f"{_MAIN_NS}definedNames")
    if defined_names is not None:
        for dn in defined_names.findall(f"{_MAIN_NS}definedName"):
            if dn.attrib.get("name") != "_xlnm.Print_Area":
                continue
            value = dn.text or ""
            local_sheet: str | None = None
            local_id = dn.attrib.get("localSheetId")
            if local_id is not None:
                try:
                    local_sheet = all_sheet_names[int(local_id)]
                except (ValueError, IndexError):
                    local_sheet = None
            for part in _split_destinations(value):
                part = part.strip()
                if not part:
                    continue
                sheet_name = local_sheet
                if "!" in part:
                    candidate = part.split("!", 1)[0].strip().strip("'")
                    # quoted names escape ' as '' (Excel convention)
                    candidate = candidate.replace("''", "'")
                    if candidate in sheet_names:
                        sheet_name = candidate
                    # range parsing must not see the quoted sheet prefix
                    part = part.split("!", 1)[1]
                if sheet_name is None or sheet_name not in sheet_names:
                    continue
                bounds = parse_range_zero_based(part)
                if bounds is None:
                    continue
                info.print_areas.setdefault(sheet_name, []).append(
                    PrintArea(
                        r1=bounds.r1 + 1, c1=bounds.c1, r2=bounds.r2 + 1, c2=bounds.c2
                    )
                )
    return info


def _split_destinations(value: str) -> list[str]:
    """Split a defined-name destination list on commas outside quotes.

    Sheet names may contain commas and are then single-quoted
    ('A,B'!$A$1:$B$2); a naive split would shear the reference apart.
    """
    parts: list[str] = []
    buf: list[str] = []
    in_quote = False
    for ch in value:
        if ch == "'":
            in_quote = not in_quote
            buf.append(ch)
        elif ch == "," and not in_quote:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts
