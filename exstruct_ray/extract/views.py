"""Print-area views: workbook slices restricted to one print area.

Semantics parity: /root/reference/src/exstruct/models/__init__.py:437-561 and
io/__init__.py:199-385 — rows clipped to the area (column interval filter,
optional rebase to the area origin), table candidates fully contained,
shapes/charts by pixel-rect overlap with the 64×20 px cell approximation,
point-containment fallback when a shape's size is unknown.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from ..functions.a1 import parse_range_zero_based
from ..functions.geometry import rects_overlap
from ..models import Arrow, CellRow, Chart, PrintArea, Shape, SheetData, SmartArt


@dataclass
class PrintAreaView:
    book_name: str
    sheet_name: str
    area: PrintArea
    shapes: list[Shape | Arrow | SmartArt] = field(default_factory=list)
    charts: list[Chart] = field(default_factory=list)
    rows: list[CellRow] = field(default_factory=list)
    table_candidates: list[str] = field(default_factory=list)

    def to_payload(self, *, include_backend_metadata: bool = False) -> dict:
        return {
            "book_name": self.book_name,
            "sheet_name": self.sheet_name,
            "area": self.area.to_payload(),
            "shapes": [
                s.to_payload(include_backend_metadata=include_backend_metadata)
                for s in self.shapes
            ],
            "charts": [
                c.to_payload(include_backend_metadata=include_backend_metadata)
                for c in self.charts
            ],
            "rows": [r.to_payload() for r in self.rows],
            "table_candidates": list(self.table_candidates),
        }


def _filter_row_to_area(
    row: CellRow, area: PrintArea, *, normalize: bool = False
) -> CellRow | None:
    if not (area.r1 <= row.r <= area.r2):
        return None
    cells: dict[str, int | float | str] = {}
    links: dict[str, str] = {}
    for col_str, value in row.c.items():
        try:
            col = int(col_str)
        except Exception:
            continue
        if area.c1 <= col <= area.c2:
            key = str(col - area.c1) if normalize else col_str
            cells[key] = value
    if row.links:
        for col_str, url in row.links.items():
            try:
                col = int(col_str)
            except Exception:
                continue
            if area.c1 <= col <= area.c2:
                key = str(col - area.c1) if normalize else col_str
                links[key] = url
    if not cells and not links:
        return None
    return CellRow(
        r=row.r - area.r1 if normalize else row.r, c=cells, links=links or None
    )


def _filter_tables_to_area(candidates: list[str], area: PrintArea) -> list[str]:
    out: list[str] = []
    for candidate in candidates:
        bounds = parse_range_zero_based(candidate)
        if not bounds:
            continue
        if (
            bounds.r1 + 1 >= area.r1
            and bounds.r2 + 1 <= area.r2
            and bounds.c1 >= area.c1
            and bounds.c2 <= area.c2
        ):
            out.append(candidate)
    return out


def _area_px_rect(
    area: PrintArea, col_px: int = 64, row_px: int = 20
) -> tuple[int, int, int, int]:
    return (
        area.c1 * col_px,
        (area.r1 - 1) * row_px,
        (area.c2 + 1) * col_px,
        area.r2 * row_px,
    )


def _filter_shapes_to_area(shapes, area: PrintArea):
    rect = _area_px_rect(area)
    out = []
    for shp in shapes:
        if shp.w is None or shp.h is None:
            if rect[0] <= shp.l <= rect[2] and rect[1] <= shp.t <= rect[3]:
                out.append(shp)
            continue
        if rects_overlap(rect, (shp.l, shp.t, shp.l + shp.w, shp.t + shp.h)):
            out.append(shp)
    return out


def _filter_charts_to_area(charts: list[Chart], area: PrintArea) -> list[Chart]:
    rect = _area_px_rect(area)
    out: list[Chart] = []
    for ch in charts:
        if ch.w is None or ch.h is None:
            continue
        if rects_overlap(rect, (ch.l, ch.t, ch.l + ch.w, ch.t + ch.h)):
            out.append(ch)
    return out


def build_print_area_views(
    book_name: str,
    sheet_name: str,
    sheet: SheetData,
    *,
    normalize: bool = False,
    include_shapes: bool = True,
    include_charts: bool = True,
    include_shape_size: bool = True,
    include_chart_size: bool = True,
) -> list[PrintAreaView]:
    """Views for every print area of one sheet (ordered as declared)."""
    views: list[PrintAreaView] = []
    for area in sheet.print_areas:
        rows = [
            filtered
            for row in sheet.rows
            if (filtered := _filter_row_to_area(row, area, normalize=normalize))
        ]
        shapes = _filter_shapes_to_area(sheet.shapes, area) if include_shapes else []
        if not include_shape_size:
            shapes = [replace(s, w=None, h=None) for s in shapes]
        charts = _filter_charts_to_area(sheet.charts, area) if include_charts else []
        if not include_chart_size:
            charts = [replace(c, w=None, h=None) for c in charts]
        views.append(
            PrintAreaView(
                book_name=book_name,
                sheet_name=sheet_name,
                area=area,
                shapes=shapes,
                charts=charts,
                rows=rows,
                table_candidates=_filter_tables_to_area(sheet.table_candidates, area),
            )
        )
    return views
