"""Table-region detection: border clusters → merge → shrink → score.

Semantics parity with the reference chain T1–T6
(/root/reference/src/exstruct/core/cells.py):
  - declared-table refs first (`_extract_openpyxl_table_refs`, :1780-1806)
  - border map scan with TableScanLimits caps, empty-row early exit and
    trailing-column shrink (`load_border_maps_xlsx`, :940-1053)
  - 4-connected components over has_border, min size 4
    (`detect_border_clusters`, :1056-1157)
  - overlapping-rectangle merge that never consolidates containment pairs
    (`_merge_rectangles` / `_rectangles_overlap_for_merge`, :1671-1717)
  - shrink-to-content trimming empty-border edge rows/cols
    (`shrink_to_content_openpyxl`, :1405-1586)
  - candidate scoring: density/coverage gate, plausibility (≥2 rows and ≥2
    cols with ≥2 nonempty), header bonus 0.2, coverage bonus 0.1, structure
    bonus 0.1 vs threshold 0.35 (`_collect_table_candidates_from_values`,
    :1720-1763; `_table_signal_score`, :1350-1381)

Runs on the in-memory SheetGrid — the workbook is parsed once per document,
unlike the reference which re-opens the file per artifact.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from ..config import TableDetectionParams, TableScanLimits
from ..functions.a1 import col_index_to_alpha
from ..functions.coerce import FLOAT_RE, INT_RE
from ..ooxml.package import VirtualPackage
from ..ooxml.sheet_parser import SheetGrid
from ..ooxml.styles import BorderEdges, Stylesheet

_TABLE_REL_TYPE = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships/table"
)
_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def extract_declared_table_refs(
    package: VirtualPackage, sheet_path: str
) -> list[str]:
    """Declared ListObject table refs (highest priority, taken verbatim)."""
    refs: list[str] = []
    root = package.read_xml(sheet_path)
    table_parts = root.find(f"{_MAIN_NS}tableParts")
    if table_parts is None:
        return refs
    rel_map = package.relationships(sheet_path)
    r_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    for part in table_parts.findall(f"{_MAIN_NS}tablePart"):
        rel = rel_map.get(part.attrib.get(f"{r_ns}id", ""))
        if rel is None or rel.relationship_type != _TABLE_REL_TYPE:
            continue
        if rel.target not in package:
            continue
        ref = package.read_xml(rel.target).attrib.get("ref")
        if ref:
            refs.append(ref)
    return refs


def load_border_maps(
    grid: SheetGrid, styles: Stylesheet, limits: TableScanLimits
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Build border-presence maps with the reference's scan-limit behavior.

    Arrays are 1-based indexed, shape (scan_max_row+1, scan_max_col+1).
    """
    max_row = max(grid.max_row, 1)
    max_col = max(grid.max_col, 1)
    scan_max_row = min(max_row, limits.max_rows)
    scan_max_col = min(max_col, limits.max_cols)

    shape = (scan_max_row + 1, scan_max_col + 1)
    has_border = np.zeros(shape, dtype=bool)
    top_edge = np.zeros(shape, dtype=bool)
    bottom_edge = np.zeros(shape, dtype=bool)
    left_edge = np.zeros(shape, dtype=bool)
    right_edge = np.zeros(shape, dtype=bool)
    col_has_border = np.zeros(shape[1], dtype=bool)

    # Pre-bucket bordered cells by row: only styled cells can have borders.
    by_row: dict[int, list[tuple[int, BorderEdges]]] = {}
    for (r, c0), cell in grid.cells.items():
        if cell.style is None:
            continue
        edges = styles.style(cell.style).border
        if not edges.any:
            continue
        by_row.setdefault(r, []).append((c0 + 1, edges))

    min_row = grid.min_row
    min_col = grid.min_col
    consecutive_empty_rows = 0
    current_max_col = scan_max_col
    rows_scanned = 0

    for r in range(min_row, scan_max_row + 1):
        row_has_border = False
        for c, edges in by_row.get(r, ()):
            if c < min_col or c > current_max_col:
                continue
            row_has_border = True
            col_has_border[c] = True
            has_border[r, c] = True
            if edges.top:
                top_edge[r, c] = True
            if edges.bottom:
                bottom_edge[r, c] = True
            if edges.left:
                left_edge[r, c] = True
            if edges.right:
                right_edge[r, c] = True

        if row_has_border:
            consecutive_empty_rows = 0
        else:
            consecutive_empty_rows += 1
        rows_scanned += 1
        if consecutive_empty_rows >= limits.empty_row_run:
            break
        if rows_scanned < limits.min_rows_before_col_shrink:
            continue
        trailing_empty_cols = 0
        for c in range(current_max_col, min_col - 1, -1):
            if col_has_border[c]:
                break
            trailing_empty_cols += 1
            if trailing_empty_cols >= limits.empty_col_run:
                new_max_col = max(min_col, current_max_col - trailing_empty_cols)
                if new_max_col < current_max_col:
                    current_max_col = new_max_col
                break

    return has_border, top_edge, bottom_edge, left_edge, right_edge


def detect_border_clusters(
    has_border: np.ndarray, min_size: int = 4
) -> list[tuple[int, int, int, int]]:
    """4-connected components of border cells → bounding boxes (BFS)."""
    coords = np.argwhere(has_border)
    if coords.size == 0:
        return []
    remaining = {(int(r), int(c)) for r, c in coords}
    rects: list[tuple[int, int, int, int]] = []
    # Deterministic scan order: row-major like the reference's nested loops.
    for start in sorted(remaining):
        if start not in remaining:
            continue
        q = deque([start])
        remaining.discard(start)
        ys = [start[0]]
        xs = [start[1]]
        while q:
            y, x = q.popleft()
            for ny, nx in ((y + 1, x), (y - 1, x), (y, x + 1), (y, x - 1)):
                if (ny, nx) in remaining:
                    remaining.discard((ny, nx))
                    q.append((ny, nx))
                    ys.append(ny)
                    xs.append(nx)
        if len(ys) >= min_size:
            rects.append((min(ys), min(xs), max(ys), max(xs)))
    return rects


def _rectangles_overlap_for_merge(
    a: tuple[int, int, int, int], b: tuple[int, int, int, int]
) -> bool:
    contains = (a[0] <= b[0] and a[1] <= b[1] and a[2] >= b[2] and a[3] >= b[3]) or (
        b[0] <= a[0] and b[1] <= a[1] and b[2] >= a[2] and b[3] >= a[3]
    )
    if contains:
        return False
    return not (a[1] > b[3] or a[3] < b[1] or a[0] > b[2] or a[2] < b[0])


def merge_rectangles(
    rects: list[tuple[int, int, int, int]],
) -> list[tuple[int, int, int, int]]:
    merged_rects: list[tuple[int, int, int, int]] = []
    for rect in sorted(rects):
        merged = False
        for i, existing in enumerate(merged_rects):
            if _rectangles_overlap_for_merge(rect, existing):
                merged_rects[i] = (
                    min(rect[0], existing[0]),
                    min(rect[1], existing[1]),
                    max(rect[2], existing[2]),
                    max(rect[3], existing[3]),
                )
                merged = True
                break
        if not merged:
            merged_rects.append(rect)
    return merged_rects


def shrink_to_content(
    top: int,
    left: int,
    bottom: int,
    right: int,
    top_edge: np.ndarray,
    bottom_edge: np.ndarray,
    left_edge: np.ndarray,
    right_edge: np.ndarray,
) -> tuple[int, int, int, int]:
    """Trim edge rows/cols that carry no border edges (1-based bounds)."""

    def col_empty(c: int) -> bool:
        rows = slice(top, bottom + 1)
        return not (
            top_edge[rows, c].any()
            or bottom_edge[rows, c].any()
            or left_edge[rows, c].any()
            or right_edge[rows, c].any()
        )

    def row_empty(r: int) -> bool:
        cols = slice(left, right + 1)
        return not (
            top_edge[r, cols].any()
            or bottom_edge[r, cols].any()
            or left_edge[r, cols].any()
            or right_edge[r, cols].any()
        )

    while left <= right and col_empty(left):
        left += 1
    while top <= bottom and left <= right and row_empty(top):
        top += 1
    while left <= right and top <= bottom and col_empty(right):
        right -= 1
    while top <= bottom and left <= right and row_empty(bottom):
        bottom -= 1
    return top, left, bottom, right


def _values_block(
    grid: SheetGrid, top: int, left: int, bottom: int, right: int
) -> list[list[str]]:
    """Dense value block (1-based bounds, inclusive)."""
    return [
        [grid.value_at(r, c - 1) for c in range(left, right + 1)]
        for r in range(top, bottom + 1)
    ]


def _is_empty_value(v: str) -> bool:
    return v.strip() == ""


def _density_coverage(matrix: list[list[str]]) -> tuple[float, float]:
    rows = len(matrix)
    cols = len(matrix[0]) if rows else 0
    if rows == 0 or cols == 0:
        return 0.0, 0.0
    coords = [
        (i, j)
        for i, row in enumerate(matrix)
        for j, v in enumerate(row)
        if not _is_empty_value(v)
    ]
    total = rows * cols
    if not coords:
        return 0.0, 0.0
    density = len(coords) / total
    ys = [p[0] for p in coords]
    xs = [p[1] for p in coords]
    coverage = ((max(ys) - min(ys) + 1) * (max(xs) - min(xs) + 1)) / total
    return density, coverage


def _row_col_counts(matrix: list[list[str]]) -> tuple[list[int], list[int]]:
    rows = len(matrix)
    cols = max((len(r) for r in matrix), default=0)
    row_counts: list[int] = []
    col_counts = [0] * cols
    for r in matrix:
        cnt = 0
        for j in range(cols):
            v = r[j] if j < len(r) else ""
            if not _is_empty_value(v):
                cnt += 1
                col_counts[j] += 1
        row_counts.append(cnt)
    return row_counts, col_counts


def _is_plausible_table(matrix: list[list[str]]) -> bool:
    rows = len(matrix)
    cols = max((len(r) for r in matrix), default=0)
    if rows < 2 or cols < 2:
        return False
    row_counts, col_counts = _row_col_counts(matrix)
    rows_with_two = sum(1 for c in row_counts if c >= 2)
    cols_with_two = sum(1 for c in col_counts if c >= 2)
    return rows_with_two >= 2 and cols_with_two >= 2


def _header_like_row(row: list[str]) -> bool:
    nonempty = [v for v in row if not _is_empty_value(v)]
    if len(nonempty) < 2:
        return False
    str_like = 0
    num_like = 0
    for v in nonempty:
        if INT_RE.match(v) or FLOAT_RE.match(v):
            num_like += 1
        else:
            str_like += 1
    return str_like >= num_like and str_like >= 1


def _table_signal_score(matrix: list[list[str]]) -> float:
    density, coverage = _density_coverage(matrix)
    header = any(_header_like_row(r) for r in matrix[:2])
    row_counts, col_counts = _row_col_counts(matrix)
    rows_with_two = sum(1 for c in row_counts if c >= 2)
    cols_with_two = sum(1 for c in col_counts if c >= 2)
    structure_score = 0.1 if (rows_with_two >= 2 and cols_with_two >= 2) else 0.0
    score = density
    if header:
        score += 0.2
    if coverage > 0.5:
        score += 0.1
    score += structure_score
    return score


def _nonempty_clusters(matrix: list[list[str]]) -> list[tuple[int, int, int, int]]:
    """4-connected components of nonempty cells (row-major discovery order)."""
    rows = len(matrix)
    cols = max((len(r) for r in matrix), default=0)
    grid = [
        [j < len(matrix[i]) and not _is_empty_value(matrix[i][j]) for j in range(cols)]
        for i in range(rows)
    ]
    visited = [[False] * cols for _ in range(rows)]
    boxes: list[tuple[int, int, int, int]] = []
    for i in range(rows):
        for j in range(cols):
            if not grid[i][j] or visited[i][j]:
                continue
            q = deque([(i, j)])
            visited[i][j] = True
            ys = [i]
            xs = [j]
            while q:
                r, c = q.popleft()
                for nr, nc in ((r + 1, c), (r - 1, c), (r, c + 1), (r, c - 1)):
                    if 0 <= nr < rows and 0 <= nc < cols and grid[nr][nc] and not visited[nr][nc]:
                        visited[nr][nc] = True
                        q.append((nr, nc))
                        ys.append(nr)
                        xs.append(nc)
            boxes.append((min(ys), min(xs), max(ys), max(xs)))
    return boxes


def _collect_candidates(
    values: list[list[str]],
    base_top: int,
    base_left: int,
    params: TableDetectionParams,
) -> list[str]:
    nonempty = sum(
        1 for row in values for v in row if not _is_empty_value(v)
    )
    if nonempty < params.min_nonempty_cells:
        return []
    results: list[str] = []
    for r0, c0, r1, c1 in _nonempty_clusters(values):
        sub = [row[c0 : c1 + 1] for row in values[r0 : r1 + 1]]
        density, coverage = _density_coverage(sub)
        if density < params.density_min and coverage < params.coverage_min:
            continue
        if not _is_plausible_table(sub):
            continue
        if _table_signal_score(sub) < params.table_score_threshold:
            continue
        addr = (
            f"{col_index_to_alpha(base_left + c0 - 1)}{base_top + r0}:"
            f"{col_index_to_alpha(base_left + c1 - 1)}{base_top + r1}"
        )
        results.append(addr)
    return results


def detect_tables(
    package: VirtualPackage,
    sheet_path: str,
    grid: SheetGrid,
    styles: Stylesheet,
    params: TableDetectionParams,
    limits: TableScanLimits,
) -> list[str]:
    """Full T1–T6 chain for one sheet; returns A1 range candidates."""
    tables = extract_declared_table_refs(package, sheet_path)
    has_border, top_edge, bottom_edge, left_edge, right_edge = load_border_maps(
        grid, styles, limits
    )
    rects = detect_border_clusters(has_border, min_size=4)
    merged_rects = merge_rectangles(rects)
    dedup: set[str] = set(tables)
    for top, left, bottom, right in merged_rects:
        top, left, bottom, right = shrink_to_content(
            top, left, bottom, right, top_edge, bottom_edge, left_edge, right_edge
        )
        if top > bottom or left > right:
            continue
        values = _values_block(grid, top, left, bottom, right)
        for addr in _collect_candidates(values, top, left, params):
            if addr not in dedup:
                dedup.add(addr)
                tables.append(addr)
    return tables
