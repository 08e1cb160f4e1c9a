"""Table detection chain tests (T1–T6 parity cases)."""

import numpy as np

from exstruct_ray.config import ExtractOptions, TableDetectionParams, TableScanLimits
from exstruct_ray.datagen.builder import BOX, WorkbookBuilder
from exstruct_ray.extract.document import extract_workbook
from exstruct_ray.tables.detect import (
    detect_border_clusters,
    merge_rectangles,
    _rectangles_overlap_for_merge,
)
from tests.test_cells import extract, make_package


class TestClusters:
    def test_min_size(self):
        grid = np.zeros((10, 10), dtype=bool)
        grid[1, 1] = grid[1, 2] = grid[2, 1] = True  # size 3 < 4
        assert detect_border_clusters(grid) == []
        grid[2, 2] = True
        assert detect_border_clusters(grid) == [(1, 1, 2, 2)]

    def test_two_components(self):
        grid = np.zeros((12, 12), dtype=bool)
        grid[1:3, 1:3] = True
        grid[8:10, 8:10] = True
        assert detect_border_clusters(grid) == [(1, 1, 2, 2), (8, 8, 9, 9)]


class TestMergeRectangles:
    def test_overlap_merges(self):
        assert merge_rectangles([(1, 1, 3, 3), (2, 2, 5, 5)]) == [(1, 1, 5, 5)]

    def test_containment_never_merges(self):
        # reference rule (cells.py:1700-1717): containment pairs stay separate
        a, b = (1, 1, 10, 10), (2, 2, 5, 5)
        assert not _rectangles_overlap_for_merge(a, b)
        assert merge_rectangles([a, b]) == [(1, 1, 10, 10), (2, 2, 5, 5)]

    def test_disjoint(self):
        assert merge_rectangles([(1, 1, 2, 2), (5, 5, 6, 6)]) == [
            (1, 1, 2, 2),
            (5, 5, 6, 6),
        ]


class TestDetectEndToEnd:
    def test_basic_table(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.fill_block(3, 1, [["h1", "h2", "h3", "h4"]], style=BOX)
        for i in range(6):
            sh.fill_block(4 + i, 1, [[i, i * 2, i * 3, f"x{i}"]], style=BOX)
        out = extract(wb)
        assert out.sheets["S"].table_candidates == ["B3:E9"]

    def test_declared_table_takes_priority(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.declare_table("A1:C5")
        sh.fill_block(1, 0, [["a", "b", "c"]] + [[1, 2, 3]] * 4)
        out = extract(wb)
        assert out.sheets["S"].table_candidates[0] == "A1:C5"

    def test_low_density_blob_rejected(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        # bordered frame but only one value cell inside -> implausible
        for r in range(1, 5):
            for c in range(0, 4):
                sh.set(r, c, "x" if (r, c) == (1, 0) else "", style=BOX)
        out = extract(wb)
        assert out.sheets["S"].table_candidates == []

    def test_shrink_to_bordered_content(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        # bordered 3x3 with values; plus unbordered far value that joins the
        # cluster bounding box only if shrink fails
        sh.fill_block(2, 1, [["h", "i", "j"], [1, 2, 3], [4, 5, 6]], style=BOX)
        out = extract(wb)
        assert out.sheets["S"].table_candidates == ["B2:D4"]

    def test_two_overlapping_boxes_merge(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.fill_block(1, 0, [["a", "b"], [1, 2]], style=BOX)
        sh.fill_block(2, 1, [["c", "d"], [3, 4]], style=BOX)
        out = extract(wb)
        # single merged candidate spanning both boxes
        assert out.sheets["S"].table_candidates == ["A1:C3"]

    def test_empty_row_run_early_exit(self):
        # A bordered table far below the empty-row-run limit is not scanned.
        limits = TableScanLimits(
            max_rows=5000,
            max_cols=200,
            empty_row_run=10,
            empty_col_run=80,
            min_rows_before_col_shrink=200,
        )
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.fill_block(1, 0, [["a", "b"], [1, 2]], style=BOX)
        sh.fill_block(50, 0, [["c", "d"], [3, 4]], style=BOX)
        out = extract_workbook(
            make_package(wb),
            ExtractOptions(scan_limits=limits).resolved(),
        )
        assert out.sheets["S"].table_candidates == ["A1:B2"]

    def test_detection_params_threshold(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.fill_block(1, 0, [["h1", "h2"], [1, 2], [3, 4]], style=BOX)
        strict = extract_workbook(
            make_package(wb),
            ExtractOptions(
                table_params=TableDetectionParams(table_score_threshold=2.0)
            ).resolved(),
        )
        assert strict.sheets["S"].table_candidates == []
