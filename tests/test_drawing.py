"""Shape / connector / chart extraction tests (P7–P11, J1/J2 parity)."""

from exstruct_ray.models import Arrow, Shape
from tests.test_cells import WorkbookBuilder, extract


class TestShapes:
    def test_shape_geometry_and_type(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.add_shape("hello", prst="flowChartProcess", x_pt=100, y_pt=50, w_pt=80, h_pt=40)
        sh.add_shape("box", prst="rect", x_pt=10, y_pt=20, w_pt=30, h_pt=40, text_box=True)
        out = extract(wb, mode="verbose")
        shapes = out.sheets["S"].shapes
        s1, s2 = shapes
        assert isinstance(s1, Shape)
        assert (s1.id, s1.text, s1.l, s1.t, s1.w, s1.h) == (1, "hello", 100, 50, 80, 40)
        assert s1.type == "AutoShape-FlowchartProcess"
        assert s2.type == "TextBox-Rectangle"
        assert s2.id == 2  # per-sheet sequential ids

    def test_light_mode_strips_sizes(self):
        wb = WorkbookBuilder()
        wb.sheet("S").add_shape("x", x_pt=10, y_pt=10, w_pt=50, h_pt=50)
        out = extract(wb)  # light: include_shape_size False
        shape = out.sheets["S"].shapes[0]
        assert shape.w is None and shape.h is None
        assert (shape.l, shape.t) == (10, 10)

    def test_rotation(self):
        wb = WorkbookBuilder()
        wb.sheet("S").add_shape("r", x_pt=0, y_pt=0, rot=45.0)
        out = extract(wb, mode="verbose")
        assert out.sheets["S"].shapes[0].rotation == 45.0


class TestConnectors:
    def test_direct_resolution(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        s1 = sh.add_shape("a", x_pt=0, y_pt=0)
        s2 = sh.add_shape("b", x_pt=200, y_pt=0)
        sh.add_connector(80, 20, 120, 0, start_id=s1, end_id=s2)
        out = extract(wb, mode="verbose")
        arrow = out.sheets["S"].shapes[2]
        assert isinstance(arrow, Arrow)
        assert (arrow.begin_id, arrow.end_id) == (1, 2)
        assert arrow.approximation_level == "direct"
        assert arrow.confidence == 1.0
        assert arrow.direction == "E"
        assert arrow.end_arrow_style == 2 and arrow.begin_arrow_style is None

    def test_heuristic_nearest_box(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.add_shape("a", x_pt=0, y_pt=0, w_pt=50, h_pt=50)
        sh.add_shape("b", x_pt=300, y_pt=0, w_pt=50, h_pt=50)
        # no endpoint refs: starts at (60, 25), ends at (290, 25)
        sh.add_connector(60, 25, 230, 0)
        out = extract(wb, mode="verbose")
        arrow = out.sheets["S"].shapes[2]
        assert (arrow.begin_id, arrow.end_id) == (1, 2)
        assert arrow.approximation_level == "heuristic"
        assert arrow.confidence == 0.6

    def test_flip_affects_direction(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.add_connector(100, 100, 80, 60, flip_h=True, flip_v=True)
        out = extract(wb, mode="verbose")
        arrow = out.sheets["S"].shapes[0]
        # dx=-80, dy=-60 -> angle atan2(-60,-80) ~= 216.9 -> SW bucket
        assert arrow.direction == "SW"

    def test_arrowhead_styles(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.add_connector(0, 0, 10, 10, head=True, tail=False)
        out = extract(wb, mode="verbose")
        arrow = out.sheets["S"].shapes[0]
        assert arrow.begin_arrow_style == 2 and arrow.end_arrow_style is None


class TestCharts:
    def test_chart_fields(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.add_chart(
            "Chart 1",
            chart_tag="lineChart",
            title="trend",
            y_axis_title="count",
            y_min=0.0,
            y_max=100.0,
            series=[
                {
                    "name": "s1",
                    "name_range": "S!$B$1",
                    "cat_range": "S!$A$1:$A$6",
                    "val_range": "S!$B$1:$B$6",
                }
            ],
            x_pt=300,
            y_pt=20,
            w_pt=240,
            h_pt=160,
        )
        out = extract(wb, mode="verbose")
        chart = out.sheets["S"].charts[0]
        assert chart.name == "Chart 1"
        assert chart.chart_type == "Line"
        assert chart.title == "trend"
        assert chart.y_axis_title == "count"
        assert chart.y_axis_range == [0.0, 100.0]
        assert (chart.l, chart.t, chart.w, chart.h) == (300, 20, 240, 160)
        ser = chart.series[0]
        assert ser.name == "s1"
        assert ser.name_range == "S!$B$1"
        assert ser.x_range == "S!$A$1:$A$6"
        assert ser.y_range == "S!$B$1:$B$6"
        assert chart.provenance == "python_ooxml"
        assert chart.confidence == 0.6

    def test_bar_direction_split(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.add_chart("c1", chart_tag="barChart", bar_dir="bar")
        sh.add_chart("c2", chart_tag="barChart", bar_dir="col")
        sh.add_chart("c3", chart_tag="pieChart")
        out = extract(wb, mode="verbose")
        assert [c.chart_type for c in out.sheets["S"].charts] == [
            "Bar",
            "Column",
            "Pie",
        ]

    def test_malformed_drawing_drops_only_that_sheet(self):
        wb = WorkbookBuilder()
        good = wb.sheet("Good")
        good.add_shape("ok", x_pt=0, y_pt=0)
        good.set(1, 0, "kept")
        bad = wb.sheet("Bad")
        bad.add_shape("broken", x_pt=0, y_pt=0)
        bad.set(1, 0, "cells survive")
        spans = wb.build_parts()
        for s in spans:
            if s["media_ref"] == "xl/drawings/drawing2.xml":
                s["text"] = "<xdr:wsDr><broken"
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook
        from exstruct_ray.ooxml.package import VirtualPackage

        package = VirtualPackage.from_spans(
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
        )
        out = extract_workbook(package, ExtractOptions(mode="verbose").resolved())
        assert len(out.sheets["Good"].shapes) == 1
        assert out.sheets["Bad"].shapes == []
        assert out.sheets["Bad"].rows[0].c == {"0": "cells survive"}


class TestAnchorVariants:
    """one/two-cell anchors resolved through sheet metrics (prefix sums)."""

    def test_one_cell_anchor_default_metrics(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        # col 2, +12700 EMU (1pt); row 3, +25400 EMU (2pt); defaults 48x15pt
        sh.add_cell_anchored_shape(
            "one", anchor="oneCell", from_marker=(2, 12700, 3, 25400),
            w_pt=100, h_pt=50,
        )
        out = extract(wb, mode="verbose")
        s = out.sheets["S"].shapes[0]
        assert (s.l, s.t) == (2 * 48 + 1, 3 * 15 + 2)
        assert (s.w, s.h) == (100, 50)

    def test_two_cell_anchor_size_from_markers(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.add_cell_anchored_shape(
            "two", anchor="twoCell", from_marker=(1, 0, 1, 0), to_marker=(4, 0, 5, 0),
        )
        out = extract(wb, mode="verbose")
        s = out.sheets["S"].shapes[0]
        assert (s.l, s.t) == (48, 15)
        assert (s.w, s.h) == (3 * 48, 4 * 15)

    def test_markers_use_explicit_col_widths_row_heights(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.col_widths[0] = 20.0   # width attr -> (20*7+5)*0.75 = 108.75pt
        sh.col_widths[1] = 10.0   # (10*7+5)*0.75 = 56.25pt
        sh.row_heights[1] = 30.0  # row 1 -> 30pt
        sh.default_row_height = 12.0
        sh.set(1, 0, "x")
        sh.add_cell_anchored_shape(
            "m", anchor="oneCell", from_marker=(2, 0, 2, 0), w_pt=10, h_pt=10,
        )
        out = extract(wb, mode="verbose")
        s = out.sheets["S"].shapes[0]
        assert s.l == int(round(108.75 + 56.25))
        assert s.t == int(round(30.0 + 12.0))

    def test_xfrm_position_preferred_when_sized(self):
        # child xfrm has full geometry -> anchor only fills missing values
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.add_cell_anchored_shape(
            "x", anchor="oneCell", from_marker=(5, 0, 5, 0),
            w_pt=60, h_pt=30, with_xfrm=True,
        )
        # with_xfrm=True emits off=(0,0) ext=(60,30)pt -> transform position
        # (0,0) wins over the anchor marker because the shape is fully sized
        out = extract(wb, mode="verbose")
        s = out.sheets["S"].shapes[0]
        assert (s.l, s.t, s.w, s.h) == (0, 0, 60, 30)
