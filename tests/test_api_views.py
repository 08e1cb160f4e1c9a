"""Engine facade, print-area views, serialization, SERIES tokenizer tests."""

import io
import json
import zipfile

from exstruct_ray.api import ExtractEngine, extract, extract_spans
from exstruct_ray.config import ExtractOptions
from exstruct_ray.datagen.builder import BOX, WorkbookBuilder
from exstruct_ray.extract.serialize import serialize_workbook
from exstruct_ray.extract.views import build_print_area_views
from exstruct_ray.functions.series import parse_series_formula


def _xlsx_bytes(wb: WorkbookBuilder) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for p in wb.build_parts():
            zf.writestr(p["media_ref"], p["text"])
    return buf.getvalue()


class TestEngineFacade:
    def _wb(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.fill_block(1, 0, [["h1", "h2"], [1, 2], [3, 4]], style=BOX)
        sh.add_shape("box", x_pt=10, y_pt=10)
        wb.print_area("S", "$A$1:$C$5")
        return wb

    def test_extract_from_bytes_and_spans_agree(self):
        wb = self._wb()
        via_bytes = extract(_xlsx_bytes(wb))
        via_spans = extract(wb.build_parts())
        assert via_bytes.sheets.keys() == via_spans.sheets.keys()
        s1, s2 = via_bytes.sheets["S"], via_spans.sheets["S"]
        assert [r.c for r in s1.rows] == [r.c for r in s2.rows]
        assert s1.table_candidates == s2.table_candidates

    def test_engine_process_exports(self, tmp_path):
        engine = ExtractEngine(ExtractOptions(mode="verbose"))
        out = tmp_path / "wb.json"
        workbook = engine.process(
            self._wb().build_parts(),
            out,
            sheets_dir=tmp_path / "sheets",
            print_areas_dir=tmp_path / "areas",
        )
        payload = json.loads(out.read_text())
        assert payload["sheets"]["S"]["rows"][0]["c"] == {"0": "h1", "1": "h2"}
        assert (tmp_path / "sheets" / "S.json").exists()
        area_files = list((tmp_path / "areas").glob("*.json"))
        assert len(area_files) == 1
        assert workbook.sheets["S"].table_candidates == ["A1:B3"]

    def test_serialize_strips_backend_metadata_by_default(self):
        wb = self._wb()
        workbook = extract(wb.build_parts(), ExtractOptions(mode="verbose"))
        text = serialize_workbook(workbook)
        assert "provenance" not in text
        text_meta = serialize_workbook(workbook, include_backend_metadata=True)
        assert '"provenance": "python_ooxml"' in text_meta

    def test_extract_spans_helper(self):
        spans = extract_spans(self._wb().build_parts())
        assert spans[0].kind == "cell_row"
        assert [s.offset for s in spans] == list(range(len(spans)))


class TestPrintAreaViews:
    def test_view_slicing_and_normalize(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.fill_block(1, 0, [["a", "b", "c", "d"]] * 6)
        sh.set(10, 0, "outside")
        wb.print_area("S", "$B$2:$C$4")
        workbook = extract(wb.build_parts())
        sheet = workbook.sheets["S"]
        views = build_print_area_views("book", "S", sheet)
        assert len(views) == 1
        view = views[0]
        assert [r.r for r in view.rows] == [2, 3, 4]
        assert all(set(r.c) == {"1", "2"} for r in view.rows)
        norm = build_print_area_views("book", "S", sheet, normalize=True)[0]
        assert [r.r for r in norm.rows] == [0, 1, 2]
        assert all(set(r.c) == {"0", "1"} for r in norm.rows)

    def test_shape_overlap_and_point_fallback(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.set(1, 0, "x")
        # area B2:C4 in px: l=64, t=20, r=192, b=80 (64x20 px cells)
        sh.add_shape("inside", x_pt=100, y_pt=40, w_pt=20, h_pt=10)
        sh.add_shape("outside", x_pt=500, y_pt=400, w_pt=20, h_pt=10)
        wb.print_area("S", "$B$2:$C$4")
        workbook = extract(wb.build_parts(), ExtractOptions(mode="verbose"))
        views = build_print_area_views("b", "S", workbook.sheets["S"])
        names = [s.text for s in views[0].shapes]
        assert names == ["inside"]
        # size-stripped shapes fall back to point containment
        light = extract(wb.build_parts())  # light mode strips sizes
        views2 = build_print_area_views("b", "S", light.sheets["S"])
        assert [s.text for s in views2[0].shapes] == ["inside"]


class TestSeriesFormula:
    def test_basic(self):
        out = parse_series_formula('=SERIES("My name",Sheet1!$A$1:$A$5,Sheet1!$B$1:$B$5,1)')
        assert out == {
            "name_range": None,
            "x_range": "Sheet1!$A$1:$A$5",
            "y_range": "Sheet1!$B$1:$B$5",
            "plot_order": "1",
            "bubble_size_range": None,
            "name_literal": "My name",
        }

    def test_name_range_and_empty_args(self):
        out = parse_series_formula("=SERIES(Sheet1!$B$1,,Sheet1!$B$2:$B$9,1)")
        assert out["name_range"] == "Sheet1!$B$1"
        assert out["name_literal"] is None
        assert out["x_range"] is None
        assert out["y_range"] == "Sheet1!$B$2:$B$9"

    def test_semicolon_locale_and_braces(self):
        out = parse_series_formula("=SERIES(;{1;2;3};Sheet1!$B$1:$B$3;1)")
        assert out["x_range"] == "{1;2;3}"
        assert out["y_range"] == "Sheet1!$B$1:$B$3"

    def test_quoted_separator_and_escape(self):
        out = parse_series_formula('=SERIES("a,""b",X!$A$1:$A$2,X!$B$1:$B$2,1)')
        assert out["name_literal"] == 'a,"b'
        assert out["x_range"] == "X!$A$1:$A$2"

    def test_invalid(self):
        assert parse_series_formula("=SUM(A1)") is None
        assert parse_series_formula("=SERIES(unclosed") is None
        assert parse_series_formula("") is None
