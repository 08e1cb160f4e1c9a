"""Parity on the reference's OWN sample workbooks (its test inputs).

The goldens under /root/reference/sample were produced by COM (standard)
mode; our scope is the pure-Python light path (ADR-0010). Assertions:
  - cell rows and detected tables must match the golden EXACTLY (the cell /
    table path is mode-independent),
  - shape/chart structure matches with documented COM-vs-light deltas only:
    geometry within ±2pt (COM reports Excel's own layout, light rounds EMU),
    arrow styles from headEnd/tailEnd presence (2/None) instead of COM
    enums, chart names from cNvPr, y_axis_range only when BOTH c:min and
    c:max are explicit.

Skipped when the reference checkout isn't present (repo stays standalone).
"""

import json
from pathlib import Path

import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)


def _extract_payload(xlsx: Path, **opts):
    from exstruct_ray.api import extract
    from exstruct_ray.config import ExtractOptions
    from exstruct_ray.extract.serialize import workbook_payload

    return workbook_payload(extract(xlsx, ExtractOptions(mode="light", **opts)))


class TestBasicSample:
    @pytest.fixture(scope="class")
    def pair(self):
        mine = _extract_payload(REF / "sample/basic/sample.xlsx")
        golden = json.loads((REF / "sample/basic/sample.json").read_text())
        return mine, golden

    def test_rows_exact(self, pair):
        mine, golden = pair
        assert mine["sheets"]["Sheet1"]["rows"] == golden["sheets"]["Sheet1"]["rows"]

    def test_tables_exact(self, pair):
        mine, golden = pair
        assert (
            mine["sheets"]["Sheet1"]["table_candidates"]
            == golden["sheets"]["Sheet1"]["table_candidates"]
            == ["B3:E9"]
        )

    def test_shapes_structure(self, pair):
        """COM goldens interleave shapes/arrows in z-order; light emits
        shapes then connectors (reference light path order). Compare by
        identity: shapes on (id, text, type) ± 2pt geometry, arrows on
        resolved endpoint pairs."""
        mine, golden = pair
        ms = mine["sheets"]["Sheet1"]["shapes"]
        gs = golden["sheets"]["Sheet1"]["shapes"]
        assert len(ms) == len(gs) == 24
        m_shapes = {s["id"]: s for s in ms if s["kind"] == "shape"}
        g_shapes = {s["id"]: s for s in gs if s["kind"] == "shape"}
        assert m_shapes.keys() == g_shapes.keys()
        for sid, g in g_shapes.items():
            m = m_shapes[sid]
            assert m["text"] == g["text"]
            assert m["type"] == g["type"]
            # geometry within ±2pt of the COM-reported layout
            assert abs(m["l"] - g["l"]) <= 2 and abs(m["t"] - g["t"]) <= 2, (m, g)
        m_arrows = [s for s in ms if s["kind"] == "arrow"]
        g_arrows = [s for s in gs if s["kind"] == "arrow"]
        # Every COM-resolved endpoint pair must appear in ours; where COM
        # reports an unconnected end (None), light's nearest-box heuristic
        # legitimately fills it in (reference _resolve_connector fallback).
        from collections import Counter

        m_pairs = Counter(
            (a.get("begin_id"), a.get("end_id")) for a in m_arrows
        )
        g_resolved = Counter(
            (a.get("begin_id"), a.get("end_id"))
            for a in g_arrows
            if a.get("begin_id") is not None and a.get("end_id") is not None
        )
        for pair, count in g_resolved.items():
            assert m_pairs[pair] >= count, (pair, m_pairs)
        assert len(m_arrows) == len(g_arrows)
        for a in m_arrows:
            # light mode: arrowhead style only from headEnd/tailEnd tags
            assert a.get("end_arrow_style") == 2
            assert "begin_arrow_style" not in a

    def test_chart_structure(self, pair):
        mine, golden = pair
        mc = mine["sheets"]["Sheet1"]["charts"][0]
        gc = golden["sheets"]["Sheet1"]["charts"][0]
        assert mc["chart_type"] == gc["chart_type"] == "Line"
        assert mc["title"] == gc["title"]
        assert mc["series"] == gc["series"]
        # COM reads Excel's name ("Chart 1"); light reads cNvPr ("グラフ 1")
        assert mc["name"] == "グラフ 1"
        # the part has c:min but no c:max -> light emits no explicit range
        assert "y_axis_range" not in mc


class TestFlowchartSample:
    def test_connector_endpoints_resolved(self):
        """Mode-independent facts must match the COM golden exactly: shape
        identities (id/text/type) and every connector's resolved
        (begin_id, end_id). COM interleaves shapes/arrows in z-order and
        derives directions from live endpoints; light emits shapes-then-
        connectors with xfrm-derived directions (reference
        libreoffice_backend.py:261-343 order), so ordering/direction are
        compared structurally, not positionally."""
        mine = _extract_payload(REF / "sample/flowchart/sample-shape-connector.xlsx")
        golden = json.loads(
            (REF / "sample/flowchart/sample-shape-connector.json").read_text()
        )
        for sheet_name, gsheet in golden["sheets"].items():
            msheet = mine["sheets"][sheet_name]
            assert msheet.get("rows", []) == gsheet.get("rows", [])
            g_shapes = [s for s in gsheet.get("shapes", []) if s["kind"] == "shape"]
            g_arrows = [s for s in gsheet.get("shapes", []) if s["kind"] == "arrow"]
            m_shapes = [s for s in msheet.get("shapes", []) if s["kind"] == "shape"]
            m_arrows = [s for s in msheet.get("shapes", []) if s["kind"] == "arrow"]
            assert len(m_shapes) == len(g_shapes)
            assert len(m_arrows) == len(g_arrows)
            assert [
                (s["id"], s["text"], s.get("type")) for s in sorted(m_shapes, key=lambda s: s["id"])
            ] == [
                (s["id"], s["text"], s.get("type")) for s in sorted(g_shapes, key=lambda s: s["id"])
            ]
            # connector endpoint resolution must agree pair-for-pair
            assert sorted(
                (a.get("begin_id") or -1, a.get("end_id") or -1) for a in m_arrows
            ) == sorted((a.get("begin_id") or -1, a.get("end_id") or -1) for a in g_arrows)
            assert all(a.get("direction") for a in m_arrows)


class TestFormulaSample:
    def test_rows_and_formulas(self):
        mine = _extract_payload(
            REF / "sample/formula/formula.xlsx", include_formulas_map=True
        )
        golden = json.loads((REF / "sample/formula/formula.json").read_text())
        for sheet_name, gsheet in golden["sheets"].items():
            msheet = mine["sheets"][sheet_name]
            assert msheet.get("rows", []) == gsheet.get("rows", []), sheet_name
            if "formulas_map" in gsheet:
                assert msheet.get("formulas_map") == gsheet["formulas_map"]


class TestMergedFormsSamples:
    @pytest.mark.parametrize(
        "stem",
        [
            "forms_with_many_merged_cells/en_form_sf425/sample",
            "forms_with_many_merged_cells/ja_general_form/ja_form",
        ],
    )
    def test_rows_tables_merged(self, stem):
        """The form goldens were produced with merged-value filtering on.

        Rows, table candidates and the merged-cell SET must match exactly.
        Merged item ORDER is compared as a set: the reference's order is
        openpyxl's set-iteration order (a hash-table accident — simulating
        it reproduces the first elements then diverges on probe collisions);
        ours is the sheet-XML document order, which is deterministic and
        meaningful.
        """
        xlsx = REF / f"sample/{stem}.xlsx"
        golden_path = xlsx.with_suffix(".json")
        if not golden_path.exists():
            pytest.skip(f"no golden for {stem}")
        mine = _extract_payload(
            xlsx, include_merged_cells=True, include_merged_values_in_rows=False
        )
        golden = json.loads(golden_path.read_text())
        for sheet_name, gsheet in golden["sheets"].items():
            msheet = mine["sheets"][sheet_name]
            assert msheet.get("rows", []) == gsheet.get("rows", []), sheet_name
            if "merged_cells" in gsheet:
                assert sorted(
                    map(tuple, msheet["merged_cells"]["items"])
                ) == sorted(map(tuple, gsheet["merged_cells"]["items"])), sheet_name
                assert msheet["merged_cells"]["schema"] == gsheet["merged_cells"]["schema"]
            if "table_candidates" in gsheet:
                assert msheet.get("table_candidates", []) == gsheet.get(
                    "table_candidates", []
                ), sheet_name


class TestPrintRangesAsset:
    def test_render_asset_extracts_cleanly(self):
        """This asset is a COM render fixture (auto page breaks → 4 images);
        it has ONE sheet and no defined-name print areas, so the light path
        correctly yields rows but no print_areas."""
        mine = _extract_payload(
            REF / "tests/assets/multiple_print_ranges_4sheets.xlsx"
        )
        assert list(mine["sheets"]) == ["Sheet1"]
        sheet = mine["sheets"]["Sheet1"]
        assert len(sheet["rows"]) > 100
        assert "print_areas" not in sheet


class TestGanttSample:
    def test_rows_tables_colors_merged(self):
        """Gantt sample: rows, tables, and the colors_map must match the
        golden exactly (ordered!); merged cells compared set-wise (the
        golden predates the compressed schema and uses dict items)."""
        mine = _extract_payload(
            REF / "sample/gantt_chart/en/sample.xlsx",
            include_colors_map=True,
            include_merged_cells=True,
        )
        golden = json.loads((REF / "sample/gantt_chart/en/sample.json").read_text())
        gs = golden["sheets"]["Project Schedule"]
        ms = mine["sheets"]["Project Schedule"]
        assert ms["rows"] == gs["rows"]
        assert ms["table_candidates"] == gs["table_candidates"] == ["A6:AZ31"]
        assert ms["colors_map"] == gs["colors_map"]
        g_merged = {
            (m["r1"], m["c1"], m["r2"], m["c2"], m["v"]) for m in gs["merged_cells"]
        }
        m_merged = {tuple(item) for item in ms["merged_cells"]["items"]}
        assert m_merged == g_merged


class TestSmartArtSample:
    def test_light_mode_produces_smartart(self):
        """SmartArt trees are COM-only in the reference (core/shapes.py
        :185-305); the light path parses the xl/diagrams data parts
        directly and must reproduce the COM golden's node trees exactly
        (full parity assertions live in tests/test_smartart.py)."""
        mine = _extract_payload(REF / "sample/smartart/sample_smartart.xlsx")
        golden = json.loads(
            (REF / "sample/smartart/sample_smartart.json").read_text()
        )
        ms = mine["sheets"]["Sheet1"]["shapes"]
        gs = golden["sheets"]["Sheet1"]["shapes"]
        assert [m["nodes"] for m in ms] == [g["nodes"] for g in gs]
        assert mine["sheets"]["Sheet1"].get("rows", []) == []


class TestFastParserDifferential:
    """The regex fast scanner must agree byte-for-byte with the ElementTree
    parser on every real Excel-produced worksheet (this differential caught
    `<v xml:space="preserve">` being missed by the fast path)."""

    def test_fast_equals_et_on_real_files(self):
        from exstruct_ray.ooxml import sheet_parser as sp
        from exstruct_ray.ooxml.package import VirtualPackage
        from exstruct_ray.ooxml.styles import parse_styles
        from exstruct_ray.ooxml.workbook_parser import parse_workbook

        checked = 0
        for f in (REF / "sample").rglob("*.xlsx"):
            pkg = VirtualPackage.from_xlsx_bytes(f.read_bytes())
            info = parse_workbook(pkg)
            styles = (
                parse_styles(pkg.read_xml("xl/styles.xml"))
                if "xl/styles.xml" in pkg
                else parse_styles(None)
            )
            shared = sp.parse_shared_strings(pkg)
            for ref in info.sheets:
                if ref.path not in pkg:
                    continue
                raw = pkg.read_text(ref.path)
                fast = sp._parse_sheet_fast(
                    pkg, ref.path, ref.name, raw, shared, styles
                )
                pkg2 = VirtualPackage.from_xlsx_bytes(f.read_bytes())
                et = sp.parse_sheet(
                    pkg2, ref.path, ref.name, shared, styles, allow_fast_path=False
                )
                if fast is None:
                    continue  # legitimate fallback
                checked += 1
                assert dict(fast.cells) == dict(et.cells), (f.name, ref.name)
                assert fast.merged_refs == et.merged_refs
                assert dict(fast.hyperlinks) == dict(et.hyperlinks)
                assert fast.table_part_rids == et.table_part_rids
                assert (fast.min_row, fast.min_col, fast.max_row, fast.max_col) == (
                    et.min_row,
                    et.min_col,
                    et.max_row,
                    et.max_col,
                )
        assert checked >= 5
