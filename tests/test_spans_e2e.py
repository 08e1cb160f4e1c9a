"""Span-sequence contract tests: ordering, offsets, determinism, xlsx parity."""

import io
import zipfile

from exstruct_ray.config import ExtractOptions
from exstruct_ray.datagen.builder import BOX, WorkbookBuilder
from exstruct_ray.datagen.corpus import build_document
from exstruct_ray.extract.document import extract_document_spans
from exstruct_ray.ooxml.package import VirtualPackage


def run(spans_in, **opts):
    return extract_document_spans(
        [s["kind"] for s in spans_in],
        [s["text"] for s in spans_in],
        [s["media_ref"] for s in spans_in],
        ExtractOptions(**opts) if opts else None,
    )


class TestSpanContract:
    def test_emission_order_and_dense_offsets(self):
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.fill_block(1, 0, [["h1", "h2"], [1, 2], [3, 4]], style=BOX)
        sh.add_shape("s", x_pt=0, y_pt=0)
        sh.add_connector(10, 10, 20, 20)
        sh.add_chart("c", chart_tag="lineChart")
        sh.merge("E1:F2")
        sh.set(1, 4, "m")
        sh.set(2, 0, 9, formula="1+8")
        wb.print_area("S", "$A$1:$F$10")
        spans = run(
            wb.build_parts(),
            mode="verbose",
            include_merged_cells=True,
        )
        kinds = [s.kind for s in spans]
        assert kinds == [
            "cell_row",
            "cell_row",
            "cell_row",
            "shape",
            "arrow",
            "chart",
            "table",
            "merged",
            "print_area",
            "formulas_map",
        ]
        assert [s.offset for s in spans] == list(range(len(spans)))
        assert all(s.media_ref == "S" for s in spans)

    def test_multi_sheet_order(self):
        wb = WorkbookBuilder()
        wb.sheet("B").set(1, 0, 1)
        wb.sheet("A").set(1, 0, 2)
        spans = run(wb.build_parts())
        assert [s.media_ref for s in spans] == ["B", "A"]

    def test_determinism(self):
        doc1 = build_document(7, seed=42)
        doc2 = build_document(7, seed=42)
        assert doc1 == doc2
        out1 = run(doc1["spans"])
        out2 = run(doc2["spans"])
        assert out1 == out2

    def test_all_families_extract_without_errors(self):
        for idx in range(20):
            doc = build_document(idx, seed=42)
            out = run(doc["spans"])
            assert all(s.kind != "error" for s in out), (idx, out)

    def test_poison_doc_yields_error_span(self):
        out = extract_document_spans(["sheet_xml"], [None], ["xl/workbook.xml"])
        # Missing workbook gives empty output, not a crash; a truly broken
        # package (non-text types) degrades to an error span.
        assert isinstance(out, list)

    def test_columnar_rollback_on_mid_emission_failure(self, monkeypatch):
        """A failure AFTER partial span appends must roll the shared
        buffers back to one error span — the count/buffer desync would
        otherwise corrupt the whole Arrow block (degrade-in-place)."""
        from exstruct_ray.extract import document as doc_mod

        def exploding(workbook, opts, ks, ts, rs):
            ks.append("cell_row")
            ts.append("partial junk")
            rs.append("S")
            raise RuntimeError("mid-emission failure")

        monkeypatch.setattr(doc_mod, "_workbook_spans_into", exploding)
        good = build_document(0, seed=42)["spans"]
        ks: list[str] = ["pre"]
        ts: list[str] = ["pre"]
        rs: list[str] = ["pre"]
        n_spans, n_err = doc_mod.extract_document_spans_columnar(
            [s["kind"] for s in good],
            [s["text"] for s in good],
            [s["media_ref"] for s in good],
            None,
            ks, ts, rs,
        )
        assert (n_spans, n_err) == (1, 1)
        # prior docs' buffers untouched; exactly one error span appended
        assert ks == ["pre", "error"]
        assert ts[0] == "pre" and ts[1].startswith("extract failed:")
        assert rs == ["pre", ""]


class TestXlsxBytesParity:
    def test_zip_and_span_inputs_agree(self):
        """The same workbook via .xlsx bytes and via spans must match."""
        wb = WorkbookBuilder()
        sh = wb.sheet("S")
        sh.fill_block(2, 1, [["h1", "h2"], [10, 20]], style=BOX)
        sh.merge("D1:E1")
        sh.set(1, 3, "m")
        parts = wb.build_parts()

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for p in parts:
                zf.writestr(p["media_ref"], p["text"])
        package = VirtualPackage.from_xlsx_bytes(buf.getvalue())

        from exstruct_ray.extract.document import extract_workbook, workbook_to_spans

        opts = ExtractOptions(mode="verbose").resolved()
        via_zip = workbook_to_spans(extract_workbook(package, opts), opts)
        via_spans = extract_document_spans(
            [s["kind"] for s in parts],
            [s["text"] for s in parts],
            [s["media_ref"] for s in parts],
            opts,
        )
        assert via_zip == via_spans


class TestParserEdgeCases:
    def test_self_closing_sheet_data(self):
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook
        from exstruct_ray.ooxml.package import VirtualPackage

        main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
        rel = "http://schemas.openxmlformats.org/package/2006/relationships"
        pkg = VirtualPackage(
            {
                "xl/workbook.xml": (
                    f'<workbook xmlns="{main}" xmlns:r="{r}"><sheets>'
                    f'<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
                ),
                "xl/_rels/workbook.xml.rels": (
                    f'<Relationships xmlns="{rel}"><Relationship Id="rId1" '
                    f'Type="{r}/worksheet" Target="worksheets/sheet1.xml"/></Relationships>'
                ),
                "xl/worksheets/sheet1.xml": f'<worksheet xmlns="{main}"><sheetData/></worksheet>',
            }
        )
        out = extract_workbook(pkg, ExtractOptions().resolved())
        assert out.sheets["S"].rows == []

    def test_workbook_without_rels_yields_no_sheets(self):
        from exstruct_ray.config import ExtractOptions
        from exstruct_ray.extract.document import extract_workbook
        from exstruct_ray.ooxml.package import VirtualPackage

        main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        r = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
        pkg = VirtualPackage(
            {
                "xl/workbook.xml": (
                    f'<workbook xmlns="{main}" xmlns:r="{r}"><sheets>'
                    f'<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
                )
            }
        )
        out = extract_workbook(pkg, ExtractOptions().resolved())
        assert out.sheets == {}

    def test_lazy_public_exports(self):
        import exstruct_ray

        assert callable(exstruct_ray.extract_spans)
        assert callable(exstruct_ray.build_extraction_pipeline)
        assert exstruct_ray.ExtractEngine.from_defaults() is not None
        try:
            exstruct_ray.nope
            raise AssertionError("should have raised")
        except AttributeError:
            pass
