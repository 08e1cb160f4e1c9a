"""Interleaved text + media document extraction tests."""

import pandas as pd

from exstruct_ray.config import ExtractOptions
from exstruct_ray.extract.document import extract_document_spans
from exstruct_ray.extract.textdoc import (
    extract_interleaved_spans,
    html_main_text,
    normalize_text,
)


class TestNormalization:
    def test_whitespace_collapse(self):
        assert normalize_text("  a\t b\n\nc  ") == "a b c"
        assert normalize_text("") == ""
        assert normalize_text("\n\t ") == ""


class TestHtmlMainText:
    def test_boilerplate_stripped(self):
        html = """<!DOCTYPE html><html><head><title>T</title>
        <style>body { color: red }</style>
        <script>var x = "hidden";</script></head>
        <body><nav>Menu Home About</nav>
        <header>Site Header</header>
        <p>Main   paragraph one.</p>
        <div>And <b>bold</b> text&amp;entity.</div>
        <footer>Copyright footer</footer></body></html>"""
        out = html_main_text(html)
        assert out == "Main paragraph one. And bold text&entity."
        assert "hidden" not in out and "Menu" not in out
        assert "Copyright" not in out

    def test_malformed_html_degrades(self):
        assert "visible" in html_main_text("<p>visible <b>oops")


class TestInterleavedSpans:
    def test_text_media_html_mix(self):
        spans = extract_interleaved_spans(
            ["text", "media", "html", ""],
            ["  hello \n world ", "", "<html><body><p>Hi</p></body></html>", "plain"],
            ["", "media/a.png", "", ""],
        )
        assert spans == [
            ("text", "hello world", "", 0),
            ("media", "", "media/a.png", 1),
            ("text", "Hi", "", 2),
            ("text", "plain", "", 3),
        ]

    def test_html_sniffed_from_content(self):
        spans = extract_interleaved_spans(
            ["text"], ["<!doctype html><body><p>Sniffed</p>"], [""]
        )
        assert spans == [("text", "Sniffed", "", 0)]


class TestPipelineRouting:
    def test_non_ooxml_doc_routes_to_text_path(self):
        spans = extract_document_spans(
            ["text", "media"],
            ["Some  document body.", ""],
            ["", "media/img.png"],
            ExtractOptions().resolved(),
        )
        assert [(s.kind, s.text, s.media_ref, s.offset) for s in spans] == [
            ("text", "Some document body.", "", 0),
            ("media", "", "media/img.png", 1),
        ]

    def test_ooxml_doc_still_routes_to_workbook_path(self):
        from exstruct_ray.datagen.builder import WorkbookBuilder

        wb = WorkbookBuilder()
        wb.sheet("S").set(1, 0, "v")
        parts = wb.build_parts()
        spans = extract_document_spans(
            [p["kind"] for p in parts],
            [p["text"] for p in parts],
            [p["media_ref"] for p in parts],
            ExtractOptions().resolved(),
        )
        assert any(s.kind == "cell_row" for s in spans)


class TestCorruptBundleRouting:
    def test_partial_ooxml_bundle_is_error_not_text(self):
        """xl/ parts without workbook.xml = corrupt bundle → error span,
        never silently reclassified as a text document."""
        spans = extract_document_spans(
            ["sheet_xml"],
            ["<worksheet>garbage"],
            ["xl/worksheets/sheet1.xml"],
            ExtractOptions().resolved(),
        )
        assert len(spans) == 1 and spans[0].kind == "error"
        assert "workbook.xml" in spans[0].text


class TestTextdocMediaBalance:
    def test_thresholds_and_oracle(self, ray_session, tmp_path):
        import duckdb

        from exstruct_ray.queries import (
            ORACLE_SQL,
            textdoc_media_balance,
        )

        texts = [
            "x " * 200,          # doc 0: media (id%3==0), 399 chars -> keep
            "short text here",   # doc 1: no media, 15 chars -> drop (<150)
            "y " * 100,          # doc 2: no media, 199 chars -> keep
            "z " * 100,          # doc 3: media, 199 chars -> drop (<300/media)
        ]
        frame = pd.DataFrame(
            {"doc_id": range(4), "text": texts, "lang": "en",
             "source": "t", "n_chars": [len(t) for t in texts]}
        )
        frame.to_parquet(tmp_path / "documents.parquet")
        out = textdoc_media_balance(str(tmp_path))
        by = out.set_index("doc_id")
        assert by.loc["0", "n_media"] == 1 and by.loc["0", "keep"] == 1
        assert by.loc["1", "keep"] == 0
        assert by.loc["2", "keep"] == 1
        assert by.loc["3", "n_media"] == 1 and by.loc["3", "keep"] == 0

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["textdoc_media_balance"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
