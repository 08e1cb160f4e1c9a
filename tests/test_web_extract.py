"""Web-extraction pipelines: HTML boilerplate strip (DOM link-density
heuristics) and PDF layout parse — the north-rule web components."""

import duckdb
import pandas as pd
import pytest

from exstruct_ray.extract.html_content import (
    Block,
    extract_main_content,
    segment_blocks,
    synth_page,
)
from exstruct_ray.extract.pdf_text import (
    layout_lines,
    pdf_extract_text,
    text_to_pdf_bytes,
)

SF_DIR = "/root/testdata/sf0.001"


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    from exstruct_ray.queries import ORACLE_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


class TestLinkDensityClassifier:
    def test_link_free_block_is_content(self):
        b = Block(parts=["real article text here"], total_chars=22, anchor_chars=0)
        assert b.is_content()

    def test_link_dense_block_is_boilerplate(self):
        b = Block(parts=["Home About Contact"], total_chars=18, anchor_chars=18)
        assert not b.is_content()

    def test_threshold_boundary(self):
        # exactly one third inside anchors still passes (<=)
        b = Block(parts=["abc" * 3], total_chars=9, anchor_chars=3)
        assert b.is_content()
        b2 = Block(parts=["abc" * 3], total_chars=9, anchor_chars=4)
        assert not b2.is_content()

    def test_empty_block_is_not_content(self):
        assert not Block().is_content()


class TestSegmentation:
    def test_unknown_tags_do_not_break_blocks(self):
        # classifier must not depend on generator markup: custom tags
        # are inline, text around them stays one block
        title, blocks = segment_blocks(
            "<html><body><p>alpha <custom-x>beta</custom-x> gamma</p></body></html>"
        )
        texts = [b.text() for b in blocks]
        assert texts == ["alpha beta gamma"]

    def test_script_style_head_invisible(self):
        _, blocks = segment_blocks(
            "<html><head><style>p{}</style><script>var x=1;</script></head>"
            "<body><p>visible</p></body></html>"
        )
        assert [b.text() for b in blocks] == ["visible"]

    def test_title_extracted_separately(self):
        title, blocks = segment_blocks(
            "<html><head><title>My  Title</title></head><body><p>x</p></body></html>"
        )
        assert title == "My Title"
        assert [b.text() for b in blocks] == ["x"]

    def test_malformed_html_degrades_not_raises(self):
        # truncated tag at EOF: degrade to collected text, never raise
        res = extract_main_content("<p>ok <a href=")
        assert res["main_text"].startswith("ok")

    def test_entities_decode(self):
        _, blocks = segment_blocks("<p>a &amp; b &lt;c&gt;</p>")
        assert blocks[0].text() == "a & b <c>"

    def test_nav_dropped_by_density_not_tag_name(self):
        # same links inside a plain <div> — still dropped
        res = extract_main_content(
            '<div><a href="/">Home</a> <a href="/a">About</a></div>'
            "<p>the actual article body text</p>"
        )
        assert res["main_text"] == "the actual article body text"
        assert res["n_boilerplate_blocks"] == 1


class TestSynthRoundTrip:
    @pytest.mark.parametrize(
        "doc_id,text",
        [
            (0, "plain words " * 30),
            (1, ""),
            (2, "one"),
            (3, "has <angle> & amp 'quotes' \"here\""),
            (5, "x " * 200),  # multi-paragraph + tail ad (doc 5 % 5 == 0)
            (6, "y " * 90),  # mid-article ad (even, >1 para)
        ],
    )
    def test_main_text_recovered_exactly(self, doc_id, text):
        from exstruct_ray.extract.textdoc import normalize_text

        res = extract_main_content(synth_page(doc_id, text))
        assert res["main_text"] == normalize_text(text)
        assert res["title"] == f"Doc {doc_id}"

    def test_boilerplate_counted(self):
        # doc 6, 90 words: nav + linked title + 3 sidebar items + mid ad
        # + footer = 1+1+3+1+1 = 7
        res = extract_main_content(synth_page(6, "y " * 90))
        assert res["n_content_blocks"] == 3
        assert res["n_boilerplate_blocks"] == 7


class TestPdfWriterParser:
    def test_empty_doc_one_blank_page(self):
        res = pdf_extract_text(text_to_pdf_bytes(1, ""))
        assert res == {"text": "", "n_pages": 1}

    def test_escapes_round_trip(self):
        text = "paren (x) back\\slash close ) open ("
        res = pdf_extract_text(text_to_pdf_bytes(0, text))
        assert res["text"] == "paren (x) back\\slash close ) open ("

    def test_hex_and_tj_lines(self):
        # 3+ lines forces at least one hex/TJ line (every idx % 3 == 2)
        text = " ".join(f"w{i}" for i in range(30))
        res = pdf_extract_text(text_to_pdf_bytes(0, text))
        assert res["text"] == text

    def test_stream_order_is_shuffled_but_reading_order_recovered(self):
        text = " ".join(f"w{i}" for i in range(80))  # 10 lines
        pdf = text_to_pdf_bytes(7, text)  # rotation 7 % 10 != 0
        # the raw stream must NOT contain the lines in reading order:
        # rotation starts emission at line 7, so line 7 appears in the
        # byte stream BEFORE line 0 …
        lines = layout_lines(text)
        body = pdf.decode("latin-1", "replace")
        assert body.find(lines[7][:12]) < body.find(lines[0][:12])
        # … yet the parser reconstructs it
        assert pdf_extract_text(pdf)["text"] == text

    def test_multi_page(self):
        words = " ".join(f"t{i}" for i in range(8 * 36 + 8))  # 37 lines
        res = pdf_extract_text(text_to_pdf_bytes(3, words))
        assert res["n_pages"] == 2
        assert res["text"] == words


class TestQueriesVsOracle:
    def test_html_main_content(self, ray_session):
        from exstruct_ray.queries import doc_html_main_content

        got = doc_html_main_content(SF_DIR)
        want = _oracle("doc_html_main_content", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_pdf_layout_text(self, ray_session):
        from exstruct_ray.queries import doc_pdf_layout_text

        got = doc_pdf_layout_text(SF_DIR)
        want = _oracle("doc_pdf_layout_text", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


class TestDensityStrategyInPipeline:
    def test_textdoc_html_density_matches_oracle(self, ray_session):
        from exstruct_ray.queries import textdoc_html_density

        got = textdoc_html_density(SF_DIR)
        want = _oracle("textdoc_html_density", SF_DIR)
        # the literal 0/1 offsets come back int32 from DuckDB (same as the
        # driver-green textdoc_extract oracle) — values must match exactly
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False,
        )

    def test_visible_strategy_keeps_nav_density_drops_it(self):
        from exstruct_ray.extract.textdoc import extract_interleaved_spans

        page = (
            '<html><body><nav><a href="/">Home</a> <a href="/a">About</a></nav>'
            "<p>body text of the page</p></body></html>"
        )
        visible = extract_interleaved_spans(["html"], [page], [""])
        dense = extract_interleaved_spans(
            ["html"], [page], [""], html_strategy="density"
        )
        # visible mode structurally skips <nav>; density mode needs no tag
        # names — but on a <div>-wrapped nav only density still strips it
        assert visible[0][1] == "body text of the page"
        assert dense[0][1] == "body text of the page"
        div_page = page.replace("<nav>", "<div>").replace("</nav>", "</div>")
        visible2 = extract_interleaved_spans(["html"], [div_page], [""])
        dense2 = extract_interleaved_spans(
            ["html"], [div_page], [""], html_strategy="density"
        )
        assert "Home" in visible2[0][1]  # tag-skip can't know a div is nav
        assert dense2[0][1] == "body text of the page"

    def test_bad_strategy_rejected(self):
        import pytest as _pytest

        from exstruct_ray.config import ExtractOptions

        with _pytest.raises(ValueError):
            ExtractOptions(html_strategy="nope").resolved()
