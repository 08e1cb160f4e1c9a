"""C4 line-level cleaning rules (Raffel et al. 2020 §2.2).

The sf corpora exercise the rules only through the deterministic page
synthesis (oracle-verified end to end), so every individual rule is
pinned here on crafted pages, plus a synthesis/oracle structural parity
check on a crafted frame via DuckDB.
"""

import duckdb
import pandas as pd

from exstruct_ray.ops.text import c4_line_filter_batch
from exstruct_ray.queries import ORACLE_SQL, _synth_c4_page


def _one(text):
    return c4_line_filter_batch(pd.Series([text], dtype=object)).iloc[0]


GOOD = [
    "first valid sentence with enough words.",
    "second valid sentence with enough words!",
    'third valid sentence with enough words"',
]


class TestLineRules:
    def test_terminal_punctuation_required(self):
        row = _one("\n".join(GOOD + ["no terminal punctuation on this line"]))
        assert row["n_lines"] == 4
        assert row["n_kept"] == 3
        assert row["keep"] == 1
        assert row["clean_text"] == "\n".join(GOOD)

    def test_question_bang_quote_all_terminal(self):
        # ., !, ? and " all count as sentence-enders
        row = _one("\n".join(GOOD + ["does a question mark count here?"]))
        assert row["n_kept"] == 4

    def test_min_five_words(self):
        row = _one("\n".join(GOOD + ["too short."]))
        assert row["n_kept"] == 3
        # exactly five words passes
        row = _one("\n".join(GOOD + ["five words right here now."]))
        assert row["n_kept"] == 4

    def test_javascript_line_dropped_case_insensitive(self):
        row = _one(
            "\n".join(GOOD + ["please enable JavaScript to continue here."])
        )
        assert row["n_kept"] == 3

    def test_lines_are_stripped_before_checks(self):
        row = _one("   " + GOOD[0] + "   \n" + GOOD[1] + "\n" + GOOD[2])
        assert row["n_kept"] == 3
        assert row["clean_text"].startswith("first valid")


class TestPageRules:
    def test_lorem_ipsum_drops_page(self):
        row = _one("\n".join(GOOD + ["Lorem Ipsum dolor sit amet today."]))
        assert row["n_kept"] == 4  # the line itself passes line rules
        assert row["keep"] == 0
        assert row["clean_text"] == ""

    def test_curly_brace_drops_page(self):
        row = _one("\n".join(GOOD + ["function f() { return 1; } done."]))
        assert row["keep"] == 0
        assert row["clean_text"] == ""

    def test_fewer_than_three_kept_lines_drops_page(self):
        row = _one("\n".join(GOOD[:2]))
        assert row["n_kept"] == 2
        assert row["keep"] == 0
        assert row["clean_text"] == ""

    def test_empty_and_none_pages(self):
        out = c4_line_filter_batch(pd.Series(["", None], dtype=object))
        assert list(out["keep"]) == [0, 0]
        assert list(out["clean_text"]) == ["", ""]

    def test_empty_batch(self):
        out = c4_line_filter_batch(pd.Series([], dtype=object))
        assert len(out) == 0


class TestSynthOracleParity:
    """The SQL oracle re-derives the synth page's fate structurally; pin
    that derivation against the real filter on a crafted frame covering
    the branch matrix (brace doc, empty doc, short-tail chunk, all three
    punctuation phases)."""

    def test_parity_on_crafted_frame(self):
        docs = pd.DataFrame(
            {
                "doc_id": pd.Series([0, 1, 2, 3, 7, 14], dtype="int64"),
                "text": [
                    " ".join(f"w{i}" for i in range(30)),  # brace doc (id%7=0)
                    "",  # empty
                    " ".join(f"w{i}" for i in range(9)),  # 2 chunks, short tail
                    " ".join(f"w{i}" for i in range(64)),  # 8 full chunks
                    " ".join(f"w{i}" for i in range(12)),  # brace doc again
                    "one two",  # single short chunk only
                ],
            }
        )
        pages = pd.Series(
            [
                _synth_c4_page(int(d), t)
                for d, t in zip(docs["doc_id"], docs["text"])
            ],
            dtype=object,
        )
        engine = c4_line_filter_batch(pages)
        engine.insert(0, "doc_id", docs["doc_id"].to_numpy())

        con = duckdb.connect()
        con.register("documents", docs)
        sql = con.execute(ORACLE_SQL["doc_c4_filters"]).df()
        for col in ("clean_text", "n_lines", "n_kept", "keep"):
            assert list(engine[col]) == list(sql[col]), col


from hypothesis import given, settings
from hypothesis import strategies as st


class TestC4Properties:
    """Structural invariants of the line filter on arbitrary pages."""

    @settings(max_examples=80, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet='abc JX.!?"{\n\t',
                max_size=60,
            ),
            max_size=6,
        )
    )
    def test_invariants(self, pages):
        s = pd.Series(pages, dtype=object)
        out = c4_line_filter_batch(s)
        assert len(out) == len(pages)
        for page, row in zip(pages, out.itertuples()):
            lines = [ln.strip() for ln in (page or "").split("\n")]
            assert row.n_lines == len(lines)
            assert 0 <= row.n_kept <= row.n_lines
            if row.keep:
                kept = row.clean_text.split("\n")
                assert len(kept) == row.n_kept >= 3
                for ln in kept:
                    # every surviving line passes all three line rules
                    assert ln and ln[-1] in '.!?"'
                    assert len(ln.split()) >= 5
                    assert "javascript" not in ln.lower()
                    assert ln in lines
                assert "{" not in (page or "")
                assert "lorem ipsum" not in (page or "").lower()
            else:
                assert row.clean_text == ""
