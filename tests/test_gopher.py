"""Gopher-style repetition/quality signal tests.

The synthetic corpus is single-line, so the duplicate-line, bullet, and
ellipsis paths are exercised here with crafted multi-line documents —
including a DuckDB cross-check of the generated oracle SQL on the same
crafted frame (the sf corpora never trip those branches).
"""

import duckdb
import pandas as pd
import pytest

from exstruct_ray.ops.text import gopher_signals_batch


def _signals(texts):
    batch = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": pd.Series(texts, dtype="object")}
    )
    return gopher_signals_batch(batch)


class TestGopherSignals:
    def test_clean_doc_keeps(self):
        out = _signals(["a plain sentence with several distinct words here"])
        row = out.iloc[0]
        assert row["n_lines"] == 1
        assert row["n_dup_lines"] == 0
        assert row["dup_line_chars"] == 0
        assert row["n_bullet_lines"] == 0
        assert row["n_ellipsis_lines"] == 0
        assert row["keep"] == 1

    def test_duplicate_lines_counted_with_all_occurrences(self):
        text = "same line\nsame line\nsame line\nunique one"
        row = _signals([text]).iloc[0]
        assert row["n_lines"] == 4
        # all 3 occurrences of the duplicated value count
        assert row["n_dup_lines"] == 3
        assert row["dup_line_chars"] == 3 * len("same line")
        # 3/4 duplicate lines >= 0.30 threshold -> rejected
        assert row["keep"] == 0

    def test_empty_lines_not_duplicates_but_count_as_lines(self):
        text = "a\n\n\n\nb"
        row = _signals([text]).iloc[0]
        assert row["n_lines"] == 5
        assert row["n_dup_lines"] == 0

    def test_top2gram_coverage(self):
        # "spam ham" occurs 3 times (8 chars) in a 29-char doc -> 24/29 > 0.2
        text = "spam ham spam ham spam ham x"
        row = _signals([text]).iloc[0]
        # overlapping word positions: grams are (spam,ham) x3 and (ham,spam) x2
        assert row["top2gram_chars"] == 3 * len("spam ham")
        assert row["keep"] == 0

    def test_top2gram_tiebreak_lexicographic(self):
        # "b c" and "a b" both occur once; tie broken by smallest gram
        row = _signals(["a b c"]).iloc[0]
        assert row["top2gram_chars"] == 1 * len("a b")

    def test_bullet_and_ellipsis_lines(self):
        text = "- item one\n* item two\nplain\nto be continued...\nor this…"
        row = _signals([text]).iloc[0]
        assert row["n_bullet_lines"] == 2
        assert row["n_ellipsis_lines"] == 2
        # 2/5 ellipsis lines >= 0.30? 2*10=20 < 5*3=15 is False -> reject
        assert row["keep"] == 0

    def test_empty_doc_rejected(self):
        row = _signals([""]).iloc[0]
        assert row["n_lines"] == 1
        assert row["keep"] == 0  # 0*10 < 0*2 is false: no content signal

    def test_mostly_bullets_rejected(self):
        text = "\n".join(["- a", "- b", "- c", "- d", "- e", "- f", "- g",
                          "- h", "- i", "- j"])
        row = _signals([text]).iloc[0]
        assert row["n_bullet_lines"] == 10
        assert row["keep"] == 0


class TestGopherOracleParity:
    def test_crafted_docs_match_sql(self, tmp_path):
        texts = [
            "a plain sentence with several distinct words here",
            "same line\nsame line\nsame line\nunique one",
            "spam ham spam ham spam ham x",
            "- item one\n* item two\nplain\nto be continued...\nor this…",
            "a\n\n\n\nb",
            "",
            "one two",
            "tab\tseparated words\ttab separated again",
        ]
        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "lang": "en",
             "source": "t", "n_chars": [len(t) for t in texts]}
        )
        path = tmp_path / "documents.parquet"
        frame.to_parquet(path)

        from exstruct_ray.queries import ORACLE_SQL

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        sql_df = (
            con.execute(ORACLE_SQL["doc_gopher_quality"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ray_df = (
            gopher_signals_batch(frame[["doc_id", "text"]])
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            ray_df[sorted(ray_df.columns)],
            sql_df[sorted(sql_df.columns)],
            check_dtype=False,
        )
