"""Duplicated word-n-gram span (ExactSubstr analogue) tests."""

import duckdb
import pandas as pd
import pytest

from exstruct_ray.ops.dedup import duplicated_ngram_spans


def _run(texts, ray_session, n=5):
    import ray.data

    frame = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": pd.Series(texts, dtype="object")}
    )
    out = duplicated_ngram_spans(
        ray.data.from_pandas(frame), n=n
    ).to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame(columns=["doc_id", "start_word", "end_word"])
    return out.sort_values(["doc_id", "start_word"]).reset_index(drop=True)


class TestDuplicatedSpans:
    def test_cross_doc_phrase_found_in_both(self, ray_session):
        shared = "the quick brown fox jumps"
        out = _run(
            [
                f"alpha beta {shared} gamma delta",
                f"one two three {shared} four",
                "entirely different words everywhere here now",
            ],
            ray_session,
        )
        # doc 0: words 2..6 duplicated -> [2, 7); doc 1: words 3..7 -> [3, 8)
        expect = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "start_word": [2, 3],
                "end_word": [7, 8],
            }
        )
        pd.testing.assert_frame_equal(
            out.astype("int64"), expect.astype("int64")
        )

    def test_within_doc_repeat_merges_overlapping_grams(self, ray_session):
        # a ten-word doc that repeats its first five words: every gram in
        # the repeated region is duplicated; intervals merge into one span
        text = "a b c d e a b c d e"
        out = _run([text], ray_session)
        assert len(out) == 1
        assert out.iloc[0]["start_word"] == 0
        assert out.iloc[0]["end_word"] == 10

    def test_short_docs_skipped(self, ray_session):
        out = _run(["one two three four", "one two three four"], ray_session)
        assert len(out) == 0  # < 5 words -> no grams at all

    def test_no_duplicates_no_rows(self, ray_session):
        out = _run(
            ["completely unique sentence number one here",
             "another entirely distinct set of words"],
            ray_session,
        )
        assert len(out) == 0

    def test_matches_sql_oracle_on_crafted_corpus(
        self, ray_session, tmp_path
    ):
        texts = [
            "alpha beta the quick brown fox jumps gamma delta",
            "one two three the quick brown fox jumps four",
            "a b c d e a b c d e",
            "short words only",
            "TAB\tsplit the quick brown fox jumps case test",
        ]
        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "lang": "en",
             "source": "t", "n_chars": [len(t) for t in texts]}
        )
        path = tmp_path / "documents.parquet"
        frame.to_parquet(path)

        import ray.data

        from exstruct_ray.queries import ORACLE_SQL

        out = duplicated_ngram_spans(
            ray.data.read_parquet(str(path), columns=["doc_id", "text"]), n=5
        ).to_pandas()
        out = out.sort_values(["doc_id", "start_word"]).reset_index(drop=True)

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        expected = con.execute(ORACLE_SQL["doc_duplicated_spans"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)],
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
