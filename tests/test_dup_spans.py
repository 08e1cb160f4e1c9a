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


class TestExactsubstrCut:
    """ExactSubstr repetition removal (doc_exactsubstr_cut): the spans
    applied as a text rewrite."""

    def _run(self, texts, ray_session, tmp_path):
        import duckdb
        import ray  # noqa: F401

        from exstruct_ray.queries import ORACLE_SQL, doc_exactsubstr_cut

        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "lang": "en",
             "source": "t", "n_chars": [len(t) for t in texts]}
        )
        (tmp_path / "corpus").mkdir(exist_ok=True)
        path = tmp_path / "corpus" / "documents.parquet"
        frame.to_parquet(path)
        out = doc_exactsubstr_cut(str(tmp_path / "corpus"))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        expected = con.execute(ORACLE_SQL["doc_exactsubstr_cut"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
        return out

    def test_cut_semantics_and_oracle_parity(self, ray_session, tmp_path):
        shared = "the quick brown fox jumps"
        out = self._run(
            [
                f"alpha beta {shared} gamma delta",
                f"one two three {shared} four",
                "a b c d e a b c d e",          # fully covered
                "short words only",              # < n words, untouched
                "entirely different words everywhere here now",
            ],
            ray_session,
            tmp_path,
        )
        by_id = out.set_index("doc_id")
        assert by_id.loc[0, "text_clean"] == "alpha beta gamma delta"
        assert by_id.loc[0, "n_words"] == 9
        assert by_id.loc[0, "n_cut_words"] == 5
        assert by_id.loc[1, "text_clean"] == "one two three four"
        assert by_id.loc[2, "text_clean"] == ""          # all words cut
        assert by_id.loc[2, "n_cut_words"] == 10
        assert by_id.loc[3, "text_clean"] == "short words only"
        assert by_id.loc[3, "n_cut_words"] == 0
        # invariant: kept word count == n_words - n_cut_words
        for _, r in out.iterrows():
            n_kept = len(r["text_clean"].split()) if r["text_clean"] else 0
            assert n_kept == r["n_words"] - r["n_cut_words"]

    def test_case_preserved_case_insensitive_match(
        self, ray_session, tmp_path
    ):
        # grams match case-insensitively (span pass lowercases); the
        # rewrite keeps the ORIGINAL case of surviving words
        out = self._run(
            [
                "KEEP Me the quick brown fox jumps",
                "other words the QUICK Brown FOX JUMPS",
            ],
            ray_session,
            tmp_path,
        )
        by_id = out.set_index("doc_id")
        assert by_id.loc[0, "text_clean"] == "KEEP Me"
        assert by_id.loc[1, "text_clean"] == "other words"

    def test_whitespace_normalized_tabs_and_runs(self, ray_session, tmp_path):
        # tokenization erases original spacing: runs/tabs become one space
        out = self._run(
            ["solo\tdoc  with   odd\tspacing only here"],
            ray_session,
            tmp_path,
        )
        assert (
            out.iloc[0]["text_clean"]
            == "solo doc with odd spacing only here"
        )
        assert out.iloc[0]["n_cut_words"] == 0

    def test_empty_and_no_dup_corpus(self, ray_session, tmp_path):
        out = self._run(
            ["", "completely unique sentence number one here"],
            ray_session,
            tmp_path,
        )
        by_id = out.set_index("doc_id")
        assert by_id.loc[0, "n_words"] == 0
        assert by_id.loc[0, "text_clean"] == ""
        assert by_id.loc[1, "n_cut_words"] == 0


class TestBoilerplateBySource:
    """Per-source duplicated-token share (doc_boilerplate_by_source)."""

    def test_shares_and_oracle_parity(self, ray_session, tmp_path):
        import duckdb

        from exstruct_ray.queries import (
            ORACLE_SQL,
            doc_boilerplate_by_source,
        )

        shared = "the quick brown fox jumps over lazy dogs"  # 8 words
        frame = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    f"{shared} unique tail one here",   # srcA: 8/12 dup
                    f"{shared} other unique words now",  # srcA: 8/12 dup
                    "entirely fresh content with no duplication at all",
                    "more fresh content that repeats nothing anywhere",
                ],
                "lang": "en",
                "source": ["srcA", "srcA", "srcB", "srcB"],
                "n_chars": 40,
            }
        )
        (tmp_path / "c").mkdir()
        frame.to_parquet(tmp_path / "c" / "documents.parquet")
        out = doc_boilerplate_by_source(str(tmp_path / "c"))
        by = out.set_index("source")
        assert by.loc["srcA", "n_docs"] == 2
        assert by.loc["srcA", "n_tokens"] == 24
        assert by.loc["srcA", "dup_tokens"] == 16
        assert by.loc["srcA", "dup_permille"] == 1000 * 16 // 24
        assert by.loc["srcB", "dup_tokens"] == 0
        assert by.loc["srcB", "dup_permille"] == 0

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'c' / 'documents.parquet'}')"
        )
        expected = con.execute(
            ORACLE_SQL["doc_boilerplate_by_source"]
        ).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestCutPacks:
    """ExactSubstr cut feeding sequence packing (doc_cut_packs)."""

    def test_contiguity_and_fully_cut_doc_vanishes(
        self, ray_session, tmp_path
    ):
        import duckdb

        from exstruct_ray.queries import ORACLE_SQL, doc_cut_packs

        texts = [
            "alpha beta the quick brown fox jumps gamma",   # 8w, 5 cut
            "a b c d e a b c d e",                          # fully cut
            "one two three the quick brown fox jumps four", # 9w, 5 cut
            "entirely different words everywhere here now", # 6w, 0 cut
        ]
        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "lang": "en",
             "source": "t", "n_chars": [len(t) for t in texts]}
        )
        (tmp_path / "c").mkdir()
        frame.to_parquet(tmp_path / "c" / "documents.parquet")
        out = doc_cut_packs(str(tmp_path / "c"))
        by_id = out.set_index("doc_id")
        # doc 1 is fully covered -> absent
        assert sorted(out["doc_id"]) == [0, 2, 3]
        assert by_id.loc[0, "n_kept"] == 3
        assert by_id.loc[2, "n_kept"] == 4
        assert by_id.loc[3, "n_kept"] == 6
        # stream contiguity: each doc starts where the previous ended
        from exstruct_ray.queries import PACK_SEQ_LEN

        ordered = out.sort_values("doc_id").reset_index(drop=True)
        pos = ordered["pack_id"] * PACK_SEQ_LEN + ordered["offset_in_pack"]
        starts = [0]
        for n in ordered["n_kept"][:-1]:
            starts.append(starts[-1] + int(n))
        assert pos.tolist() == starts

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'c' / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_cut_packs"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestSyndicationPairs:
    """Cross-source shared-duplicated-gram detector."""

    def test_planted_syndication_and_oracle(self, ray_session, tmp_path):
        import duckdb

        from exstruct_ray.queries import (
            ORACLE_SQL,
            source_syndication_pairs,
        )

        wire = ("breaking news the quick brown fox jumps over the lazy dog "
                "again today in the city center after long negotiations")
        texts = [wire, wire + " local angle one", wire + " local angle two",
                 "completely original reporting with unique words here"]
        sources = ["wireA", "siteB", "siteC", "siteD"]
        frame = pd.DataFrame(
            {"doc_id": range(4), "text": texts, "lang": "en",
             "source": sources, "n_chars": [len(t) for t in texts]}
        )
        (tmp_path / "c").mkdir()
        frame.to_parquet(tmp_path / "c" / "documents.parquet")
        out = source_syndication_pairs(str(tmp_path / "c"))
        got = set(zip(out["source_a"], out["source_b"]))
        # the three wire-sharing sources pair up; siteD appears nowhere
        assert got == {("siteB", "siteC"), ("siteB", "wireA"),
                       ("siteC", "wireA")}
        assert (out["n_shared_grams"] >= 10).all()

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'c' / 'documents.parquet'}')"
        )
        expected = con.execute(
            ORACLE_SQL["source_syndication_pairs"]
        ).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_within_source_duplication_ignored(self, ray_session, tmp_path):
        from exstruct_ray.queries import source_syndication_pairs

        dup = ("the very same long document body repeated verbatim many "
               "words to give enough distinct five gram material")
        frame = pd.DataFrame(
            {"doc_id": range(2), "text": [dup, dup], "lang": "en",
             "source": ["same", "same"], "n_chars": [len(dup)] * 2}
        )
        (tmp_path / "c").mkdir()
        frame.to_parquet(tmp_path / "c" / "documents.parquet")
        out = source_syndication_pairs(str(tmp_path / "c"))
        assert len(out) == 0   # duplication inside ONE source: no pair
