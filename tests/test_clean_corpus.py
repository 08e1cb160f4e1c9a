"""Composite curation verdict + fuzzy-dedup survivor tests."""

import duckdb
import pandas as pd
import pytest


def _write_docs(tmp_path, texts):
    frame = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    )
    frame.to_parquet(tmp_path / "documents.parquet")
    return frame


class TestCleanCorpus:
    @pytest.fixture(scope="class")
    def corpus_dir(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("clean")
        # doc 0: the benchmark slice (0 % 97 == 0) — always excluded
        # doc 1: clean and unique -> kept
        # doc 2: shares a 3-gram with doc 0 -> contaminated
        # doc 3 and 4: identical -> 4 loses exact dedup
        # doc 5: heavy line repetition -> fails Gopher quality
        _write_docs(
            tmp,
            [
                "held out benchmark evaluation sentence for the suite",
                "a perfectly ordinary unique training document example "
                "whose length comfortably clears every repetition "
                "threshold because all of these additional words appear "
                "exactly once across the entire body",
                "contains held out benchmark inside its words somewhere",
                "two copies of this exact training document exist",
                "two copies of this exact training document exist",
                "same line\nsame line\nsame line\nsame line\nsame line\nok",
            ],
        )
        return tmp

    def test_flags_and_keep(self, ray_session, corpus_dir):
        from exstruct_ray.queries import doc_clean_corpus

        out = doc_clean_corpus(str(corpus_dir)).set_index("doc_id")
        assert out.loc[0, "decontam_keep"] == 0  # bench slice
        assert out.loc[0, "keep"] == 0
        assert out.loc[1, "keep"] == 1
        assert out.loc[2, "decontam_keep"] == 0  # 3-gram overlap
        assert out.loc[2, "keep"] == 0
        assert out.loc[3, "dedup_keep"] == 1  # canonical copy
        assert out.loc[4, "dedup_keep"] == 0  # duplicate
        assert out.loc[4, "keep"] == 0
        assert out.loc[5, "quality_keep"] == 0  # repeated lines
        assert out.loc[5, "keep"] == 0

    def test_matches_sql_oracle(self, ray_session, corpus_dir):
        from exstruct_ray.queries import ORACLE_SQL, doc_clean_corpus

        out = doc_clean_corpus(str(corpus_dir))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{corpus_dir}/documents.parquet')"
        )
        expected = con.execute(ORACLE_SQL["doc_clean_corpus"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestNeardupSurvivors:
    def test_identical_docs_collapse_to_lowest_id(
        self, ray_session, tmp_path
    ):
        from exstruct_ray.queries import doc_neardup_survivors

        dup = (
            "the very same long document body repeated verbatim many words "
            "to give the shingler enough distinct five character shingles "
            "for a confident jaccard estimate of unity between the copies"
        )
        texts = [
            dup,
            dup,
            dup,
            "a completely different document about other topics entirely "
            "with its own vocabulary and no overlap in any shingle space",
        ]
        _write_docs(tmp_path, texts)
        out = doc_neardup_survivors(str(tmp_path))
        assert out["doc_id"].tolist() == [0, 3]


class TestNeardupBestKeep:
    """Quality-ranked survivor selection: keep the longest member of each
    near-dup component (tie -> lowest id), not the lowest id."""

    def test_longest_member_wins(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_neardup_best_keep

        base = (
            "the very same long document body repeated verbatim many words "
            "to give the shingler enough distinct five character shingles "
            "for a confident jaccard estimate of unity between the copies"
        )
        texts = [
            base,                                   # truncated-ish copy
            base + " plus an extra trailing clause appended here",
            base,                                   # another short copy
            "a completely different document about other topics entirely "
            "with its own vocabulary and no overlap in any shingle space",
        ]
        _write_docs(tmp_path, texts)
        out = doc_neardup_best_keep(str(tmp_path))
        by_id = out.set_index("doc_id")
        # one component {0,1,2}; doc 3 unpaired (absent from output)
        assert sorted(out["doc_id"]) == [0, 1, 2]
        assert (out["group_id"] == 0).all()
        # the LONGEST copy (doc 1) survives, not the lowest id
        assert by_id.loc[1, "keep"] == 1
        assert by_id.loc[0, "keep"] == 0
        assert by_id.loc[2, "keep"] == 0

    def test_tie_breaks_to_lowest_id_and_oracle_parity(
        self, ray_session, tmp_path
    ):
        from exstruct_ray.queries import ORACLE_SQL, doc_neardup_best_keep

        dup = (
            "identical twins of equal token length share every shingle "
            "and therefore tie on tokens so the lower id must survive "
            "per the pinned deterministic ordering of this selection"
        )
        _write_docs(tmp_path, [dup, dup, "unrelated other text entirely"])
        out = doc_neardup_best_keep(str(tmp_path))
        by_id = out.set_index("doc_id")
        assert by_id.loc[0, "keep"] == 1 and by_id.loc[1, "keep"] == 0

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_neardup_best_keep"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_no_duplicates_empty_output(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_neardup_best_keep

        _write_docs(
            tmp_path,
            ["completely unique sentence number one here today",
             "another entirely distinct set of words and phrases"],
        )
        out = doc_neardup_best_keep(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == [
            "doc_id", "group_id", "n_tokens", "keep",
        ]


class TestNeardupSurvivorsDupFree:
    def test_dup_free_corpus_all_survive(self, ray_session, tmp_path):
        # regression: zero candidate pairs used to KeyError inside
        # dedup_groups (zero-column frame from empty map_groups blocks)
        from exstruct_ray.queries import doc_neardup_survivors

        _write_docs(
            tmp_path,
            ["completely unique sentence number one here today",
             "another entirely distinct set of words and phrases"],
        )
        out = doc_neardup_survivors(str(tmp_path))
        assert out["doc_id"].tolist() == [0, 1]
