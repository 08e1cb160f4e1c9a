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
