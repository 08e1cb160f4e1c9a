"""Unigram-LM rarity scoring tests (integer-exact CCNet-style proxy)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from exstruct_ray.ops.text import (
    LM_RARITY_SCALE,
    corpus_token_counts,
    lm_rarity_scores,
)


def _dataset(texts):
    import ray.data

    frame = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": pd.Series(texts, dtype="object")}
    )
    return ray.data.from_pandas(frame), frame


class TestCorpusTokenCounts:
    def test_counts_merge_across_batches(self, ray_session):
        import ray.data

        frame = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": ["a b a", "b c", "a", "c c c"],
            }
        )
        # two single-row blocks force cross-block merging of partials
        ds = ray.data.from_pandas([frame.iloc[:2], frame.iloc[2:]])
        counts = corpus_token_counts(ds)
        got = dict(zip(counts["token"], counts["n"]))
        assert got == {"a": 3, "b": 2, "c": 4}


class TestLmRarity:
    def test_hand_computed_scores(self, ray_session):
        import ray

        # corpus: "x x x y" -> count(x)=3, count(y)=1
        ds, _ = _dataset(["x x x", "y x"])
        counts_df = corpus_token_counts(ds)
        counts = pd.Series(
            counts_df["n"].to_numpy(dtype=np.int64),
            index=counts_df["token"].to_numpy(),
        )
        assert counts["x"] == 4 and counts["y"] == 1
        ref = ray.put(counts)
        out = (
            lm_rarity_scores(ds, ref)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        per_x = LM_RARITY_SCALE // 4
        per_y = LM_RARITY_SCALE // 1
        assert out.loc[0, "rarity_sum"] == 3 * per_x
        assert out.loc[0, "mean_rarity"] == per_x
        assert out.loc[1, "rarity_sum"] == per_y + per_x
        assert out.loc[1, "mean_rarity"] == (per_y + per_x) // 2

    def test_empty_doc_scores_zero(self, ray_session):
        import ray

        ds, _ = _dataset(["real words here", ""])
        counts_df = corpus_token_counts(ds)
        counts = pd.Series(
            counts_df["n"].to_numpy(dtype=np.int64),
            index=counts_df["token"].to_numpy(),
        )
        ref = ray.put(counts)
        out = (
            lm_rarity_scores(ds, ref)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.loc[1, "n_tokens"] == 0
        assert out.loc[1, "rarity_sum"] == 0
        assert out.loc[1, "mean_rarity"] == 0

    def test_matches_sql_oracle_on_crafted_corpus(self, ray_session, tmp_path):
        texts = [
            "the cat sat on the mat",
            "the dog sat on the log",
            "unique singleton vocabulary entry",
            "",
            "THE\tCAT tab and case test",
        ]
        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "lang": "en",
             "source": "t", "n_chars": [len(t) for t in texts]}
        )
        path = tmp_path / "documents.parquet"
        frame.to_parquet(path)

        from exstruct_ray.queries import doc_lm_rarity, ORACLE_SQL

        out = doc_lm_rarity(str(tmp_path))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        expected = con.execute(ORACLE_SQL["doc_lm_rarity"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestLangMismatchBySource:
    def test_planted_mismatch_and_oracle(self, ray_session, tmp_path):
        import duckdb

        from exstruct_ray.queries import (
            ORACLE_SQL,
            doc_lang_mismatch_by_source,
        )

        frame = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    "the quick brown fox and the lazy dog with many the",
                    "le chat est sur la table avec le chien et les souris",
                    "the cat and the dog are on the table with the mouse",
                    "zzz qqq xxx",   # no markers -> detected 'unknown'
                ],
                "lang": ["en", "en", "en", "en"],   # doc 1 mislabeled
                "source": ["good", "bad", "good", "bad"],
                "n_chars": 50,
            }
        )
        frame.to_parquet(tmp_path / "documents.parquet")
        out = doc_lang_mismatch_by_source(str(tmp_path))
        by = out.set_index("source")
        assert by.loc["good", "n_mismatch"] == 0
        assert by.loc["bad", "n_mismatch"] == 2   # fr text + unknown
        assert by.loc["bad", "mismatch_permille"] == 1000

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(
            ORACLE_SQL["doc_lang_mismatch_by_source"]
        ).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_null_lang_and_source_match_oracle(self, ray_session, tmp_path):
        import duckdb

        from exstruct_ray.queries import (
            ORACLE_SQL,
            doc_lang_mismatch_by_source,
        )

        frame = pd.DataFrame(
            {
                "doc_id": range(3),
                "text": [
                    "the quick brown fox and the lazy dog with the",
                    "le chat est sur la table avec le chien et les",
                    "the cat and the dog are on the table with the",
                ],
                "lang": ["en", None, "en"],     # NULL lang: no mismatch
                "source": ["a", "a", None],     # NULL source: dropped
                "n_chars": 40,
            }
        )
        frame.to_parquet(tmp_path / "documents.parquet")
        out = doc_lang_mismatch_by_source(str(tmp_path))
        assert out["source"].tolist() == ["a"]
        assert int(out.iloc[0]["n_docs"]) == 2
        assert int(out.iloc[0]["n_mismatch"]) == 0

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(
            ORACLE_SQL["doc_lang_mismatch_by_source"]
        ).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
