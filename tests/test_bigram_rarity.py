"""Bigram-LM rarity (conditional-likelihood analogue of doc_lm_rarity)."""

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    from exstruct_ray.queries import ORACLE_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


class TestBigramRarity:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import doc_bigram_rarity

        got = doc_bigram_rarity(SF_DIR)
        want = _oracle("doc_bigram_rarity", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_conditional_semantics(self, ray_session, tmp_path):
        """'a b' appears twice, 'a c' once: prefix(a)=3, so rarity(a,b) =
        1e6*3//2 and rarity(a,c) = 1e6*3//1 — rare continuations of a
        common prefix score high (the perplexity shape)."""
        docs = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["a b", "a b", "a c", ""],
                "source": "s",
                "lang": "en",
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import doc_bigram_rarity

        got = doc_bigram_rarity(str(tmp_path)).set_index("doc_id")
        assert got.loc[0, "brarity_sum"] == 1_000_000 * 3 // 2
        assert got.loc[2, "brarity_sum"] == 3_000_000
        assert got.loc[3, "n_bigrams"] == 0
        assert got.loc[3, "brarity_sum"] == 0

    def test_single_token_doc_has_no_bigrams(self, ray_session, tmp_path):
        docs = pd.DataFrame(
            {"doc_id": [0], "text": ["lonely"], "source": "s", "lang": "en"}
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import doc_bigram_rarity

        got = doc_bigram_rarity(str(tmp_path))
        assert got.loc[0, "n_bigrams"] == 0
        assert got.loc[0, "mean_brarity"] == 0


class TestCorpusProfile:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import corpus_profile

        got = corpus_profile(SF_DIR)
        want = _oracle("corpus_profile", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_empty_and_null_text(self, ray_session, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["", None],
                "source": ["s1", "s2"],
                "lang": ["en", "en"],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import corpus_profile

        got = corpus_profile(str(tmp_path))
        assert got.loc[0, "n_docs"] == 2
        assert got.loc[0, "n_tokens"] == 0
        assert got.loc[0, "n_langs"] == 1
        assert got.loc[0, "n_sources"] == 2
