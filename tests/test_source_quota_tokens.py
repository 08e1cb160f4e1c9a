"""Per-source quota cap and BPE-ish pretokenizer counts."""

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


class TestSourceQuota:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import doc_source_quota

        got = doc_source_quota(SF_DIR)
        want = _oracle("doc_source_quota", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_cap_enforced_with_skewed_source(self, ray_session, tmp_path):
        """A source with far more docs than the quota keeps exactly the
        quota, lowest doc_id first — the domain-cap semantics."""
        docs = pd.DataFrame(
            {
                "doc_id": range(100),
                "source": ["hot.example"] * 90 + ["cold.example"] * 10,
                "text": "x",
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import doc_source_quota

        got = doc_source_quota(str(tmp_path))
        hot = got[got["source"] == "hot.example"]
        assert len(hot) == 10
        assert hot["doc_id"].tolist() == list(range(10))
        assert len(got[got["source"] == "cold.example"]) == 10


class TestBpeTokenCounts:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import doc_bpe_token_counts

        got = doc_bpe_token_counts(SF_DIR)
        want = _oracle("doc_bpe_token_counts", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_pretokenizer_shapes(self, ray_session, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "it's a test",  # contraction splits: it|'s| a| test
                    "abc123 x-y",  # word|number then word|punct|word
                    "",
                    None,
                ],
                "source": "s",
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import doc_bpe_token_counts

        got = doc_bpe_token_counts(str(tmp_path)).set_index("doc_id")
        assert got.loc[0, "n_tokens"] == 4
        assert got.loc[0, "n_words"] == 3
        assert got.loc[1, "n_tokens"] == 5
        assert got.loc[2, "n_tokens"] == 0
        assert got.loc[3, "n_tokens"] == 0


class TestSourceTypoPairs:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import source_typo_pairs

        got = source_typo_pairs(SF_DIR)
        want = _oracle("source_typo_pairs", SF_DIR)
        assert len(got) > 0
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_insert_delete_substitute_all_found(self, ray_session, tmp_path):
        """FastSS recall: one representative of each edit kind plus a
        distance-2 decoy that must NOT pair with the base."""
        terms = ["crawl", "crawls", "craw", "crawt", "crxwls"]
        docs = pd.DataFrame(
            {
                "doc_id": range(len(terms)),
                "text": "x",
                "source": terms,
                "lang": "en",
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import source_typo_pairs

        got = source_typo_pairs(str(tmp_path))
        pairs = set(zip(got["term_a"], got["term_b"]))
        assert ("crawl", "crawls") in pairs  # insertion
        assert ("craw", "crawl") in pairs  # deletion
        assert ("crawl", "crawt") in pairs  # substitution
        assert ("crawl", "crxwls") not in pairs  # distance 2


class TestGroupedQuantiles:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import doc_length_quantiles_by_lang

        got = doc_length_quantiles_by_lang(SF_DIR)
        want = _oracle("doc_length_quantiles_by_lang", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_rank_convention_with_ties(self, ray_session, tmp_path):
        """Duplicated values and a 1-row group exercise the
        max(0, ceil(q*n)-1) rank and the cumulative-count walk."""
        docs = pd.DataFrame(
            {
                "doc_id": range(5),
                "text": "x",
                "source": "s",
                "lang": ["en", "en", "en", "en", "de"],
                "n_chars": [10, 10, 20, 30, 7],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import doc_length_quantiles_by_lang

        got = doc_length_quantiles_by_lang(str(tmp_path))
        en = got[got["lang"] == "en"].set_index("quantile")
        assert en.loc[0.25, "value"] == 10  # rank 0 of [10,10,20,30]
        assert en.loc[0.5, "value"] == 10  # rank 1
        assert en.loc[0.75, "value"] == 20  # rank 2
        assert en.loc[0.95, "value"] == 30  # rank 3
        de = got[got["lang"] == "de"].set_index("quantile")
        assert (de["value"] == 7).all()  # single-row group
