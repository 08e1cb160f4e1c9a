"""Near-dup cluster-size histogram (doc_dedup_group_sizes)."""

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


class TestDedupGroupSizes:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import doc_dedup_group_sizes

        got = doc_dedup_group_sizes(SF_DIR).reset_index(drop=True)
        want = _oracle("doc_dedup_group_sizes", SF_DIR)
        pd.testing.assert_frame_equal(got, want, check_dtype=True)

    def test_consistent_with_groups(self, ray_session):
        # the histogram must re-total to the group table exactly
        from exstruct_ray.queries import doc_dedup_group_sizes, doc_dedup_groups

        groups = doc_dedup_groups(SF_DIR)
        hist = doc_dedup_group_sizes(SF_DIR)
        assert int(hist["n_docs"].sum()) == len(groups)
        assert int(hist["n_groups"].sum()) == groups["group_id"].nunique()
        # every component has >= 2 members (singletons never enter the
        # pair graph)
        assert int(hist["group_size"].min()) >= 2


class TestLeakageSafeSplit:
    def test_matches_oracle_and_covers_corpus(self, ray_session):
        from exstruct_ray.queries import doc_leakage_safe_split

        got = doc_leakage_safe_split(SF_DIR).reset_index(drop=True)
        want = _oracle("doc_leakage_safe_split", SF_DIR)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # every document gets exactly one split; both splits non-empty
        # on the real corpus
        assert len(got) == 500
        assert set(got["split"].unique()) <= {"train", "valid"}
        assert (got["split"] == "valid").any()
        assert (got["split"] == "train").any()

    def test_near_dups_never_straddle(self, ray_session):
        """The invariant the query exists for: all members of a
        near-dup component share one split."""
        from exstruct_ray.queries import (
            doc_dedup_groups,
            doc_leakage_safe_split,
        )

        split = doc_leakage_safe_split(SF_DIR)
        groups = doc_dedup_groups(SF_DIR)
        m = groups.merge(split, on="doc_id")
        assert (m.groupby("group_id_y")["split"].nunique() == 1).all()
        # and the group ids agree between the two queries
        assert (m["group_id_x"] == m["group_id_y"]).all()
