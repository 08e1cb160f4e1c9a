"""Distributed survivor-selection family (VERDICT r4 item 1).

The big routes never collect or broadcast the dup-member table: token
counts attach via a doc-bucket tagged-union merge, ranking runs inside
group-bucket map_groups, the survivor anti-join folds per bucket, and
boilerplate attribution folds straight to per-source partials.
Forced-big-route tests (driver_member_limit=0) run on a
boilerplate-heavy fixture where dup members are >=60% of the corpus and
must equal the broadcast small route row for row (mirrors
TestLabelPropagation / test_pagerank's forced-big-route checks).
"""

import pandas as pd
import pytest


def _boilerplate_corpus(tmp_path):
    """12 docs, 3 near-dup components of 3 (9 members = 75% of corpus),
    members differ in length so best-keep ranking is non-trivial."""
    bodies = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi",
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen",
        "red orange yellow green blue indigo violet crimson scarlet "
        "amber chartreuse teal cyan azure cobalt navy periwinkle",
    ]
    texts, sources = [], []
    for ci, body in enumerate(bodies):
        texts += [
            body,                                   # short copy
            body + " extra trailing words appended",  # longest -> keeper
            body,                                   # short copy
        ]
        sources += [f"src{ci}", f"src{ci}", "shared"]
    uniques = [
        "completely standalone document with unrepeated vocabulary here",
        "another singleton text whose words collide with nothing else",
        "third unique document keeping the corpus from total duplication",
    ]
    texts += uniques
    sources += ["solo", "solo", None]  # one NULL source (pinned: excluded)
    frame = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts, "source": sources}
    )
    frame.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


class TestForcedBigRoute:
    def test_best_keep_big_equals_small(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_neardup_best_keep

        sf = _boilerplate_corpus(tmp_path)
        small = doc_neardup_best_keep(sf)
        big = doc_neardup_best_keep(sf, driver_member_limit=0)
        assert len(small) == 9  # 3 components x 3 members
        pd.testing.assert_frame_equal(
            small.reset_index(drop=True),
            big.reset_index(drop=True),
            check_dtype=False,
        )
        # the longest member of each component is the keeper
        keepers = big.loc[big["keep"] == 1, "doc_id"].tolist()
        assert keepers == [1, 4, 7]

    def test_survivors_big_equals_small(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_neardup_survivors

        sf = _boilerplate_corpus(tmp_path)
        small = doc_neardup_survivors(sf)
        big = doc_neardup_survivors(sf, driver_member_limit=0)
        pd.testing.assert_frame_equal(
            small.reset_index(drop=True),
            big.reset_index(drop=True),
            check_dtype=False,
        )
        # lowest id per component + the three uniques survive
        assert big["doc_id"].tolist() == [0, 3, 6, 9, 10, 11]

    def test_boilerplate_by_source_big_equals_small(
        self, ray_session, tmp_path
    ):
        from exstruct_ray.queries import doc_boilerplate_by_source

        sf = _boilerplate_corpus(tmp_path)
        small = doc_boilerplate_by_source(sf)
        big = doc_boilerplate_by_source(sf, driver_member_limit=0)
        pd.testing.assert_frame_equal(
            small.reset_index(drop=True),
            big.reset_index(drop=True),
            check_dtype=False,
        )
        # NULL-source doc excluded; dup sources show nonzero boilerplate
        assert None not in set(big["source"])
        by = big.set_index("source")
        assert int(by.loc["src0", "dup_tokens"]) > 0
        assert int(by.loc["solo", "dup_tokens"]) == 0

    def test_boilerplate_small_route_matches_oracle(
        self, ray_session, tmp_path
    ):
        import duckdb

        from exstruct_ray.queries import (
            ORACLE_SQL,
            doc_boilerplate_by_source,
        )

        sf = _boilerplate_corpus(tmp_path)
        out = doc_boilerplate_by_source(sf)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_boilerplate_by_source"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestGroupsDatasetContract:
    def test_dedup_groups_auto_ds_small_route_matches_pandas(
        self, ray_session
    ):
        import ray

        from exstruct_ray.ops.dedup import (
            dedup_groups,
            dedup_groups_auto_ds,
        )

        pairs = pd.DataFrame(
            {"doc_a": [1, 2, 10], "doc_b": [2, 3, 11]}
        )
        ds = ray.data.from_pandas(pairs)
        got = (
            dedup_groups_auto_ds(ds)
            .to_pandas()
            .sort_values(["group_id", "doc_id"])
            .reset_index(drop=True)
        )
        want = dedup_groups(pairs)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_dedup_groups_auto_ds_big_route_matches_pandas(
        self, ray_session
    ):
        import ray

        from exstruct_ray.ops.dedup import (
            dedup_groups,
            dedup_groups_auto_ds,
        )

        pairs = pd.DataFrame(
            {"doc_a": [1, 2, 10, 20], "doc_b": [2, 3, 11, 21]}
        )
        ds = ray.data.from_pandas(pairs)
        got = (
            dedup_groups_auto_ds(ds, driver_pair_limit=0)
            .to_pandas()
            .sort_values(["group_id", "doc_id"])
            .reset_index(drop=True)
        )
        want = dedup_groups(pairs)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
