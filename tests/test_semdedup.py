"""SemDeDup (k-means + in-cluster cosine pruning) tests."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from exstruct_ray.ops.kmeans import semdedup, semdedup_oracle_sql


def _make_corpus(rng, n=60, dim=64):
    """Deterministic embeddings with planted exact and near duplicates."""
    base = rng.normal(size=(n, dim))
    # plant exact duplicates: 10 copies vec 40..49 of vec 0..9
    base[40:50] = base[0:10]
    # plant near-duplicates: 50..54 = tiny perturbation of 10..14
    base[50:55] = base[10:15] + 1e-4 * rng.normal(size=(5, dim))
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in base],
            "label": np.zeros(n, dtype=np.int32),
        }
    )


class TestSemDeDup:
    @pytest.fixture(scope="class")
    def corpus(self):
        return _make_corpus(np.random.default_rng(7))

    def test_matches_sql_oracle_end_to_end(self, ray_session, corpus, tmp_path_factory):
        import ray.data

        path = tmp_path_factory.mktemp("semdedup") / "embeddings.parquet"
        corpus.to_parquet(path)
        ds = ray.data.read_parquet(str(path), columns=["vec_id", "embedding"])
        out = semdedup(ds, k=4, n_iter=3, dim=64)

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
        )
        expected = con.execute(semdedup_oracle_sql(k=4, n_iter=3, dim=64)).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_exact_duplicates_pruned_lowest_id_survives(
        self, ray_session, corpus
    ):
        import ray.data

        ds = ray.data.from_pandas(corpus[["vec_id", "embedding"]])
        out = semdedup(ds, k=4, n_iter=3, dim=64).set_index("vec_id")
        # every planted copy (40..49) shares a cluster with its identical
        # original (0..9): same vector -> same centroid distances -> same
        # cluster; the copy has the larger id so it must be pruned
        for orig, copy in zip(range(10), range(40, 50)):
            assert out.loc[copy, "cluster_id"] == out.loc[orig, "cluster_id"]
            assert out.loc[copy, "keep"] == 0
            # the original survives unless itself near-dup of a smaller id
        # near-duplicates 50..54 of 10..14 pruned too (cos ~ 1 >> 0.38)
        for copy in range(50, 55):
            assert out.loc[copy, "keep"] == 0

    def test_keep_flags_match_exact_integer_rule(self, ray_session, corpus):
        """Recompute pruning with pure arbitrary-precision integers from the
        op's own assignment — validates the float-margin fast path never
        flips a verdict."""
        import ray.data

        from exstruct_ray.ops.kmeans import (
            _assign,
            kmeans_fit,
            quantize_embeddings,
        )

        ds = ray.data.from_pandas(corpus[["vec_id", "embedding"]])
        out = semdedup(ds, k=4, n_iter=3, dim=64)
        cents, _ = kmeans_fit(ds, k=4, n_iter=3, dim=64)
        q = quantize_embeddings(
            np.stack(
                [np.asarray(v, dtype=np.float64) for v in corpus["embedding"]]
            )
        )
        labels = _assign(q, cents)
        n = len(q)
        keep = np.ones(n, dtype=np.int64)
        for i in range(n):
            for j in range(i):
                if labels[i] != labels[j]:
                    continue
                d = int(np.dot(q[i], q[j]))
                if d > 0 and d * d * 2500 >= 361 * int(np.dot(q[i], q[i])) * int(
                    np.dot(q[j], q[j])
                ):
                    keep[i] = 0
                    break
        expected = pd.DataFrame(
            {"vec_id": corpus["vec_id"], "keep": keep}
        ).sort_values("vec_id")
        got = out[["vec_id", "keep"]].sort_values("vec_id")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), expected.reset_index(drop=True)
        )


class TestClusterSample:
    """Cluster-balanced deterministic downsampling."""

    def test_balance_determinism_and_oracle(self, ray_session, tmp_path):
        import duckdb
        import numpy as np

        from exstruct_ray.queries import (
            ORACLE_SQL,
            embedding_cluster_sample,
        )

        # two tight synthetic clusters, one 4x the other: the big one is
        # thinned toward the small one's size; the smallest keeps all
        rng = np.random.RandomState(7)
        big = rng.normal(0.0, 0.02, size=(160, 64)) + 1.0
        small = rng.normal(0.0, 0.02, size=(40, 64)) - 1.0
        vecs = np.vstack([big, small])
        frame = pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [v.astype("float32") for v in vecs],
                "label": 0,
            }
        )
        frame.to_parquet(tmp_path / "embeddings.parquet")
        out = embedding_cluster_sample(str(tmp_path))
        assert len(out) == 200
        sizes = out.groupby("cluster_id").size()
        kept = out.groupby("cluster_id")["keep"].sum()
        # the smallest cluster keeps everything (rate 1000)
        smallest = sizes.idxmin()
        assert kept[smallest] == sizes[smallest]
        # the dominant cluster is substantially thinned toward min_size
        biggest = sizes.idxmax()
        assert kept[biggest] < sizes[biggest]
        # deterministic re-run
        again = embedding_cluster_sample(str(tmp_path))
        pd.testing.assert_frame_equal(out, again)

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'embeddings.parquet'}')"
        )
        expected = con.execute(
            ORACLE_SQL["embedding_cluster_sample"]
        ).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
