"""Exact k-NN graph: neighbor order, self-exclusion, exact-tie id
tie-break, and DuckDB parity on a crafted embedding table."""

import duckdb
import numpy as np
import pandas as pd

from exstruct_ray.queries import ORACLE_SQL


def _run(tmp_path, vecs):
    emb = pd.DataFrame(
        {
            "vec_id": pd.Series(range(len(vecs)), dtype="int64"),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
        }
    )
    sf_dir = tmp_path / "sfknn"
    sf_dir.mkdir()
    emb.to_parquet(sf_dir / "embeddings.parquet")
    from exstruct_ray.queries import embedding_knn_graph

    return emb, embedding_knn_graph(str(sf_dir))


class TestKnnGraph:
    def test_order_selfexclusion_and_ties(self, ray_session, tmp_path):
        # id0 = query axis; id1 near-dup of id0; id2/id3 exactly
        # orthogonal to id0 (sim 0 tie -> lower id first); id4 opposite
        vecs = [
            [1.0, 0.0, 0.0, 0.0],
            [0.999, 0.01, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, -1.0, 0.0, 0.0],
            [-1.0, 0.0, 0.0, 0.0],
            [0.5, 0.5, 0.0, 0.0],
        ]
        emb, out = _run(tmp_path, vecs)
        g0 = out[out["vec_id"] == 0]
        assert list(g0["neighbor_id"]) == [1, 5, 2, 3, 4]
        assert list(g0["rank"]) == [1, 2, 3, 4, 5]
        # exact tie (sim 0 for ids 2 and 3) broken by ascending id
        assert list(g0["neighbor_id"])[2:4] == [2, 3]
        # no self edges anywhere
        assert (out["vec_id"] != out["neighbor_id"]).all()
        # every vector gets exactly k rows
        assert out.groupby("vec_id").size().eq(5).all()

        con = duckdb.connect()
        con.register("embeddings", emb)
        sql = con.execute(ORACLE_SQL["embedding_knn_graph"]).df()
        for col in ("vec_id", "neighbor_id", "rank"):
            assert list(out[col]) == list(sql[col]), col


class TestKnnGraphIvf:
    def test_subset_of_exact_and_recall(self, ray_session, tmp_path):
        """The IVF graph's neighbor lists are drawn from probed-cell
        candidates; every edge must also rank correctly, and on a
        clustered corpus recall vs the exact graph should be high."""
        rng = np.random.default_rng(23)
        # clustered corpus: points near 4 IVF centroid directions
        from exstruct_ray.ops.ann import ivf_centroids

        cents = ivf_centroids(64)
        vecs = []
        for i in range(40):
            base = cents[i % 4]
            vecs.append((base + rng.normal(0, 0.05, 64)).astype(np.float32))
        emb = pd.DataFrame(
            {
                "vec_id": pd.Series(range(40), dtype="int64"),
                "embedding": vecs,
            }
        )
        sf_dir = tmp_path / "sfknnivf"
        sf_dir.mkdir()
        emb.to_parquet(sf_dir / "embeddings.parquet")

        from exstruct_ray.queries import (
            embedding_knn_graph,
            embedding_knn_graph_ivf,
        )

        exact = embedding_knn_graph(str(sf_dir))
        approx = embedding_knn_graph_ivf(str(sf_dir))
        assert (approx.groupby("vec_id").size() <= 5).all()
        assert (approx["vec_id"] != approx["neighbor_id"]).all()
        e = set(zip(exact["vec_id"], exact["neighbor_id"]))
        a = set(zip(approx["vec_id"], approx["neighbor_id"]))
        recall = len(e & a) / len(e)
        assert recall >= 0.9  # same-cluster neighbors live in probed cells

        con = duckdb.connect()
        con.register("embeddings", emb)
        sql = con.execute(ORACLE_SQL["embedding_knn_graph_ivf"]).df()
        for col in ("vec_id", "neighbor_id", "rank"):
            assert list(approx[col]) == list(sql[col]), col
