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
