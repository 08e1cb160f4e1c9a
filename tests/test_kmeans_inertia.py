"""k-means inertia: exact integer within-cluster sums, floor means, and
DuckDB parity on a crafted 4-blob table."""

import duckdb
import numpy as np
import pandas as pd

from exstruct_ray.queries import ORACLE_SQL


class TestKmeansInertia:
    def test_crafted_blobs(self, ray_session, tmp_path):
        rng = np.random.default_rng(11)
        rows = []
        vid = 4
        for b in range(4):
            v = np.zeros(64)
            v[b] = 1.0
            rows.append((b, (v + rng.normal(0, 0.01, 64)).astype(np.float32)))
        for b in range(4):
            for _ in range(3):
                v = np.zeros(64)
                v[b] = 1.0
                rows.append(
                    (vid, (v + rng.normal(0, 0.01, 64)).astype(np.float32))
                )
                vid += 1
        rows.sort(key=lambda t: t[0])
        emb = pd.DataFrame(
            {
                "vec_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "embedding": [r[1] for r in rows],
            }
        )
        sf_dir = tmp_path / "sfinertia"
        sf_dir.mkdir()
        emb.to_parquet(sf_dir / "embeddings.parquet")

        from exstruct_ray.queries import embedding_kmeans_inertia

        out = embedding_kmeans_inertia(str(sf_dir))
        assert int(out["n_vecs"].sum()) == len(emb)
        # every blob is tight: per-member mean squared distance stays well
        # under the inter-blob separation (~2e12 μu²)
        assert (out["mean_dist_q"] < 10**11).all()
        assert (
            out["mean_dist_q"] == out["inertia_q"] // out["n_vecs"]
        ).all()

        con = duckdb.connect()
        con.register("embeddings", emb)
        sql = con.execute(ORACLE_SQL["embedding_kmeans_inertia"]).df()
        for col in out.columns:
            assert list(out[col]) == list(sql[col]), col
