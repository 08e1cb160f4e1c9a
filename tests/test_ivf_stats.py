"""IVF posting-list balance audit: zero-filled empty cells, permille
shares, count conservation, DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd

from exstruct_ray.ops.ann import IVF_CLUSTERS, _normalize, ivf_centroids
from exstruct_ray.queries import ORACLE_SQL


class TestIvfStats:
    def test_skewed_corpus(self, ray_session, tmp_path):
        # all vectors sit on one centroid direction -> one hot cell,
        # every other cell must still appear zero-filled
        cents = ivf_centroids(64)
        hot = cents[3]
        rng = np.random.default_rng(3)
        vecs = [
            (hot + rng.normal(0, 0.001, 64)).astype(np.float32)
            for _ in range(20)
        ]
        emb = pd.DataFrame(
            {
                "vec_id": pd.Series(range(20), dtype="int64"),
                "embedding": vecs,
            }
        )
        sf_dir = tmp_path / "sfivf"
        sf_dir.mkdir()
        emb.to_parquet(sf_dir / "embeddings.parquet")

        from exstruct_ray.queries import embedding_ivf_stats

        out = embedding_ivf_stats(str(sf_dir))
        assert len(out) == IVF_CLUSTERS
        assert int(out["n_vecs"].sum()) == 20
        assert int(out.loc[out["cluster_id"] == 3, "n_vecs"].iloc[0]) == 20
        assert int(out.loc[out["cluster_id"] == 3, "share_permille"].iloc[0]) == 1000
        assert (out.loc[out["cluster_id"] != 3, "n_vecs"] == 0).all()

        con = duckdb.connect()
        con.register("embeddings", emb)
        sql = con.execute(ORACLE_SQL["embedding_ivf_stats"]).df()
        for col in out.columns:
            assert list(out[col]) == list(sql[col]), col
