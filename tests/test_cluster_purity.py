"""Cluster purity: majority labels, the count-tie -> lower-label rule,
permille flooring, and DuckDB parity on a crafted 4-blob table."""

import duckdb
import numpy as np
import pandas as pd

from exstruct_ray.queries import ORACLE_SQL


class TestClusterPurity:
    def test_crafted_blobs(self, ray_session, tmp_path):
        rng = np.random.default_rng(7)
        vecs, labels = [], []
        # four well-separated blobs on orthogonal axes; ids 0..3 land one
        # per blob so the deterministic init seeds each blob's centroid
        blob_sizes = [3, 4, 5, 4]
        blob_labels = [
            [7, 7, 5],          # majority 7, purity 666
            [1, 2, 1, 2],       # tie 2-2 -> lower label 1
            [3, 3, 3, 3, 3],    # pure 1000
            [9, 9, 9, 0],       # majority 9, purity 750
        ]
        order = []  # (vec_id, blob, member_idx)
        # first the 4 init ids, one per blob
        for b in range(4):
            order.append((b, b, 0))
        nid = 4
        for b in range(4):
            for m in range(1, blob_sizes[b]):
                order.append((nid, b, m))
                nid += 1
        for vid, b, m in order:
            v = np.zeros(64)
            v[b] = 1.0
            v += rng.normal(0, 0.01, 64)
            vecs.append((vid, v.astype(np.float32), blob_labels[b][m]))
        vecs.sort(key=lambda t: t[0])
        emb = pd.DataFrame(
            {
                "vec_id": pd.Series([v[0] for v in vecs], dtype="int64"),
                "embedding": [v[1] for v in vecs],
                "label": pd.Series([v[2] for v in vecs], dtype="int32"),
            }
        )
        sf_dir = tmp_path / "sfpurity"
        sf_dir.mkdir()
        emb.to_parquet(sf_dir / "embeddings.parquet")

        from exstruct_ray.queries import embedding_cluster_purity

        out = embedding_cluster_purity(str(sf_dir))
        assert int(out["n_vecs"].sum()) == len(emb)
        by_cluster = {
            int(r.cluster_id): r for r in out.itertuples()
        }
        # blob b was seeded by init vector b -> cluster ids track blobs
        assert by_cluster[0].top_label == 7
        assert by_cluster[0].purity_permille == 1000 * 2 // 3
        assert by_cluster[1].top_label == 1  # tie broken by lower label
        assert by_cluster[1].n_top == 2
        assert by_cluster[2].purity_permille == 1000
        assert by_cluster[3].top_label == 9
        assert by_cluster[3].purity_permille == 750

        con = duckdb.connect()
        con.register("embeddings", emb)
        sql = con.execute(ORACLE_SQL["embedding_cluster_purity"]).df()
        for col in out.columns:
            assert list(out[col]) == list(sql[col]), col
