"""Product quantization tests."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from exstruct_ray.ops.kmeans import pq_codes, pq_oracle_sql


def _corpus(n=40, dim=64, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    base[30] = base[5]  # identical pair -> identical codes
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [r.astype(np.float32).tolist() for r in base],
            "label": np.zeros(n, dtype=np.int32),
        }
    )


class TestPqCodes:
    def test_shape_range_and_duplicate_consistency(self, ray_session):
        import ray.data

        frame = _corpus()
        ds = ray.data.from_pandas(frame[["vec_id", "embedding"]])
        out = pq_codes(ds, m=4, k=4, n_iter=2, dim=64)
        assert len(out) == len(frame) * 4
        assert set(out["sub_id"]) == {0, 1, 2, 3}
        assert out["code"].between(0, 3).all()
        # every vector has exactly one code per subspace
        assert (out.groupby("vec_id").size() == 4).all()
        # the planted duplicate pair gets identical code words
        c5 = out[out["vec_id"] == 5].sort_values("sub_id")["code"].tolist()
        c30 = out[out["vec_id"] == 30].sort_values("sub_id")["code"].tolist()
        assert c5 == c30

    def test_matches_sql_oracle(self, ray_session, tmp_path):
        import ray.data

        frame = _corpus(seed=11)
        path = tmp_path / "embeddings.parquet"
        frame.to_parquet(path)
        ds = ray.data.read_parquet(str(path), columns=["vec_id", "embedding"])
        out = pq_codes(ds, m=4, k=4, n_iter=2, dim=64)

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
        )
        expected = con.execute(pq_oracle_sql(m=4, k=4, n_iter=2, dim=64)).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_rejects_uneven_subspaces(self, ray_session):
        import ray.data

        ds = ray.data.from_pandas(_corpus()[["vec_id", "embedding"]])
        with pytest.raises(ValueError):
            pq_codes(ds, m=5, k=4, n_iter=1, dim=64)


class TestPqTopk:
    def test_self_retrieval_and_oracle(self, ray_session, tmp_path):
        import ray.data

        from exstruct_ray.queries import ORACLE_SQL, embedding_pq_topk

        frame = _corpus(n=60, seed=19)
        path = tmp_path / "embeddings.parquet"
        frame.to_parquet(path)
        out = embedding_pq_topk(str(tmp_path))

        # 5 queries x 10 ranks, and each query retrieves itself among the
        # top results (its own cell has the minimal table distance; ties
        # broken by its low vec_id)
        assert len(out) == 50
        for qid in range(5):
            hits = out[out["query_id"] == qid]["vec_id"].tolist()
            assert qid in hits

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
        )
        expected = con.execute(ORACLE_SQL["embedding_pq_topk"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
