"""Shuffle-key skew audit: count conservation, hot-key visibility,
zero-filled grid, DuckDB parity."""

import duckdb
import pandas as pd

from exstruct_ray.queries import ORACLE_SQL


class TestBucketSkew:
    def test_hot_key_and_parity(self, ray_session, tmp_path):
        # one order dominates: its bucket must show the hot share
        keys = [7] * 80 + list(range(100, 120))
        li = pd.DataFrame({"l_orderkey": pd.Series(keys, dtype="int64")})
        sf_dir = tmp_path / "sfskew"
        sf_dir.mkdir()
        li.to_parquet(sf_dir / "lineitem.parquet")

        from exstruct_ray.queries import lineitem_bucket_skew

        out = lineitem_bucket_skew(str(sf_dir))
        assert len(out) == 64
        assert int(out["n_rows"].sum()) == len(keys)
        assert int(out["n_rows"].max()) >= 80  # the hot bucket is visible
        assert int(out["share_permille"].max()) >= 800

        con = duckdb.connect()
        con.register("lineitem", li)
        sql = con.execute(ORACLE_SQL["lineitem_bucket_skew"]).df()
        for col in out.columns:
            assert list(out[col]) == list(sql[col]), col
