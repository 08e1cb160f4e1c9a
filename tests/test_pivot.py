"""Pivot/crosstab: zero-filled pinned columns, out-of-range years in
total only, DuckDB parity on a crafted orders frame."""

import duckdb
import pandas as pd

from exstruct_ray.queries import ORACLE_SQL


class TestOrdersPivot:
    def test_crafted_orders(self, ray_session, tmp_path):
        orders = pd.DataFrame(
            {
                "o_orderkey": pd.Series(range(6), dtype="int64"),
                "o_custkey": pd.Series([1] * 6, dtype="int64"),
                "o_orderstatus": ["O"] * 6,
                "o_totalprice": [10.0] * 6,
                "o_orderdate": pd.to_datetime(
                    [
                        "1995-03-01",
                        "1995-07-15",
                        "1999-01-02",
                        "2001-08-01",
                        "2001-02-11",
                        "1996-12-31",
                    ]
                ),
                "o_orderpriority": [
                    "1-URGENT",
                    "1-URGENT",
                    "1-URGENT",
                    "5-LOW",
                    "5-LOW",
                    "5-LOW",
                ],
            }
        )
        sf_dir = tmp_path / "sfpivot"
        sf_dir.mkdir()
        orders.to_parquet(sf_dir / "orders.parquet")

        from exstruct_ray.queries import orders_priority_year_pivot

        out = orders_priority_year_pivot(str(sf_dir))
        assert list(out["priority"]) == ["1-URGENT", "5-LOW"]
        urgent = out.iloc[0]
        assert urgent["n_1995"] == 2
        assert urgent["n_1999"] == 1
        assert urgent["n_1996"] == 0  # zero-filled, column present
        assert urgent["total"] == 3
        low = out.iloc[1]
        assert low["n_2001"] == 2 and low["n_1996"] == 1
        assert low["total"] == 3

        con = duckdb.connect()
        con.register("orders", orders)
        sql = con.execute(ORACLE_SQL["orders_priority_year_pivot"]).df()
        for col in out.columns:
            assert list(out[col]) == list(sql[col]), col
