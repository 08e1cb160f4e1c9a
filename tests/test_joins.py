"""Distributed semi-join and anti-join (tagged-union bucket merge)."""

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    from exstruct_ray.queries import ORACLE_SQL

    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(ORACLE_SQL[name]).df()


class TestSemiJoin:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import order_priority_counts

        got = order_priority_counts(SF_DIR)
        want = _oracle("order_priority_counts", SF_DIR)
        assert len(got) > 0  # the window+flag predicate actually selects
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False,
        )

    def test_priorities_counted_once_per_order(self, ray_session, tmp_path):
        """An order with MANY returned lineitems still counts once — the
        semi-join must not inflate into an inner-join row product."""
        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],
                "o_custkey": [1, 1, 1],
                "o_orderstatus": "O",
                "o_totalprice": 1.0,
                "o_orderdate": pd.Timestamp("1995-02-01"),
                "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW"],
            }
        )
        lineitem = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 3],  # order 2 has no returns
                "l_partkey": 1, "l_suppkey": 1,
                "l_linenumber": [1, 2, 3, 1],
                "l_quantity": 1.0, "l_extendedprice": 1.0,
                "l_discount": 0.0, "l_tax": 0.0,
                "l_returnflag": ["R", "R", "R", "R"],
                "l_linestatus": "O",
                "l_shipdate": pd.Timestamp("1995-03-01"),
            }
        )
        orders.to_parquet(tmp_path / "orders.parquet")
        lineitem.to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import order_priority_counts

        got = order_priority_counts(str(tmp_path))
        assert got.set_index("o_orderpriority")["order_count"].to_dict() == {
            "1-URGENT": 1,
            "5-LOW": 1,
        }


class TestAntiJoin:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import customers_inactive_2001

        got = customers_inactive_2001(SF_DIR)
        want = _oracle("customers_inactive_2001", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False,
        )

    def test_all_customers_active_yields_empty(self, ray_session, tmp_path):
        customers = pd.DataFrame(
            {
                "c_custkey": [1, 2],
                "c_name": ["a", "b"],
                "c_nationkey": 0,
                "c_acctbal": [10.0, 20.0],
                "c_mktsegment": ["X", "Y"],
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2],
                "o_custkey": [1, 2],
                "o_orderstatus": "O",
                "o_totalprice": 1.0,
                "o_orderdate": pd.Timestamp("2001-06-01"),
                "o_orderpriority": "5-LOW",
            }
        )
        customers.to_parquet(tmp_path / "customer.parquet")
        orders.to_parquet(tmp_path / "orders.parquet")
        from exstruct_ray.queries import customers_inactive_2001

        got = customers_inactive_2001(str(tmp_path))
        assert len(got) == 0
        assert list(got.columns) == [
            "c_mktsegment", "n_customers", "total_acctbal",
        ]
