"""TPC-H Q5/Q10/Q14/Q18 star-join pipelines vs their DuckDB oracles."""

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "orders", "lineitem", "part"]


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    from exstruct_ray.queries import ORACLE_SQL

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(ORACLE_SQL[name]).df()


def _check(fn, name, min_rows=1):
    got = fn(SF_DIR).reset_index(drop=True)
    want = _oracle(name, SF_DIR).reset_index(drop=True)
    assert len(got) >= min_rows
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestQ5:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q5_local_supplier_volume

        _check(q5_local_supplier_volume, "q5_local_supplier_volume")

    def test_colocation_predicate(self, ray_session, tmp_path):
        """Revenue counts ONLY when customer and supplier share a nation —
        the cross-nation line must be dropped, not summed."""
        pd.DataFrame({"r_regionkey": [0], "r_name": ["ASIA"]}).to_parquet(
            tmp_path / "region.parquet"
        )
        pd.DataFrame(
            {"n_nationkey": [0, 1], "n_name": ["N0", "N1"], "n_regionkey": [0, 0]}
        ).to_parquet(tmp_path / "nation.parquet")
        pd.DataFrame(
            {
                "c_custkey": [1],
                "c_name": ["c"],
                "c_nationkey": [0],
                "c_acctbal": [0.0],
                "c_mktsegment": ["BUILDING"],
            }
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {"s_suppkey": [10, 11], "s_name": ["a", "b"], "s_nationkey": [0, 1],
             "s_acctbal": [0.0, 0.0]}
        ).to_parquet(tmp_path / "supplier.parquet")
        pd.DataFrame(
            {
                "o_orderkey": [100],
                "o_custkey": [1],
                "o_orderstatus": ["O"],
                "o_totalprice": [1.0],
                "o_orderdate": [pd.Timestamp("1996-06-01")],
                "o_orderpriority": ["1-URGENT"],
            }
        ).to_parquet(tmp_path / "orders.parquet")
        # Two lines on the same order: supplier 10 shares the customer's
        # nation (counts, 7.0), supplier 11 does not (dropped).
        pd.DataFrame(
            {
                "l_orderkey": [100, 100],
                "l_partkey": [1, 1],
                "l_suppkey": [10, 11],
                "l_linenumber": [1, 2],
                "l_quantity": [1.0, 1.0],
                "l_extendedprice": [10.0, 99.0],
                "l_discount": [0.3, 0.0],
                "l_tax": [0.0, 0.0],
                "l_returnflag": ["N", "N"],
                "l_linestatus": ["O", "O"],
                "l_shipdate": [pd.Timestamp("1996-07-01")] * 2,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q5_local_supplier_volume

        out = q5_local_supplier_volume(str(tmp_path))
        assert out["n_name"].tolist() == ["N0"]
        assert out["revenue"].tolist() == [7.0]


class TestQ10:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q10_returned_items

        _check(q10_returned_items, "q10_returned_items")

    def test_top20_cut_is_global(self, ray_session):
        """The bucket-local top-20 partials must reproduce the global
        top-20 exactly (no bucket may starve the global cut)."""
        from exstruct_ray.queries import q10_returned_items

        got = q10_returned_items(SF_DIR)
        assert len(got) <= 20
        # Deterministic total order: revenue desc, custkey asc.
        rev = got["revenue"].tolist()
        assert rev == sorted(rev, reverse=True)


class TestQ14:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q14_promo_revenue

        _check(q14_promo_revenue, "q14_promo_revenue")

    def test_promo_share_tiny(self, ray_session, tmp_path):
        pd.DataFrame(
            {
                "p_partkey": [1, 2],
                "p_name": ["x", "y"],
                "p_brand": ["B", "B"],
                "p_type": ["PROMO ANODIZED TIN", "STANDARD BRUSHED COPPER"],
                "p_size": [1, 1],
                "p_retailprice": [1.0, 1.0],
            }
        ).to_parquet(tmp_path / "part.parquet")
        pd.DataFrame(
            {
                "l_orderkey": [1, 1],
                "l_partkey": [1, 2],
                "l_suppkey": [1, 1],
                "l_linenumber": [1, 2],
                "l_quantity": [1.0, 1.0],
                "l_extendedprice": [25.0, 75.0],
                "l_discount": [0.0, 0.0],
                "l_tax": [0.0, 0.0],
                "l_returnflag": ["N", "N"],
                "l_linestatus": ["O", "O"],
                "l_shipdate": [pd.Timestamp("1996-09-15")] * 2,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q14_promo_revenue

        out = q14_promo_revenue(str(tmp_path))
        assert out["promo_revenue"].tolist() == [25.0]


class TestQ18:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q18_large_volume_customers

        _check(q18_large_volume_customers, "q18_large_volume_customers")

    def test_having_threshold_exact(self, ray_session, tmp_path):
        """sum(quantity) == 300 is NOT > 300 — the boundary order must be
        excluded; 300.01 must be included (centi-unit exactness)."""
        pd.DataFrame(
            {"c_custkey": [1], "c_name": ["c1"], "c_nationkey": [0],
             "c_acctbal": [0.0], "c_mktsegment": ["BUILDING"]}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {
                "o_orderkey": [1, 2],
                "o_custkey": [1, 1],
                "o_orderstatus": ["O", "O"],
                "o_totalprice": [10.0, 20.0],
                "o_orderdate": [pd.Timestamp("1997-01-01")] * 2,
                "o_orderpriority": ["1-URGENT"] * 2,
            }
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 2],
                "l_partkey": [1] * 4,
                "l_suppkey": [1] * 4,
                "l_linenumber": [1, 2, 1, 2],
                "l_quantity": [150.0, 150.0, 150.0, 150.01],
                "l_extendedprice": [1.0] * 4,
                "l_discount": [0.0] * 4,
                "l_tax": [0.0] * 4,
                "l_returnflag": ["N"] * 4,
                "l_linestatus": ["O"] * 4,
                "l_shipdate": [pd.Timestamp("1997-02-01")] * 4,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q18_large_volume_customers

        out = q18_large_volume_customers(str(tmp_path))
        assert out["o_orderkey"].tolist() == [2]
        assert out["sum_qty"].tolist() == [300.01]


class TestQ7:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q7_volume_shipping

        _check(q7_volume_shipping, "q7_volume_shipping")

    def test_same_nation_volume_excluded(self, ray_session, tmp_path):
        """supp_nation == cust_nation rows must not appear, and each
        direction aggregates separately."""
        pd.DataFrame(
            {"n_nationkey": [2, 7], "n_name": ["NATION_13", "NATION_19"],
             "n_regionkey": [0, 0]}
        ).to_parquet(tmp_path / "nation.parquet")
        pd.DataFrame(
            {"s_suppkey": [1, 2], "s_name": ["a", "b"], "s_nationkey": [2, 7],
             "s_acctbal": [0.0, 0.0]}
        ).to_parquet(tmp_path / "supplier.parquet")
        pd.DataFrame(
            {"c_custkey": [10, 20], "c_name": ["x", "y"], "c_nationkey": [7, 2],
             "c_acctbal": [0.0, 0.0], "c_mktsegment": ["BUILDING"] * 2}
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {
                "o_orderkey": [100, 200],
                "o_custkey": [10, 20],
                "o_orderstatus": ["O"] * 2,
                "o_totalprice": [1.0] * 2,
                "o_orderdate": [pd.Timestamp("1997-01-01")] * 2,
                "o_orderpriority": ["1-URGENT"] * 2,
            }
        ).to_parquet(tmp_path / "orders.parquet")
        # order 100 (cust NATION_19): supp 1 (NATION_13) -> cross, 5.0;
        #                              supp 2 (NATION_19) -> same nation, dropped.
        # order 200 (cust NATION_13): supp 2 (NATION_19) -> cross, 3.0.
        pd.DataFrame(
            {
                "l_orderkey": [100, 100, 200],
                "l_partkey": [1] * 3,
                "l_suppkey": [1, 2, 2],
                "l_linenumber": [1, 2, 1],
                "l_quantity": [1.0] * 3,
                "l_extendedprice": [5.0, 99.0, 3.0],
                "l_discount": [0.0] * 3,
                "l_tax": [0.0] * 3,
                "l_returnflag": ["N"] * 3,
                "l_linestatus": ["O"] * 3,
                "l_shipdate": [pd.Timestamp("1997-06-01")] * 3,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q7_volume_shipping

        out = q7_volume_shipping(str(tmp_path))
        assert out[["supp_nation", "cust_nation"]].values.tolist() == [
            ["NATION_13", "NATION_19"],
            ["NATION_19", "NATION_13"],
        ]
        assert out["revenue"].tolist() == [5.0, 3.0]
        assert out["l_year"].tolist() == [1997, 1997]


class TestQ8:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q8_market_share

        _check(q8_market_share, "q8_market_share")

    def test_share_scoped_to_region_window(self, ray_session, tmp_path):
        """Only in-region, in-window orders enter the denominator, and
        the numerator counts only the target nation's suppliers."""
        pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["ASIA", "AFRICA"]}
                     ).to_parquet(tmp_path / "region.parquet")
        pd.DataFrame(
            {"n_nationkey": [12, 3, 5],
             "n_name": ["NATION_12", "NATION_3", "NATION_5"],
             "n_regionkey": [0, 0, 1]}
        ).to_parquet(tmp_path / "nation.parquet")
        pd.DataFrame(
            {"p_partkey": [1, 2], "p_name": ["x", "y"],
             "p_brand": ["B", "B"], "p_type": ["ECONOMY", "STANDARD"],
             "p_size": [1, 1], "p_retailprice": [1.0, 1.0]}
        ).to_parquet(tmp_path / "part.parquet")
        pd.DataFrame(
            {"s_suppkey": [1, 2], "s_name": ["a", "b"],
             "s_nationkey": [12, 3], "s_acctbal": [0.0, 0.0]}
        ).to_parquet(tmp_path / "supplier.parquet")
        # cust 10 in-region (NATION_3/ASIA); cust 20 out-of-region.
        pd.DataFrame(
            {"c_custkey": [10, 20], "c_name": ["x", "y"],
             "c_nationkey": [3, 5], "c_acctbal": [0.0, 0.0],
             "c_mktsegment": ["BUILDING"] * 2}
        ).to_parquet(tmp_path / "customer.parquet")
        # order 100: in-region, in-window. order 200: out-of-region.
        # order 300: in-region but outside the date window.
        pd.DataFrame(
            {
                "o_orderkey": [100, 200, 300],
                "o_custkey": [10, 20, 10],
                "o_orderstatus": ["O"] * 3,
                "o_totalprice": [1.0] * 3,
                "o_orderdate": [
                    pd.Timestamp("1995-06-01"),
                    pd.Timestamp("1995-06-01"),
                    pd.Timestamp("1999-06-01"),
                ],
                "o_orderpriority": ["1-URGENT"] * 3,
            }
        ).to_parquet(tmp_path / "orders.parquet")
        # On order 100: target-nation supplier sells 30, other 70 (ECONOMY
        # part), non-ECONOMY part excluded entirely; orders 200/300 dropped.
        pd.DataFrame(
            {
                "l_orderkey": [100, 100, 100, 200, 300],
                "l_partkey": [1, 1, 2, 1, 1],
                "l_suppkey": [1, 2, 1, 1, 1],
                "l_linenumber": [1, 2, 3, 1, 1],
                "l_quantity": [1.0] * 5,
                "l_extendedprice": [30.0, 70.0, 99.0, 50.0, 50.0],
                "l_discount": [0.0] * 5,
                "l_tax": [0.0] * 5,
                "l_returnflag": ["N"] * 5,
                "l_linestatus": ["O"] * 5,
                "l_shipdate": [pd.Timestamp("1995-07-01")] * 5,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q8_market_share

        out = q8_market_share(str(tmp_path))
        assert out["o_year"].tolist() == [1995]
        assert out["mkt_share"].tolist() == [0.3]


class TestQ13:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q13_customer_distribution

        _check(q13_customer_distribution, "q13_customer_distribution")

    def test_zero_order_customers_counted(self, ray_session, tmp_path):
        """Customers with no (non-urgent) orders must appear in the
        c_count=0 bin — the left-outer semantics."""
        pd.DataFrame(
            {"c_custkey": [1, 2, 3], "c_name": ["a", "b", "c"],
             "c_nationkey": [0] * 3, "c_acctbal": [0.0] * 3,
             "c_mktsegment": ["BUILDING"] * 3}
        ).to_parquet(tmp_path / "customer.parquet")
        # cust 1: two kept orders; cust 2: one urgent order (filtered ->
        # counts as zero); cust 3: no orders at all.
        pd.DataFrame(
            {
                "o_orderkey": [10, 11, 12],
                "o_custkey": [1, 1, 2],
                "o_orderstatus": ["O"] * 3,
                "o_totalprice": [1.0] * 3,
                "o_orderdate": [pd.Timestamp("1996-01-01")] * 3,
                "o_orderpriority": ["5-LOW", "5-LOW", "1-URGENT"],
            }
        ).to_parquet(tmp_path / "orders.parquet")
        from exstruct_ray.queries import q13_customer_distribution

        out = q13_customer_distribution(str(tmp_path))
        assert out[["c_count", "custdist"]].values.tolist() == [
            [0, 2],
            [2, 1],
        ]


class TestQ19:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q19_discounted_revenue

        _check(q19_discounted_revenue, "q19_discounted_revenue")

    def test_clause_boundaries(self, ray_session, tmp_path):
        """Each OR clause gates on its own brand x size x quantity box;
        a quantity one unit outside the box must drop the line."""
        pd.DataFrame(
            {"p_partkey": [1, 2], "p_name": ["x", "y"],
             "p_brand": ["Brand#11", "Brand#13"],
             "p_type": ["ECONOMY"] * 2, "p_size": [5, 15],
             "p_retailprice": [1.0, 1.0]}
        ).to_parquet(tmp_path / "part.parquet")
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 1],
                "l_partkey": [1, 1, 2, 2],
                "l_suppkey": [1] * 4,
                "l_linenumber": [1, 2, 3, 4],
                # part 1 (Brand#11, size 5): qty 11 in-box, 12 out.
                # part 2 (Brand#13, size 15): qty 20 in-box, 19 out.
                "l_quantity": [11.0, 12.0, 20.0, 19.0],
                "l_extendedprice": [10.0, 100.0, 7.0, 100.0],
                "l_discount": [0.0] * 4,
                "l_tax": [0.0] * 4,
                "l_returnflag": ["N"] * 4,
                "l_linestatus": ["O"] * 4,
                "l_shipdate": [pd.Timestamp("1996-01-01")] * 4,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q19_discounted_revenue

        out = q19_discounted_revenue(str(tmp_path))
        assert out["revenue"].tolist() == [17.0]


class TestQ4:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q4_order_priority

        _check(q4_order_priority, "q4_order_priority")

    def test_exists_counts_order_once(self, ray_session, tmp_path):
        """EXISTS semantics: an order with three 'R' lines counts once;
        an order with no 'R' line is excluded; out-of-window orders are
        excluded even with 'R' lines."""
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],
                "o_custkey": [1, 1, 1],
                "o_orderstatus": ["O"] * 3,
                "o_totalprice": [1.0] * 3,
                "o_orderdate": [
                    pd.Timestamp("1996-02-01"),
                    pd.Timestamp("1996-02-01"),
                    pd.Timestamp("1997-02-01"),
                ],
                "o_orderpriority": ["2-HIGH", "2-HIGH", "2-HIGH"],
            }
        ).to_parquet(tmp_path / "orders.parquet")
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 2, 3],
                "l_partkey": [1] * 5,
                "l_suppkey": [1] * 5,
                "l_linenumber": [1, 2, 3, 1, 1],
                "l_quantity": [1.0] * 5,
                "l_extendedprice": [1.0] * 5,
                "l_discount": [0.0] * 5,
                "l_tax": [0.0] * 5,
                "l_returnflag": ["R", "R", "R", "N", "R"],
                "l_linestatus": ["O"] * 5,
                "l_shipdate": [pd.Timestamp("1996-03-01")] * 5,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q4_order_priority

        out = q4_order_priority(str(tmp_path))
        assert out["o_orderpriority"].tolist() == ["2-HIGH"]
        assert out["order_count"].tolist() == [1]


class TestQ9:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q9_product_type_profit

        _check(q9_product_type_profit, "q9_product_type_profit")

    def test_profit_is_revenue_minus_cost(self, ray_session, tmp_path):
        """profit = ep*(1-disc) - retail*qty for '%red%' parts only,
        grouped by the SUPPLIER's nation and the ORDER's year."""
        pd.DataFrame(
            {"n_nationkey": [0, 1], "n_name": ["NATION_A", "NATION_B"],
             "n_regionkey": [0, 0]}
        ).to_parquet(tmp_path / "nation.parquet")
        pd.DataFrame(
            {"p_partkey": [1, 2], "p_name": ["red widget", "blue bolt"],
             "p_brand": ["B"] * 2, "p_type": ["ECONOMY"] * 2,
             "p_size": [1] * 2, "p_retailprice": [10.0, 10.0]}
        ).to_parquet(tmp_path / "part.parquet")
        pd.DataFrame(
            {"s_suppkey": [1, 2], "s_name": ["a", "b"],
             "s_nationkey": [0, 1], "s_acctbal": [0.0] * 2}
        ).to_parquet(tmp_path / "supplier.parquet")
        pd.DataFrame(
            {
                "o_orderkey": [100, 200],
                "o_custkey": [1, 1],
                "o_orderstatus": ["O"] * 2,
                "o_totalprice": [1.0] * 2,
                "o_orderdate": [
                    pd.Timestamp("1996-06-01"),
                    pd.Timestamp("1997-06-01"),
                ],
                "o_orderpriority": ["5-LOW"] * 2,
            }
        ).to_parquet(tmp_path / "orders.parquet")
        # line 1: red part, supp nation A, 1996: 100*(1-0) - 10*2 = 80.
        # line 2: red part, supp nation B, 1997: 50 - 10*1 = 40.
        # line 3: blue part — excluded entirely.
        pd.DataFrame(
            {
                "l_orderkey": [100, 200, 100],
                "l_partkey": [1, 1, 2],
                "l_suppkey": [1, 2, 1],
                "l_linenumber": [1, 1, 2],
                "l_quantity": [2.0, 1.0, 5.0],
                "l_extendedprice": [100.0, 50.0, 999.0],
                "l_discount": [0.0] * 3,
                "l_tax": [0.0] * 3,
                "l_returnflag": ["N"] * 3,
                "l_linestatus": ["O"] * 3,
                "l_shipdate": [pd.Timestamp("1996-07-01")] * 3,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q9_product_type_profit

        out = q9_product_type_profit(str(tmp_path))
        assert out[["nation", "o_year"]].values.tolist() == [
            ["NATION_A", 1996],
            ["NATION_B", 1997],
        ]
        assert out["profit"].tolist() == [80.0, 40.0]


class TestQ15:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q15_top_supplier

        _check(q15_top_supplier, "q15_top_supplier")

    def test_ties_and_window(self, ray_session, tmp_path):
        """Two suppliers tied at the max both surface; revenue outside
        the ship window doesn't count toward the max."""
        pd.DataFrame(
            {"s_suppkey": [1, 2, 3], "s_name": ["sa", "sb", "sc"],
             "s_nationkey": [0] * 3, "s_acctbal": [0.0] * 3}
        ).to_parquet(tmp_path / "supplier.parquet")
        # supp 1: 100 in-window. supp 2: 100 in-window. supp 3: 60
        # in-window + 999 OUT of window (must not win).
        pd.DataFrame(
            {
                "l_orderkey": [1, 2, 3, 4],
                "l_partkey": [1] * 4,
                "l_suppkey": [1, 2, 3, 3],
                "l_linenumber": [1] * 4,
                "l_quantity": [1.0] * 4,
                "l_extendedprice": [100.0, 100.0, 60.0, 999.0],
                "l_discount": [0.0] * 4,
                "l_tax": [0.0] * 4,
                "l_returnflag": ["N"] * 4,
                "l_linestatus": ["O"] * 4,
                "l_shipdate": [
                    pd.Timestamp("1996-02-01"),
                    pd.Timestamp("1996-02-01"),
                    pd.Timestamp("1996-02-01"),
                    pd.Timestamp("1999-02-01"),
                ],
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q15_top_supplier

        out = q15_top_supplier(str(tmp_path))
        assert out["s_suppkey"].tolist() == [1, 2]
        assert out["s_name"].tolist() == ["sa", "sb"]
        assert out["total_revenue"].tolist() == [100.0, 100.0]


class TestQ17:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q17_small_quantity_revenue

        _check(q17_small_quantity_revenue, "q17_small_quantity_revenue")

    def test_below_fifth_of_part_average(self, ray_session, tmp_path):
        """Only lines with quantity STRICTLY below 0.2x their own part's
        average quantity contribute; other brands are invisible."""
        pd.DataFrame(
            {"p_partkey": [1, 2], "p_name": ["x", "y"],
             "p_brand": ["Brand#15", "Brand#99"],
             "p_type": ["ECONOMY"] * 2, "p_size": [1] * 2,
             "p_retailprice": [1.0] * 2}
        ).to_parquet(tmp_path / "part.parquet")
        # Part 1 avg qty = (50+50+4)/3 = 34.666; 0.2*avg = 6.933:
        # the qty-4 line (price 70) qualifies, qty-50 lines don't.
        # Part 2 (other brand) would qualify but must be excluded.
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 2],
                "l_partkey": [1, 1, 1, 2],
                "l_suppkey": [1] * 4,
                "l_linenumber": [1, 2, 3, 1],
                "l_quantity": [50.0, 50.0, 4.0, 1.0],
                "l_extendedprice": [10.0, 10.0, 70.0, 999.0],
                "l_discount": [0.0] * 4,
                "l_tax": [0.0] * 4,
                "l_returnflag": ["N"] * 4,
                "l_linestatus": ["O"] * 4,
                "l_shipdate": [pd.Timestamp("1996-01-01")] * 4,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        from exstruct_ray.queries import q17_small_quantity_revenue

        out = q17_small_quantity_revenue(str(tmp_path))
        assert out["avg_yearly"].tolist() == [70.0 / 7.0]


class TestQ22:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q22_global_sales_opportunity

        # sf0.001 has so few customers that every above-average one has
        # orders — 0 rows is the oracle-confirmed answer at this scale.
        _check(
            q22_global_sales_opportunity,
            "q22_global_sales_opportunity",
            min_rows=0,
        )

    def test_anti_join_and_average_gate(self, ray_session, tmp_path):
        """Kept: above-avg balance AND no orders. Dropped: has orders,
        or balance at/below the positive average, or nation outside the
        set."""
        pd.DataFrame(
            {"n_nationkey": [3, 9], "n_name": ["NATION_3", "NATION_9"],
             "n_regionkey": [0, 0]}
        ).to_parquet(tmp_path / "nation.parquet")
        # Positive balances in-set: 100, 900, 500 -> avg = 500.
        # cust 1 (bal 900, no orders): kept.
        # cust 2 (bal 900, HAS an order): anti-joined away.
        # cust 3 (bal 500 == avg, strict >): dropped.
        # cust 4 (bal 100): below avg.
        # cust 5 (bal 9999, NATION_9 not in set): invisible.
        pd.DataFrame(
            {
                "c_custkey": [1, 2, 3, 4, 5],
                "c_name": list("abcde"),
                "c_nationkey": [3, 3, 3, 3, 9],
                "c_acctbal": [900.0, 900.0, 500.0, 100.0, 9999.0],
                "c_mktsegment": ["BUILDING"] * 5,
            }
        ).to_parquet(tmp_path / "customer.parquet")
        pd.DataFrame(
            {
                "o_orderkey": [10],
                "o_custkey": [2],
                "o_orderstatus": ["O"],
                "o_totalprice": [1.0],
                "o_orderdate": [pd.Timestamp("1996-01-01")],
                "o_orderpriority": ["5-LOW"],
            }
        ).to_parquet(tmp_path / "orders.parquet")
        from exstruct_ray.queries import q22_global_sales_opportunity

        out = q22_global_sales_opportunity(str(tmp_path))
        assert out["cntrycode"].tolist() == ["NATION_3"]
        assert out["numcust"].tolist() == [1]
        assert out["totacctbal"].tolist() == [900.0]


def _mini_tables(tmp_path, **over):
    """Write a minimal consistent 7-table star into tmp_path; per-table
    overrides replace the default frame wholesale."""
    defaults = {
        "region": pd.DataFrame(
            {"r_regionkey": [0, 1], "r_name": ["EUROPE", "ASIA"]}
        ),
        "nation": pd.DataFrame(
            {
                "n_nationkey": [0, 1, 3],
                "n_name": ["NATION_0", "NATION_1", "NATION_3"],
                "n_regionkey": [0, 1, 1],
            }
        ),
        "customer": pd.DataFrame(
            {
                "c_custkey": [1],
                "c_name": ["c"],
                "c_nationkey": [0],
                "c_acctbal": [0.0],
                "c_mktsegment": ["BUILDING"],
            }
        ),
        "supplier": pd.DataFrame(
            {
                "s_suppkey": [10, 11, 12],
                "s_name": ["SA", "SB", "SC"],
                "s_nationkey": [0, 0, 1],
                "s_acctbal": [100.0, 100.0, 900.0],
            }
        ),
        "part": pd.DataFrame(
            {
                "p_partkey": [1, 2],
                "p_name": ["pa", "pb"],
                "p_brand": ["Brand#1", "Brand#2"],
                "p_type": ["LARGE", "PROMO"],
                "p_size": [5, 1],
                "p_retailprice": [10.0, 20.0],
            }
        ),
        "orders": pd.DataFrame(
            {
                "o_orderkey": [100, 101],
                "o_custkey": [1, 1],
                "o_orderstatus": ["F", "O"],
                "o_totalprice": [1.0, 1.0],
                "o_orderdate": [pd.Timestamp("1997-06-01")] * 2,
                "o_orderpriority": ["1-URGENT", "5-LOW"],
            }
        ),
        "lineitem": pd.DataFrame(
            {
                "l_orderkey": [100, 100],
                "l_partkey": [1, 2],
                "l_suppkey": [10, 11],
                "l_linenumber": [1, 2],
                "l_quantity": [1.0, 2.0],
                "l_extendedprice": [10.0, 20.0],
                "l_discount": [0.0, 0.0],
                "l_tax": [0.0, 0.0],
                "l_returnflag": ["N", "R"],
                "l_linestatus": ["O", "F"],
                "l_shipdate": [pd.Timestamp("1997-07-01")] * 2,
            }
        ),
    }
    defaults.update(over)
    for name, df in defaults.items():
        df.to_parquet(tmp_path / f"{name}.parquet")


class TestQ2:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q2_min_cost_supplier

        _check(q2_min_cost_supplier, "q2_min_cost_supplier")

    def test_acctbal_ties_all_kept(self, ray_session, tmp_path):
        """Two EUROPE suppliers share the per-part max acctbal -> both
        rows survive (the correlated MAX keeps ties), while the
        higher-balance non-EUROPE supplier is invisible."""
        _mini_tables(
            tmp_path,
            lineitem=pd.DataFrame(
                {
                    "l_orderkey": [100, 100, 100],
                    "l_partkey": [1, 1, 1],
                    "l_suppkey": [10, 11, 12],
                    "l_linenumber": [1, 2, 3],
                    "l_quantity": [1.0] * 3,
                    "l_extendedprice": [1.0] * 3,
                    "l_discount": [0.0] * 3,
                    "l_tax": [0.0] * 3,
                    "l_returnflag": ["N"] * 3,
                    "l_linestatus": ["O"] * 3,
                    "l_shipdate": [pd.Timestamp("1997-07-01")] * 3,
                }
            ),
        )
        from exstruct_ray.queries import q2_min_cost_supplier

        out = q2_min_cost_supplier(str(tmp_path))
        # suppliers 10/11 (EUROPE via NATION_0, bal 100 == 100) both kept;
        # supplier 12 (bal 900) is ASIA and must not shadow them.
        assert sorted(out["s_name"]) == ["SA", "SB"]
        assert set(out["p_partkey"]) == {1}


class TestQ11:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q11_important_stock

        _check(q11_important_stock, "q11_important_stock")

    def test_threshold_is_strict(self, ray_session, tmp_path):
        """A part holding exactly 1/1000 of total value is excluded
        (val_c * 1000 > total is strict); one above survives."""
        n = 1000
        _mini_tables(
            tmp_path,
            part=pd.DataFrame(
                {
                    "p_partkey": list(range(1, n + 1)),
                    "p_name": ["p"] * n,
                    "p_brand": ["Brand#1"] * n,
                    "p_type": ["LARGE"] * n,
                    "p_size": [1] * n,
                    "p_retailprice": [1.0] * n,
                }
            ),
            lineitem=pd.DataFrame(
                {
                    # 999 parts at $1, part 1000 at $2: total 1001.
                    # part 1000: 200000*1000 > 100100000? 2e8 > 1.001e8 yes.
                    # $1 parts: 1e5*1000 = 1e8 < 1.001e8 -> excluded.
                    "l_orderkey": [100] * n,
                    "l_partkey": list(range(1, n + 1)),
                    "l_suppkey": [10] * n,
                    "l_linenumber": list(range(1, n + 1)),
                    "l_quantity": [1.0] * n,
                    "l_extendedprice": [1.0] * (n - 1) + [2.0],
                    "l_discount": [0.0] * n,
                    "l_tax": [0.0] * n,
                    "l_returnflag": ["N"] * n,
                    "l_linestatus": ["O"] * n,
                    "l_shipdate": [pd.Timestamp("1997-07-01")] * n,
                }
            ),
        )
        from exstruct_ray.queries import q11_important_stock

        out = q11_important_stock(str(tmp_path))
        assert out["p_partkey"].tolist() == [1000]
        assert out["total_value"].tolist() == [2.0]


class TestQ12:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q12_linestatus_priority

        _check(q12_linestatus_priority, "q12_linestatus_priority")

    def test_priority_split(self, ray_session, tmp_path):
        """Lines split by their ORDER's priority: the urgent order's
        two lines land in high, the low order's one line in low; a
        line shipped outside 1997 is invisible."""
        _mini_tables(
            tmp_path,
            lineitem=pd.DataFrame(
                {
                    "l_orderkey": [100, 100, 101, 101],
                    "l_partkey": [1, 1, 1, 1],
                    "l_suppkey": [10] * 4,
                    "l_linenumber": [1, 2, 1, 2],
                    "l_quantity": [1.0] * 4,
                    "l_extendedprice": [1.0] * 4,
                    "l_discount": [0.0] * 4,
                    "l_tax": [0.0] * 4,
                    "l_returnflag": ["N"] * 4,
                    "l_linestatus": ["F", "F", "F", "F"],
                    "l_shipdate": [
                        pd.Timestamp("1997-07-01"),
                        pd.Timestamp("1997-08-01"),
                        pd.Timestamp("1997-09-01"),
                        pd.Timestamp("1999-01-01"),  # outside window
                    ],
                }
            ),
        )
        from exstruct_ray.queries import q12_linestatus_priority

        out = q12_linestatus_priority(str(tmp_path))
        assert out["l_linestatus"].tolist() == ["F"]
        assert out["high_line_count"].tolist() == [2]
        assert out["low_line_count"].tolist() == [1]


class TestQ16:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q16_parts_supplier

        _check(q16_parts_supplier, "q16_parts_supplier")

    def test_distinct_across_parts_and_exclusion(self, ray_session, tmp_path):
        """Two parts in the SAME (brand,type,size) group supplied by the
        same supplier count it ONCE; a negative-balance supplier is
        excluded entirely."""
        _mini_tables(
            tmp_path,
            part=pd.DataFrame(
                {
                    "p_partkey": [1, 2],
                    "p_name": ["pa", "pb"],
                    "p_brand": ["Brand#1", "Brand#1"],
                    "p_type": ["LARGE", "LARGE"],
                    "p_size": [1, 1],
                    "p_retailprice": [1.0, 1.0],
                }
            ),
            supplier=pd.DataFrame(
                {
                    "s_suppkey": [10, 11],
                    "s_name": ["SA", "SBAD"],
                    "s_nationkey": [0, 0],
                    "s_acctbal": [100.0, -5.0],
                }
            ),
            lineitem=pd.DataFrame(
                {
                    "l_orderkey": [100, 100, 100],
                    "l_partkey": [1, 2, 1],
                    "l_suppkey": [10, 10, 11],
                    "l_linenumber": [1, 2, 3],
                    "l_quantity": [1.0] * 3,
                    "l_extendedprice": [1.0] * 3,
                    "l_discount": [0.0] * 3,
                    "l_tax": [0.0] * 3,
                    "l_returnflag": ["N"] * 3,
                    "l_linestatus": ["O"] * 3,
                    "l_shipdate": [pd.Timestamp("1997-07-01")] * 3,
                }
            ),
        )
        from exstruct_ray.queries import q16_parts_supplier

        out = q16_parts_supplier(str(tmp_path))
        assert len(out) == 1
        assert out["supplier_cnt"].tolist() == [1]
        assert out["p_size"].tolist() == [1]


class TestQ20:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q20_potential_promotion

        _check(q20_potential_promotion, "q20_potential_promotion")

    def test_half_share_excluded(self, ray_session, tmp_path):
        """Exactly 50% of a part's 1995 volume does NOT qualify
        (2*q > tq strict); a 60% share from a NATION_3 supplier does."""
        _mini_tables(
            tmp_path,
            supplier=pd.DataFrame(
                {
                    "s_suppkey": [10, 11, 12],
                    "s_name": ["SA", "SB", "SC"],
                    "s_nationkey": [3, 3, 3],
                    "s_acctbal": [1.0, 2.0, 3.0],
                }
            ),
            lineitem=pd.DataFrame(
                {
                    # part 2 is PROMO. Suppliers 10/11 split it 50/50
                    # (neither qualifies); supplier 12 ships 60% of a
                    # second PROMO part vs 40% from supplier 10.
                    "l_orderkey": [100] * 4,
                    "l_partkey": [2, 2, 3, 3],
                    "l_suppkey": [10, 11, 12, 10],
                    "l_linenumber": [1, 2, 3, 4],
                    "l_quantity": [5.0, 5.0, 6.0, 4.0],
                    "l_extendedprice": [1.0] * 4,
                    "l_discount": [0.0] * 4,
                    "l_tax": [0.0] * 4,
                    "l_returnflag": ["N"] * 4,
                    "l_linestatus": ["O"] * 4,
                    "l_shipdate": [pd.Timestamp("1995-06-01")] * 4,
                }
            ),
            part=pd.DataFrame(
                {
                    "p_partkey": [2, 3],
                    "p_name": ["pa", "pb"],
                    "p_brand": ["Brand#1", "Brand#1"],
                    "p_type": ["PROMO", "PROMO"],
                    "p_size": [1, 1],
                    "p_retailprice": [1.0, 1.0],
                }
            ),
        )
        from exstruct_ray.queries import q20_potential_promotion

        out = q20_potential_promotion(str(tmp_path))
        assert out["s_name"].tolist() == ["SC"]


class TestQ21:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import q21_waiting_suppliers

        _check(q21_waiting_suppliers, "q21_waiting_suppliers")

    def test_sole_returner_rules(self, ray_session, tmp_path):
        """Counted: sole returner among >=2 suppliers on an F order.
        Not counted: two returners on one order, single-supplier
        orders, and O-status orders."""
        _mini_tables(
            tmp_path,
            orders=pd.DataFrame(
                {
                    "o_orderkey": [100, 101, 102, 103],
                    "o_custkey": [1] * 4,
                    "o_orderstatus": ["F", "F", "F", "O"],
                    "o_totalprice": [1.0] * 4,
                    "o_orderdate": [pd.Timestamp("1997-06-01")] * 4,
                    "o_orderpriority": ["5-LOW"] * 4,
                }
            ),
            lineitem=pd.DataFrame(
                {
                    # 100: supp 10 returns, supp 11 clean -> 10 counts.
                    # 101: both return -> nobody counts.
                    # 102: single supplier returns -> not multi-supplier.
                    # 103: sole returner but order is O-status.
                    "l_orderkey": [100, 100, 101, 101, 102, 103, 103],
                    "l_partkey": [1] * 7,
                    "l_suppkey": [10, 11, 10, 11, 10, 10, 11],
                    "l_linenumber": [1, 2, 1, 2, 1, 1, 2],
                    "l_quantity": [1.0] * 7,
                    "l_extendedprice": [1.0] * 7,
                    "l_discount": [0.0] * 7,
                    "l_tax": [0.0] * 7,
                    "l_returnflag": ["R", "N", "R", "R", "R", "R", "N"],
                    "l_linestatus": ["O"] * 7,
                    "l_shipdate": [pd.Timestamp("1997-07-01")] * 7,
                }
            ),
        )
        from exstruct_ray.queries import q21_waiting_suppliers

        out = q21_waiting_suppliers(str(tmp_path))
        assert out["s_name"].tolist() == ["SA"]
        assert out["numwait"].tolist() == [1]


class TestNewShapesEmptyPaths:
    """The zero-qualifying-row guards: every new query must return its
    typed empty frame (right columns, right dtypes) instead of crashing
    on the zero-column-block gotcha."""

    def test_q2_no_region_match(self, ray_session, tmp_path):
        _mini_tables(
            tmp_path,
            region=pd.DataFrame(
                {"r_regionkey": [0], "r_name": ["NOWHERE"]}
            ),
        )
        from exstruct_ray.queries import q2_min_cost_supplier

        out = q2_min_cost_supplier(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == [
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand"
        ]

    def test_q11_no_region_match(self, ray_session, tmp_path):
        _mini_tables(
            tmp_path,
            region=pd.DataFrame(
                {"r_regionkey": [0], "r_name": ["NOWHERE"]}
            ),
        )
        from exstruct_ray.queries import q11_important_stock

        out = q11_important_stock(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == ["p_partkey", "total_value"]

    def test_q20_no_promo_parts(self, ray_session, tmp_path):
        _mini_tables(
            tmp_path,
            part=pd.DataFrame(
                {
                    "p_partkey": [1],
                    "p_name": ["pa"],
                    "p_brand": ["Brand#1"],
                    "p_type": ["LARGE"],
                    "p_size": [5],
                    "p_retailprice": [10.0],
                }
            ),
        )
        from exstruct_ray.queries import q20_potential_promotion

        out = q20_potential_promotion(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == ["s_name", "s_acctbal"]

    def test_q21_no_finished_orders(self, ray_session, tmp_path):
        _mini_tables(
            tmp_path,
            orders=pd.DataFrame(
                {
                    "o_orderkey": [100],
                    "o_custkey": [1],
                    "o_orderstatus": ["O"],
                    "o_totalprice": [1.0],
                    "o_orderdate": [pd.Timestamp("1997-06-01")],
                    "o_orderpriority": ["5-LOW"],
                }
            ),
        )
        from exstruct_ray.queries import q21_waiting_suppliers

        out = q21_waiting_suppliers(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == ["s_name", "numwait"]

    def test_q16_all_parts_excluded(self, ray_session, tmp_path):
        _mini_tables(
            tmp_path,
            part=pd.DataFrame(
                {
                    "p_partkey": [1],
                    "p_name": ["pa"],
                    "p_brand": ["Brand#45"],  # excluded brand
                    "p_type": ["LARGE"],
                    "p_size": [1],
                    "p_retailprice": [1.0],
                }
            ),
        )
        from exstruct_ray.queries import q16_parts_supplier

        out = q16_parts_supplier(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == [
            "p_brand", "p_type", "p_size", "supplier_cnt"
        ]
