"""The local oracle harness must catch dtype drift the driver's value-hash
would catch — the class of bug that shipped three latent failures in round
3 (DuckDB HUGEINT/DECIMAL outputs rendered as float64/object against
engine int64/float64, numerically equal, hash-mismatched)."""

import importlib.util
import pathlib

import duckdb
import pandas as pd

_SCRIPT = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "check_oracles.py"
_spec = importlib.util.spec_from_file_location("check_oracles", _SCRIPT)
check_oracles = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracles)


class TestDtypeGate:
    def test_injected_hugeint_fails(self):
        """A window-SUM (HUGEINT) oracle column vs an engine int64 column:
        values equal, dtypes differ — the old int64 normalization masked
        this; the harness must now flag it."""
        sql_df = duckdb.sql(
            "SELECT CAST(x AS HUGEINT) * 1000000007 AS v"
            " FROM (VALUES (1), (2), (3)) t(x)"
        ).df()
        assert sql_df["v"].dtype != "int64"  # the DuckDB rendering drifts
        ray_df = pd.DataFrame({"v": pd.array([1000000007, 2000000014, 3000000021], dtype="int64")})
        verdict = check_oracles.compare("t", ray_df, sql_df)
        assert verdict.startswith("DTYPE MISMATCH")

    def test_injected_decimal_fails(self):
        sql_df = duckdb.sql("SELECT CAST(0.25 AS DECIMAL(3,2)) AS q").df()
        ray_df = pd.DataFrame({"q": pd.array([0.25], dtype="float64")})
        if sql_df["q"].dtype == "float64":
            # duckdb version renders DECIMAL as float64 — equal dtypes, OK
            assert check_oracles.compare("t", ray_df, sql_df) == "OK"
        else:
            assert check_oracles.compare("t", ray_df, sql_df).startswith(
                "DTYPE MISMATCH"
            )

    def test_matching_dtypes_still_pass(self):
        df_a = pd.DataFrame(
            {"k": ["a", "b"], "n": pd.array([1, 2], dtype="int64"),
             "x": pd.array([0.5, 1.5], dtype="float64")}
        )
        df_b = df_a.copy().iloc[::-1].reset_index(drop=True)
        assert check_oracles.compare("t", df_a, df_b) == "OK"

    def test_datetime_unit_difference_allowed(self):
        a = pd.DataFrame({"ts": pd.to_datetime(["2026-01-01"]).astype("datetime64[ns]")})
        b = pd.DataFrame({"ts": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]")})
        assert check_oracles.compare("t", a, b) == "OK"
