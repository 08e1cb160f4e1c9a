"""Histogram + rollup profiling aggregate tests."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _write_events(tmp_path, values, types=None, hours=None):
    n = len(values)
    frame = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                [
                    f"2024-01-01 {h:02d}:15:00"
                    for h in (hours or [0] * n)
                ]
            ),
            "user_id": np.arange(n, dtype=np.int64),
            "event_type": types or ["t"] * n,
            "value": np.asarray(values, dtype=np.float64),
            "props": "{}",
        }
    )
    frame.to_parquet(tmp_path / "events.parquet")
    return frame


class TestValueHistogram:
    def test_edges_and_counts(self, ray_session, tmp_path):
        from exstruct_ray.queries import events_value_histogram

        # min lands in bin 0, max in bin 31, everything counted once
        _write_events(tmp_path, [0.0, 1.0, 2.0, 3.2, 3.2, 3.2])
        out = events_value_histogram(str(tmp_path))
        assert len(out) == 32
        assert out["n"].sum() == 6
        assert out.loc[0, "n"] >= 1  # the minimum
        assert out.loc[31, "n"] == 3  # the three maxima

    def test_matches_sql_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import ORACLE_SQL, events_value_histogram

        rng = np.random.default_rng(5)
        _write_events(tmp_path, rng.normal(size=200) * 7.3)
        out = events_value_histogram(str(tmp_path))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        expected = con.execute(ORACLE_SQL["events_value_histogram"]).df()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True),
            expected.reset_index(drop=True),
            check_dtype=False,
        )


class TestHourlyRollup:
    def test_levels_consistent_and_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import ORACLE_SQL, events_hourly_rollup

        _write_events(
            tmp_path,
            [1.0, 2.0, 3.0, 4.0, 5.5],
            types=["a", "a", "b", "b", "b"],
            hours=[0, 1, 0, 0, 2],
        )
        out = events_hourly_rollup(str(tmp_path))
        leaf = out[out["lvl"] == 0]
        mid = out[out["lvl"] == 1].set_index("event_type")
        top = out[out["lvl"] == 2].iloc[0]
        # per-type level equals the sum of its leaves
        for t in ("a", "b"):
            sel = leaf[leaf["event_type"] == t]
            assert mid.loc[t, "n"] == sel["n"].sum()
            assert mid.loc[t, "vsum_micro"] == sel["vsum_micro"].sum()
        assert top["n"] == leaf["n"].sum()
        assert top["vsum_micro"] == leaf["vsum_micro"].sum()

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        expected = con.execute(ORACLE_SQL["events_hourly_rollup"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
