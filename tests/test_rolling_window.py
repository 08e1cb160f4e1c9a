"""Trailing-range rolling window tests (RANGE-frame semantics)."""

import duckdb
import pandas as pd
import pytest


def _write_events(tmp_path, rows):
    frame = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "value"]
    )
    frame["ts"] = pd.to_datetime(frame["ts"])
    frame["event_type"] = "t"
    frame["props"] = "{}"
    frame.to_parquet(tmp_path / "events.parquet")
    return frame


class TestRollingWindow:
    @pytest.fixture(scope="class")
    def events_dir(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("rolling")
        _write_events(
            tmp,
            [
                # user 1: a dense burst
                (0, "2024-01-01 10:00:00", 1, 1.0),
                (1, "2024-01-01 10:30:00", 1, 2.0),
                # exactly one hour after event 0 — RANGE is inclusive
                (2, "2024-01-01 11:00:00", 1, 4.0),
                # 10:30 falls out of [10:30:01, 11:30:01]
                (3, "2024-01-01 11:30:01", 1, 8.0),
                # same-timestamp peers: both must count each other
                (4, "2024-01-01 12:00:00", 1, 16.0),
                (5, "2024-01-01 12:00:00", 1, 32.0),
                # user 2: isolated, negative value
                (6, "2024-01-01 10:15:00", 2, -1.5),
            ],
        )
        return tmp

    def test_hand_computed_frames(self, ray_session, events_dir):
        from exstruct_ray.queries import events_rolling_window

        out = events_rolling_window(str(events_dir)).set_index("event_id")
        assert out.loc[0, "n_window"] == 1
        assert out.loc[1, "n_window"] == 2  # events 0, 1
        assert out.loc[2, "n_window"] == 3  # 10:00 included (inclusive edge)
        assert out.loc[3, "n_window"] == 2  # 11:00, 11:30:01 only
        # frame [11:00, 12:00] holds events 2, 3 and both same-ts peers,
        # which include each other (RANGE, not ROWS)
        assert out.loc[4, "n_window"] == 4
        assert out.loc[5, "n_window"] == 4
        assert out.loc[4, "vsum_micro"] == out.loc[5, "vsum_micro"] == int(
            (4.0 + 8.0 + 16.0 + 32.0) * 1e6
        )
        assert out.loc[6, "n_window"] == 1
        assert out.loc[6, "vsum_micro"] == int(-1.5 * 1e6)

    def test_matches_sql_oracle(self, ray_session, events_dir):
        from exstruct_ray.queries import ORACLE_SQL, events_rolling_window

        out = events_rolling_window(str(events_dir))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{events_dir}/events.parquet')"
        )
        expected = con.execute(ORACLE_SQL["events_rolling_window"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestFunnel:
    def test_boundaries_and_counts(self, ray_session, tmp_path):
        from exstruct_ray.queries import ORACLE_SQL, events_funnel

        rows = [
            # user 1: click at 10:00, purchases at 11:00 (exactly 1h ->
            # included), 11:00:01 (click now outside), 10:30 (inside)
            (0, "2024-01-01 10:00:00", 1, "click"),
            (1, "2024-01-01 11:00:00", 1, "purchase"),
            (2, "2024-01-01 11:00:01", 1, "purchase"),
            (3, "2024-01-01 10:30:00", 1, "purchase"),
            # user 2: click at same instant as purchase -> NOT before
            (4, "2024-01-01 09:00:00", 2, "click"),
            (5, "2024-01-01 09:00:00", 2, "purchase"),
            # user 3: purchase with no click at all
            (6, "2024-01-01 12:00:00", 3, "purchase"),
            # user 4: click after the purchase -> no conversion
            (7, "2024-01-01 13:00:00", 4, "purchase"),
            (8, "2024-01-01 13:30:00", 4, "click"),
        ]
        frame = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type"]
        )
        frame["ts"] = pd.to_datetime(frame["ts"])
        frame["value"] = 1.0
        frame["props"] = "{}"
        frame.to_parquet(tmp_path / "events.parquet")

        out = events_funnel(str(tmp_path))
        assert out["user_id"].tolist() == [1]
        assert out["n_conversions"].tolist() == [2]  # 11:00 and 10:30

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        expected = con.execute(ORACLE_SQL["events_funnel"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
