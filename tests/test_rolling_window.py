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
