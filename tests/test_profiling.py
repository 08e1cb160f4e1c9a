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


class TestTopUsersPerType:
    def test_grouped_topk_with_ties(self, ray_session, tmp_path):
        from exstruct_ray.queries import (
            ORACLE_SQL,
            events_top_users_per_type,
        )

        # type a: user 1 x3, user 2 x2, users 3/4 x1 (tie -> lower id)
        rows = (
            [("a", 1)] * 3 + [("a", 2)] * 2 + [("a", 3), ("a", 4)]
            + [("b", 9)] * 2 + [("b", 7)]
        )
        frame = pd.DataFrame(
            {
                "event_id": np.arange(len(rows), dtype=np.int64),
                "ts": pd.Timestamp("2024-01-01"),
                "user_id": [u for _, u in rows],
                "event_type": [t for t, _ in rows],
                "value": 1.0,
                "props": "{}",
            }
        )
        frame.to_parquet(tmp_path / "events.parquet")
        out = events_top_users_per_type(str(tmp_path))
        a = out[out["event_type"] == "a"]
        assert a["user_id"].tolist() == [1, 2, 3]  # tie 3 vs 4 -> lower id
        assert a["n"].tolist() == [3, 2, 1]
        b = out[out["event_type"] == "b"]
        assert b["user_id"].tolist() == [9, 7]

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        expected = con.execute(ORACLE_SQL["events_top_users_per_type"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestQualityDeciles:
    def test_monotone_and_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import ORACLE_SQL, doc_quality_deciles

        # 20 docs with strictly increasing rarity: doc i repeats a token
        # seen nowhere else i+1 times -> unique-token-heavy docs score high
        texts = []
        common = "the common filler words appear in every document "
        for i in range(20):
            texts.append(common + " ".join(f"rare{i}x{j}" for j in range(i)))
        frame = pd.DataFrame(
            {
                "doc_id": range(20),
                "text": texts,
                "lang": "en",
                "source": "t",
                "n_chars": [len(t) for t in texts],
            }
        )
        frame.to_parquet(tmp_path / "documents.parquet")
        out = doc_quality_deciles(str(tmp_path))
        # deciles are monotone in the score
        s = out.sort_values("mean_rarity")
        assert (np.diff(s["decile"].to_numpy()) >= 0).all()
        assert out["decile"].between(1, 10).all()

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        expected = con.execute(ORACLE_SQL["doc_quality_deciles"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestCohortRetention:
    def test_hand_computed_matrix(self, ray_session, tmp_path):
        from exstruct_ray.queries import (
            ORACLE_SQL,
            events_cohort_retention,
        )

        rows = [
            # user 1: first day 0, active days 0 and 2
            (0, "2024-01-01 08:00:00", 1),
            (1, "2024-01-01 20:00:00", 1),  # same day, no double count
            (2, "2024-01-03 10:00:00", 1),
            # user 2: same cohort, only day 0
            (3, "2024-01-01 09:00:00", 2),
            # user 3: cohort day 1, active days 1 and 2
            (4, "2024-01-02 12:00:00", 3),
            (5, "2024-01-03 12:00:00", 3),
        ]
        frame = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
        frame["ts"] = pd.to_datetime(frame["ts"])
        frame["event_type"] = "t"
        frame["value"] = 1.0
        frame["props"] = "{}"
        frame.to_parquet(tmp_path / "events.parquet")

        out = events_cohort_retention(str(tmp_path))
        m = {
            (r.cohort_day, r.day_offset): r.n_users
            for r in out.itertuples()
        }
        d0 = pd.Timestamp("2024-01-01").value // (86_400 * 10**9)
        assert m[(d0, 0)] == 2  # users 1 and 2 on their first day
        assert m[(d0, 2)] == 1  # user 1 returns two days later
        assert m[(d0 + 1, 0)] == 1 and m[(d0 + 1, 1)] == 1  # user 3
        assert (d0, 1) not in m  # nobody from cohort 0 active on day 1

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        expected = con.execute(ORACLE_SQL["events_cohort_retention"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestBudgetSelect:
    def test_tie_set_cut_by_doc_id_order(self, ray_session, tmp_path):
        """All docs share one rarity score (identical text): the whole
        corpus is the boundary tie set, and the budget must cut it in
        doc_id order via the distributed prefix sum — 20 x 500 <= 10000
        keeps exactly docs 0..19 of 30."""
        from exstruct_ray.queries import ORACLE_SQL, doc_budget_select

        text = " ".join(["tok"] * 500)
        frame = pd.DataFrame(
            {
                "doc_id": range(30),
                "text": [text] * 30,
                "lang": "en",
                "source": "t",
                "n_chars": [len(text)] * 30,
            }
        )
        frame.to_parquet(tmp_path / "documents.parquet")
        out = doc_budget_select(str(tmp_path))
        assert out["doc_id"].tolist() == list(range(20))
        assert (out["n_tokens"] == 500).all()

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        expected = con.execute(ORACLE_SQL["doc_budget_select"]).df()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True),
            expected.reset_index(drop=True),
            check_dtype=False,
        )

    def test_threshold_then_tie_remainder(self, ray_session, tmp_path):
        """Two score classes: every low-rarity doc is kept outright
        (strictly below the boundary), then the high-rarity tie set
        consumes the remainder in doc_id order."""
        from exstruct_ray.queries import ORACLE_SQL, doc_budget_select

        low = " ".join(["common"] * 600)
        docs, texts = [], []
        for i in range(10):
            docs.append(i)
            texts.append(low)
        for i in range(10, 20):
            docs.append(i)
            # 599 common + 1 token shared only by this class -> same
            # (higher) score for all ten docs.
            texts.append(" ".join(["common"] * 599 + ["rareclass"]))
        frame = pd.DataFrame(
            {
                "doc_id": docs,
                "text": texts,
                "lang": "en",
                "source": "t",
                "n_chars": [len(t) for t in texts],
            }
        )
        frame.to_parquet(tmp_path / "documents.parquet")
        out = doc_budget_select(str(tmp_path))
        # 10 low docs = 6000 tokens; remainder 4000 admits 6 more
        # 600-token docs from the tie set (3600 <= 4000 < 4200).
        assert out["doc_id"].tolist() == list(range(16))

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        expected = con.execute(ORACLE_SQL["doc_budget_select"]).df()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True),
            expected.reset_index(drop=True),
            check_dtype=False,
        )

    def test_oracle_parity_real_corpus(self, ray_session):
        from exstruct_ray.queries import ORACLE_SQL, doc_budget_select

        sf_dir = "/root/testdata/sf0.001"
        out = doc_budget_select(sf_dir)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        expected = con.execute(ORACLE_SQL["doc_budget_select"]).df()
        assert 0 < len(out) < 500
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True),
            expected.reset_index(drop=True),
            check_dtype=False,
        )


class TestHourlyCube:
    def test_all_four_levels_and_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import ORACLE_SQL, events_hourly_cube

        _write_events(
            tmp_path,
            [1.0, 2.0, 3.0, 4.0, 5.5],
            types=["a", "a", "b", "b", "b"],
            hours=[0, 1, 0, 0, 2],
        )
        out = events_hourly_cube(str(tmp_path))
        leaf = out[out["lvl"] == 0]
        per_type = out[out["lvl"] == 1].set_index("event_type")
        per_hour = out[out["lvl"] == 2].set_index("hour")
        top = out[out["lvl"] == 3].iloc[0]
        for t in ("a", "b"):
            sel = leaf[leaf["event_type"] == t]
            assert per_type.loc[t, "n"] == sel["n"].sum()
        # the per-hour marginal (what ROLLUP cannot emit)
        for h in leaf["hour"].unique():
            sel = leaf[leaf["hour"] == h]
            assert per_hour.loc[h, "n"] == sel["n"].sum()
            assert per_hour.loc[h, "vsum_micro"] == sel["vsum_micro"].sum()
        assert top["n"] == leaf["n"].sum()

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        expected = con.execute(ORACLE_SQL["events_hourly_cube"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestEpochShuffle:
    """Deterministic epoch shuffle: seeded md5 permutation into shards."""

    def _write(self, tmp_path, n):
        frame = pd.DataFrame(
            {
                "doc_id": range(n),
                "text": [f"document body number {i}" for i in range(n)],
                "lang": "en",
                "source": "t",
                "n_chars": 20,
            }
        )
        frame.to_parquet(tmp_path / "documents.parquet")

    def test_permutation_determinism_and_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import ORACLE_SQL, doc_epoch_shuffle

        self._write(tmp_path, 300)
        out = doc_epoch_shuffle(str(tmp_path))
        assert len(out) == 300
        assert sorted(out["doc_id"]) == list(range(300))
        # positions are a 0..n_s-1 permutation within every shard
        for _, grp in out.groupby("shard_id"):
            assert sorted(grp["pos_in_shard"]) == list(range(len(grp)))
        # retry-stable: identical on a re-run
        again = doc_epoch_shuffle(str(tmp_path))
        pd.testing.assert_frame_equal(out, again)
        # not the identity order (it actually shuffles)
        shard0 = out[out["shard_id"] == out["shard_id"].iloc[0]]
        assert not shard0.sort_values("pos_in_shard")["doc_id"].is_monotonic_increasing

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_epoch_shuffle"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )


class TestPhraseIndex:
    """Pruned bigram inverted index: df band [2, 20], sorted postings."""

    def test_band_postings_and_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import ORACLE_SQL, doc_phrase_index

        texts = [
            "alpha beta gamma",          # "alpha beta" in docs 0,1,2
            "alpha beta delta",
            "x alpha beta",
            "gamma delta",               # "gamma delta" only here + doc 4
            "gamma delta",
            "unique words here",         # all df=1 phrases -> pruned
        ]
        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "lang": "en",
             "source": "t", "n_chars": [len(t) for t in texts]}
        )
        frame.to_parquet(tmp_path / "documents.parquet")
        out = doc_phrase_index(str(tmp_path))
        idx = out.set_index("phrase")
        assert idx.loc["alpha beta", "df"] == 3
        assert idx.loc["alpha beta", "postings"] == "0,1,2"
        assert idx.loc["gamma delta", "df"] == 2
        assert idx.loc["gamma delta", "postings"] == "3,4"
        assert "unique words" not in idx.index          # df=1 pruned
        assert (idx["df"] >= 2).all() and (idx["df"] <= 20).all()

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_phrase_index"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_within_doc_repeat_counts_once(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_phrase_index

        frame = pd.DataFrame(
            {"doc_id": [0, 1],
             "text": ["rep pair rep pair rep pair", "rep pair once"],
             "lang": "en", "source": "t", "n_chars": 20}
        )
        frame.to_parquet(tmp_path / "documents.parquet")
        out = doc_phrase_index(str(tmp_path))
        idx = out.set_index("phrase")
        # df is DOCUMENT frequency: repeats inside doc 0 count once
        assert idx.loc["rep pair", "df"] == 2
        assert idx.loc["rep pair", "postings"] == "0,1"


class TestHourlyAnomaly:
    """Integer-exact 3-sigma anomaly flags over (event_type, hour) counts."""

    def _write(self, tmp_path, rows):
        frame = pd.DataFrame(rows)
        frame["ts"] = pd.to_datetime(frame["ts"])
        frame["user_id"] = 1
        frame["value"] = 1.0
        frame.to_parquet(tmp_path / "events.parquet")

    def test_planted_spike_flagged(self, ray_session, tmp_path):
        from exstruct_ray.queries import (
            ORACLE_SQL,
            events_hourly_anomaly,
        )

        rows = []
        # type "a": 11 quiet hours of 10 events, one spike hour of 200.
        # (11 quiet, not 9: a single outlier among H points has
        # z² ≤ H−1, so H must exceed 10 for any spike to clear 3σ)
        for h in range(11):
            rows += [
                {"ts": f"2001-01-01 {h:02d}:15:00", "event_type": "a"}
            ] * 10
        rows += [{"ts": "2001-01-01 11:15:00", "event_type": "a"}] * 200
        # type "b": perfectly flat -> zero variance, nothing flagged
        for h in range(10):
            rows += [
                {"ts": f"2001-01-01 {h:02d}:45:00", "event_type": "b"}
            ] * 7
        self._write(tmp_path, rows)
        out = events_hourly_anomaly(str(tmp_path))
        a = out[out["event_type"] == "a"]
        assert a["is_anomaly"].sum() == 1
        assert int(a.loc[a["is_anomaly"] == 1, "n_events"].iloc[0]) == 200
        b = out[out["event_type"] == "b"]
        assert b["is_anomaly"].sum() == 0

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'events.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["events_hourly_anomaly"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_boundary_exactly_three_sigma_not_flagged(
        self, ray_session, tmp_path
    ):
        from exstruct_ray.queries import events_hourly_anomaly

        # counts 1,1,1,1,6: H=5 S=10 Q=40 -> H²σ²=100; dev(6)=6·5−10=20,
        # dev²=400 > 900? no -> NOT flagged (strict >, exactly at 2σ)
        rows = []
        for h, n in enumerate([1, 1, 1, 1, 6]):
            rows += [
                {"ts": f"2001-01-02 {h:02d}:00:00", "event_type": "c"}
            ] * n
        self._write(tmp_path, rows)
        out = events_hourly_anomaly(str(tmp_path))
        assert out["is_anomaly"].sum() == 0
