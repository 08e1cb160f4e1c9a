"""NULL-source semantics pinned on both engine and oracle sides
(CLAUDE.md rule; ADVICE r4 items 1-2).

Both queries exclude rows with a NULL ``source`` explicitly:
- doc_boilerplate_by_source: pandas groupby drops NaN keys, oracle now
  filters WHERE d.source IS NOT NULL.
- source_syndication_pairs: the engine drops NaN sources at gram
  emission (a NaN among sorted() raises str-vs-float TypeError),
  matching the oracle's silent NULL exclusion via a.source < b.source.
"""

import duckdb
import pandas as pd
import pytest


SHARED_RUN = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi"
)  # 14 words -> 10 distinct word-5-grams


def _write_docs(tmp_path, frame: pd.DataFrame) -> str:
    frame.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _oracle(tmp_path, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path / 'documents.parquet'}')"
    )
    return con.execute(sql).df()


class TestNullSourceSemantics:
    def test_boilerplate_by_source_drops_null_source(
        self, ray_session, tmp_path
    ):
        from exstruct_ray.queries import (
            ORACLE_SQL,
            doc_boilerplate_by_source,
        )

        frame = pd.DataFrame(
            {
                "doc_id": range(4),
                "text": [
                    f"{SHARED_RUN} unique tail one",
                    f"{SHARED_RUN} unique tail two",
                    # NULL-source doc that IS a dup member: its dup
                    # tokens must not be attributed anywhere.
                    f"{SHARED_RUN} unique tail three",
                    "totally distinct words with no duplicated runs",
                ],
                "source": ["a", "b", None, "a"],
            }
        )
        sf = _write_docs(tmp_path, frame)
        out = doc_boilerplate_by_source(sf)
        assert set(out["source"]) == {"a", "b"}
        expected = _oracle(tmp_path, ORACLE_SQL["doc_boilerplate_by_source"])
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_syndication_pairs_null_source_no_crash(
        self, ray_session, tmp_path
    ):
        from exstruct_ray.queries import (
            ORACLE_SQL,
            source_syndication_pairs,
        )

        frame = pd.DataFrame(
            {
                "doc_id": range(3),
                "text": [
                    f"{SHARED_RUN} tail a",
                    f"{SHARED_RUN} tail b",
                    # NULL-source doc sharing the same grams: before the
                    # fix this crashed sorted() with str-vs-float.
                    f"{SHARED_RUN} tail c",
                ],
                "source": ["a", "b", None],
            }
        )
        sf = _write_docs(tmp_path, frame)
        out = source_syndication_pairs(sf)
        assert out[["source_a", "source_b"]].values.tolist() == [["a", "b"]]
        # 14-word run -> 10 grams, plus "lambda mu nu xi tail" (the
        # shared "tail" word extends the run by one gram) -> 11
        assert int(out.iloc[0]["n_shared_grams"]) == 11
        expected = _oracle(tmp_path, ORACLE_SQL["source_syndication_pairs"])
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
