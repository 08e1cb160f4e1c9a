"""Incremental snapshot ingest: old-content suppression, arrival-copy
grouping, canonical-id choice, and DuckDB parity on a crafted corpus."""

import duckdb
import pandas as pd

from exstruct_ray.queries import ORACLE_SQL


class TestSnapshotIngest:
    def test_crafted_corpus(self, ray_session, tmp_path):
        docs = pd.DataFrame(
            {
                # %10==9 rows are the arrivals
                "doc_id": pd.Series([1, 2, 3, 9, 19, 29, 39], dtype="int64"),
                "text": [
                    "old content alpha",
                    "old content beta",
                    "old content gamma",
                    "old content alpha",  # arrival duplicating A -> suppressed
                    "fresh content one",  # new, two arrival copies
                    "fresh content one",
                    "fresh content two",  # new, unique
                ],
            }
        )
        sf_dir = tmp_path / "sfsnap"
        sf_dir.mkdir()
        docs.to_parquet(sf_dir / "documents.parquet")

        from exstruct_ray.queries import doc_snapshot_ingest

        out = doc_snapshot_ingest(str(sf_dir))
        assert list(out["doc_id"]) == [19, 39]
        assert list(out["n_copies"]) == [2, 1]

        con = duckdb.connect()
        con.register("documents", docs)
        sql = con.execute(ORACLE_SQL["doc_snapshot_ingest"]).df()
        for col in ("doc_id", "content_hash", "n_copies"):
            assert list(out[col]) == list(sql[col]), col

    def test_no_arrivals(self, ray_session, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": pd.Series([1, 2], dtype="int64"),
                "text": ["a", "b"],
            }
        )
        sf_dir = tmp_path / "sfsnap2"
        sf_dir.mkdir()
        docs.to_parquet(sf_dir / "documents.parquet")
        from exstruct_ray.queries import doc_snapshot_ingest

        out = doc_snapshot_ingest(str(sf_dir))
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "content_hash", "n_copies"]
