"""Resumable partitioned job tests (manifest, lineage, skip-on-resume)."""

import json
import os

from exstruct_ray.config import ExtractOptions
from exstruct_ray.datagen.corpus import write_corpus_parquet
from exstruct_ray.stages.manifest import load_manifest, run_extraction_job


class TestResumableJob:
    def test_run_and_resume(self, ray_session, tmp_path):
        input_dir = tmp_path / "input"
        write_corpus_parquet(str(input_dir), 40, seed=42, rows_per_file=10)
        out_dir = tmp_path / "out"

        summary = run_extraction_job(
            str(input_dir), str(out_dir), files_per_partition=2, batch_size=8
        )
        assert summary["partitions"] == 2
        assert summary["executed"] == 2
        assert summary["docs"] == 40
        assert summary["errors"] == 0

        manifest = load_manifest(str(out_dir))
        assert set(manifest) == {0, 1}
        for rec in manifest.values():
            assert rec.docs == 20
            assert rec.wall_sec > 0
            assert len(rec.input_files) == 2
        # partitioned output layout, one dir per partition
        assert sorted(os.listdir(out_dir))[:2] == ["_manifest.jsonl", "partition=00000"]

        # resume: nothing re-executed
        summary2 = run_extraction_job(
            str(input_dir), str(out_dir), files_per_partition=2, batch_size=8
        )
        assert summary2["skipped"] == 2
        assert summary2["executed"] == 0
        assert summary2["docs"] == 40

    def test_config_change_invalidates(self, ray_session, tmp_path):
        input_dir = tmp_path / "input"
        write_corpus_parquet(str(input_dir), 10, seed=42, rows_per_file=10)
        out_dir = tmp_path / "out"
        run_extraction_job(str(input_dir), str(out_dir), files_per_partition=1)
        summary = run_extraction_job(
            str(input_dir),
            str(out_dir),
            ExtractOptions(mode="verbose"),
            files_per_partition=1,
        )
        assert summary["executed"] == 1  # hash differs -> re-run

    def test_partial_manifest_resumes_missing_only(self, ray_session, tmp_path):
        input_dir = tmp_path / "input"
        write_corpus_parquet(str(input_dir), 30, seed=42, rows_per_file=10)
        out_dir = tmp_path / "out"
        run_extraction_job(str(input_dir), str(out_dir), files_per_partition=1)
        # drop one manifest line to simulate a crash mid-job
        manifest_path = out_dir / "_manifest.jsonl"
        lines = manifest_path.read_text().strip().splitlines()
        manifest_path.write_text("\n".join(lines[:-1]) + "\n")
        summary = run_extraction_job(
            str(input_dir), str(out_dir), files_per_partition=1
        )
        assert summary["skipped"] == 2
        assert summary["executed"] == 1

    def test_stale_partition_files_cleared_on_rerun(self, ray_session, tmp_path):
        """A crashed attempt's leftover files must not pollute the re-run."""
        input_dir = tmp_path / "input"
        write_corpus_parquet(str(input_dir), 20, seed=42, rows_per_file=10)
        out_dir = tmp_path / "out"
        run_extraction_job(str(input_dir), str(out_dir), files_per_partition=1)
        # simulate: partition 1 crashed after writing a file but before its
        # manifest commit — stale file present, manifest line missing
        manifest_path = out_dir / "_manifest.jsonl"
        lines = manifest_path.read_text().strip().splitlines()
        manifest_path.write_text(lines[0] + "\n")
        part1 = out_dir / "partition=00001"
        stale = part1 / "stale-leftover.parquet"
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"n_spans": [999], "n_errors": [999]}), str(stale)
        )
        summary = run_extraction_job(
            str(input_dir), str(out_dir), files_per_partition=1
        )
        assert summary["executed"] == 1
        assert not stale.exists()
        manifest = load_manifest(str(out_dir))
        assert manifest[1].docs == 10
        assert manifest[1].errors == 0
