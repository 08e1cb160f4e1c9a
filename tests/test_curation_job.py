"""Resumable curation job tests: quality/decontam/dedup/PII composition,
manifest skip-on-resume, and crash-recompute without data loss."""

import json
import os

import pandas as pd
import pytest

from exstruct_ray.stages.curation_job import run_curation_job

CLEAN = (
    "a perfectly ordinary unique training document example whose length "
    "comfortably clears every repetition threshold because all of these "
    "additional words appear exactly once across the entire body"
)
DUP = (
    "this exact document body is duplicated across two different "
    "partitions of the corpus and only its first occurrence may survive "
    "the global admission index whatever the partition order"
)
PII = (
    "contact me at someone123@example.com with reference 123456789 for "
    "all of the remaining perfectly distinct vocabulary used here today"
)
LOWQ = "same line\nsame line\nsame line\nsame line\nsame line\nok"
BENCH = "held out benchmark evaluation sentence for the suite"
CONTAM = (
    "this one contains held out benchmark material verbatim in its body "
    "with otherwise fully unique words surrounding the quoted fragment"
)


def _write_corpus(tmp_path):
    """Three parquet files; doc 0 (file 0) is the bench slice (0 % 97)."""
    rows = [
        # file 0
        [(0, BENCH), (1, CLEAN), (2, DUP)],
        # file 1
        [(3, CONTAM), (4, LOWQ), (5, PII)],
        # file 2 — doc 6 repeats DUP (cross-partition duplicate)
        [(6, DUP), (7, CLEAN + " with a small unique twist appended")],
    ]
    input_dir = tmp_path / "corpus"
    input_dir.mkdir()
    for i, part in enumerate(rows):
        pd.DataFrame(
            {
                "doc_id": [d for d, _ in part],
                "text": [t for _, t in part],
                "lang": "en",
                "source": "t",
                "n_chars": [len(t) for _, t in part],
            }
        ).to_parquet(input_dir / f"part-{i}.parquet")
    return str(input_dir)


def _read_output(out_dir):
    frames = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("partition="):
            pdir = os.path.join(out_dir, name)
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    frames.append(pd.read_parquet(os.path.join(pdir, f)))
    if not frames:
        return pd.DataFrame(columns=["doc_id", "text", "n_pii"])
    return (
        pd.concat(frames).sort_values("doc_id").reset_index(drop=True)
    )


class TestCurationJob:
    def test_end_to_end_decisions(self, ray_session, tmp_path):
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        summary = run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        assert summary["partitions"] == 3
        assert summary["skipped"] == 0
        assert summary["docs_in"] == 8

        out = _read_output(out_dir)
        # bench(0), contaminated(3), low-quality(4), cross-partition dup(6)
        # are dropped; 1, 2, 5, 7 survive
        assert out["doc_id"].tolist() == [1, 2, 5, 7]
        assert summary["kept"] == 4
        # PII was redacted in the surviving doc 5
        doc5 = out.set_index("doc_id").loc[5]
        assert "<EMAIL>" in doc5["text"] and "<NUM>" in doc5["text"]
        assert doc5["n_pii"] == 2

    def test_resume_skips_finished_partitions(self, ray_session, tmp_path):
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        first = run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        second = run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        assert second["skipped"] == 3
        assert second["kept"] == first["kept"] == 4
        assert second["job_id"] == first["job_id"]  # persisted in manifest
        assert _read_output(out_dir)["doc_id"].tolist() == [1, 2, 5, 7]

    def test_crashed_partition_recomputes_without_loss(
        self, ray_session, tmp_path
    ):
        """A partition that wrote its admissions but lost its output (the
        crash window the claimant tokens exist for) must recompute with
        identical survivors — the index re-grants the same claimants."""
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        # simulate the crash: partition 2's output and manifest line are
        # gone, but its hashes are already admitted in the index
        import shutil

        shutil.rmtree(os.path.join(out_dir, "partition=00002"))
        manifest_path = os.path.join(out_dir, "curation_manifest.jsonl")
        with open(manifest_path) as f:
            lines = [
                line
                for line in f.read().splitlines()
                if '"partition_id": 2' not in line
            ]
        with open(manifest_path, "w") as f:
            f.write("\n".join(lines) + "\n")

        summary = run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        assert summary["skipped"] == 2
        # doc 7 survives the recompute (claimant re-granted); doc 6 is
        # still recognized as a duplicate of doc 2
        assert _read_output(out_dir)["doc_id"].tolist() == [1, 2, 5, 7]
        assert summary["kept"] == 4


class TestCurationJobMinWords:
    def _write(self, tmp_path):
        input_dir = tmp_path / "corpus"
        input_dir.mkdir()
        short = (
            "twenty wholly distinct vocabulary entries marching onward "
            "toward satisfying gopher repetition thresholds despite "
            "modest overall corpus footprint here today friends"
        )  # 20 words — passes repetition signals, below a 25-word floor
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [CLEAN, "", " \n\t ", short],
            }
        ).to_parquet(input_dir / "part-0.parquet")
        return str(input_dir)

    def test_default_floor_drops_content_free_docs(
        self, ray_session, tmp_path
    ):
        """Repetition signals alone keep empty/whitespace-only docs (all
        duplicate fractions are 0/0); the min_words floor must not."""
        input_dir = self._write(tmp_path)
        out_dir = str(tmp_path / "curated")
        summary = run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=2
        )
        assert summary["docs_in"] == 4
        assert _read_output(out_dir)["doc_id"].tolist() == [1, 4]

    def test_raised_word_floor(self, ray_session, tmp_path):
        input_dir = self._write(tmp_path)
        out_dir = str(tmp_path / "curated_g")
        run_curation_job(
            input_dir,
            out_dir,
            files_per_partition=1,
            n_shards=2,
            min_words=25,
        )
        # the 20-word doc now falls below the floor; CLEAN (27 words) stays
        assert _read_output(out_dir)["doc_id"].tolist() == [1]

    def test_min_words_change_refused(self, ray_session, tmp_path):
        """min_words changes keep decisions, so it rides the config
        fingerprint — resuming under a different floor must refuse."""
        input_dir = self._write(tmp_path)
        out_dir = str(tmp_path / "curated")
        run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=2
        )
        with pytest.raises(ValueError, match="config changed"):
            run_curation_job(
                input_dir,
                out_dir,
                files_per_partition=1,
                n_shards=2,
                min_words=5,
            )


class TestCurationJobExternalEvalSet:
    def _write_eval(self, tmp_path, text=BENCH):
        eval_dir = tmp_path / "eval"
        eval_dir.mkdir(exist_ok=True)
        pd.DataFrame({"doc_id": [0], "text": [text]}).to_parquet(
            eval_dir / "suite.parquet"
        )
        return str(eval_dir)

    def test_external_suite_decontaminates_without_bench_slice(
        self, ray_session, tmp_path
    ):
        """Production shape: the suite is its own table — CONTAM (gram
        overlap) is dropped, but doc 0 (the fixture's bench-slice id) is
        judged like any other doc instead of being dropped as 'the bench
        copy'. BENCH itself is too short for the repetition thresholds,
        so the survivor delta vs fixture mode is exactly {3}."""
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        summary = run_curation_job(
            input_dir,
            out_dir,
            files_per_partition=1,
            n_shards=4,
            eval_set=self._write_eval(tmp_path),
        )
        assert summary["docs_in"] == 8
        # vs fixture mode's [1, 2, 5, 7]: doc 3 (CONTAM) still dropped by
        # gram overlap; doc 0 (BENCH) dropped only because the 8-word doc
        # fails the top-2-gram fraction — and is contaminated anyway.
        out = _read_output(out_dir)
        assert 3 not in out["doc_id"].tolist()
        assert out["doc_id"].tolist() == [1, 2, 5, 7]

    def test_changed_eval_set_refused(self, ray_session, tmp_path):
        """The eval-set CONTENT fingerprint rides the config hash —
        resuming under a different suite must refuse, not mix
        decontamination policies across partitions."""
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        eval_dir = self._write_eval(tmp_path)
        run_curation_job(
            input_dir,
            out_dir,
            files_per_partition=1,
            n_shards=4,
            eval_set=eval_dir,
        )
        self._write_eval(tmp_path, text="a completely different suite")
        with pytest.raises(ValueError, match="config changed"):
            run_curation_job(
                input_dir,
                out_dir,
                files_per_partition=1,
                n_shards=4,
                eval_set=eval_dir,
            )

    def test_eval_fingerprint_layout_invariant(self, ray_session, tmp_path):
        """Same suite content in one file vs three files, different row
        order -> same fingerprint (content-addressed, not layout)."""
        from exstruct_ray.stages.curation_job import _eval_set_fingerprint

        a = tmp_path / "eva"
        b = tmp_path / "evb"
        a.mkdir()
        b.mkdir()
        texts = ["alpha suite row", "beta suite row", "gamma suite row"]
        pd.DataFrame({"text": texts}).to_parquet(a / "one.parquet")
        for i, t in enumerate(reversed(texts)):
            pd.DataFrame({"text": [t]}).to_parquet(b / f"p{i}.parquet")
        assert _eval_set_fingerprint(str(a)) == _eval_set_fingerprint(
            str(b)
        )
        pd.DataFrame({"text": ["extra"]}).to_parquet(b / "p9.parquet")
        assert _eval_set_fingerprint(str(a)) != _eval_set_fingerprint(
            str(b)
        )


class TestCurationJobSafety:
    def test_config_change_refused(self, ray_session, tmp_path):
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        with pytest.raises(ValueError, match="config changed"):
            run_curation_job(
                input_dir, out_dir, files_per_partition=2, n_shards=4
            )

    def test_shard_count_change_refused(self, ray_session, tmp_path):
        """n_shards is part of the dedup checkpoint layout (per-shard files
        + prefix routing); resuming with a different count must refuse, not
        reload misaligned checkpoints and re-admit duplicates."""
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        with pytest.raises(ValueError, match="config changed"):
            run_curation_job(
                input_dir, out_dir, files_per_partition=1, n_shards=8
            )

    def test_removed_input_file_refused(self, ray_session, tmp_path):
        """Removing a processed corpus file leaves its documents' claims in
        the dedup index; a resume would recompute shifted partitions against
        stale claims and silently drop content they owned — refuse."""
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        os.remove(os.path.join(input_dir, "part-0.parquet"))
        with pytest.raises(ValueError, match="lost files"):
            run_curation_job(
                input_dir, out_dir, files_per_partition=1, n_shards=4
            )

    def test_input_drift_forces_recompute(self, ray_session, tmp_path):
        input_dir = _write_corpus(tmp_path)
        out_dir = str(tmp_path / "curated")
        run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        # a new file whose name sorts FIRST shifts every partition's
        # membership — nothing may stale-skip, and the new doc must land
        pd.DataFrame(
            {
                "doc_id": [100],
                "text": [
                    "a brand new late arriving document with plenty of "
                    "fully distinct vocabulary to sail through the "
                    "quality thresholds easily"
                ],
                "lang": "en",
                "source": "t",
                "n_chars": [120],
            }
        ).to_parquet(os.path.join(input_dir, "part-0a.parquet"))

        summary = run_curation_job(
            input_dir, out_dir, files_per_partition=1, n_shards=4
        )
        assert summary["partitions"] == 4
        assert summary["docs_in"] == 9
        out = _read_output(out_dir)
        # prior survivors all keep surviving (claimants re-granted) and
        # the new doc is curated in
        assert out["doc_id"].tolist() == [1, 2, 5, 7, 100]
