"""Cluster job entrypoint: `ray job submit -- python scripts/run_curation.py ...`.

Runs the resumable partitioned CURATION job over a document corpus:
Gopher quality filter + benchmark decontamination + PII redaction in one
vectorized pass, corpus-global exact dedup via the sharded streaming
index (checkpointed, retry- and resume-idempotent), survivors written as
partitioned parquet with a JSONL manifest for skip-on-resume.

Example:
    ray job submit --working-dir . -- \
        python scripts/run_curation.py \
        --input /data/corpus --output /data/curated \
        --files-per-partition 16 --n-shards 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description="Resumable curation job")
    parser.add_argument("--input", required=True, help="input parquet dir/file")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument("--files-per-partition", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--n-shards", type=int, default=8)
    parser.add_argument(
        "--bench-mod",
        type=int,
        default=97,
        help="doc_id %% bench-mod == 0 marks the held-out benchmark slice",
    )
    parser.add_argument(
        "--min-words",
        type=int,
        default=1,
        help="quality floor on whitespace word count (50 = Gopher bound)",
    )
    parser.add_argument(
        "--eval-set",
        default=None,
        help="parquet path/dir of the benchmark suite (text column); "
        "when set, decontamination uses it and --bench-mod is ignored",
    )
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init()  # cluster address from the job runtime; local fallback

    from exstruct_ray.stages.curation_job import run_curation_job

    start = time.perf_counter()
    summary = run_curation_job(
        args.input,
        args.output,
        files_per_partition=args.files_per_partition,
        batch_size=args.batch_size,
        n_shards=args.n_shards,
        bench_mod=args.bench_mod,
        min_words=args.min_words,
        eval_set=args.eval_set,
    )
    summary["wall_sec"] = round(time.perf_counter() - start, 3)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
