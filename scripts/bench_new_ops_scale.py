"""Scale-linearity check for the round-4 ops: line dedup + DSIR scores.

Runs doc-level line_dedup and dsir_scores over a deterministic synthetic
corpus at 5k and 50k docs (10×, same shape, seed-pinned, synthesized
under /tmp — no external data) and reports wall time at both sizes. The
design expectation: both ops' exchanges are bounded (md5 line keys /
65536-bucket count partials), so wall time should grow far slower than
10× on 32 CPUs (fixed AllToAll + driver costs dominate at toy scale).

Run:  python scripts/bench_new_ops_scale.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/exstruct_ray_newops_{n}"
LANGS = ["en", "zh", "es", "de", "fr"]


def _build(path: str, n_docs: int, seed: int = 13) -> None:
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(path, ".complete")):
        return
    os.makedirs(path, exist_ok=True)
    rng = random.Random(seed)
    vocab = [f"w{i:04d}" for i in range(800)]
    texts, langs = [], []
    for i in range(n_docs):
        if i % 25 == 1 and i > 0:
            # Shared 16-word prefix with the previous doc -> duplicate line.
            prev = texts[i - 1].split(" ")
            tail = [rng.choice(vocab) for _ in range(rng.randint(16, 48))]
            texts.append(" ".join(prev[:16] + tail))
        else:
            texts.append(
                " ".join(rng.choice(vocab) for _ in range(rng.randint(32, 64)))
            )
        langs.append(LANGS[i % len(LANGS)] if i % 5 else "en")
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    for shard, start in enumerate(range(0, n_docs, 5_000)):
        pq.write_table(
            table.slice(start, 5_000),
            os.path.join(path, f"part-{shard:05d}.parquet"),
        )
    open(os.path.join(path, ".complete"), "w").close()


def main() -> None:
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
    )
    from exstruct_ray.ops.dedup import line_dedup
    from exstruct_ray.ops.dsir import dsir_scores

    report: dict = {"metric": "new-ops scale linearity (5k vs 50k docs)"}
    for n in (5_000, 50_000):
        path = BASE.format(n=n)
        _build(path, n)
        # Warm the read path untimed (BASELINE.md protocol).
        ray.data.read_parquet(path).count()

        start = time.perf_counter()
        ld = line_dedup(
            ray.data.read_parquet(path, columns=["doc_id", "text"])
        ).to_pandas()
        t_line = time.perf_counter() - start

        start = time.perf_counter()
        ds = dsir_scores(
            ray.data.read_parquet(path, columns=["doc_id", "lang", "text"])
        ).to_pandas()
        t_dsir = time.perf_counter() - start

        assert len(ld) == n and (ld["n_kept"] <= ld["n_lines"]).all()
        dup_docs = int((ld["n_kept"] < ld["n_lines"]).sum())
        assert dup_docs >= n // 25 - 2  # the planted shared-prefix lines
        assert len(ds) == n and (ds["score"] >= 0).all()

        report[f"line_dedup_{n}_sec"] = round(t_line, 2)
        report[f"dsir_{n}_sec"] = round(t_dsir, 2)
        report[f"dup_docs_{n}"] = dup_docs
    report["line_dedup_ratio_10x"] = round(
        report["line_dedup_50000_sec"] / report["line_dedup_5000_sec"], 2
    )
    report["dsir_ratio_10x"] = round(
        report["dsir_50000_sec"] / report["dsir_5000_sec"], 2
    )
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
