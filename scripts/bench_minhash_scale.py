"""MinHash design comparison at two corpus scales (VERDICT round-2 item 8).

Compares the shipped ids-only three-AllToAll design (minhash_dedup_pairs)
against the round-1 sig-carrying two-AllToAll design
(minhash_dedup_pairs_sigcarry) on:

  - the driver's sf0.1 documents table (5,000 docs), and
  - a deterministic synthetic 10× corpus ("sf1.0-like", 50,000 docs,
    same word-salad shape and near-dup cluster structure, seed=7,
    synthesized under /tmp — no external data).

Expectation being tested: the r2 design pays ~2-3 s of fixed AllToAll sort
cost extra at toy scale but its exchange bytes stay ~bands× smaller, so it
amortizes as the corpus grows. Both designs must produce the IDENTICAL
pair set at both scales (asserted here).

Run:  python scripts/bench_minhash_scale.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SYN_DIR = "/tmp/exstruct_ray_docs_sf1_v2"
SYN_DOCS = 50_000


def _make_vocab(n: int = 600, seed: int = 11) -> list[str]:
    """Deterministic vocabulary of distinct letter strings.

    Large enough (600 words) that two RANDOM docs share few char-5
    shingles — matching real-text statistics, where baseline Jaccard is
    near zero and banding candidates ≈ true near-dups. (A 36-word vocab
    was measured to push random-pair Jaccard to ~0.5, exploding the
    candidate set ~5000×; that regime is recorded in BASELINE.md as the
    ids-only design's documented boundary, not used for the scaling
    comparison.)"""
    import random

    rng = random.Random(seed)
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = set()
    while len(vocab) < n:
        vocab.add("".join(rng.choice(letters) for _ in range(rng.randint(5, 9))))
    return sorted(vocab)


_VOCAB = _make_vocab()


def _build_synthetic_docs(path: str, n_docs: int, seed: int = 7) -> None:
    """Deterministic word-salad corpus with near-dup clusters.

    ~5% of docs are near-duplicates: doc i with i % 20 == 1 copies doc i-1
    with a single word changed (Jaccard well above 0.8 on char-5 shingles),
    mirroring the testdata documents table's cluster rate.
    """
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    rng = random.Random(seed)
    texts: list[str] = []
    for i in range(n_docs):
        if i % 20 == 1 and i > 0:
            words = texts[i - 1].split()
            words[rng.randrange(len(words))] = rng.choice(_VOCAB)
            texts.append(" ".join(words))
        else:
            texts.append(
                " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(40, 60)))
            )
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    rows_per_file = 5_000
    for shard, start in enumerate(range(0, n_docs, rows_per_file)):
        pq.write_table(
            table.slice(start, rows_per_file),
            os.path.join(path, f"part-{shard:05d}.parquet"),
        )
    open(os.path.join(path, ".complete"), "w").close()


def _pairs_key_set(df) -> set:
    return set(zip(df["doc_a"].tolist(), df["doc_b"].tolist()))


def _time_design(fn, ds_factory) -> tuple[float, object]:
    start = time.perf_counter()
    out = fn(ds_factory()).to_pandas()
    return time.perf_counter() - start, out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
    )
    import ray.data

    from exstruct_ray.ops.dedup import (
        minhash_dedup_pairs,
        minhash_dedup_pairs_sigcarry,
    )

    if not os.path.exists(os.path.join(SYN_DIR, ".complete")):
        _build_synthetic_docs(SYN_DIR, SYN_DOCS)

    scales = {
        "sf0.1 (5k docs)": lambda: ray.data.read_parquet(
            "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
        ),
        "sf1.0-like (50k docs)": lambda: ray.data.read_parquet(
            SYN_DIR, columns=["doc_id", "text"]
        ),
    }
    result: dict = {"metric": "minhash r1-design vs r2-design (sec)", "scales": {}}
    for label, factory in scales.items():
        t_r2, out_r2 = _time_design(
            lambda ds: minhash_dedup_pairs(ds, jaccard_threshold=0.8), factory
        )
        t_r1, out_r1 = _time_design(
            lambda ds: minhash_dedup_pairs_sigcarry(ds, jaccard_threshold=0.8),
            factory,
        )
        assert _pairs_key_set(out_r1) == _pairs_key_set(out_r2), (
            f"designs disagree at {label}"
        )
        result["scales"][label] = {
            "r2_ids_only_sec": round(t_r2, 2),
            "r1_sig_carry_sec": round(t_r1, 2),
            "pairs": len(out_r2),
            "ratio_r2_over_r1": round(t_r2 / t_r1, 3) if t_r1 else None,
        }
    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
