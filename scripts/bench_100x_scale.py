"""100x scale-linearity spot-check for the heaviest compositions.

VERDICT r4 item 3: the wave checks ran at 10x (5k -> 50k docs); a 10x
check cannot resolve superlinear terms that only dominate later. This
script times the four heaviest compositions — doc_cut_packs,
doc_curation_packs, doc_exactsubstr_cut, doc_neardup_best_keep — on the
driver's sf0.1 documents table (5,000 docs) and on a deterministic
500,000-doc synthetic corpus of identical shape (the
bench_minhash_scale word-salad builder: 40-60 words/doc, ~5% near-dup
clusters, seed=7, synthesized under /tmp — no external data), and
reports the 100x-normalized wall ratio per query (1.0 = perfectly
linear; the bar from VERDICT item 3 is <= ~10x wall at 100x data, i.e.
normalized_ratio <= ~0.1 is better-than-linear because fixed AllToAll
costs amortize, and anything <= 1.0 passes).

Run:  python scripts/bench_100x_scale.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_minhash_scale import _build_synthetic_docs  # noqa: E402

SYN_ROOT = "/tmp/exstruct_ray_100x_sf1"
SYN_DOCS = 500_000
SMALL_DOCS = 5_000
SMALL_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_synthetic() -> str:
    docs_dir = os.path.join(SYN_ROOT, "documents.parquet")
    if not os.path.exists(os.path.join(docs_dir, ".complete")):
        _build_synthetic_docs(docs_dir, SYN_DOCS)
    return SYN_ROOT


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
    )
    from exstruct_ray import queries as q

    syn_dir = _ensure_synthetic()

    # Untimed warmup (bench.py protocol): first read_parquet, worker
    # spawn and metadata fetch must not land on the first timed leg.
    import ray.data

    for d in (SMALL_SF, syn_dir):
        ray.data.read_parquet(f"{d}/documents.parquet").map_batches(
            lambda b: b[["doc_id"]], batch_format="pandas"
        ).count()

    suites = [
        ("doc_exactsubstr_cut", q.doc_exactsubstr_cut),
        ("doc_cut_packs", q.doc_cut_packs),
        ("doc_neardup_best_keep", q.doc_neardup_best_keep),
        ("doc_curation_packs", q.doc_curation_packs),
    ]
    scale = SYN_DOCS / SMALL_DOCS
    result: dict = {
        "small_docs": SMALL_DOCS,
        "big_docs": SYN_DOCS,
        "scale": scale,
        "queries": {},
    }
    for name, fn in suites:
        t0 = time.perf_counter()
        small_rows = len(fn(SMALL_SF))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        big_rows = len(fn(syn_dir))
        t_big = time.perf_counter() - t0
        result["queries"][name] = {
            "sec_small": round(t_small, 3),
            "sec_big": round(t_big, 3),
            "rows_small": small_rows,
            "rows_big": big_rows,
            "wall_ratio": round(t_big / t_small, 3),
            "normalized_ratio": round(t_big / t_small / scale, 4),
        }
        print(
            json.dumps({name: result["queries"][name]}),
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
