"""Scale-linearity check for the round-4 cleaning/tokenizer wave.

Times doc_c4_filters, doc_pmi_collocations, doc_tokenize_ids and
source_trigram_diversity over a deterministic synthetic documents table
at 5k and 50k docs (10x, same shape, seed-pinned, synthesized under
/tmp — no external data) and reports the 10x time ratio per query.
Design expectation: c4/tokenize are per-doc passes plus a vocabulary
exchange, PMI/diversity one coarse-bucket count exchange each — all
read-bandwidth-bound, so the ratio should sit well under 10 on 32 CPUs
(fixed AllToAll + driver costs dominate at toy scale).

Run:  python scripts/bench_wave4_scale.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/exstruct_ray_wave4_{n}"


def _build(path: str, n_docs: int, seed: int = 17) -> None:
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(path, ".complete")
    if os.path.exists(marker):
        return
    os.makedirs(path, exist_ok=True)
    rng = random.Random(seed)
    vocab = [f"w{i:04d}" for i in range(800)]
    texts, sources, langs = [], [], []
    for i in range(n_docs):
        texts.append(
            " ".join(rng.choice(vocab) for _ in range(rng.randint(32, 64)))
        )
        sources.append(f"src{i % 20}")
        langs.append("en")
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(path, "documents.parquet"))
    open(marker, "w").close()


def main() -> None:
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
    )
    from exstruct_ray import queries as q

    ops = (
        ("c4", q.doc_c4_filters),
        ("pmi", q.doc_pmi_collocations),
        ("tokenize", q.doc_tokenize_ids),
        ("diversity", q.source_trigram_diversity),
    )
    report: dict = {"metric": "wave-4 ops scale linearity (5k vs 50k docs)"}
    for n in (5_000, 50_000):
        path = BASE.format(n=n)
        _build(path, n)
        ray.data.read_parquet(path).count()  # warm untimed
        for name, fn in ops:
            start = time.perf_counter()
            out = fn(path)
            report[f"{name}_{n}_sec"] = round(time.perf_counter() - start, 2)
            if name in ("c4",):
                assert len(out) == n
            if name == "diversity":
                assert len(out) == 20
    for name, _ in ops:
        report[f"{name}_ratio_10x"] = round(
            report[f"{name}_50000_sec"] / report[f"{name}_5000_sec"], 2
        )
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
