"""Raw-@ray.remote-task control for the scaling bench (no Ray Data).

Same corpus, same ExtractActor UDF, same GC tuning, same warmup — but one
plain Ray task per parquet file with only (docs, spans, errors) counts
returned. This is the zero-framework-overhead upper bound the Ray Data
pipeline is compared against in BASELINE.md; the efficiency gap between
this control and `bench.py --scaling` is the engine-attributable part.

Run:  python scripts/bench_rawtask_control.py   (one JSON line, 8 vs 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _corpus() -> str:
    import bench

    sf = bench._sf_of(SF_DIR)
    n_docs = bench._DOCS_BY_SF.get(sf, 2_000)
    return bench._ensure_corpus(sf, n_docs)


def run_single(num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import bench

    corpus = _corpus()
    files = sorted(
        os.path.join(corpus, f)
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )

    @ray.remote
    def extract_file(path: str) -> tuple[int, int, int]:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from exstruct_ray.stages.actor import ExtractActor

        table = pq.read_table(path)
        out = ExtractActor()(table)
        return (
            out.num_rows,
            pc.sum(out.column("n_spans")).as_py() or 0,
            pc.sum(out.column("n_errors")).as_py() or 0,
        )

    bench._warmup(num_cpus)
    start = time.perf_counter()
    results = ray.get([extract_file.remote(p) for p in files])
    elapsed = time.perf_counter() - start
    docs = sum(r[0] for r in results)
    print(
        "BENCH_RESULT "
        + json.dumps(
            {
                "sec": elapsed,
                "docs": docs,
                "spans": sum(r[1] for r in results),
                "errors": sum(r[2] for r in results),
                "docs_per_sec": docs / elapsed if elapsed else 0.0,
                "num_cpus": num_cpus,
            }
        )
    )
    ray.shutdown()


def main(repeats: int = 2) -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False)
    _corpus()
    ray.shutdown()

    best: dict[int, dict] = {}
    all_runs: dict[int, list[float]] = {8: [], 32: []}
    for _ in range(repeats):
        for cpus in (8, 32):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", str(cpus)],
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = next(
                (
                    l
                    for l in proc.stdout.splitlines()
                    if l.startswith("BENCH_RESULT ")
                ),
                None,
            )
            if line is None:
                print(json.dumps({"error": "no result", "stderr": proc.stderr[-2000:]}))
                sys.exit(1)
            result = json.loads(line[len("BENCH_RESULT "):])
            all_runs[cpus].append(round(result["docs_per_sec"], 2))
            if cpus not in best or result["docs_per_sec"] > best[cpus]["docs_per_sec"]:
                best[cpus] = result
    t8, t32 = best[8]["docs_per_sec"], best[32]["docs_per_sec"]
    print(
        json.dumps(
            {
                "metric": "raw-task control scaling efficiency (8 vs 32 CPUs)",
                "value": round((t32 / t8) / 4.0, 4) if t8 else 0.0,
                "throughput_8": round(t8, 2),
                "throughput_32": round(t32, 2),
                "all_runs": all_runs,
            }
        )
    )


if __name__ == "__main__":
    if "--single" in sys.argv:
        run_single(int(sys.argv[sys.argv.index("--single") + 1]))
    else:
        main()
