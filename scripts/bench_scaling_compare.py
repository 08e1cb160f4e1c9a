"""Same-window scaling comparison: Ray Data pipeline vs raw-task control.

Interleaves all four legs (pipeline-8, control-8, pipeline-32, control-32)
within each repeat so host-contention swings hit both implementations in
the same window — the only fair way to attribute an efficiency delta to
the engine on this shared VM. Reports best-per-leg (contention only slows
a leg down) plus every raw run.

Run:  python scripts/bench_scaling_compare.py   (one JSON line, ~12 min)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def _leg(script: str, cpus: int) -> float:
    proc = subprocess.run(
        [sys.executable, script, "--single", str(cpus)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith("BENCH_RESULT ")),
        None,
    )
    if line is None:
        print(json.dumps({"error": "no result", "script": script, "cpus": cpus,
                          "stderr": proc.stderr[-2000:]}))
        sys.exit(1)
    return float(json.loads(line[len("BENCH_RESULT "):])["docs_per_sec"])


def main(repeats: int = 2) -> None:
    import ray

    import bench

    ray.init(address="local", num_cpus=32, include_dashboard=False)
    bench._ensure_corpus(
        bench._sf_of(bench.SF_DIR), bench._DOCS_BY_SF.get(bench._sf_of(bench.SF_DIR), 2000)
    )
    ray.shutdown()

    pipeline = os.path.join(ROOT, "bench.py")
    control = os.path.join(HERE, "bench_rawtask_control.py")
    runs: dict[str, list[float]] = {
        "pipeline_8": [], "control_8": [], "pipeline_32": [], "control_32": []
    }
    for _ in range(repeats):
        runs["pipeline_8"].append(_leg(pipeline, 8))
        runs["control_8"].append(_leg(control, 8))
        runs["pipeline_32"].append(_leg(pipeline, 32))
        runs["control_32"].append(_leg(control, 32))
    best = {k: max(v) for k, v in runs.items()}
    eff_pipe = (best["pipeline_32"] / best["pipeline_8"]) / 4.0
    eff_ctrl = (best["control_32"] / best["control_8"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "same-window scaling: pipeline vs raw-task control",
                "pipeline_efficiency": round(eff_pipe, 4),
                "control_efficiency": round(eff_ctrl, 4),
                "delta": round(eff_ctrl - eff_pipe, 4),
                "pipeline_32_over_control_32": round(
                    best["pipeline_32"] / best["control_32"], 3
                ),
                "best": {k: round(v, 1) for k, v in best.items()},
                "all_runs": {k: [round(x, 1) for x in v] for k, v in runs.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
