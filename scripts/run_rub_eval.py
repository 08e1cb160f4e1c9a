"""RUB evaluation CLI: `python scripts/run_rub_eval.py --manifest M --truth-root R`.

Runs the Ray Data RUB scoring pipeline (exstruct_ray/benchmark.py) with a
named answerer and prints one JSON report line. In this sandbox the
useful answerers are the harness bounds (echo / empty); on a real
cluster an LLM-backed answerer is a drop-in callable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description="RUB eval pipeline")
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--truth-root", required=True)
    parser.add_argument(
        "--answerer", default="echo", choices=["echo", "empty"]
    )
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from exstruct_ray.benchmark import (
        echo_truth_answerer,
        empty_answerer,
        evaluate_rub,
    )

    answerer = {"echo": echo_truth_answerer, "empty": empty_answerer}[
        args.answerer
    ]
    per_task, agg = evaluate_rub(
        args.manifest, answerer, truth_root=args.truth_root
    )
    agg["answerer"] = args.answerer
    agg["tasks"] = per_task.to_dict("records")
    print(json.dumps(agg, ensure_ascii=False))
    ray.shutdown()


if __name__ == "__main__":
    main()
