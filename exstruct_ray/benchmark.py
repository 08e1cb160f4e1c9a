"""RUB evaluation harness: deterministic scoring + Ray task pipeline.

The reference ships an LLM-accuracy benchmark ("RUB") that asks a model
questions about extracted workbooks and scores the JSON answers
(`/root/reference/benchmark/src/bench/rub/normalize.py:1-117`,
`score.py:1-127`, `manifest.py:1-40`). The LLM client is network-bound
and out of scope here; this module rebuilds the DETERMINISTIC core with
behavioral parity — answer normalization, exact match, token-level
precision/recall/F1 — plus a Ray Data evaluation pipeline with a
pluggable answerer, so any answer source (an LLM endpoint on a real
cluster, a heuristic, a cached run) scores identically.

Normalization parity contract (verified in tests against the
reference's shipped `rub/truth*/` payloads):
  - strings: CRLF/CR -> LF, Unicode NFKC, ideographic space -> space,
    zero-width characters removed, whitespace runs collapsed to one
    space, spaces BETWEEN two non-ASCII characters removed (CJK
    re-joining), outer strip; then pure integer / decimal strings are
    parsed to numbers.
  - dicts: keys sorted; the dot-path extends per key.
  - lists: elements normalized (path unchanged); lists whose dot-path
    is named in the task's ``unordered_paths`` sort by canonical JSON.
  - partial score: multiset token overlap over the flattened scalars,
    empty-side conventions precision=1 iff both empty etc.

Scale note: tasks are independent rows — the pipeline is one stateless
``map_batches`` over the task table (answer + score per row, no
shuffle), so an eval suite of millions of (doc, question) pairs streams
like any other corpus; the aggregate is a per-type mean over a tiny
grouped frame.
"""

from __future__ import annotations

import json
import re
import unicodedata
from collections import Counter
from typing import Any, Callable

_ZW = re.compile("[\u200b\u200c\u200d\ufeff]")
_WS = re.compile(r"\s+")
_CJK_GAP = re.compile(r"(?<=[^\x00-\x7F])\s+(?=[^\x00-\x7F])")
_INT = re.compile(r"-?\d+")
_DEC = re.compile(r"-?\d+\.\d+")


def normalize_answer_text(value: str) -> str:
    """Reference text normalization (normalize.py:22-39)."""
    s = value.replace("\r\n", "\n").replace("\r", "\n")
    s = unicodedata.normalize("NFKC", s)
    s = s.replace("\u3000", " ")
    s = _ZW.sub("", s)
    s = _WS.sub(" ", s.strip())
    return _CJK_GAP.sub("", s).strip()


def _scalarize(value: str) -> Any:
    if _INT.fullmatch(value):
        return int(value)
    if _DEC.fullmatch(value):
        return float(value)
    return value


def _canon(value: Any) -> str:
    return json.dumps(
        value, ensure_ascii=False, sort_keys=True, separators=(",", ":")
    )


def normalize_answer(
    payload: Any, unordered_paths: list[str] | None = None
) -> Any:
    """Normalize a JSON-like answer for comparison (normalize.py:69-117)."""
    unordered = set(unordered_paths or [])

    def walk(value: Any, path: str) -> Any:
        if isinstance(value, dict):
            return {
                k: walk(value[k], f"{path}.{k}" if path else k)
                for k in sorted(value)
            }
        if isinstance(value, list):
            items = [walk(v, path) for v in value]
            if path in unordered:
                items.sort(key=_canon)
            return items
        if isinstance(value, str):
            return _scalarize(normalize_answer_text(value))
        return value

    return walk(payload, "")


def answer_tokens(value: Any) -> list[str]:
    """Flatten a normalized answer to scalar tokens (score.py:27-65)."""
    out: list[str] = []
    stack = [value]
    while stack:
        v = stack.pop()
        if isinstance(v, dict):
            stack.extend(reversed(list(v.values())))
        elif isinstance(v, list):
            stack.extend(reversed(v))
        elif v is None:
            continue
        elif isinstance(v, str):
            t = v.strip()
            if t:
                out.append(t)
        else:
            out.append(str(v))
    return out


def score_exact(
    truth: Any, pred: Any, unordered_paths: list[str] | None = None
) -> float:
    """1.0 iff the normalized payloads are equal (score.py:68-85)."""
    a = normalize_answer(truth, unordered_paths)
    b = normalize_answer(pred, unordered_paths)
    return 1.0 if a == b else 0.0


def score_partial(
    truth: Any, pred: Any, unordered_paths: list[str] | None = None
) -> dict[str, float]:
    """Multiset token precision/recall/F1 (score.py:87-127)."""
    t = Counter(answer_tokens(normalize_answer(truth, unordered_paths)))
    p = Counter(answer_tokens(normalize_answer(pred, unordered_paths)))
    overlap = sum((t & p).values())
    t_total, p_total = sum(t.values()), sum(p.values())
    precision = (1.0 if t_total == 0 else 0.0) if p_total == 0 else overlap / p_total
    recall = (1.0 if p_total == 0 else 0.0) if t_total == 0 else overlap / t_total
    f1 = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return {"precision": precision, "recall": recall, "f1": f1}


def load_rub_manifest(path: str) -> list[dict]:
    """Load a RUB manifest (rub/manifest.py:9-40) into plain task dicts:
    id, type, track, question, truth (path), unordered_paths."""
    with open(path, encoding="utf-8-sig") as fh:
        data = json.load(fh)
    tasks = []
    for t in data["tasks"]:
        tasks.append(
            {
                "id": t["id"],
                "type": t["type"],
                "track": t.get("track", "reconstruction"),
                "source_case_id": t.get("source_case_id", t["id"]),
                "question": t["question"],
                "truth": t["truth"],
                "unordered_paths": t.get("unordered_paths") or [],
            }
        )
    return tasks


def _load_truth(root: str, rel: str) -> Any:
    import os

    path = rel if os.path.isabs(rel) else os.path.join(root, rel)
    with open(path, encoding="utf-8-sig") as fh:
        return json.load(fh)


# ---------------------------------------------------------------------------
# Answerers: task dict -> JSON-like answer. Pluggable; these two are the
# in-sandbox bounds (an LLM answerer is a drop-in on a real cluster).
# ---------------------------------------------------------------------------


def echo_truth_answerer(task: dict, truth: Any) -> Any:
    """Upper bound: answer with the truth (harness self-check == 1.0)."""
    return truth


def empty_answerer(task: dict, truth: Any) -> Any:
    """Lower bound: empty object (exact 0; recall 0 unless truth empty)."""
    return {}


def evaluate_rub(
    manifest_path: str,
    answerer: Callable[[dict, Any], Any],
    *,
    truth_root: str,
):
    """Run the RUB evaluation as a Ray Data pipeline.

    Returns (per_task pandas frame, aggregate dict). Each task row is
    answered and scored inside one stateless map_batches stage; the
    truth payload is read next to the task (eval suites are small files
    per task — at corpus scale store truths as a column instead).
    """
    import pandas as pd
    import ray.data

    tasks = load_rub_manifest(manifest_path)

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rec in batch.to_dict("records"):
            unordered = list(rec["unordered_paths"])
            truth = _load_truth(truth_root, rec["truth"])
            pred = answerer(rec, truth)
            part = score_partial(truth, pred, unordered)
            rows.append(
                {
                    "task_id": rec["id"],
                    "type": rec["type"],
                    "track": rec["track"],
                    "exact": score_exact(truth, pred, unordered),
                    "precision": part["precision"],
                    "recall": part["recall"],
                    "f1": part["f1"],
                }
            )
        return pd.DataFrame(rows)

    per_task = (
        ray.data.from_pandas(pd.DataFrame(tasks))
        .map_batches(run, batch_format="pandas")
        .to_pandas()
        .sort_values("task_id")
        .reset_index(drop=True)
    )
    agg = {
        "n_tasks": int(len(per_task)),
        "exact_mean": float(per_task["exact"].mean()) if len(per_task) else 0.0,
        "f1_mean": float(per_task["f1"].mean()) if len(per_task) else 0.0,
        "by_type": {
            k: {"exact_mean": float(g["exact"].mean()), "f1_mean": float(g["f1"].mean()), "n": int(len(g))}
            for k, g in per_task.groupby("type")
        },
    }
    return per_task, agg
