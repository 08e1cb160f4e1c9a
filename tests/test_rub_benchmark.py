"""RUB scoring-harness parity tests (reference benchmark/src/bench/rub)."""

import json
import os

import pytest

from exstruct_ray.benchmark import (
    answer_tokens,
    echo_truth_answerer,
    empty_answerer,
    evaluate_rub,
    load_rub_manifest,
    normalize_answer,
    normalize_answer_text,
    score_exact,
    score_partial,
)

REF_RUB = "/root/reference/benchmark/rub"


class TestNormalizeText:
    def test_newlines_and_ws_collapse(self):
        assert normalize_answer_text("a\r\nb\rc   d\te") == "a b c d e"

    def test_nfkc_fullwidth(self):
        assert normalize_answer_text("ＡＢＣ１２３") == "ABC123"

    def test_ideographic_space_and_zero_width(self):
        assert normalize_answer_text("x　y") == "x y"
        assert normalize_answer_text("a​b﻿c") == "abc"

    def test_cjk_gap_removed_ascii_gap_kept(self):
        assert normalize_answer_text("日本 語") == "日本語"
        assert normalize_answer_text("abc 語") == "abc 語"
        assert normalize_answer_text("abc def") == "abc def"


class TestNormalizeAnswer:
    def test_numeric_strings_parse(self):
        assert normalize_answer({"a": "42", "b": "-1.5", "c": "1e3"}) == {
            "a": 42,
            "b": -1.5,
            "c": "1e3",
        }

    def test_dict_keys_sorted(self):
        out = normalize_answer({"b": 1, "a": 2})
        assert list(out.keys()) == ["a", "b"]

    def test_unordered_path_sorts_list(self):
        v = {"items": ["b", "a"]}
        assert normalize_answer(v)["items"] == ["b", "a"]
        assert normalize_answer(v, ["items"])["items"] == ["a", "b"]

    def test_unordered_path_is_exact_dot_path(self):
        v = {"outer": {"items": [2, 1]}}
        assert normalize_answer(v, ["items"])["outer"]["items"] == [2, 1]
        assert normalize_answer(v, ["outer.items"])["outer"]["items"] == [1, 2]

    def test_list_path_unextended_by_index(self):
        # Lists do not extend the dot path — nested lists under an
        # unordered path all sort (reference walks lists with same path).
        v = {"g": [[2, 1], [9, 3]]}
        out = normalize_answer(v, ["g"])
        assert out["g"] == [[1, 2], [3, 9]] or out["g"] == [[3, 9], [1, 2]]


class TestScores:
    def test_exact_after_normalization(self):
        assert score_exact({"x": "４２"}, {"x": "42"}) == 1.0
        assert score_exact({"x": "42"}, {"x": "43"}) == 0.0

    def test_partial_multiset_overlap(self):
        s = score_partial({"a": ["x", "x", "y"]}, {"a": ["x", "z"]})
        # truth tokens {x:2, y:1}, pred {x:1, z:1} -> overlap 1
        assert s["precision"] == 0.5
        assert s["recall"] == pytest.approx(1 / 3)
        assert s["f1"] == pytest.approx(2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))

    def test_empty_side_conventions(self):
        assert score_partial({}, {}) == {
            "precision": 1.0,
            "recall": 1.0,
            "f1": 1.0,
        }
        s = score_partial({"a": "x"}, {})
        assert (s["precision"], s["recall"], s["f1"]) == (0.0, 0.0, 0.0)

    def test_numbers_tokenize_as_strings(self):
        assert answer_tokens(normalize_answer({"n": "10", "m": 2.5})) in (
            ["10", "2.5"],
            ["2.5", "10"],
        )


@pytest.mark.skipif(
    not os.path.isdir(REF_RUB), reason="reference RUB data not mounted"
)
class TestReferenceTruthParity:
    """Score the reference's own shipped truth payloads."""

    def test_truth_scores_one_against_itself(self):
        tasks = load_rub_manifest(f"{REF_RUB}/manifest.json")
        assert len(tasks) == 12
        for t in tasks:
            with open(
                f"/root/reference/benchmark/{t['truth']}", encoding="utf-8-sig"
            ) as fh:
                truth = json.load(fh)
            assert score_exact(truth, truth, t["unordered_paths"]) == 1.0
            assert score_partial(truth, truth, t["unordered_paths"])["f1"] == 1.0

    def test_unordered_truth_survives_shuffle(self):
        tasks = [
            t
            for t in load_rub_manifest(f"{REF_RUB}/manifest.json")
            if t["unordered_paths"]
        ]
        assert tasks
        for t in tasks:
            with open(
                f"/root/reference/benchmark/{t['truth']}", encoding="utf-8-sig"
            ) as fh:
                truth = json.load(fh)
            shuffled = json.loads(json.dumps(truth))

            def rev_at(node, keys):
                # Lists never extend the dot path (reference semantics),
                # so descend through list elements transparently.
                if isinstance(node, list):
                    for item in node:
                        rev_at(item, keys)
                    return
                if not isinstance(node, dict) or not keys:
                    return
                head, *rest = keys
                if head not in node:
                    return
                if rest:
                    rev_at(node[head], rest)
                elif isinstance(node[head], list):
                    node[head] = list(reversed(node[head]))

            for p in t["unordered_paths"]:
                rev_at(shuffled, p.split("."))
            assert score_exact(truth, shuffled, t["unordered_paths"]) == 1.0


@pytest.mark.skipif(
    not os.path.isdir(REF_RUB), reason="reference RUB data not mounted"
)
class TestEvaluatePipeline:
    def test_echo_bound_is_perfect(self, ray_session):
        per_task, agg = evaluate_rub(
            f"{REF_RUB}/manifest_lite.json",
            echo_truth_answerer,
            truth_root="/root/reference/benchmark",
        )
        assert agg["n_tasks"] == len(per_task) > 0
        assert agg["exact_mean"] == 1.0
        assert agg["f1_mean"] == 1.0

    def test_empty_bound_is_zero(self, ray_session):
        per_task, agg = evaluate_rub(
            f"{REF_RUB}/manifest_lite.json",
            empty_answerer,
            truth_root="/root/reference/benchmark",
        )
        assert agg["exact_mean"] == 0.0
        assert agg["f1_mean"] == 0.0
        assert set(per_task.columns) == {
            "task_id",
            "type",
            "track",
            "exact",
            "precision",
            "recall",
            "f1",
        }
