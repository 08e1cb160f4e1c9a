"""Line-level exact dedup + BPE training primitive tests."""

import pandas as pd

from exstruct_ray.ops.bpe import (
    bpe_train,
    merges_from_vocab,
    pair_counts,
    word_type_counts,
)
from exstruct_ray.ops.dedup import line_dedup


def _docs(texts):
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": pd.Series(texts, dtype="object")}
        )
    )


class TestLineDedup:
    def test_first_occurrence_wins(self, ray_session):
        # 4-word lines: doc 0 = [A, B], doc 1 = [B, C] -> doc 1 loses B.
        a = "a b c d"
        b = "e f g h"
        c = "i j k l"
        out = (
            line_dedup(_docs([f"{a} {b}", f"{b} {c}"]), words_per_line=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_lines"].tolist() == [2, 2]
        assert out["n_kept"].tolist() == [2, 1]

    def test_within_doc_repeat_kept_once(self, ray_session):
        out = line_dedup(_docs(["a b c d a b c d"]), words_per_line=4).to_pandas()
        assert out["n_lines"].tolist() == [2]
        assert out["n_kept"].tolist() == [1]

    def test_order_is_doc_then_line(self, ray_session):
        # Same line appears in doc 0 at idx 1 and doc 1 at idx 0 — the
        # globally-first instance is (doc 0, idx 1), not the lowest idx.
        shared = "x y z w"
        out = (
            line_dedup(
                _docs([f"p q r s {shared}", f"{shared} t u v m"]),
                words_per_line=4,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_kept"].tolist() == [2, 1]

    def test_ragged_tail_segment_counts(self, ray_session):
        out = line_dedup(_docs(["a b c d e f"]), words_per_line=4).to_pandas()
        assert out["n_lines"].tolist() == [2]  # [a b c d], [e f]
        assert out["n_kept"].tolist() == [2]


class TestBpePairCounts:
    def test_counts_match_manual(self, ray_session):
        # "abab" pairs: ab, ba, ab; "ab" adds one more ab; "a-b" none.
        out = pair_counts(_docs(["abab ab", "a-b"]), top_k=5)
        got = {(r.a, r.b): r.cnt for r in out.itertuples()}
        assert got == {("a", "b"): 3, ("b", "a"): 1}

    def test_doc_boundary_breaks_adjacency(self, ray_session):
        # Last letter of doc 0 + first of doc 1 must not pair.
        out = pair_counts(_docs(["xy", "yz"]), top_k=10)
        got = {(r.a, r.b): r.cnt for r in out.itertuples()}
        assert got == {("x", "y"): 1, ("y", "z"): 1}

    def test_case_folds_and_nonletters_split(self, ray_session):
        out = pair_counts(_docs(["AbC7cd"]), top_k=10)
        got = {(r.a, r.b): r.cnt for r in out.itertuples()}
        assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1}

    def test_topk_total_order(self, ray_session):
        # Tie on cnt -> lexicographic (a, b) decides the cut.
        out = pair_counts(_docs(["zy xw"]), top_k=1)
        assert (out.iloc[0]["a"], out.iloc[0]["b"]) == ("x", "w")


class TestBpeTrain:
    def test_word_type_counts_weighted(self, ray_session):
        vocab = word_type_counts(_docs(["low low low lower", "lower low"]))
        got = dict(zip(vocab["word"], vocab["cnt"]))
        assert got == {"low": 4, "lower": 2}

    def test_max_vocab_truncates_head(self, ray_session):
        vocab = word_type_counts(
            _docs(["aa aa aa bb bb cc"]), max_vocab=2
        )
        assert vocab["word"].tolist() == ["aa", "bb"]

    def test_merges_classic_example(self):
        # Sennrich et al. figure-1 style: l+o dominates first.
        vocab = pd.DataFrame(
            {"word": ["low", "lower", "newest", "widest"], "cnt": [5, 2, 6, 3]}
        )
        merges = merges_from_vocab(vocab, 3)
        assert merges[0] == ("e", "s", 9)  # newest(6) + widest(3)
        assert merges[1] == ("es", "t", 9)
        assert merges[2] == ("l", "o", 7)  # low(5) + lower(2)

    def test_merge_applies_within_word(self):
        vocab = pd.DataFrame({"word": ["aaaa"], "cnt": [1]})
        merges = merges_from_vocab(vocab, 2)
        # After merging (a,a) -> "aa" the word is [aa, aa]; next merge is
        # (aa, aa). Non-overlapping left-to-right replacement: 4 a's give
        # count 3 for (a,a) pairs but replacement is greedy pairwise.
        assert merges[0][:2] == ("a", "a")
        assert merges[1][:2] == ("aa", "aa")

    def test_bpe_train_end_to_end(self, ray_session):
        merges = bpe_train(_docs(["low low lowest", "low lowest"]), num_merges=2)
        assert merges[0][:2] == ("l", "o")
        assert merges[1][:2] == ("lo", "w")

    def test_deterministic_tiebreak(self):
        vocab = pd.DataFrame({"word": ["ab", "cd"], "cnt": [1, 1]})
        merges = merges_from_vocab(vocab, 1)
        assert merges[0] == ("a", "b", 1)
