"""SimHash hamming-pairs tests: pigeonhole completeness vs brute force."""

import numpy as np
import pandas as pd
import pytest

from exstruct_ray.ops.dedup import simhash_batch, simhash_pairs


def _texts():
    dup = (
        "an identical document body repeated so the signatures agree on "
        "every single bit across the full sixty four positions"
    )
    near = dup + " extra"
    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(400)]
    randoms = [
        " ".join(rng.choice(words, size=60).tolist()) for _ in range(30)
    ]
    return [dup, dup, near] + randoms


class TestSimhashPairs:
    def test_matches_bruteforce_popcount(self, ray_session):
        import ray.data

        texts = _texts()
        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": pd.Series(texts, dtype="object")}
        )
        out = (
            simhash_pairs(
                ray.data.from_pandas(frame[["doc_id", "text"]]),
                max_hamming=3,
            )
            .to_pandas()
        )
        got = (
            set()
            if "doc_a" not in out.columns
            else set(zip(out["doc_a"], out["doc_b"]))
        )

        sigs = simhash_batch(frame)["simhash"].to_numpy().view(np.uint64)
        expected = set()
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                if int(sigs[i] ^ sigs[j]).bit_count() <= 3:
                    expected.add((i, j))
        # banding at <= 3 over 4x16-bit bands is COMPLETE — exact equality
        assert got == expected
        assert (0, 1) in got  # the identical pair, hamming 0

    def test_hamming_values_reported(self, ray_session):
        import ray.data

        texts = _texts()[:3]
        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": pd.Series(texts, dtype="object")}
        )
        out = (
            simhash_pairs(
                ray.data.from_pandas(frame[["doc_id", "text"]]),
                max_hamming=3,
            )
            .to_pandas()
            .set_index(["doc_a", "doc_b"])
        )
        assert out.loc[(0, 1), "hamming"] == 0


class TestWinnowPairs:
    def test_overlap_detection_and_boilerplate_skip(self, ray_session):
        import ray.data

        from exstruct_ray.ops.text import winnow_overlap_pairs

        shared = (
            "a very long shared passage that produces many identical "
            "rolling window fingerprints across both documents because "
            "it is well beyond the thirty two character gram size"
        )
        texts = [
            "first document intro " + shared,
            "second document different intro " + shared,
            "totally unrelated content with none of that passage inside "
            "and enough length to carry its own fingerprints around",
        ]
        frame = pd.DataFrame(
            {"doc_id": range(len(texts)), "text": pd.Series(texts, dtype="object")}
        )
        ds = ray.data.from_pandas(frame)
        out = winnow_overlap_pairs(ds, min_shared=5).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (0, 1) in pairs
        assert not any(2 in p for p in pairs)

        # with max_postings=1 every posting list is "boilerplate" -> none
        out2 = winnow_overlap_pairs(
            ray.data.from_pandas(frame), min_shared=1, max_postings=1
        ).to_pandas()
        assert "doc_a" not in out2.columns or len(out2) == 0
