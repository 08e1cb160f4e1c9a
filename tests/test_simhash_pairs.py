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
