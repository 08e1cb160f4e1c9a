"""DSIR hashed-bigram importance scoring tests."""

import numpy as np
import pandas as pd

from exstruct_ray.ops.dsir import (
    _gram_buckets,
    dsir_scores,
    gram_count_tables,
    weight_table,
)


def _docs(rows):
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "lang": [r[0] for r in rows],
                "text": pd.Series([r[1] for r in rows], dtype="object"),
            }
        )
    )


class TestGramBuckets:
    def test_bigram_count(self):
        assert len(_gram_buckets("a b c", 1024)) == 2

    def test_short_and_empty(self):
        assert len(_gram_buckets("solo", 1024)) == 0
        assert len(_gram_buckets("", 1024)) == 0
        assert len(_gram_buckets(None, 1024)) == 0

    def test_deterministic(self):
        a = _gram_buckets("x y z", 65536)
        b = _gram_buckets("x y z", 65536)
        assert (a == b).all()


class TestWeightTable:
    def test_ratio_math(self):
        src = np.array([9, 0, 4], dtype=np.int64)
        tgt = np.array([5, 0, 4], dtype=np.int64)
        w = weight_table(src, tgt, scale=1000)
        # (5*1000)//10 = 500; (0*1000)//1 = 0; (4*1000)//5 = 800
        assert w.tolist() == [500, 0, 800]

    def test_no_int64_overflow_in_product(self):
        # tgt * scale overflows int64 as a numpy product; the Python-int
        # build must still produce the right (always < scale) weight.
        big = np.array([10**13], dtype=np.int64)
        w = weight_table(big, big, scale=1_000_000)
        assert w.tolist() == [(10**13 * 1_000_000) // (10**13 + 1)]
        assert w[0] < 1_000_000


class TestDsirScores:
    def test_target_slice_scores_higher(self, ray_session):
        # Docs sharing grams with the 'en' slice outscore disjoint docs.
        rows = [
            ("en", "good clean prose here"),
            ("en", "good clean prose here"),
            ("xx", "good clean prose here"),  # same grams as target
            ("xx", "zq wv xk yj"),  # grams never seen in target
        ]
        out = (
            dsir_scores(_docs(rows), target_lang="en")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == 4
        assert out.loc[2, "score"] > out.loc[3, "score"]
        assert out.loc[3, "score"] == 0  # tgt count 0 in every bucket

    def test_no_bigram_doc_emits_no_row(self, ray_session):
        out = dsir_scores(
            _docs([("en", "a b"), ("en", "solo"), ("en", "")])
        ).to_pandas()
        assert out["doc_id"].tolist() == [0]

    def test_occurrences_weighted_not_types(self, ray_session):
        # A repeated gram accumulates its weight per OCCURRENCE.
        rows = [("en", "a b"), ("xx", "a b a b a b")]  # "a b" + 2x("b a","a b")
        out = (
            dsir_scores(_docs(rows))
            .to_pandas()
            .set_index("doc_id")["score"]
        )
        src, tgt = gram_count_tables(_docs(rows))
        w = weight_table(src, tgt)
        ab = _gram_buckets("a b", 65536)[0]
        ba = _gram_buckets("b a", 65536)[0]
        assert out[1] == 3 * w[ab] + 2 * w[ba]

    def test_count_tables_fold_exactly(self, ray_session):
        rows = [("en", "p q r"), ("fr", "q r s")]
        src, tgt = gram_count_tables(_docs(rows))
        assert src.sum() == 4  # pq, qr | qr, rs
        assert tgt.sum() == 2
        qr = _gram_buckets("q r", 65536)[0]
        assert src[qr] >= 2 and tgt[qr] >= 1
