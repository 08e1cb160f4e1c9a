"""Sketch/selection aggregate tests: HLL, count-min, distributed quantiles."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from exstruct_ray.ops.sketch import (
    CM_DEPTH,
    HLL_M,
    _cm_cell,
    _doc_ngrams,
    _hll_bucket_rho,
    _md5_top64,
    countmin_token_counts,
    distributed_quantile_disc,
    hll_estimate_from_registers,
    hll_ngram_distinct,
    quantile_ranks,
)


class TestHLLPrimitives:
    def test_bucket_rho_bounds(self):
        for s in ("a", "bb", "hello world", "x y z"):
            bucket, rho = _hll_bucket_rho(_md5_top64(s))
            assert 0 <= bucket < HLL_M
            assert 1 <= rho <= 55

    def test_zero_suffix_rho(self):
        bucket, rho = _hll_bucket_rho(7 << 54)  # suffix exactly 0
        assert bucket == 7
        assert rho == 55

    def test_estimator_raw_accuracy(self):
        # 100k synthetic distinct items -> raw branch, within ~3/sqrt(m).
        registers = np.zeros(HLL_M, dtype=np.int64)
        n = 100_000
        for i in range(n):
            b, r = _hll_bucket_rho(_md5_top64(f"item-{i}"))
            if r > registers[b]:
                registers[b] = r
        row = hll_estimate_from_registers(registers)
        rel_err = abs(row["estimate"] - n) / n
        assert rel_err < 3 / math.sqrt(HLL_M)
        assert row["v_empty"] == int((registers == 0).sum())

    def test_estimator_linear_counting_branch(self):
        # 200 distinct items << 2.5*m -> linear counting, near-exact.
        registers = np.zeros(HLL_M, dtype=np.int64)
        n = 200
        for i in range(n):
            b, r = _hll_bucket_rho(_md5_top64(f"small-{i}"))
            if r > registers[b]:
                registers[b] = r
        row = hll_estimate_from_registers(registers)
        assert abs(row["estimate"] - n) <= 20

    def test_doc_ngrams_short_doc(self):
        assert _doc_ngrams("one two", 3) == set()
        assert _doc_ngrams("One  Two Three", 3) == {"one two three"}


class TestHLLDistributed:
    def test_matches_exact_on_corpus(self, ray_session):
        import ray.data

        rng = np.random.default_rng(7)
        words = [f"w{i}" for i in range(40)]
        texts = [
            " ".join(rng.choice(words, size=30).tolist()) for _ in range(60)
        ]
        ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
        out = hll_ngram_distinct(ds, n=3, include_exact=True)
        assert len(out) == 1
        exact = len(set().union(*(_doc_ngrams(t, 3) for t in texts)))
        assert int(out["n_exact"].iloc[0]) == exact
        # Deep linear-counting regime here -> tight estimate.
        assert abs(int(out["estimate"].iloc[0]) - exact) / exact < 0.15

    def test_sketch_only_mode(self, ray_session):
        import ray.data

        ds = ray.data.from_pandas(
            pd.DataFrame({"text": ["alpha beta gamma delta"] * 5})
        )
        out = hll_ngram_distinct(ds, n=3, include_exact=False)
        assert "n_exact" not in out.columns
        assert int(out["estimate"].iloc[0]) >= 1


class TestCountMin:
    def test_overestimate_invariant_and_exact_probes(self, ray_session):
        import ray.data

        rng = np.random.default_rng(3)
        vocab = [f"t{i}" for i in range(50)]
        texts = [" ".join(rng.choice(vocab, size=40).tolist()) for _ in range(40)]
        ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
        probes = ["t0", "t1", "t25", "not_in_corpus"]
        out = countmin_token_counts(ds, probes)
        assert list(out["token"]) == sorted(probes)
        true_counts = pd.Series(" ".join(texts).split()).value_counts()
        for _, row in out.iterrows():
            expected = int(true_counts.get(row["token"], 0))
            assert row["exact_count"] == expected
            assert row["cm_estimate"] >= expected  # CM never underestimates
        absent = out[out["token"] == "not_in_corpus"].iloc[0]
        assert absent["exact_count"] == 0

    def test_cell_layout(self):
        cells = {_cm_cell(j, "token") // 1024 for j in range(CM_DEPTH)}
        assert cells == set(range(CM_DEPTH))  # row-major depth x width


class TestQuantiles:
    def test_rank_convention_matches_duckdb(self):
        rng = np.random.default_rng(11)
        vals = np.round(rng.uniform(0, 1000, size=997), 2)
        con = duckdb.connect()
        con.register("tv", pd.DataFrame({"v": vals}))
        srt = np.sort(vals)
        for q in (0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
            (dd,) = con.sql(f"SELECT quantile_disc(v, {q}) FROM tv").fetchone()
            r = quantile_ranks([q], len(vals))[0]
            assert srt[r] == dd, f"q={q}"

    def test_distributed_matches_sorted_selection(self, ray_session):
        import ray.data

        rng = np.random.default_rng(5)
        vals = rng.normal(500, 100, size=20_000)
        ds = ray.data.from_pandas(
            [pd.DataFrame({"x": c}) for c in np.array_split(vals, 8)]
        )
        qs = [0.01, 0.25, 0.5, 0.75, 0.99]
        out = distributed_quantile_disc(ds, "x", qs)
        srt = np.sort(vals)
        for q, row_rank, row_val in zip(out["quantile"], out["rank"], out["value"]):
            r = max(0, math.ceil(q * len(vals)) - 1)
            assert row_rank == r
            assert row_val == srt[r]

    def test_skewed_bucket_recursion(self, ray_session):
        import ray.data

        # 5k values crammed into a tiny range plus outliers: the hot
        # histogram bucket exceeds max_collect and must recurse.
        rng = np.random.default_rng(9)
        dense = rng.uniform(100.0, 100.001, size=5_000)
        sparse = rng.uniform(0, 1_000_000, size=100)
        vals = np.concatenate([dense, sparse])
        ds = ray.data.from_pandas(
            [pd.DataFrame({"x": c}) for c in np.array_split(vals, 4)]
        )
        out = distributed_quantile_disc(
            ds, "x", [0.5, 0.9], n_buckets=64, max_collect=500
        )
        srt = np.sort(vals)
        for q, row_val in zip(out["quantile"], out["value"]):
            r = max(0, math.ceil(q * len(vals)) - 1)
            assert row_val == srt[r]

    def test_identical_values_depth_cap(self, ray_session):
        import ray.data

        vals = np.full(3_000, 42.5)
        ds = ray.data.from_pandas(pd.DataFrame({"x": vals}))
        out = distributed_quantile_disc(
            ds, "x", [0.5], n_buckets=16, max_collect=100
        )
        assert out["value"].iloc[0] == 42.5

    def test_empty_dataset(self, ray_session):
        import ray.data

        ds = ray.data.from_pandas(pd.DataFrame({"x": pd.Series(dtype="float64")}))
        out = distributed_quantile_disc(ds, "x", [0.5])
        assert out.empty


class TestBloom:
    def test_membership_no_false_negatives(self):
        from exstruct_ray.ops.sketch import _bloom_contains, build_bloom

        grams = {f"g{i} x y" for i in range(500)}
        bits = build_bloom(grams)
        assert all(_bloom_contains(bits, g) for g in grams)

    def test_false_positive_rate_bounded(self):
        from exstruct_ray.ops.sketch import BLOOM_K, BLOOM_M, _bloom_contains, build_bloom

        grams = {f"in{i} a b" for i in range(1000)}
        bits = build_bloom(grams)
        fp = sum(
            1 for i in range(2000) if _bloom_contains(bits, f"out{i} c d")
        )
        # (1 - e^(-kn/M))^k with n=1000, M=65536, k=3 -> ~7e-5; allow slack.
        assert fp / 2000 < 0.01

    def test_superset_of_exact_decontaminate(self, ray_session):
        import ray
        import ray.data

        from exstruct_ray.ops.sketch import bloom_decontaminate, build_bloom
        from exstruct_ray.ops.text import decontaminate, word_ngram_set

        bench_texts = ["alpha beta gamma delta", "one two three four five"]
        corpus = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "x alpha beta gamma y",       # overlaps bench
                    "no overlap here at all",      # clean
                    "two three four and more",     # overlaps bench
                ],
            }
        )
        grams: set[str] = set()
        for t in bench_texts:
            grams |= word_ngram_set(t, 3)
        ds = ray.data.from_pandas(corpus)
        exact = decontaminate(ds, ray.put(grams), n=3).to_pandas()
        bloom = bloom_decontaminate(ds, ray.put(build_bloom(grams)), n=3).to_pandas()
        exact_ids = set(exact.get("doc_id", []))
        bloom_ids = set(bloom.get("doc_id", []))
        assert exact_ids == {1, 3}
        assert exact_ids <= bloom_ids  # never a false negative
        # n_maybe >= n_overlap for common docs
        e = dict(zip(exact["doc_id"], exact["n_overlap"]))
        b = dict(zip(bloom["doc_id"], bloom["n_maybe"]))
        assert all(b[d] >= e[d] for d in exact_ids)


class TestStratifiedSample:
    def test_rates_and_determinism(self, ray_session):
        from exstruct_ray.queries import (
            STRATIFIED_DEFAULT_PERMILLE,
            STRATIFIED_RATES_PERMILLE,
            doc_stratified_sample,
        )

        out1 = doc_stratified_sample("/root/testdata/sf0.001")
        out2 = doc_stratified_sample("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(out1, out2)  # retry-stable
        # Every sampled row respects its stratum's hash threshold.
        import hashlib

        for _, row in out1.iterrows():
            key = (
                int.from_bytes(
                    hashlib.md5(str(int(row["doc_id"])).encode()).digest()[:4],
                    "big",
                )
                % 1000
            )
            rate = STRATIFIED_RATES_PERMILLE.get(
                row["lang"], STRATIFIED_DEFAULT_PERMILLE
            )
            assert key < rate


class TestSequencePacking:
    def test_packing_invariants(self, ray_session):
        from exstruct_ray.queries import PACK_SEQ_LEN, doc_pack_sequences

        out = doc_pack_sequences("/root/testdata/sf0.001")
        assert (out["offset_in_pack"] < PACK_SEQ_LEN).all()
        # Chunked-concat contract: each doc starts exactly where the
        # previous one's tokens end (global token stream, no padding).
        start = out["pack_id"].to_numpy() * PACK_SEQ_LEN + out[
            "offset_in_pack"
        ].to_numpy()
        expected = np.concatenate([[0], out["n_tokens"].to_numpy()[:-1].cumsum()])
        assert (start == expected).all()
        assert out["pack_id"].is_monotonic_increasing


class TestInt8Quantization:
    def test_codes_in_range_and_reconstruction(self, ray_session):
        import ray.data

        from exstruct_ray.ops.ann import QUANT_LEVELS, quantize_embeddings_int8

        rng = np.random.default_rng(13)
        vecs = rng.normal(0, 1, size=(300, 64)).astype(np.float32)
        df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(vecs)})
        out = quantize_embeddings_int8(ray.data.from_pandas(df), dim=64).to_pandas()
        q = np.stack([np.asarray(v, dtype=np.int64) for v in out["q"]])
        assert q.min() >= -127 and q.max() <= 127
        # Reconstruction: de-quantized values within one quantization step.
        order = out["vec_id"].to_numpy().argsort()
        q = q[order]
        vi = np.rint(vecs.astype(np.float64) * 1e6).astype(np.int64)
        lo, hi = vi.min(axis=0), vi.max(axis=0)
        span = (hi - lo).astype(np.float64)
        recon = lo + (q + 127) * span / QUANT_LEVELS
        step = span / QUANT_LEVELS
        assert (np.abs(recon - vi) <= step + 1).all()

    def test_constant_dimension_degrades_to_zero(self, ray_session):
        import ray.data

        from exstruct_ray.ops.ann import quantize_embeddings_int8

        vecs = np.ones((10, 64), dtype=np.float32) * 0.5
        df = pd.DataFrame({"vec_id": np.arange(10), "embedding": list(vecs)})
        out = quantize_embeddings_int8(ray.data.from_pandas(df), dim=64).to_pandas()
        assert all((np.asarray(v) == 0).all() for v in out["q"])


class TestGroupedHLL:
    def test_per_group_estimates_near_exact(self, ray_session):
        import ray.data

        from exstruct_ray.ops.sketch import hll_group_distinct

        rng = np.random.default_rng(21)
        rows = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], size=5_000),
                "v": rng.integers(0, 400, size=5_000),
            }
        )
        out = hll_group_distinct(ray.data.from_pandas(rows), "g", "v")
        exact = rows.groupby("g")["v"].nunique()
        assert list(out["g"]) == ["a", "b", "c"]
        for _, r in out.iterrows():
            e = int(exact[r["g"]])
            # linear-counting regime: tight bound
            assert abs(int(r["estimate"]) - e) / e < 0.1
