"""Perceptual-hash (aHash) image dedup over synthesized PNGs."""

import duckdb
import hashlib

import numpy as np
import pandas as pd

from exstruct_ray.ops.media import (
    ahash64,
    decode_png,
    encode_png,
    synth_bit_image,
)

SF_DIR = "/root/testdata/sf0.001"


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    from exstruct_ray.queries import ORACLE_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


class TestAhash:
    def test_png_round_trip_is_bit_exact(self):
        bits = int.from_bytes(hashlib.md5(b"7").digest()[:8], "big")
        png = encode_png(synth_bit_image(bits))
        assert ahash64(decode_png(png)) == bits

    def test_constant_image_hashes_zero(self):
        img = np.full((64, 64, 3), 200, dtype=np.uint8)
        assert ahash64(img) == 0

    def test_threshold_is_mean_not_median(self):
        # one bright block among 63 dark: mean is just above dark level,
        # only the bright block crosses it
        img = np.zeros((64, 64, 3), dtype=np.uint8)
        img[:8, :8] = 255
        assert ahash64(img) == 1 << 63

    def test_flipped_neighbor_is_distance_one(self):
        from exstruct_ray.queries import _image_bits

        assert bin(_image_bits(3) ^ _image_bits(2)).count("1") == 1
        # non-flagged docs are plain md5 prefixes
        assert _image_bits(4) == int.from_bytes(
            hashlib.md5(b"4").digest()[:8], "big"
        )


class TestImageQueries:
    def test_image_ahash_matches_oracle(self, ray_session):
        from exstruct_ray.queries import image_ahash

        got = image_ahash(SF_DIR)
        want = _oracle("image_ahash", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_neardup_pairs_match_oracle(self, ray_session):
        from exstruct_ray.queries import image_neardup_pairs

        got = image_neardup_pairs(SF_DIR)
        want = _oracle("image_neardup_pairs", SF_DIR)
        assert len(got) > 0  # the every-17th near-dup family exists
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )
        assert (got["hamming"] <= 2).all()


class TestAudioFingerprint:
    def test_wav_round_trip_is_bit_exact(self):
        from exstruct_ray.ops.media import (
            audio_fingerprint64,
            decode_wav,
            encode_wav,
            synth_bit_audio,
        )

        bits = int.from_bytes(hashlib.md5(b"11").digest()[:8], "big")
        samples, rate = decode_wav(encode_wav(synth_bit_audio(bits)))
        assert rate == 16000
        assert audio_fingerprint64(samples) == bits

    def test_short_clip_fingerprints_zero(self):
        from exstruct_ray.ops.media import audio_fingerprint64

        assert audio_fingerprint64(np.zeros(10)) == 0

    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import audio_fingerprint

        got = audio_fingerprint(SF_DIR)
        want = _oracle("audio_fingerprint", SF_DIR)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


class TestHamming64PairsProperty:
    def test_matches_brute_force_on_random_sigs(self, ray_session):
        """Pigeonhole completeness: banding output == brute-force pairs
        for every threshold <= 3 on a clustered random signature set."""
        import ray.data

        from exstruct_ray.ops.dedup import hamming64_pairs

        rng = np.random.RandomState(7)
        base = rng.randint(-(2**62), 2**62, size=40, dtype=np.int64)
        sigs = [int(b) for b in base]
        # plant near-dups at distances 1..3
        for i, d in [(0, 1), (1, 2), (2, 3)]:
            mutated = np.int64(base[i])
            for bit in rng.choice(64, size=d, replace=False):
                mutated = np.int64(
                    np.uint64(mutated) ^ (np.uint64(1) << np.uint64(bit))
                )
            sigs.append(int(mutated))
        df = pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(sigs)), dtype="int64"),
                "sig": pd.Series(sigs, dtype="int64"),
            }
        )
        for k in (1, 2, 3):
            got = (
                hamming64_pairs(
                    ray.data.from_pandas(df), max_hamming=k, sig_col="sig"
                )
                .to_pandas()
            )
            got_pairs = (
                set(zip(got["doc_a"], got["doc_b"]))
                if "doc_a" in got.columns
                else set()
            )
            want = set()
            u = np.array(sigs, dtype=np.int64).view(np.uint64)
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    if int(u[i] ^ u[j]).bit_count() <= k:
                        want.add((i, j))
            assert got_pairs == want, k
