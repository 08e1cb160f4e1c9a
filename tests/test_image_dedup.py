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
