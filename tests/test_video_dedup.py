"""Video fingerprint + near-dup: majority combine, stride, oracle parity."""

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    from exstruct_ray.queries import ORACLE_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


class TestVideoFingerprint64:
    def test_majority_suppresses_noise_frames(self):
        from exstruct_ray.ops.media import (
            decode_multipng,
            encode_multipng,
            synth_bit_image,
            video_fingerprint64,
        )

        base = 0xDEADBEEF12345678
        frames = [synth_bit_image(base)] * 6 + [
            synth_bit_image(0x0F0F0F0F0F0F0F0F),
            synth_bit_image(0xF0F0F0F0F0F0F0F0),
        ]
        dec = decode_multipng(encode_multipng(frames))
        assert video_fingerprint64(dec) == base

    def test_stride_samples_every_nth(self):
        """every_nth=2 over [base, noise]*4 sees only the base frames."""
        from exstruct_ray.ops.media import (
            synth_bit_image,
            video_fingerprint64,
        )

        base, noise = 0x1234123412341234, 0xFFFFFFFFFFFFFFFF
        frames = [synth_bit_image(base), synth_bit_image(noise)] * 4
        assert video_fingerprint64(frames, every_nth=2) == base

    def test_tie_clears_bit(self):
        from exstruct_ray.ops.media import (
            synth_bit_image,
            video_fingerprint64,
        )

        base = 0xAAAAAAAAAAAAAAAA
        frames = [
            synth_bit_image(base),
            synth_bit_image(base ^ 0xFFFFFFFFFFFFFFFF),
        ]
        assert video_fingerprint64(frames) == 0

    def test_empty_is_zero(self):
        from exstruct_ray.ops.media import video_fingerprint64

        assert video_fingerprint64([]) == 0


class TestVideoQueries:
    def test_fingerprint_matches_oracle(self, ray_session):
        from exstruct_ray.queries import video_fingerprint

        got = video_fingerprint(SF_DIR).reset_index(drop=True)
        want = _oracle("video_fingerprint", SF_DIR).reset_index(drop=True)
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_neardup_pairs_match_oracle(self, ray_session):
        from exstruct_ray.queries import video_neardup_pairs

        got = video_neardup_pairs(SF_DIR).reset_index(drop=True)
        want = _oracle("video_neardup_pairs", SF_DIR).reset_index(drop=True)
        assert len(got) > 0  # the %17 flip family plants hamming-1 pairs
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
