"""Multimodal-column plumbing: decode / feature-extract / resize stages.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
columns alongside. The decode kernels themselves are STUBBED (the image and
audio libraries are not available in this environment and the inputs carry no
real media), but the Ray-side plumbing — schema, actor signature, batch
sizing, output layout — is real and tested.

A production deployment swaps ``_decode_image_stub`` for a real decoder
(e.g. PIL/ffmpeg) inside the same actor; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

MEDIA_COLUMNS = ("media_id", "payload", "media_type", "width", "height")


def _decode_image_stub(payload: bytes, target_w: int, target_h: int) -> np.ndarray:
    """Deterministic fake decode: digest-seeded pixels at the target size.

    Replaces a real image decode (NotImplemented in this environment); the
    output shape/dtype contract (H, W, 3) uint8 is the real one.
    """
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(target_h, target_w, 3), dtype=np.uint8)


class MediaFeatureActor:
    """Actor-pool stage: decode + resize + feature-extract per media row.

    Small batches by design — large binary payloads mean batch_size must be
    sized so batch × concurrency fits the worker heap.
    """

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self._w = target_w
        self._h = target_h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        features = []
        for payload in batch["payload"]:
            data = bytes(payload) if payload is not None else b""
            pixels = _decode_image_stub(data, self._w, self._h)
            # Feature = per-channel mean — stand-in for a real embedding.
            features.append(pixels.reshape(-1, 3).mean(axis=0).astype(np.float32))
        out = batch[["media_id"]].copy()
        out["feature"] = [f.tolist() for f in features]
        out["feat_dim"] = 3
        return out


def extract_media_features(ds, target_w: int = 32, target_h: int = 32,
                           batch_size: int = 16, concurrency=None):
    """Media decode/feature pipeline: actor pool, small batches."""
    if concurrency is None:
        from ..stages.pipeline import _default_concurrency

        concurrency = _default_concurrency()
    return ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
