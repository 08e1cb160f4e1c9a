"""Shared primitives of the tagged-union bucket-merge pattern.

The engine's manual shuffle join (used instead of Dataset.join, whose
hash aggregator cannot finalize partitions that received no blocks —
routine with tiny pair sets): both sides compute a coarse hash bucket,
union into one tagged stream, and groupby(bucket).map_groups runs the
exact merge inside each group. These two helpers are the pieces every
site needs identical: a deterministic bucket hash and a typed empty
frame (schema unification across zero-row blocks — an untyped empty
frame yields null Arrow columns that conflict with non-empty blocks).
"""

from __future__ import annotations

import pandas as pd


def hash_bucket(values: pd.Series, n_buckets: int) -> pd.Series:
    """Coarse deterministic bucket of a key column (int64)."""
    hashed = pd.util.hash_array(values.to_numpy()) % n_buckets
    return pd.Series(hashed.astype("int64"), index=values.index)


def empty_frame(cols: list[tuple[str, object]]) -> pd.DataFrame:
    """Zero-row frame with pinned dtypes for block-schema unification."""
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols})
