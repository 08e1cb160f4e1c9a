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

import numpy as np
import pandas as pd


def hash_bucket_np(values: np.ndarray, n_buckets: int) -> np.ndarray:
    """Coarse deterministic bucket of an int64 key array (int64).

    pd.util.hash_array, never builtin hash(): the per-process salt would
    split partials across workers."""
    return (pd.util.hash_array(values) % n_buckets).astype("int64")


def hash_bucket(values: pd.Series, n_buckets: int) -> pd.Series:
    """Coarse deterministic bucket of a key column (int64)."""
    return pd.Series(
        hash_bucket_np(values.to_numpy(), n_buckets), index=values.index
    )


def md5_mod_int(values, mod: int) -> np.ndarray:
    """Deterministic md5 gate/bucket over integer ids: the first 4 digest
    bytes of ``md5(str(int(id)))`` mod ``mod`` — the engine-wide
    content-free sampling idiom, always paired with the SQL fragment
    ``CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS UBIGINT)
    % mod``. One implementation because the string rendering and the
    4-byte width are oracle-load-bearing: changing either in one copy
    silently desynchronizes every paired oracle."""
    import hashlib

    return np.asarray(
        [
            int.from_bytes(
                hashlib.md5(str(int(v)).encode()).digest()[:4], "big"
            )
            % mod
            for v in values
        ],
        dtype=np.int64,
    )


def empty_frame(cols: list[tuple[str, object]]) -> pd.DataFrame:
    """Zero-row frame with pinned dtypes for block-schema unification."""
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols})


def attach_payload(
    pairs_ds,
    payload_ds,
    *,
    on: str,
    out: str,
    payload_key: str,
    payload_col: str,
    carry_ids: list[str],
    carry_payloads: dict[str, object] | None = None,
    payload_type=None,
    dedup_pairs: bool = False,
    n_buckets: int = 64,
):
    """Arrow-native tagged-union bucket merge: attach one payload column
    to a pair table by key.

    The generic shape behind every "candidate ids ⋈ per-doc payload"
    exchange (MinHash ids-only signature attach, LSH embedding attach,
    ngram-verify text attach): ``pairs_ds`` rows carry ``carry_ids``
    (int64) plus previously attached ``carry_payloads``; each pair row
    receives ``payload_ds``'s ``payload_col`` for its ``on`` key as a new
    ``out`` column (inner join — pairs without a payload drop).

    Everything is ``batch_format="pyarrow"`` end to end: payloads ride the
    exchange as Arrow binary/string buffers (zero-copy through the object
    store and the wire), never pandas object columns of pickled Python
    bytes. The in-group join is numpy searchsorted over the int64 keys +
    one Arrow ``take`` of the payload column — no pandas merge.

    ``dedup_pairs=True`` drops duplicate carry_ids rows inside the merge
    (candidates surfaced by several bands always share the ``on`` key and
    therefore the same bucket, so no extra dedup shuffle is needed).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    carry_payloads = dict(carry_payloads or {})
    payload_type = payload_type if payload_type is not None else pa.binary()

    def _placeholder(dtype, n: int):
        if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
            return pa.array([""] * n, dtype)
        return pa.array([b""] * n, dtype)

    union_fields = (
        [("bucket", pa.int64()), ("key", pa.int64())]
        + [(c, pa.int64()) for c in carry_ids]
        + list(carry_payloads.items())
        + [("payload", payload_type), ("is_payload", pa.bool_())]
    )
    union_schema = pa.schema(union_fields)
    out_schema = pa.schema(
        [(c, pa.int64()) for c in carry_ids]
        + list(carry_payloads.items())
        + [(out, payload_type)]
    )

    def _np(col) -> np.ndarray:
        return col.combine_chunks().to_numpy(zero_copy_only=False)

    def tag_pairs(batch: pa.Table) -> pa.Table:
        if on not in batch.column_names or batch.num_rows == 0:
            return union_schema.empty_table()
        n = batch.num_rows
        keys = pc.cast(batch[on], pa.int64())
        cols: dict[str, object] = {
            "bucket": pa.array(hash_bucket_np(_np(keys), n_buckets)),
            "key": keys,
        }
        for c in carry_ids:
            cols[c] = pc.cast(batch[c], pa.int64())
        for c, t in carry_payloads.items():
            cols[c] = pc.cast(batch[c], t)
        cols["payload"] = _placeholder(payload_type, n)
        cols["is_payload"] = pa.array(np.zeros(n, dtype=bool))
        return pa.table(cols)

    def tag_payloads(batch: pa.Table) -> pa.Table:
        if payload_key not in batch.column_names or batch.num_rows == 0:
            return union_schema.empty_table()
        n = batch.num_rows
        keys = pc.cast(batch[payload_key], pa.int64())
        cols: dict[str, object] = {
            "bucket": pa.array(hash_bucket_np(_np(keys), n_buckets)),
            "key": keys,
        }
        zeros = pa.array(np.zeros(n, dtype=np.int64))
        for c in carry_ids:
            cols[c] = zeros
        for c, t in carry_payloads.items():
            cols[c] = _placeholder(t, n)
        cols["payload"] = pc.cast(batch[payload_col], payload_type)
        cols["is_payload"] = pa.array(np.ones(n, dtype=bool))
        return pa.table(cols)

    def merge(group: pa.Table) -> pa.Table:
        # map_groups emits zero-column blocks for empty hash partitions
        if "key" not in group.column_names or group.num_rows == 0:
            return out_schema.empty_table()
        group = group.combine_chunks()
        is_p = _np(group["is_payload"]).astype(bool)
        pair_t = group.filter(pa.array(~is_p))
        pay_t = group.filter(pa.array(is_p))
        if pair_t.num_rows == 0 or pay_t.num_rows == 0:
            return out_schema.empty_table()
        if dedup_pairs:
            idc = [_np(pair_t[c]) for c in carry_ids]
            order = np.lexsort(idc[::-1])
            keep = np.ones(len(order), dtype=bool)
            if len(order) > 1:
                neq = np.zeros(len(order) - 1, dtype=bool)
                for c in idc:
                    s = c[order]
                    neq |= s[1:] != s[:-1]
                keep[1:] = neq
            pair_t = pair_t.take(pa.array(order[keep]))
        pk = _np(pay_t["key"])
        o = np.argsort(pk, kind="stable")
        sk = pk[o]
        first = np.ones(len(sk), dtype=bool)
        first[1:] = sk[1:] != sk[:-1]
        sk, o = sk[first], o[first]
        jk = _np(pair_t["key"])
        pos = np.searchsorted(sk, jk)
        pos_c = np.minimum(pos, len(sk) - 1)
        valid = sk[pos_c] == jk
        pair_sel = pair_t.filter(pa.array(valid))
        payload_vals = pay_t["payload"].take(pa.array(o[pos_c[valid]]))
        cols = {c: pair_sel[c] for c in carry_ids}
        cols.update({c: pair_sel[c] for c in carry_payloads})
        cols[out] = payload_vals
        return pa.table(cols)

    tagged = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        payload_ds.map_batches(tag_payloads, batch_format="pyarrow")
    )
    return tagged.groupby("bucket").map_groups(merge, batch_format="pyarrow")
