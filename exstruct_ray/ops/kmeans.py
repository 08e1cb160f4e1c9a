"""Distributed k-means over an embedding column (Lloyd's algorithm).

The classic curation/clustering op for training-data pipelines (cluster
balancing, semantic dedup, IVF codebook training — the trained quantizer
ivf_centroids documents as its drop-in upgrade).

Scale shape: each iteration is ONE shuffle-free map_batches pass — the
current centroids broadcast via ray.put (read per task, never re-shipped
per batch), every batch emits per-cluster partial sums + counts (K rows,
K×dim ints), and the driver combines partials and updates centroids (a
K×dim int matrix — trivially driver-sized for any real K). No AllToAll,
no per-row driver work; iterations = n_iter passes over the corpus.

Exactness contract (what makes the SQL oracle a HASH check, not a close
check): all arithmetic is integer after a single half-even quantization
(round_even in DuckDB ≡ np.rint) to micro-units. Distances are int64
squared-L2 sums; assignment ties break to the lowest cluster id; centroid
updates are FLOOR(sum/count) in micro-units; empty clusters carry their
previous centroid. Every step is order-independent integer math, so
distributed partial order can never diverge from the oracle's single
stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

KMEANS_SCALE = 1_000_000.0  # micro-units


def quantize_embeddings(vectors: np.ndarray) -> np.ndarray:
    """float → int64 micro-units, half-even (np.rint ≡ DuckDB round_even)."""
    return np.rint(np.asarray(vectors, dtype=np.float64) * KMEANS_SCALE).astype(
        np.int64
    )


def _assign(q_vecs: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest centroid per row (int64 squared L2; ties → lowest id)."""
    # (n, k) distances without materializing (n, k, dim): ||v||² − 2v·c + ||c||²
    # stays in int64: |v|,|c| ≤ ~2e6 μu, dim 64 → ≤ 2.6e14 per term.
    v2 = np.einsum("ij,ij->i", q_vecs, q_vecs)[:, None]
    c2 = np.einsum("ij,ij->i", centroids, centroids)[None, :]
    cross = q_vecs @ centroids.T
    dists = v2 - 2 * cross + c2
    return np.argmin(dists, axis=1)  # first min = lowest cluster id


def kmeans_fit(
    ds,
    k: int = 4,
    n_iter: int = 3,
    dim: int = 64,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit k-means; returns (centroids int64 (k, dim) μ-units, counts (k,)).

    Init: the k lowest vec_ids' quantized embeddings (deterministic,
    collected via a distributed scan — only k rows reach the driver).
    Counts are the final assignment's cluster sizes (the assignment that
    produced the returned centroids).
    """
    import ray

    # deterministic init: vec_id < k (tiny collect)
    init_rows = (
        ds.map_batches(
            lambda b: b[b["vec_id"] < k], batch_format="pandas"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    if len(init_rows) < k:
        raise ValueError(f"need at least {k} vectors with vec_id < {k}")
    centroids = quantize_embeddings(
        np.stack([np.asarray(v, dtype=np.float64) for v in init_rows["embedding"]])
    )

    counts = np.zeros(k, dtype=np.int64)
    for _ in range(n_iter):
        ref = ray.put(centroids)

        def assign_partial(
            batch: pd.DataFrame, _centroids_ref=ref
        ) -> pd.DataFrame:
            # Task-based (no actor pool per iteration — pool spin-up ×
            # n_iter dominated at sandbox scale); ray.get of the broadcast
            # is a local shared-memory hit per batch, not a re-ship.
            cents = ray.get(_centroids_ref)
            q = quantize_embeddings(
                np.stack(
                    [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
                )
            )
            labels = _assign(q, cents)
            rows_c: list[int] = []
            rows_n: list[int] = []
            rows_s: list[list[int]] = []
            for c in np.unique(labels):
                mask = labels == c
                rows_c.append(int(c))
                rows_n.append(int(mask.sum()))
                rows_s.append(q[mask].sum(axis=0).tolist())
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series(rows_c, dtype="int64"),
                    "n": pd.Series(rows_n, dtype="int64"),
                    "sums": pd.Series(rows_s, dtype="object"),
                }
            )

        partials = ds.map_batches(
            assign_partial, batch_format="pandas"
        ).to_pandas()  # ≤ k rows per block — tiny

        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for c, n, s in zip(partials["cluster_id"], partials["n"], partials["sums"]):
            counts[int(c)] += int(n)
            sums[int(c)] += np.asarray(s, dtype=np.int64)
        new_centroids = centroids.copy()  # empty clusters carry over
        nonempty = counts > 0
        new_centroids[nonempty] = np.floor_divide(
            sums[nonempty], counts[nonempty][:, None]
        )
        centroids = new_centroids
    return centroids, counts


def kmeans_oracle_sql(k: int = 4, n_iter: int = 3, dim: int = 64) -> str:
    """DuckDB SQL recomputing the identical k-means run — integer μ-unit
    arithmetic, round_even quantization, ROW_NUMBER tie-break, FLOOR
    centroid updates, COALESCE empty-cluster carryover. Output one row per
    (cluster_id, dim_idx): the final centroids + final-assignment sizes.
    """
    scale = f"{KMEANS_SCALE:.1f}"
    parts = [
        f"""
    WITH dims AS (SELECT UNNEST(range(1, {dim + 1})) AS i),
    clusters AS (SELECT UNNEST(range(0, {k})) AS cluster_id),
    q AS (
      SELECT vec_id,
             [CAST(round_even(CAST(x AS DOUBLE) * {scale}, 0) AS BIGINT)
              for x in embedding] AS qe
      FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cluster_id, qe AS c FROM q WHERE vec_id < {k}
    )"""
    ]
    prev = "c0"
    for it in range(1, n_iter + 1):
        parts.append(
            f""",
    d{it} AS (
      SELECT q.vec_id, p.cluster_id,
             list_sum([(q.qe[i] - p.c[i]) * (q.qe[i] - p.c[i])
                       for i in range(1, {dim + 1})]) AS dist
      FROM q CROSS JOIN {prev} p
    ),
    a{it} AS (
      SELECT vec_id, cluster_id FROM (
        SELECT vec_id, cluster_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster_id) AS rn
        FROM d{it}
      ) WHERE rn = 1
    ),
    s{it} AS (
      SELECT a.cluster_id, d.i, SUM(q.qe[d.i]) AS s, COUNT(*) AS n
      FROM a{it} a JOIN q USING (vec_id) CROSS JOIN dims d
      GROUP BY 1, 2
    ),
    c{it} AS (
      SELECT cl.cluster_id,
             COALESCE(
               array_agg(CASE WHEN s.s >= 0 THEN s.s // s.n
                              ELSE -((-s.s + s.n - 1) // s.n) END
                         ORDER BY s.i) FILTER (WHERE s.i IS NOT NULL),
               any_value(p.c)
             ) AS c
      FROM clusters cl
      LEFT JOIN s{it} s ON s.cluster_id = cl.cluster_id
      JOIN {prev} p ON p.cluster_id = cl.cluster_id
      GROUP BY cl.cluster_id
    )"""
        )
        prev = f"c{it}"
    parts.append(
        f"""
    SELECT c.cluster_id,
           d.i - 1 AS dim_idx,
           c.c[d.i] AS centroid_q,
           COALESCE(n.n, 0) AS n_members
    FROM {prev} c
    CROSS JOIN dims d
    LEFT JOIN (
      SELECT cluster_id, COUNT(*) AS n FROM a{n_iter} GROUP BY 1
    ) n ON n.cluster_id = c.cluster_id
    ORDER BY c.cluster_id, dim_idx
    """
    )
    return "".join(parts)
