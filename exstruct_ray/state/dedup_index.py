"""Sharded streaming dedup index: cross-batch mutable state as raw actors.

The batch dedup operators (ops/dedup.py) answer "which documents in this
corpus duplicate each other" as a pure Dataset computation. A *streaming
ingest* asks a different question the Dataset API cannot express: "has
this content EVER been admitted before — including by a batch running
right now or by yesterday's run?" That needs an index that mutates across
batches and outlives a single pipeline, so it drops to the raw-actor tier
— the engine's only shared-mutable-state component, per the design rule
that raw actors are a last resort.

Design for scale:
  - The index is SHARDED by content-hash prefix across N actors, so
    admission checks fan out and no single actor's heap or throughput is
    the bottleneck; shard count is a knob sized to the cluster.
  - Ingest batches send each shard ONE set-union RPC per batch (not one
    per row): admission is an atomic check-and-insert per shard, so a
    hash is admitted exactly once even with concurrent ingest tasks.
  - First-writer-wins across concurrent batches; losers learn the
    duplicate verdict in the same RPC round trip.
  - Actors checkpoint their hash sets to parquet (one file per shard) so
    an index survives across jobs — the streaming analogue of the
    manifest layer's resumability.
"""

from __future__ import annotations

import hashlib
import os


def _content_hash(text: str) -> bytes:
    return hashlib.md5((text or "").encode("utf-8")).digest()


def _make_shard_actor():
    """Define the shard actor lazily so importing this module never
    requires an initialized Ray runtime."""
    import ray

    @ray.remote(num_cpus=0.1)
    class _DedupShard:
        """One shard: an owned set of admitted content hashes."""

        def __init__(self, shard_id: int, checkpoint_dir: str | None = None):
            self._shard_id = shard_id
            self._dir = checkpoint_dir
            self._seen: set[bytes] = set()
            if checkpoint_dir:
                path = self._path()
                if os.path.exists(path):
                    import pyarrow.parquet as pq

                    table = pq.read_table(path)
                    self._seen = set(table.column("hash").to_pylist())

        def _path(self) -> str:
            return os.path.join(self._dir, f"shard-{self._shard_id:04d}.parquet")

        def admit(self, hashes: list[bytes]) -> list[bool]:
            """Atomic check-and-insert for a batch slice; True = first time."""
            out = []
            seen = self._seen
            for h in hashes:
                if h in seen:
                    out.append(False)
                else:
                    seen.add(h)
                    out.append(True)
            return out

        def size(self) -> int:
            return len(self._seen)

        def checkpoint(self) -> str | None:
            if not self._dir:
                return None
            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(self._dir, exist_ok=True)
            path = self._path()
            tmp = path + ".tmp"
            pq.write_table(
                pa.table({"hash": sorted(self._seen)}), tmp
            )
            os.replace(tmp, path)  # write-then-rename: crash-safe
            return path

    return _DedupShard


class DedupIndex:
    """Handle over the shard actors (create once per job on the driver)."""

    def __init__(
        self,
        n_shards: int = 16,
        checkpoint_dir: str | None = None,
        name_prefix: str = "dedup_index",
    ):
        import ray

        shard_cls = _make_shard_actor()
        self.n_shards = n_shards
        self._actors = [
            shard_cls.options(
                name=f"{name_prefix}:{i}", get_if_exists=True
            ).remote(i, checkpoint_dir)
            for i in range(n_shards)
        ]

    def shard_of(self, digest: bytes) -> int:
        return digest[0] % self.n_shards

    def admit_hashes(self, digests: list[bytes]) -> list[bool]:
        """Batch admission: one RPC per touched shard, order-preserving."""
        import ray

        by_shard: dict[int, list[int]] = {}
        for pos, digest in enumerate(digests):
            by_shard.setdefault(self.shard_of(digest), []).append(pos)
        refs = {
            shard: self._actors[shard].admit.remote(
                [digests[pos] for pos in positions]
            )
            for shard, positions in by_shard.items()
        }
        verdicts: list[bool] = [False] * len(digests)
        for shard, positions in by_shard.items():
            for pos, ok in zip(positions, ray.get(refs[shard])):
                verdicts[pos] = ok
        return verdicts

    def total_size(self) -> int:
        import ray

        return sum(ray.get([a.size.remote() for a in self._actors]))

    def checkpoint(self) -> list[str]:
        import ray

        return [
            p
            for p in ray.get([a.checkpoint.remote() for a in self._actors])
            if p is not None
        ]


def dedup_against_index(
    ds,
    index: DedupIndex,
    text_column: str = "text",
    *,
    batch_size: int = 256,
):
    """Streaming admission filter: keep only rows whose content has never
    been admitted to the index (by this run or any previous one).

    The map stage is stateless — the state lives in the shard actors — so
    Ray can retry a failed task safely: re-admitting the same hash returns
    False on the retry, but the hash was only ever ADMITTED once, and a
    task retry re-processes its whole batch against the same first-writer
    verdicts only if the original never delivered its output block.
    """
    import pandas as pd

    def admit_batch(batch: pd.DataFrame) -> pd.DataFrame:
        digests = [_content_hash(t) for t in batch[text_column]]
        keep = index.admit_hashes(digests)
        return batch.loc[pd.Series(keep, index=batch.index)]

    return ds.map_batches(admit_batch, batch_format="pandas", batch_size=batch_size)
