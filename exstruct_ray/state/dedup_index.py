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
  - Ingest batches send each shard ONE RPC per batch (not one per row):
    admission is an atomic check-and-insert per shard.
  - Admission is IDEMPOTENT PER CLAIMANT: each shard stores
    ``hash → first claimant id`` (the claiming document's id), and a
    claimant re-presenting its own hash receives ``True`` again. This is
    what makes Ray task retries safe — a map task that admitted its
    hashes and died before its output block became durable re-runs,
    re-presents the same (hash, claimant) pairs, and gets the same
    verdicts, so no row is silently dropped. First-writer-wins still
    holds across *distinct* claimants racing on the same content.
  - Actors are named with a config fingerprint (shard count + checkpoint
    dir), so two indexes with different configurations in one Ray session
    can never silently share actors created under the other's layout.
  - Actors checkpoint their hash→claimant maps to parquet (one file per
    shard) so an index survives across jobs — the streaming analogue of
    the manifest layer's resumability.
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

    # num_cpus=0: shards are tiny mostly-idle RPC servers (dict ops), and
    # the process-lifetime handle registry keeps them alive — a nonzero
    # reservation would accumulate across jobs in one process and starve
    # task scheduling on small clusters (observed as a suite hang at 4
    # CPUs with 0.1-CPU shards).
    @ray.remote(num_cpus=0)
    class _DedupShard:
        """One shard: an owned map of admitted content hash → claimant."""

        def __init__(self, shard_id: int, checkpoint_dir: str | None = None):
            self._shard_id = shard_id
            self._dir = checkpoint_dir
            self._seen: dict[bytes, int] = {}
            if checkpoint_dir:
                path = self._path()
                if os.path.exists(path):
                    import pyarrow.parquet as pq

                    table = pq.read_table(path)
                    self._seen = dict(
                        zip(
                            table.column("hash").to_pylist(),
                            table.column("claimant").to_pylist(),
                        )
                    )

        def _path(self) -> str:
            return os.path.join(self._dir, f"shard-{self._shard_id:04d}.parquet")

        def admit(self, hashes: list[bytes], claimants: list[int]) -> list[bool]:
            """Atomic check-and-insert for a batch slice.

            True = this claimant owns the hash (first presentation OR a
            re-presentation by the same claimant, i.e. a task retry).
            False = a different claimant admitted the content first.
            Claimant -1 is the anonymous mode: first-call-wins, never
            granted ownership on re-presentation.
            """
            out = []
            seen = self._seen
            for h, c in zip(hashes, claimants):
                if h in seen:
                    out.append(c != -1 and seen[h] == c)
                else:
                    seen[h] = c
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
            items = sorted(self._seen.items())
            pq.write_table(
                pa.table(
                    {
                        "hash": [h for h, _ in items],
                        "claimant": [c for _, c in items],
                    }
                ),
                tmp,
            )
            os.replace(tmp, path)  # write-then-rename: crash-safe
            return path

    return _DedupShard


# Process-lifetime strong references to shard actor handles (see the
# registry comment in DedupIndex.__init__).
_SHARD_HANDLES: dict[str, object] = {}


class DedupIndex:
    """Handle over the shard actors (create once per job on the driver)."""

    def __init__(
        self,
        n_shards: int = 16,
        checkpoint_dir: str | None = None,
        name_prefix: str = "dedup_index",
        run_id: str | None = None,
        ephemeral: bool = False,
    ):
        import ray
        import uuid

        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1, got {n_shards}")
        shard_cls = _make_shard_actor()
        self.n_shards = n_shards
        # Run token scoping the retry-idempotence window: claimant ids are
        # derived from (run_id, doc_id), and the token is fixed when the
        # index handle is built — BEFORE the pipeline runs — so a Ray task
        # retry (same serialized closure, same token) re-receives True,
        # while tomorrow's job (new handle, new token) correctly sees its
        # re-ingested documents as duplicates.
        self.run_id = run_id if run_id is not None else uuid.uuid4().hex
        # The actor name embeds the configuration (shard count + checkpoint
        # dir hash): ray's get_if_exists ignores constructor args for an
        # existing named actor, so without this a second DedupIndex with a
        # different layout would silently reuse actors built under the old
        # one and shard_of() would disagree with the live shard count.
        cfg = hashlib.md5(
            f"{n_shards}|{checkpoint_dir or ''}".encode()
        ).hexdigest()[:8]
        # Handles are held in a process-level registry: named NON-detached
        # actors are reference-counted, so when a prior DedupIndex over
        # the same shards goes out of scope the actors start dying
        # asynchronously — a quick successor's get_if_exists can then
        # resolve the name to a DYING actor and every RPC fails with
        # ActorDiedError (observed as an order-dependent flake under
        # back-to-back job runs). Keeping one strong handle per name for
        # the process lifetime removes the race; a fresh process simply
        # re-creates actors, which reload from the checkpoint dir.
        # Ephemeral mode skips the registry: an index whose name is unique
        # per call (e.g. a uuid prefix) can never hit the dying-actor name
        # race the registry exists to fix, and pinning such handles would
        # leak one actor set (plus its hash map) per call in a long-lived
        # driver. Ephemeral actors die with this handle via normal
        # reference counting.
        self._actors = []
        for i in range(n_shards):
            name = f"{name_prefix}:{cfg}:{i}"
            if ephemeral:
                handle = shard_cls.options(
                    name=name, get_if_exists=True
                ).remote(i, checkpoint_dir)
            else:
                handle = _SHARD_HANDLES.get(name)
                if handle is None:
                    handle = shard_cls.options(
                        name=name, get_if_exists=True
                    ).remote(i, checkpoint_dir)
                    _SHARD_HANDLES[name] = handle
            self._actors.append(handle)

    def shard_of(self, digest: bytes) -> int:
        # Four prefix bytes, not one: digest[0] % n silently caps the
        # effective shard count at 256 and skews when n doesn't divide 256.
        return int.from_bytes(digest[:4], "big") % self.n_shards

    def claimant_of(self, doc_id) -> int:
        """Compact int64 claimant token for (run_id, doc_id)."""
        digest = hashlib.md5(f"{self.run_id}:{doc_id}".encode()).digest()
        return int.from_bytes(digest[:8], "big", signed=True)

    def admit_hashes(
        self, digests: list[bytes], claimants: list[int] | None = None
    ) -> list[bool]:
        """Batch admission: one RPC per touched shard, order-preserving.

        ``claimants[i]`` identifies who is presenting ``digests[i]`` (the
        document id in dedup_against_index). Re-presenting the same
        (digest, claimant) pair always returns the same verdict — the
        retry-idempotence contract. When omitted, every row claims as -1,
        which degrades to plain first-call-wins (NOT retry-safe; only for
        single-shot interactive use).
        """
        import ray

        if claimants is None:
            claimants = [-1] * len(digests)
        by_shard: dict[int, list[int]] = {}
        for pos, digest in enumerate(digests):
            by_shard.setdefault(self.shard_of(digest), []).append(pos)
        refs = {
            shard: self._actors[shard].admit.remote(
                [digests[pos] for pos in positions],
                [claimants[pos] for pos in positions],
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
    id_column: str = "doc_id",
    *,
    batch_size: int = 256,
):
    """Streaming admission filter: keep only rows whose content has never
    been admitted to the index (by this run or any previous one).

    Retry-safe: admission is claimed under a token derived from the
    index's run id and each row's ``id_column`` value, and shards grant
    ``True`` to a re-presenting claimant. A task that admitted its hashes
    and died before delivering its output block is retried by Ray Data;
    the retry presents the same (hash, claimant) pairs, receives the same
    ``True`` verdicts, and emits the full row set — no silent loss under
    task failure. Two *different* documents with equal content still race
    first-writer-wins exactly once, and a NEW job over the same documents
    (fresh run id) correctly sees them all as duplicates.
    """
    import pyarrow as pa

    def admit_batch(batch: pa.Table) -> pa.Table:
        # Arrow-native: hashing needs per-row Python strings either way,
        # but the row filter is a zero-copy Arrow mask — non-text columns
        # never round-trip through pandas.
        digests = [
            _content_hash(t) for t in batch.column(text_column).to_pylist()
        ]
        claimants = [
            index.claimant_of(i)
            for i in batch.column(id_column).to_pylist()
        ]
        keep = index.admit_hashes(digests, claimants)
        return batch.filter(pa.array(keep, type=pa.bool_()))

    return ds.map_batches(
        admit_batch, batch_format="pyarrow", batch_size=batch_size
    )
