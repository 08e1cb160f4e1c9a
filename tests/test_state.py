"""Shared-state tier tests: sharded streaming dedup index."""

import pandas as pd


class TestDedupIndex:
    def test_streaming_admission_across_batches(self, ray_session, tmp_path):
        import ray.data

        from exstruct_ray.state import DedupIndex, dedup_against_index

        index = DedupIndex(
            n_shards=4, checkpoint_dir=str(tmp_path), name_prefix="t1"
        )
        docs = [
            {"doc_id": i, "text": f"content-{i % 6}"} for i in range(30)
        ]  # 6 distinct contents, 30 rows
        ds = ray.data.from_items(docs)
        kept = dedup_against_index(ds, index, batch_size=5).to_pandas()
        # exactly one admission per distinct content, regardless of batch
        # boundaries or task parallelism
        assert len(kept) == 6
        assert sorted(kept["text"].unique()) == sorted(
            f"content-{i}" for i in range(6)
        )
        assert index.total_size() == 6

    def test_index_survives_checkpoint_reload(self, ray_session, tmp_path):
        import ray.data

        from exstruct_ray.state import DedupIndex, dedup_against_index

        first = DedupIndex(
            n_shards=2, checkpoint_dir=str(tmp_path), name_prefix="t2a"
        )
        ds1 = ray.data.from_items(
            [{"doc_id": i, "text": f"seen-{i}"} for i in range(4)]
        )
        assert len(dedup_against_index(ds1, first).to_pandas()) == 4
        paths = first.checkpoint()
        assert len(paths) == 2

        # a NEW index (fresh actors, e.g. the next day's job) reloads the
        # checkpoint and rejects everything already admitted
        second = DedupIndex(
            n_shards=2, checkpoint_dir=str(tmp_path), name_prefix="t2b"
        )
        ds2 = ray.data.from_items(
            [{"doc_id": i, "text": f"seen-{i}"} for i in range(4)]
            + [{"doc_id": 99, "text": "brand-new"}]
        )
        kept = dedup_against_index(ds2, second).to_pandas()
        assert kept["text"].tolist() == ["brand-new"]

    def test_task_retry_does_not_lose_rows(self, ray_session):
        """Simulated Ray task retry: a task admits its hashes, dies before
        its output block is delivered, and re-runs. The retry presents the
        same (hash, claimant) pairs and must re-receive True for every row
        it claimed — otherwise the filter silently drops documents."""
        from exstruct_ray.state import DedupIndex
        from exstruct_ray.state.dedup_index import _content_hash

        index = DedupIndex(n_shards=4, name_prefix="t4")
        texts = [f"retry-doc-{i}" for i in range(20)]
        digests = [_content_hash(t) for t in texts]
        claimants = [index.claimant_of(i) for i in range(20)]

        first = index.admit_hashes(digests, claimants)
        assert all(first)
        # the "retry": identical presentation must yield identical verdicts
        retry = index.admit_hashes(digests, claimants)
        assert retry == first
        # a DIFFERENT document with the same content still loses the race
        other = index.admit_hashes([digests[0]], [index.claimant_of(999)])
        assert other == [False]
        # hashes were only ever admitted once each
        assert index.total_size() == 20

    def test_new_run_sees_prior_admissions_as_dups(self, ray_session, tmp_path):
        """Retry-idempotence must NOT leak across jobs: a new index handle
        (fresh run id) over the same checkpoint rejects yesterday's docs
        even when doc_ids coincide."""
        import ray.data

        from exstruct_ray.state import DedupIndex, dedup_against_index

        docs = [{"doc_id": i, "text": f"daily-{i}"} for i in range(5)]
        day1 = DedupIndex(n_shards=2, checkpoint_dir=str(tmp_path), name_prefix="t5a")
        kept1 = dedup_against_index(ray.data.from_items(docs), day1).to_pandas()
        assert len(kept1) == 5
        day1.checkpoint()

        day2 = DedupIndex(n_shards=2, checkpoint_dir=str(tmp_path), name_prefix="t5b")
        kept2 = dedup_against_index(ray.data.from_items(docs), day2).to_pandas()
        assert len(kept2) == 0

    def test_config_mismatch_gets_fresh_actors(self, ray_session, tmp_path):
        """Two indexes with the same name_prefix but different shard counts
        must not silently share actors (named-actor get_if_exists ignores
        constructor args)."""
        from exstruct_ray.state import DedupIndex
        from exstruct_ray.state.dedup_index import _content_hash

        a = DedupIndex(n_shards=2, name_prefix="t6")
        b = DedupIndex(n_shards=4, name_prefix="t6")
        digests = [_content_hash(f"cfg-{i}") for i in range(40)]
        assert all(a.admit_hashes(digests))
        # b has its own actors: the same content is unseen there
        assert all(b.admit_hashes(digests))
        assert a.total_size() == 40
        assert b.total_size() == 40

    def test_sharding_spreads_hashes(self, ray_session):
        from exstruct_ray.state import DedupIndex
        from exstruct_ray.state.dedup_index import _content_hash

        index = DedupIndex(n_shards=4, name_prefix="t3")
        digests = [_content_hash(f"doc {i}") for i in range(200)]
        verdicts = index.admit_hashes(digests)
        assert all(verdicts)
        # re-admitting is all duplicates, order preserved
        assert not any(index.admit_hashes(digests))
        shards = {index.shard_of(d) for d in digests}
        assert shards == {0, 1, 2, 3}

    def test_shard_routing_not_capped_at_256(self, ray_session):
        """Single-byte routing silently left shards >=256 permanently
        empty; the 4-byte prefix must reach the whole shard range."""
        from exstruct_ray.state import DedupIndex
        from exstruct_ray.state.dedup_index import _content_hash

        # routing is a pure function of (digest, n_shards) — no need to
        # spin up 300 actors to test it
        index = DedupIndex.__new__(DedupIndex)
        index.n_shards = 300
        shards = {
            index.shard_of(_content_hash(f"wide {i}")) for i in range(20000)
        }
        assert max(shards) >= 256
        assert len(shards) == 300

    def test_ephemeral_mode_does_not_pin_handles(self, ray_session):
        """Per-call uuid-named indexes must not leak one actor set per call
        into the process-lifetime registry."""
        import uuid

        from exstruct_ray.state import DedupIndex
        from exstruct_ray.state import dedup_index as mod
        from exstruct_ray.state.dedup_index import _content_hash

        before = set(mod._SHARD_HANDLES)
        index = DedupIndex(
            n_shards=2,
            name_prefix=f"eph_{uuid.uuid4().hex[:8]}",
            ephemeral=True,
        )
        digests = [_content_hash(f"eph-{i}") for i in range(10)]
        assert all(index.admit_hashes(digests))
        assert not any(index.admit_hashes(digests))
        assert set(mod._SHARD_HANDLES) == before
