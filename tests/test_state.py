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
