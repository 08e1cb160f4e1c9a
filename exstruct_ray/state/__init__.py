"""Shared mutable state — the raw-actor tier.

Everything else in this engine is a pure Dataset transform; this package
holds the one semantics the Dataset API genuinely cannot express: state
that mutates across batches and must be consistent corpus-wide (a growing
dedup admission index for streaming ingest). Kept deliberately small —
reach for it last, per the engine's design rules.
"""

from .dedup_index import DedupIndex, dedup_against_index

__all__ = ["DedupIndex", "dedup_against_index"]
