"""The extraction actor: one stateful map_batches stage over Arrow batches.

Setup (option resolution, parser tables) happens once per actor in
``__init__``; each ``__call__`` processes one Arrow batch of documents.
Per-document failures become error spans, never task failures — one poison
document cannot fail a block (the distributed analogue of the reference's
FallbackReason degrade-in-place policy, ADR-0002).

Emits per-row metrics columns (n_spans, n_errors, parse_ms) so per-partition
lineage/throughput can be aggregated downstream without a second pass.
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..config import ExtractOptions
from ..datagen.corpus import SPAN_TYPE
from ..extract.document import extract_document_spans

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPAN_TYPE),
        ("n_spans", pa.int32()),
        ("n_errors", pa.int32()),
        ("parse_ms", pa.float32()),
    ]
)


_GC_TUNED = False


def _tune_gc_for_parse() -> None:
    """Raise GC gen-0 threshold once per worker process.

    XML parsing allocates millions of short-lived objects per batch; the
    default gen-0 threshold (700) triggers collection sweeps constantly and
    they serialize badly across many cores (measured +13–15% extraction
    throughput at 32 CPUs from this change alone). Collection stays ON —
    only the cadence changes — so cyclic garbage is still reclaimed.
    """
    global _GC_TUNED
    if not _GC_TUNED:
        import gc

        gc.set_threshold(200_000, 100, 100)
        _GC_TUNED = True


class ExtractActor:
    """Callable class for ``ds.map_batches(ExtractActor, concurrency=...)``."""

    def __init__(self, options: ExtractOptions | None = None) -> None:
        _tune_gc_for_parse()
        self._opts = (options or ExtractOptions()).resolved()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()

        # Decode the list<struct> column via flat child arrays + offsets —
        # no per-span Python dicts on either side of the actor.
        spans_col = batch.column("spans")
        if spans_col.num_chunks == 0:
            list_arr = pa.array([], type=batch.schema.field("spans").type)
        else:
            list_arr = spans_col.combine_chunks()
        offsets = list_arr.offsets.to_pylist()
        values = list_arr.values
        all_kinds = values.field("kind").to_pylist()
        all_texts = values.field("text").to_pylist()
        all_refs = values.field("media_ref").to_pylist()

        out_kinds: list[str] = []
        out_texts: list[str] = []
        out_refs: list[str] = []
        out_offs: list[int] = []
        out_list_offsets: list[int] = [0]
        out_n_spans: list[int] = []
        out_n_errors: list[int] = []
        out_ms: list[float] = []

        for i in range(len(doc_ids)):
            lo, hi = offsets[i], offsets[i + 1]
            start = time.perf_counter()
            result = extract_document_spans(
                all_kinds[lo:hi],
                all_texts[lo:hi],
                all_refs[lo:hi],
                self._opts,
            )
            n_err = 0
            for s in result:
                out_kinds.append(s.kind)
                out_texts.append(s.text)
                out_refs.append(s.media_ref)
                out_offs.append(s.offset)
                if s.kind == "error":
                    n_err += 1
            out_list_offsets.append(len(out_kinds))
            out_n_spans.append(len(result))
            out_n_errors.append(n_err)
            out_ms.append((time.perf_counter() - start) * 1000.0)

        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(out_kinds, pa.string()),
                pa.array(out_texts, pa.string()),
                pa.array(out_refs, pa.string()),
                pa.array(out_offs, pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans_out = pa.ListArray.from_arrays(
            pa.array(out_list_offsets, pa.int32()), span_struct
        )
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                spans_out,
                pa.array(out_n_spans, pa.int32()),
                pa.array(out_n_errors, pa.int32()),
                pa.array(out_ms, pa.float32()),
            ],
            schema=OUTPUT_SCHEMA,
        )
