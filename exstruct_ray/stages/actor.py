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


class ExtractActor:
    """Callable class for ``ds.map_batches(ExtractActor, concurrency=...)``."""

    def __init__(self, options: ExtractOptions | None = None) -> None:
        self._opts = (options or ExtractOptions()).resolved()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()

        out_doc_ids: list[str] = []
        out_spans: list[list[dict]] = []
        out_n_spans: list[int] = []
        out_n_errors: list[int] = []
        out_ms: list[float] = []

        for doc_id, spans in zip(doc_ids, spans_col):
            start = time.perf_counter()
            spans = spans or []
            result = extract_document_spans(
                [s["kind"] for s in spans],
                [s["text"] for s in spans],
                [s["media_ref"] for s in spans],
                self._opts,
            )
            out_doc_ids.append(doc_id)
            out_spans.append(
                [
                    {
                        "kind": s.kind,
                        "text": s.text,
                        "media_ref": s.media_ref,
                        "offset": s.offset,
                    }
                    for s in result
                ]
            )
            out_n_spans.append(len(result))
            out_n_errors.append(sum(1 for s in result if s.kind == "error"))
            out_ms.append((time.perf_counter() - start) * 1000.0)

        return pa.Table.from_pydict(
            {
                "doc_id": out_doc_ids,
                "spans": out_spans,
                "n_spans": out_n_spans,
                "n_errors": out_n_errors,
                "parse_ms": out_ms,
            },
            schema=OUTPUT_SCHEMA,
        )
