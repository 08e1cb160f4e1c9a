"""Pinned golden span sequences — the span-equality regression gate.

tests/golden_spans.json holds the exact (kind, text, media_ref, offset)
sequences for every fixture family at both modes. Any change to parser,
detection, ordering, or serialization semantics that alters output fails
here with a precise diff. Regenerate ONLY for intentional semantic changes
(see the generation snippet in the file's git history).
"""

import json
from pathlib import Path

import pytest

from exstruct_ray.config import ExtractOptions
from exstruct_ray.datagen.corpus import build_document
from exstruct_ray.extract.document import extract_document_spans

GOLDEN = json.loads(
    (Path(__file__).parent / "golden_spans.json").read_text(encoding="utf-8")
)


@pytest.mark.parametrize("key", sorted(GOLDEN))
def test_golden_span_sequence(key):
    mode, doc_id = key.split(":", 1)
    idx = int(doc_id.split("-")[1])
    doc = build_document(idx, seed=42)
    assert doc["doc_id"] == doc_id
    s = doc["spans"]
    out = extract_document_spans(
        [x["kind"] for x in s],
        [x["text"] for x in s],
        [x["media_ref"] for x in s],
        ExtractOptions(mode=mode),
    )
    got = [
        {"kind": x.kind, "text": x.text, "media_ref": x.media_ref, "offset": x.offset}
        for x in out
    ]
    assert got == GOLDEN[key]
