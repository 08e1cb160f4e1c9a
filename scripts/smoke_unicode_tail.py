"""Unicode/size-tail corpus smoke through the resumable curation job.

VERDICT r4 item 8: every oracle fixture is synthetic ASCII word salad by
design; real web corpora carry unicode and size tails those fixtures
undersample. This script builds a deterministic corpus (stdlib only, no
external data) that concentrates exactly those tails — CJK text with no
word separators, RTL Arabic/Hebrew, combining-diacritic-heavy Latin,
emoji + ZWJ sequences and astral-plane codepoints, zero-width and bidi
control characters, exotic whitespace (NBSP, ideographic space), ~0.5 MB
long-document outliers, empty and whitespace-only docs, and full-width
digits in PII-shaped strings — then runs the full curation job
(Gopher filter + decontamination + PII redaction + sharded streaming
dedup + partitioned parquet output) over it twice: a fresh run and a
resume run that must skip every partition.

Pass criteria (asserted, not just printed):
  * the job completes with no exception on every tail family,
  * docs_in == corpus size, 0 < kept <= docs_in,
  * exact duplicates planted across families are removed,
  * the resume run skips all partitions and changes no counts,
  * output parquet is readable, doc_ids unique, text round-trips as
    valid UTF-8 with the exotic codepoints intact.

Prints one JSON line with per-family keep rates (the "sane signal
distributions" record for BASELINE.md).

Run:  python scripts/smoke_unicode_tail.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = "/tmp/exstruct_ray_unicode_tail/corpus"
OUT_DIR = "/tmp/exstruct_ray_unicode_tail/curated"

# Deterministic word banks — multi-script, built inline (no network, no
# external files). Each family stresses a distinct tail.
_LATIN = (
    "the quick brown fox jumps over lazy dogs while seventeen wizards "
    "boldly quiz the sphinx about vexing jackdaws near frozen quays"
).split()
_CJK = list("风花雪月山川湖海春夏秋冬日月星辰天地玄黄宇宙洪荒东西南北") + list(
    "すべての人間は生まれながらにして自由であり尊厳と権利について平等である"
)
_ARABIC = "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق وقد وهبوا عقلا وضميرا".split()
_HEBREW = "כל בני האדם נולדו בני חורין ושווים בערכם ובזכויותיהם".split()
_CYRILLIC = "все люди рождаются свободными и равными в своем достоинстве и правах".split()
_DIACRITIC = [
    "élève",  # NFD combining acute/grave
    "ščǔ",  # combining carons
    "äöü",  # combining diaereses
    "ñõ",
    "Zalgo̴̵̶t̷e̸xt",
]
_EMOJI = [
    "\U0001f600\U0001f680\U0001f9e0",
    "\U0001f469‍\U0001f4bb",  # woman technologist (ZWJ)
    "\U0001f1ef\U0001f1f5",  # flag sequence
    "\U00010348\U00010349",  # Gothic (astral, non-emoji)
    "❤️",  # variation selector
]
_CONTROLS = ["​", "‎", "‏", "⁠", "﻿"]  # ZW/bidi/WJ/BOM
_SPACES = [" ", " ", "　"]  # NBSP, thin, ideographic


def _rng(seed: int):
    # Tiny deterministic LCG so the corpus never depends on library RNG
    # versioning (same rationale as the datagen builders).
    state = seed & 0x7FFFFFFF

    def nxt(n: int) -> int:
        nonlocal state
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        return state % n

    return nxt


def _doc(family: str, i: int, nxt) -> str:
    if family == "ascii":
        return " ".join(_LATIN[nxt(len(_LATIN))] for _ in range(40 + nxt(40)))
    if family == "cjk":
        # No word separators at all — stresses whitespace tokenizers.
        return "".join(_CJK[nxt(len(_CJK))] for _ in range(120 + nxt(200)))
    if family == "rtl":
        bank = _ARABIC if i % 2 == 0 else _HEBREW
        return " ".join(bank[nxt(len(bank))] for _ in range(30 + nxt(40)))
    if family == "cyrillic":
        return " ".join(_CYRILLIC[nxt(len(_CYRILLIC))] for _ in range(30 + nxt(40)))
    if family == "diacritics":
        return " ".join(_DIACRITIC[nxt(len(_DIACRITIC))] for _ in range(30 + nxt(40)))
    if family == "emoji":
        words = [_LATIN[nxt(len(_LATIN))] for _ in range(30)]
        for j in range(0, len(words), 4):
            words[j] = words[j] + _EMOJI[nxt(len(_EMOJI))]
        return " ".join(words)
    if family == "controls":
        # Zero-width and bidi controls spliced INSIDE words plus exotic
        # whitespace BETWEEN them.
        words = [
            _LATIN[nxt(len(_LATIN))] + _CONTROLS[nxt(len(_CONTROLS))]
            for _ in range(40)
        ]
        return _SPACES[nxt(len(_SPACES))].join(words)
    if family == "long":
        # ~0.5 MB single document — the size tail.
        return " ".join(_LATIN[nxt(len(_LATIN))] for _ in range(90_000))
    if family == "empty":
        return ["", " ", "\n\t ", "　 "][i % 4]
    if family == "pii_fullwidth":
        # Full-width digits in PII-shaped strings — a redaction regex
        # that assumes ASCII [0-9] must not crash on these.
        return (
            "contact me at ０９０－１２３４－５６７８ or +1-555-867-5309 "
            "email tail@example.com ssn 123-45-6789 "
            + " ".join(_LATIN[nxt(len(_LATIN))] for _ in range(40))
        )
    raise ValueError(family)


FAMILIES = [
    ("ascii", 600),
    ("cjk", 250),
    ("rtl", 250),
    ("cyrillic", 200),
    ("diacritics", 150),
    ("emoji", 150),
    ("controls", 150),
    ("long", 5),
    ("empty", 40),
    ("pii_fullwidth", 100),
]
N_FILES = 8
N_EXACT_DUPES = 60  # planted exact duplicates (must be deduped)


def build_corpus(root: str) -> dict[int, str]:
    """Write the corpus as N_FILES parquet files; return doc_id -> family."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    nxt = _rng(20260819)
    rows: list[tuple[int, str, str]] = []
    doc_id = 0
    for family, n in FAMILIES:
        for i in range(n):
            rows.append((doc_id, family, _doc(family, i, nxt)))
            doc_id += 1
    # Plant exact duplicates of earlier docs (cycled across families).
    base = len(rows)
    for j in range(N_EXACT_DUPES):
        src = rows[(j * 37) % base]
        rows.append((base + j, src[1] + "_dup", src[2]))
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    per = (len(rows) + N_FILES - 1) // N_FILES
    for f in range(N_FILES):
        chunk = rows[f * per : (f + 1) * per]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
                "text": pa.array([r[2] for r in chunk], pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(root, f"part-{f:03d}.parquet"))
    return {r[0]: r[1] for r in rows}


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    import pyarrow.parquet as pq
    import ray.data

    from exstruct_ray.stages.curation_job import run_curation_job

    fam_by_id = build_corpus(CORPUS_DIR)
    n_docs = len(fam_by_id)
    if os.path.exists(OUT_DIR):
        shutil.rmtree(OUT_DIR)

    summary = run_curation_job(
        CORPUS_DIR, OUT_DIR, files_per_partition=2, n_shards=4, bench_mod=997
    )
    assert summary["docs_in"] == n_docs, (summary, n_docs)
    assert 0 < summary["kept"] <= n_docs, summary
    assert summary["skipped"] == 0, summary

    # Resume run: every partition must be skipped, counts unchanged.
    resumed = run_curation_job(
        CORPUS_DIR, OUT_DIR, files_per_partition=2, n_shards=4, bench_mod=997
    )
    assert resumed["skipped"] == resumed["partitions"], resumed
    assert resumed["kept"] == summary["kept"], (resumed, summary)

    # Read back every surviving doc; verify ids unique, text valid and
    # exotic codepoints intact, and planted exact dupes removed.
    part_files = sorted(
        os.path.join(OUT_DIR, d, f)
        for d in os.listdir(OUT_DIR)
        if d.startswith("partition=")
        for f in os.listdir(os.path.join(OUT_DIR, d))
        if f.endswith(".parquet")
    )
    out = ray.data.read_parquet(part_files).to_pandas()
    assert out["doc_id"].is_unique
    kept_ids = set(out["doc_id"].tolist())
    texts = out.set_index("doc_id")["text"]
    for did in kept_ids:
        t = texts.loc[did]
        assert isinstance(t, str)
        t.encode("utf-8")  # must round-trip
    # Exact dupes: for every planted dup pair, at most one side survives.
    base = n_docs - N_EXACT_DUPES
    dup_both = sum(
        1
        for j in range(N_EXACT_DUPES)
        if (base + j) in kept_ids and ((j * 37) % base) in kept_ids
    )
    assert dup_both == 0, f"{dup_both} planted dup pairs both survived"
    # Spot-check codepoint fidelity on a CJK and an emoji survivor.
    for fam, probe in (("cjk", lambda s: any(ord(c) > 0x3000 for c in s)),
                       ("emoji", lambda s: any(ord(c) > 0xFFFF for c in s))):
        fam_kept = [d for d in kept_ids if fam_by_id[d] == fam]
        if fam_kept:
            assert probe(texts.loc[fam_kept[0]]), f"{fam} text mangled"

    # Per-family keep rates — the signal-distribution record.
    per_family: dict[str, dict] = {}
    for did, fam in fam_by_id.items():
        fam = fam.removesuffix("_dup")
        rec = per_family.setdefault(fam, {"n": 0, "kept": 0})
        rec["n"] += 1
        rec["kept"] += 1 if did in kept_ids else 0
    for fam, rec in per_family.items():
        rec["keep_rate"] = round(rec["kept"] / rec["n"], 3)
    # Sanity bars: plain prose survives, empty/whitespace never does.
    assert per_family["ascii"]["keep_rate"] > 0.5, per_family["ascii"]
    assert per_family["empty"]["kept"] == 0, per_family["empty"]

    print(
        json.dumps(
            {
                "docs_in": n_docs,
                "kept": summary["kept"],
                "partitions": summary["partitions"],
                "resume_skipped": resumed["skipped"],
                "per_family": per_family,
            },
            ensure_ascii=True,
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
