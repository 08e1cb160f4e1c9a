"""Deterministic synthetic corpus generator (fixture families F1–F11).

Builds the engine's input table — (doc_id: string, spans:
list<struct<kind,text,media_ref,offset>>) — from seeded synthetic workbooks.
Families mirror FIXTURES.md §2 / the reference's own test corpus themes
(basic table, numeric coercion, unicode, flowchart, charts, merged forms,
multi-sheet print areas, border clusters, empty/edge, links+formulas+colors,
giant-doc skew). No external data; same (seed, index) → same document.
"""

from __future__ import annotations

import datetime as _dt
import random

import pyarrow as pa

from .builder import BOX, StyleSpec, WorkbookBuilder

# Bump when generator output changes so cached bench corpora regenerate.
GENERATOR_VERSION = 2

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPAN_TYPE)])


def _family_basic(rng: random.Random) -> WorkbookBuilder:
    """F1: one sheet, bordered 6-col table with header + numbers + dates."""
    wb = WorkbookBuilder()
    sh = wb.sheet("Sheet1")
    header = ["month", "prodA", "prodB", "prodC"]
    sh.fill_block(3, 1, [header], style=BOX)
    base = rng.randint(50, 200)
    for i in range(6):
        row = [
            _dt.datetime(2025, i + 1, 1),
            base + i * rng.randint(5, 20),
            base // 2 + i * 7,
            round(base / 3 + i * 1.5, 2),
        ]
        sh.fill_block(4 + i, 1, [row], style=BOX)
    return wb


def _family_coercion(rng: random.Random) -> WorkbookBuilder:
    """F2: numeric-coercion edge strings + blanks."""
    wb = WorkbookBuilder()
    sh = wb.sheet("Coerce")
    values = ["123", "1.50", "+7", "-0.25", "007", "1e5", "text", "", "  ", "12.0"]
    rng.shuffle(values)
    for j, v in enumerate(values):
        sh.set(1, j, v)
    sh.set(2, 0, rng.randint(0, 10**9))
    sh.set(2, 1, rng.random())
    return wb


def _family_unicode(rng: random.Random) -> WorkbookBuilder:
    """F3: Japanese/emoji text, newlines/tabs in cells, JP sheet names."""
    wb = WorkbookBuilder()
    sh = wb.sheet("シート一")
    words = ["月", "製品A", "データ🎉", "改\n行", "タブ\tあり", "ключ", "café"]
    sh.fill_block(1, 0, [words[: 3 + rng.randint(0, 3)]])
    sh.set(2, 0, f"値{rng.randint(0, 999)}")
    wb.sheet("数値").set(1, 0, rng.randint(1, 100))
    return wb


def _family_flowchart(rng: random.Random) -> WorkbookBuilder:
    """F4: shapes + connectors with direct ids, a heuristic endpoint, flips."""
    wb = WorkbookBuilder()
    sh = wb.sheet("Flow")
    s1 = sh.add_shape("start", prst="flowChartProcess", x_pt=100, y_pt=50)
    s2 = sh.add_shape("check", prst="flowChartDecision", x_pt=100, y_pt=200)
    s3 = sh.add_shape("end", prst="ellipse", x_pt=300, y_pt=200)
    # direct connector s1 -> s2 (downwards)
    sh.add_connector(140, 90, 0, 110, start_id=s1, end_id=s2, head=False, tail=True)
    # heuristic connector near s2 -> s3 (eastwards, no endpoint refs)
    sh.add_connector(185, 220, 110, 0, head=True, tail=True)
    # flipped connector (direction NW)
    sh.add_connector(100, 100, 80, 60, start_id=s2, end_id=s1, flip_h=True, flip_v=True)
    if rng.random() < 0.5:
        sh.add_shape(f"note{rng.randint(0, 9)}", prst="rect", x_pt=420, y_pt=60, text_box=True)
    return wb


def _family_chart(rng: random.Random) -> WorkbookBuilder:
    """F5: line + bar(dir=bar) + scatter charts with titles/axes/series."""
    wb = WorkbookBuilder()
    sh = wb.sheet("Charts")
    for i in range(6):
        sh.set(1 + i, 0, i + 1)
        sh.set(1 + i, 1, rng.randint(10, 99))
    sh.add_chart(
        "Chart 1",
        chart_tag="lineChart",
        title="trend",
        y_axis_title="count",
        series=[
            {
                "name": "s1",
                "name_range": "Charts!$B$1",
                "cat_range": "Charts!$A$1:$A$6",
                "val_range": "Charts!$B$1:$B$6",
            }
        ],
    )
    sh.add_chart(
        "Chart 2",
        chart_tag="barChart",
        bar_dir="bar",
        y_min=0.0,
        y_max=float(rng.randint(100, 200)),
        series=[{"name": "lit", "cat_range": "Charts!$A$1:$A$6", "val_range": "Charts!$B$1:$B$6"}],
    )
    sh.add_chart(
        "Chart 3",
        chart_tag="scatterChart",
        series=[
            {
                "scatter": True,
                "cat_range": "Charts!$A$1:$A$6",
                "val_range": "Charts!$B$1:$B$6",
            }
        ],
    )
    return wb


def _family_merged_form(rng: random.Random) -> WorkbookBuilder:
    """F6: merged-cell-heavy form; some merges empty (value " ")."""
    wb = WorkbookBuilder()
    sh = wb.sheet("Form")
    n = 8 + rng.randint(0, 4)
    for i in range(n):
        r = 1 + i * 2
        sh.set(r, 0, f"label{i}")
        sh.merge(f"A{r}:B{r}")
        if i % 3 != 0:
            sh.set(r, 2, f"value{rng.randint(0, 99)}")
        sh.merge(f"C{r}:E{r}")
    return wb


def _family_print_areas(rng: random.Random) -> WorkbookBuilder:
    """F7: 4 sheets with (multi-)print areas and tables in/outside areas."""
    wb = WorkbookBuilder()
    for s in range(4):
        sh = wb.sheet(f"P{s + 1}")
        sh.fill_block(
            2,
            1,
            [["h1", "h2", "h3"]] + [[i, i * 2, f"x{i}"] for i in range(4)],
            style=BOX,
        )
        sh.set(20, 8, f"outside{rng.randint(0, 9)}")
        if s % 2 == 0:
            wb.print_area(f"P{s + 1}", "$A$1:$F$10")
        else:
            wb.print_area(f"P{s + 1}", "$A$1:$D$8,$G$18:$J$22")
    return wb


def _family_border_clusters(rng: random.Random) -> WorkbookBuilder:
    """F8: overlapping boxes (merge), containment (no merge), sparse blobs."""
    wb = WorkbookBuilder()
    sh = wb.sheet("Borders")
    # Two overlapping bordered tables -> one merged region
    sh.fill_block(2, 1, [[f"a{i}{j}" for j in range(3)] for i in range(3)], style=BOX)
    sh.fill_block(4, 3, [[i * j for j in range(1, 4)] for i in range(1, 4)], style=BOX)
    # A separate bordered table containing a denser inner table (containment)
    sh.fill_block(12, 1, [[f"h{j}" for j in range(4)]] + [
        [rng.randint(0, 9) for _ in range(4)] for _ in range(3)
    ], style=BOX)
    # Sub-threshold blob: single bordered cell pair (below min_size=4)
    sh.set(30, 10, "lonely", style=BOX)
    return wb


def _family_empty_edge(rng: random.Random) -> WorkbookBuilder:
    """F9: empty sheet, 1x1 sheet, malformed drawing part on one sheet."""
    wb = WorkbookBuilder()
    wb.sheet("Empty")
    wb.sheet("Tiny").set(1, 0, rng.randint(0, 9))
    bad = wb.sheet("BadDrawing")
    bad.set(1, 0, "kept")
    bad.add_shape("will be dropped", x_pt=10, y_pt=10)
    return wb


def _family_links_formulas_colors(rng: random.Random) -> WorkbookBuilder:
    """F10: hyperlinks, formulas (incl. shared), rgb/theme/indexed fills."""
    wb = WorkbookBuilder()
    sh = wb.sheet("Rich")
    sh.set(1, 0, "site")
    sh.link(1, 0, f"https://example.com/{rng.randint(0, 999)}")
    sh.set(2, 0, 2, formula="A1*2")
    sh.set(2, 1, 4, formula="SUM(A2:A2)")
    sh.set(3, 0, "red", style=StyleSpec(fill_rgb="FFFF0000"))
    sh.set(3, 1, "themed", style=StyleSpec(fill_theme=4, fill_tint=-0.25))
    sh.set(3, 2, "white", style=StyleSpec(fill_rgb="FFFFFFFF"))
    sh.set(4, 0, rng.randint(0, 99))
    return wb


def _family_giant(rng: random.Random, sheets: int = 8, rows: int = 1200) -> WorkbookBuilder:
    """F11: giant multi-sheet workbook (skew / explode-path exercise)."""
    wb = WorkbookBuilder()
    wb.use_shared_strings = True
    for s in range(sheets):
        sh = wb.sheet(f"G{s + 1}")
        sh.fill_block(1, 0, [["id", "name", "value"]], style=BOX)
        for r in range(rows):
            sh.set(2 + r, 0, r, style=BOX)
            sh.set(2 + r, 1, f"row{r % 50}", style=BOX)
            sh.set(2 + r, 2, round(rng.random() * 100, 3), style=BOX)
    return wb


def _family_anchored(rng: random.Random) -> WorkbookBuilder:
    """F12: one/two-cell-anchored shapes resolved via sheet metrics."""
    wb = WorkbookBuilder()
    sh = wb.sheet("Anchored")
    sh.col_widths[0] = 18.0
    sh.col_widths[2] = 6.0
    sh.row_heights[2] = 28.0
    sh.set(1, 0, "anchored sheet")
    sh.add_cell_anchored_shape(
        "note", anchor="oneCell",
        from_marker=(1 + rng.randint(0, 2), 6350, 1, 0), w_pt=60, h_pt=30,
    )
    sh.add_cell_anchored_shape(
        "span", anchor="twoCell",
        from_marker=(0, 0, 0, 0), to_marker=(3, 0, 4, 0),
    )
    return wb


FAMILIES = [
    ("basic", _family_basic),
    ("coercion", _family_coercion),
    ("unicode", _family_unicode),
    ("flowchart", _family_flowchart),
    ("chart", _family_chart),
    ("merged_form", _family_merged_form),
    ("print_areas", _family_print_areas),
    ("border_clusters", _family_border_clusters),
    ("empty_edge", _family_empty_edge),
    ("links_formulas_colors", _family_links_formulas_colors),
    ("anchored", _family_anchored),
]


def build_document(index: int, seed: int = 42, include_giant: bool = False) -> dict:
    """Build one document row deterministically from (seed, index)."""
    rng = random.Random((seed << 20) ^ index)
    if include_giant and index % 97 == 96:
        wb = _family_giant(rng, sheets=4, rows=400)
        family = "giant"
    else:
        family, fn = FAMILIES[index % len(FAMILIES)]
        wb = fn(rng)
    spans = wb.build_parts()
    if family == "empty_edge":
        # Corrupt the third sheet's drawing part (malformed XML) so only that
        # sheet's shapes drop — parity with the reference's degrade-in-place.
        for span in spans:
            if span["media_ref"].startswith("xl/drawings/drawing3"):
                span["text"] = "<xdr:wsDr><broken"
    return {"doc_id": f"doc-{index:012d}", "spans": spans}


def generate_corpus_table(
    n_docs: int, seed: int = 42, include_giant: bool = False
) -> pa.Table:
    rows = [build_document(i, seed=seed, include_giant=include_giant) for i in range(n_docs)]
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def write_corpus_parquet(
    path: str, n_docs: int, seed: int = 42, include_giant: bool = False,
    rows_per_file: int = 200,
) -> None:
    """Write the corpus as multiple parquet files (shardable input layout)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    shard = 0
    for start in range(0, n_docs, rows_per_file):
        stop = min(start + rows_per_file, n_docs)
        rows = [
            build_document(i, seed=seed, include_giant=include_giant)
            for i in range(start, stop)
        ]
        table = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
        pq.write_table(table, os.path.join(path, f"part-{shard:05d}.parquet"))
        shard += 1
