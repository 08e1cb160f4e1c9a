"""Generate golden span tables for the extract_* correctness oracles.

The extraction corpus is deterministic (seed=42, sized by sf), and the span
output is required to be byte-stable (FIXTURES.md span contract + the
reference-sample parity tests). That makes the flagship pipeline exactly
oracle-checkable: this script pins the expected flattened span table per
(variant, sf) as parquet under data/golden/, and ORACLE_SQL reads it back
with DuckDB read_parquet for an exact hash compare.

Regenerate ONLY for intentional semantic changes (same policy as
tests/golden_spans.json):

    python scripts/gen_golden_spans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "golden"
)

EXTRACT_QUERIES = [
    "extract_light",
    "extract_verbose",
    "extract_alpha_col",
    "extract_no_merged_values",
    "extract_exploded",
    "edit_patch_extract",
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entry_mod

    queries = entry_mod.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in EXTRACT_QUERIES:
            df = queries[name](sf_dir)
            table = pa.Table.from_pandas(df, preserve_index=False)
            out_path = os.path.join(GOLDEN_DIR, f"{name}_sf{sf}.parquet")
            pq.write_table(table, out_path, compression="zstd")
            print(f"wrote {out_path}: {table.num_rows} rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
