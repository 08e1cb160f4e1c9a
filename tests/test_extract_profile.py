"""Extraction -> per-doc profile composition: column semantics against
the pinned golden span parquet at sf0.001."""

import os

import pandas as pd


class TestExtractDocProfile:
    def test_matches_golden_recompute(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["extract_doc_profile"](
            "/root/testdata/sf0.001"
        )
        golden_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "golden",
            "extract_light_sf0.001.parquet",
        )
        g = pd.read_parquet(golden_path)
        exp = (
            g.groupby("doc_id")
            .apply(
                lambda grp: pd.Series(
                    {
                        "n_spans": len(grp),
                        "n_cell_rows": int((grp["kind"] == "cell_row").sum()),
                        "n_tables": int((grp["kind"] == "table").sum()),
                        "n_shapes": int(
                            grp["kind"].isin(["shape", "arrow", "chart"]).sum()
                        ),
                        "cell_chars": int(
                            grp.loc[grp["kind"] == "cell_row", "text"]
                            .fillna("")
                            .str.len()
                            .sum()
                        ),
                    }
                ),
                include_groups=False,
            )
            .reset_index()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp["doc_ok"] = (
            (exp["n_tables"] >= 1) | (exp["n_cell_rows"] >= 5)
        ).astype("int64")
        assert list(out["doc_id"]) == list(exp["doc_id"])
        for col in (
            "n_spans",
            "n_cell_rows",
            "n_tables",
            "n_shapes",
            "cell_chars",
            "doc_ok",
        ):
            assert list(out[col]) == list(exp[col].astype("int64")), col
        # the verdict actually splits the corpus (both classes present)
        assert out["doc_ok"].nunique() <= 2 and out["doc_ok"].max() == 1


class TestExtractSpanDedup:
    def test_matches_golden_recompute(self, ray_session):
        import hashlib

        import __ray_entry__ as entry

        out = entry.queries()["extract_span_dedup"]("/root/testdata/sf0.001")
        golden_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "golden",
            "extract_light_sf0.001.parquet",
        )
        g = pd.read_parquet(golden_path)
        cells = g[g["kind"] == "cell_row"].copy()
        cells["text_md5"] = (
            cells["text"]
            .fillna("")
            .map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        )
        exp = (
            cells.groupby("text_md5")
            .agg(
                n_docs=("doc_id", "nunique"),
                n_rows=("doc_id", "size"),
                canonical_doc=("doc_id", "min"),
            )
            .reset_index()
        )
        exp = (
            exp[exp["n_docs"] >= 2]
            .sort_values("text_md5")
            .reset_index(drop=True)
        )
        assert len(out) == len(exp) > 0
        assert list(out["text_md5"]) == list(exp["text_md5"])
        assert list(out["n_docs"]) == list(exp["n_docs"].astype("int64"))
        assert list(out["n_rows"]) == list(exp["n_rows"].astype("int64"))
        assert list(out["canonical_doc"]) == list(exp["canonical_doc"])
        # every reported row text really crosses a document boundary
        assert (out["n_docs"] >= 2).all()
        assert (out["n_rows"] >= out["n_docs"]).all()


class TestExtractFormulaAudit:
    def test_matches_golden_recompute(self, ray_session):
        import json

        import __ray_entry__ as entry

        out = entry.queries()["extract_formula_audit"](
            "/root/testdata/sf0.001"
        )
        golden_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "golden",
            "extract_verbose_sf0.001.parquet",
        )
        g = pd.read_parquet(golden_path)
        fm = g[g["kind"] == "formulas_map"]
        assert len(fm) > 0, "corpus should contain formula workbooks"
        rows = []
        for _, r in fm.iterrows():
            m = json.loads(r["text"] or "{}")
            rows.append(
                {
                    "doc_id": r["doc_id"],
                    "n_formulas": len(m),
                    "n_formula_cells": sum(len(v) for v in m.values()),
                    "n_sum_like": sum(1 for k in m if "SUM(" in k),
                }
            )
        exp = (
            pd.DataFrame(rows)
            .groupby("doc_id", as_index=False)
            .sum()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out, exp.astype(
                {
                    "n_formulas": "int64",
                    "n_formula_cells": "int64",
                    "n_sum_like": "int64",
                }
            )
        )
        # semantic spot checks: every audited doc declares >=1 formula,
        # cells cover at least the formula count
        assert (out["n_formulas"] >= 1).all()
        assert (out["n_formula_cells"] >= out["n_formulas"]).all()
