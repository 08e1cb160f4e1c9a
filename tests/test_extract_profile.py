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
