"""Per-source trigram diversity: template-source collapse, cross-doc
distinct merging, short-doc exclusion, DuckDB parity."""

import duckdb
import pandas as pd

from exstruct_ray.queries import ORACLE_SQL


class TestSourceDiversity:
    def test_crafted_sources(self, ray_session, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": pd.Series(range(5), dtype="int64"),
                "source": ["tmpl", "tmpl", "fresh", "fresh", "tiny"],
                "text": [
                    # template source: both docs share the same trigrams
                    "buy now click here today",
                    "buy now click here today",
                    # fresh source: all-distinct trigrams
                    "alpha beta gamma delta",
                    "epsilon zeta eta theta",
                    # under 3 tokens -> no trigrams -> source absent
                    "too short",
                ],
            }
        )
        sf_dir = tmp_path / "sfdiv"
        sf_dir.mkdir()
        docs.to_parquet(sf_dir / "documents.parquet")

        from exstruct_ray.queries import source_trigram_diversity

        out = source_trigram_diversity(str(sf_dir))
        assert list(out["source"]) == ["fresh", "tmpl"]
        by = {r.source: r for r in out.itertuples()}
        # tmpl: 3 trigrams per doc x2 occurrences, 3 distinct -> 500
        assert by["tmpl"].n_trigrams == 6
        assert by["tmpl"].n_distinct == 3
        assert by["tmpl"].diversity_permille == 500
        # fresh: 2+2 all distinct -> 1000
        assert by["fresh"].n_trigrams == 4
        assert by["fresh"].n_distinct == 4
        assert by["fresh"].diversity_permille == 1000

        con = duckdb.connect()
        con.register("documents", docs)
        sql = con.execute(ORACLE_SQL["source_trigram_diversity"]).df()
        for col in out.columns:
            assert list(out[col]) == list(sql[col]), col

    def test_empty(self, ray_session, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": pd.Series([0], dtype="int64"),
                "source": ["s"],
                "text": ["one two"],
            }
        )
        sf_dir = tmp_path / "sfdiv2"
        sf_dir.mkdir()
        docs.to_parquet(sf_dir / "documents.parquet")
        from exstruct_ray.queries import source_trigram_diversity

        out = source_trigram_diversity(str(sf_dir))
        assert len(out) == 0
