"""PMI collocation mining: hand-computed scores, the min-count cutoff
boundary, tie determinism, and DuckDB parity on a crafted corpus."""

import duckdb
import pandas as pd
import ray

from exstruct_ray.queries import ORACLE_SQL


def _run(tmp_path, texts):
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(texts)), dtype="int64"),
            "text": pd.Series(texts, dtype="object"),
        }
    )
    sf_dir = tmp_path / "sfpmi"
    sf_dir.mkdir()
    docs.to_parquet(sf_dir / "documents.parquet")
    from exstruct_ray.queries import doc_pmi_collocations

    return docs, doc_pmi_collocations(str(sf_dir))


class TestPmiCollocations:
    def test_scores_cutoff_and_ties(self, ray_session, tmp_path):
        texts = [
            # new->york x5 (kept), york->new x4 (below the >=5 cutoff)
            "new york " * 4 + "new york",
            # a->b x6, b->a x5; larger unigram counts dilute the score
            "a b " * 5 + "a b",
            # two structurally identical collocations -> equal scores,
            # broken by (w1, w2) lexicographic order
            "c d " * 4 + "c d",
            "e f " * 4 + "e f",
        ]
        docs, out = _run(tmp_path, texts)
        n_total = sum(len(t.split()) for t in texts)

        rows = {(r.w1, r.w2): (r.pair_count, r.score) for r in out.itertuples()}
        assert ("york", "new") not in rows  # c=4 < 5 cut
        assert rows[("new", "york")] == (5, 5 * n_total * 1_000_000 // 25)
        assert rows[("a", "b")] == (6, 6 * n_total * 1_000_000 // 36)
        assert rows[("b", "a")] == (5, 5 * n_total * 1_000_000 // 36)
        assert rows[("c", "d")] == rows[("e", "f")]
        # equal scores -> lexicographic (w1, w2)
        cd = out.index[(out["w1"] == "c")][0]
        ef = out.index[(out["w1"] == "e")][0]
        assert cd < ef

        con = duckdb.connect()
        con.register("documents", docs)
        sql = con.execute(ORACLE_SQL["doc_pmi_collocations"]).df()
        for col in ("w1", "w2", "pair_count", "score"):
            assert list(out[col]) == list(sql[col]), col

    def test_empty_corpus(self, ray_session, tmp_path):
        _, out = _run(tmp_path, ["", "solo"])
        assert len(out) == 0
        assert list(out.columns) == ["w1", "w2", "pair_count", "score"]
