"""Tokenizer deployment (frequency-ranked vocabulary ids): rank order,
count-tie -> lexicographic id assignment, positions, empties, DuckDB
parity."""

import duckdb
import pandas as pd

from exstruct_ray.queries import ORACLE_SQL


def _run(tmp_path, texts):
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(texts)), dtype="int64"),
            "text": pd.Series(texts, dtype="object"),
        }
    )
    sf_dir = tmp_path / "sftok"
    sf_dir.mkdir()
    docs.to_parquet(sf_dir / "documents.parquet")
    from exstruct_ray.queries import doc_tokenize_ids

    return docs, doc_tokenize_ids(str(sf_dir))


class TestTokenizeIds:
    def test_rank_ties_positions(self, ray_session, tmp_path):
        docs, out = _run(
            tmp_path,
            [
                "the cat sat on the mat",
                "the dog sat",
                "",  # empty doc: no rows
                "Zebra apple zebra APPLE",  # case-folding + count tie
            ],
        )
        # counts: the=3, sat=2, apple=2, zebra=2, cat=1, dog=1, mat=1, on=1
        # rank: the=0, then ties at 2 -> apple=1, sat=2, zebra=3,
        # then ties at 1 -> cat=4, dog=5, mat=6, on=7
        d0 = out[out["doc_id"] == 0]
        assert list(d0["pos"]) == [0, 1, 2, 3, 4, 5]
        assert list(d0["token_id"]) == [0, 4, 2, 7, 0, 6]
        d1 = out[out["doc_id"] == 1]
        assert list(d1["token_id"]) == [0, 5, 2]
        assert (out["doc_id"] != 2).all()
        d3 = out[out["doc_id"] == 3]
        assert list(d3["token_id"]) == [3, 1, 3, 1]

        con = duckdb.connect()
        con.register("documents", docs)
        sql = con.execute(ORACLE_SQL["doc_tokenize_ids"]).df()
        for col in ("doc_id", "pos", "token_id"):
            assert list(out[col]) == list(sql[col]), col

    def test_all_empty_corpus(self, ray_session, tmp_path):
        _, out = _run(tmp_path, ["", None])
        assert len(out) == 0
        assert list(out.columns) == ["doc_id", "pos", "token_id"]
