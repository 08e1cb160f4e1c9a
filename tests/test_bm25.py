"""Integer-exact BM25 retrieval tests."""

import duckdb
import pandas as pd
import pytest


def _run(texts, tmp_path):
    frame = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    )
    frame.to_parquet(tmp_path / "documents.parquet")
    from exstruct_ray.queries import doc_bm25_topk

    return doc_bm25_topk(str(tmp_path))


class TestBm25:
    def test_ranking_behaviour(self, ray_session, tmp_path):
        out = _run(
            [
                # repeats both query terms, short doc -> top hit
                "data query data query",
                # one term, once, in a long document -> ranked below
                "data surrounded by very many entirely unrelated filler "
                "words that stretch the document length normalizer out",
                # no query terms at all -> absent from results
                "nothing relevant here whatsoever",
                # rare term 'spark' only here: high idf
                "spark",
            ],
            tmp_path,
        )
        ids = out["doc_id"].tolist()
        assert 2 not in ids
        assert ids[0] in (0, 3)  # both outscore the diluted doc 1
        assert out.loc[out["doc_id"] == 0, "score_u"].iloc[0] > out.loc[
            out["doc_id"] == 1, "score_u"
        ].iloc[0]

    def test_matches_sql_oracle(self, ray_session, tmp_path):
        texts = [
            "data query data query",
            "data word word word word word word word word word word",
            "irrelevant content only",
            "spark query data spark spark",
            "query",
        ]
        out = _run(texts, tmp_path)
        from exstruct_ray.queries import ORACLE_SQL

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        expected = con.execute(ORACLE_SQL["doc_bm25_topk"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
