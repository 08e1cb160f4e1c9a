"""Integer-exact PageRank over the near-dup graph."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _corpus(tmp_path):
    """Three exact copies (triangle component) + one pair + singletons."""
    tri = (
        "the very same long document body repeated verbatim many words "
        "to give the shingler enough distinct five character shingles "
        "for a confident jaccard estimate of unity between the copies"
    )
    duo = (
        "another duplicated body with its own completely different "
        "vocabulary also repeated verbatim across exactly two documents "
        "so the pair forms one graph edge between them both"
    )
    texts = [
        tri, tri, tri, duo, duo,
        "a unique singleton document with no duplicate partner at all "
        "whose shingles overlap nothing else in this tiny corpus",
    ]
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
    return frame


class TestPagerank:
    def test_structure_and_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import ORACLE_SQL, doc_pagerank

        _corpus(tmp_path)
        out = doc_pagerank(str(tmp_path))
        # only paired docs are nodes: the triangle 0,1,2 and the pair 3,4
        assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
        pr = out.set_index("doc_id")["pr"]
        # symmetric components -> equal ranks inside each
        assert pr[0] == pr[1] == pr[2]
        assert pr[3] == pr[4]
        # triangle nodes (degree 2, inflow from two donors) outrank the
        # pair nodes only through mass conservation; both positive
        assert (pr > 0).all()

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        expected = con.execute(ORACLE_SQL["doc_pagerank"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_distributed_matches_driver(self, ray_session):
        """The bucket-merged contribution exchange must emit the identical
        integer ranks as the driver numpy engine — same floor-division
        order, same inflow sums — on an irregular multi-component graph."""
        import ray

        from exstruct_ray.ops.graph import pagerank_distributed, pagerank_driver

        rng = np.random.default_rng(7)
        a = rng.integers(0, 200, size=400)
        b = rng.integers(0, 200, size=400)
        keep = a != b
        pairs = pd.DataFrame(
            {
                "doc_a": np.minimum(a[keep], b[keep]).astype("int64"),
                "doc_b": np.maximum(a[keep], b[keep]).astype("int64"),
            }
        ).drop_duplicates()
        want = pagerank_driver(pairs)
        got = pagerank_distributed(ray.data.from_pandas(pairs))
        pd.testing.assert_frame_equal(got, want)

    def test_auto_routes_by_pair_count(self, ray_session, tmp_path):
        """pagerank_auto: small pair sets take the driver engine; above the
        limit the distributed engine runs — both produce identical frames,
        so forcing the big route must not change doc_pagerank's output."""
        import ray

        from exstruct_ray.ops import graph as graph_mod

        pairs = pd.DataFrame(
            {"doc_a": [0, 0, 1, 5], "doc_b": [1, 2, 2, 6]},
            dtype="int64",
        )
        small = graph_mod.pagerank_auto(ray.data.from_pandas(pairs))
        big = graph_mod.pagerank_auto(
            ray.data.from_pandas(pairs), driver_pair_limit=0
        )
        pd.testing.assert_frame_equal(small, big)
        assert small["doc_id"].tolist() == [0, 1, 2, 5, 6]

    def test_forced_distributed_matches_oracle(self, ray_session, tmp_path, monkeypatch):
        """doc_pagerank forced onto the distributed route stays oracle-green
        (mirrors TestLabelPropagation's forced-big-route check)."""
        import exstruct_ray.queries as q
        from exstruct_ray.ops import graph as graph_mod

        _corpus(tmp_path)

        orig = graph_mod.pagerank_auto

        def force_big(pairs_ds, **kw):
            kw["driver_pair_limit"] = 0
            return orig(pairs_ds, **kw)

        monkeypatch.setattr(graph_mod, "pagerank_auto", force_big)
        # queries.py imports pagerank_auto inside the function body, so the
        # module attribute patch is what it sees.
        out = q.doc_pagerank(str(tmp_path))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        expected = con.execute(q.ORACLE_SQL["doc_pagerank"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_empty_graph(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_pagerank

        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "totally unique first document body here",
                    "entirely different second document content now",
                ],
                "lang": "en",
                "source": "t",
                "n_chars": [38, 45],
            }
        ).to_parquet(tmp_path / "documents.parquet")
        out = doc_pagerank(str(tmp_path))
        assert len(out) == 0
