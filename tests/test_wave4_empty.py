"""Empty-input guards for the round-4 wave: every new query must return
its typed empty frame (or zero-filled audit) on empty tables, never
crash on the zero-column-block path."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "text": pd.Series(dtype="object"),
            "lang": pd.Series(dtype="object"),
            "source": pd.Series(dtype="object"),
            "n_chars": pd.Series(dtype="int64"),
        }
    ).to_parquet(d / "documents.parquet")
    pd.DataFrame(
        {
            "vec_id": pd.Series(dtype="int64"),
            "embedding": pd.Series(dtype="object"),
            "label": pd.Series(dtype="int32"),
        }
    ).to_parquet(d / "embeddings.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name,cols",
    [
        ("doc_c4_filters", ["doc_id", "clean_text", "n_lines", "n_kept", "keep"]),
        ("doc_pmi_collocations", ["w1", "w2", "pair_count", "score"]),
        ("doc_tokenize_ids", ["doc_id", "pos", "token_id"]),
        ("doc_snapshot_ingest", ["doc_id", "content_hash", "n_copies"]),
        (
            "source_trigram_diversity",
            ["source", "n_trigrams", "n_distinct", "diversity_permille"],
        ),
        ("embedding_knn_graph", ["vec_id", "neighbor_id", "rank"]),
        ("embedding_knn_graph_ivf", ["vec_id", "neighbor_id", "rank"]),
    ],
)
def test_empty_returns_typed_frame(ray_session, empty_sf, name, cols):
    from exstruct_ray import queries as q

    out = getattr(q, name)(empty_sf)
    assert len(out) == 0
    assert list(out.columns) == cols


def test_ivf_stats_zero_fills(ray_session, empty_sf):
    from exstruct_ray import queries as q
    from exstruct_ray.ops.ann import IVF_CLUSTERS

    out = q.embedding_ivf_stats(empty_sf)
    assert len(out) == IVF_CLUSTERS
    assert (out["n_vecs"] == 0).all()
    assert (out["share_permille"] == 0).all()
