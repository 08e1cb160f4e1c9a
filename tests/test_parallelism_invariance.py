"""Block-structure invariance: the same corpus stored as ONE parquet file
vs EIGHT files (different Ray block/batch boundaries, different partial
orders) must produce byte-identical query outputs — the property that
makes results stable across cluster sizes, retries and repartitioning."""

import numpy as np
import pandas as pd
import pytest


def _corpus(n=400):
    rng = np.random.RandomState(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "the", "quick", "brown", "fox", "jumps", "lazy", "dog"]
    texts = []
    for i in range(n):
        k = rng.randint(20, 60)
        t = " ".join(rng.choice(words, size=k))
        if i % 7 == 0:
            t += " shared boilerplate phrase repeated across documents"
        texts.append(t)
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": [["en", "fr", "de"][i % 3] for i in range(n)],
            "source": [f"s{i % 5}" for i in range(n)],
            "n_chars": [len(t) for t in texts],
        }
    )


@pytest.fixture(scope="module")
def two_layouts(tmp_path_factory):
    frame = _corpus()
    one = tmp_path_factory.mktemp("one_file")
    eight = tmp_path_factory.mktemp("eight_files")
    frame.to_parquet(one / "documents.parquet")
    (eight / "documents.parquet").mkdir()
    for j, part in enumerate(np.array_split(frame, 8)):
        part.to_parquet(
            eight / "documents.parquet" / f"part-{j}.parquet"
        )
    return str(one), str(eight)


@pytest.mark.parametrize(
    "qname",
    [
        "doc_pack_sequences",
        "doc_epoch_shuffle",
        "doc_exactsubstr_cut",
        "doc_phrase_index",
        "doc_lang_mismatch_by_source",
        "source_syndication_pairs",
    ],
)
def test_block_structure_invariance(ray_session, two_layouts, qname):
    from exstruct_ray import queries as q

    one, eight = two_layouts
    fn = getattr(q, qname)
    a = fn(one).reset_index(drop=True)
    b = fn(eight).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.fixture(scope="module")
def two_embedding_layouts(tmp_path_factory):
    rng = np.random.RandomState(13)
    n, dim = 240, 64
    vecs = rng.normal(0, 1, size=(n, dim)).astype("float32")
    frame = pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [v for v in vecs],
            "label": [i % 10 for i in range(n)],
        }
    )
    one = tmp_path_factory.mktemp("emb_one")
    eight = tmp_path_factory.mktemp("emb_eight")
    frame.to_parquet(one / "embeddings.parquet")
    (eight / "embeddings.parquet").mkdir()
    for j, part in enumerate(np.array_split(frame, 8)):
        part.to_parquet(
            eight / "embeddings.parquet" / f"part-{j}.parquet"
        )
    return str(one), str(eight)


@pytest.mark.parametrize(
    "qname",
    ["embedding_kmeans", "embedding_cluster_sample", "embedding_semdedup"],
)
def test_embedding_block_structure_invariance(
    ray_session, two_embedding_layouts, qname
):
    from exstruct_ray import queries as q

    one, eight = two_embedding_layouts
    fn = getattr(q, qname)
    a = fn(one).reset_index(drop=True)
    b = fn(eight).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
