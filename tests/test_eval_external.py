"""External eval-set decontamination (VERDICT r4 item 2).

The compositions accept an eval-set table as their small side; the gram
structure is built in a distributed pass (collect_gram_set: each batch
emits DISTINCT gram strings, so only eval-sized gram rows ever reach the
driver — never corpus text). Equivalence contract: running fixture mode
over a corpus containing the bench slice equals running external mode
over (corpus minus bench docs) with the bench docs supplied as eval_ds.
"""

import numpy as np
import pandas as pd
import pytest


WORDS = (
    "aurora basalt cedar delta ember fjord granite harbor indigo "
    "juniper krill lagoon marble nectar onyx prairie quartz reef "
    "sierra tundra umber violet walnut xenon yarrow zephyr"
).split()


def _doc_text(rng: np.random.Generator, n_words: int = 18) -> str:
    return " ".join(rng.choice(WORDS, size=n_words, replace=True))


def _make_corpus(tmp_path, n_docs: int = 120):
    """Corpus where doc_id % 97 == 0 marks the bench slice (docs 0, 97)
    and a handful of non-bench docs deliberately share a 3-gram with a
    bench doc. All texts distinct (no dedup effects across the split)."""
    rng = np.random.default_rng(7)
    texts = [_doc_text(rng) + f" uniq{idx}" for idx in range(n_docs)]
    # docs 5, 40, 103 copy the first 3 words of bench doc 0 -> contaminated
    bench_head = " ".join(texts[0].split()[:3])
    for idx in (5, 40, 103):
        texts[idx] = f"{bench_head} {texts[idx]}"
    frame = pd.DataFrame(
        {"doc_id": range(n_docs), "text": texts}
    )
    full = tmp_path / "full"
    split = tmp_path / "split"
    evald = tmp_path / "eval"
    for d in (full, split, evald):
        d.mkdir()
    frame.to_parquet(full / "documents.parquet")
    is_bench = frame["doc_id"] % 97 == 0
    frame[~is_bench].to_parquet(split / "documents.parquet")
    frame[is_bench].to_parquet(evald / "eval.parquet")
    return str(full), str(split), str(evald / "eval.parquet")


class TestExternalEvalSet:
    def test_collect_gram_set_matches_driver_build(
        self, ray_session, tmp_path
    ):
        import ray

        from exstruct_ray.ops.text import collect_gram_set, word_ngram_set

        frame = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["the quick brown fox jumps", "lazy dog sat"],
            }
        )
        p = tmp_path / "eval.parquet"
        frame.to_parquet(p)
        got = collect_gram_set(ray.data.read_parquet(str(p)), n=3)
        want = set()
        for t in frame["text"]:
            want |= word_ngram_set(t, 3)
        assert got == want

    def test_decontaminate_external_equals_fixture(
        self, ray_session, tmp_path
    ):
        import ray

        from exstruct_ray.queries import doc_decontaminate

        full, split, eval_path = _make_corpus(tmp_path)
        fixture = doc_decontaminate(full)
        external = doc_decontaminate(
            split, eval_ds=ray.data.read_parquet(eval_path)
        )
        pd.testing.assert_frame_equal(
            fixture.reset_index(drop=True),
            external.reset_index(drop=True),
            check_dtype=False,
        )
        assert set(external["doc_id"]) >= {5, 40, 103}

    def test_clean_corpus_external_equals_fixture(
        self, ray_session, tmp_path
    ):
        import ray

        from exstruct_ray.queries import doc_clean_corpus

        full, split, eval_path = _make_corpus(tmp_path)
        fixture = doc_clean_corpus(full)
        # fixture mode also emits rows for the bench docs (keep=0);
        # external mode never sees them.
        fixture = fixture[fixture["doc_id"] % 97 != 0].reset_index(drop=True)
        external = doc_clean_corpus(
            split, eval_ds=ray.data.read_parquet(eval_path)
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            fixture, external, check_dtype=False
        )
        by = external.set_index("doc_id")
        assert int(by.loc[5, "decontam_keep"]) == 0
        assert int(external["keep"].sum()) > 0

    def test_curation_packs_external_equals_fixture(
        self, ray_session, tmp_path
    ):
        import ray

        from exstruct_ray.queries import doc_curation_packs

        full, split, eval_path = _make_corpus(tmp_path)
        fixture = doc_curation_packs(full)
        external = doc_curation_packs(
            split, eval_ds=ray.data.read_parquet(eval_path)
        )
        pd.testing.assert_frame_equal(
            fixture.reset_index(drop=True),
            external.reset_index(drop=True),
            check_dtype=False,
        )
        assert len(external) > 0
