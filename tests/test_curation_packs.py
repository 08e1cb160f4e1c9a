"""Capstone composition: clean-corpus survivors packed into sequences.

doc_curation_packs = doc_clean_corpus's keep decision feeding
doc_pack_sequences' global prefix sum, survivors only.
"""

import duckdb
import pandas as pd
import pytest


def _write_docs(tmp_path, texts):
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


def _oracle(corpus_dir) -> pd.DataFrame:
    from exstruct_ray.queries import ORACLE_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{corpus_dir}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL["doc_curation_packs"]).df()


class TestCurationPacks:
    @pytest.fixture(scope="class")
    def corpus_dir(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("packs")
        # doc 0: bench slice (0 % 97 == 0) — excluded outright
        # docs 1..24: unique-vocabulary survivors, 40+i tokens each
        #   (24 docs x ~52 avg tokens ≈ 1250 tokens -> straddles the
        #    512-token pack boundary at least twice)
        # doc 25/26: identical -> 26 loses exact dedup
        # doc 27: heavy line repetition -> fails Gopher quality
        texts = ["benchzero benchone benchtwo benchthree benchfour"]
        for i in range(1, 25):
            texts.append(" ".join(f"d{i}w{j}" for j in range(40 + i)))
        dup = " ".join(f"dupw{j}" for j in range(30))
        texts.append(dup)
        texts.append(dup)
        texts.append("same\nsame\nsame\nsame\nsame\nok")
        _write_docs(tmp, texts)
        return tmp

    def test_survivors_and_packing(self, ray_session, corpus_dir):
        from exstruct_ray.queries import doc_curation_packs

        out = doc_curation_packs(str(corpus_dir))
        ids = out["doc_id"].tolist()
        # survivors: 1..24 plus the canonical copy 25
        assert ids == list(range(1, 25)) + [25]
        by_id = out.set_index("doc_id")
        assert by_id.loc[1, "n_tokens"] == 41
        assert by_id.loc[1, "pack_id"] == 0
        assert by_id.loc[1, "offset_in_pack"] == 0
        # prefix-sum invariant: each start = sum of previous n_tokens
        starts = (
            out["pack_id"].to_numpy() * 512 + out["offset_in_pack"].to_numpy()
        )
        n_tok = out["n_tokens"].to_numpy()
        assert (starts[1:] == starts[:-1] + n_tok[:-1]).all()
        # the corpus genuinely straddles packs
        assert out["pack_id"].max() >= 2

    def test_matches_sql_oracle(self, ray_session, corpus_dir):
        from exstruct_ray.queries import doc_curation_packs

        out = doc_curation_packs(str(corpus_dir))
        expected = _oracle(corpus_dir)
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_zero_survivors_empty_typed_frame(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_curation_packs

        # every non-bench doc shares a 3-gram with the bench doc
        _write_docs(
            tmp_path,
            [
                "held out benchmark sentence for the evaluation suite",
                "also held out benchmark material in this training doc",
                "more held out benchmark contamination right here too",
            ],
        )
        out = doc_curation_packs(str(tmp_path))
        assert len(out) == 0
        assert list(out.columns) == [
            "doc_id",
            "n_tokens",
            "pack_id",
            "offset_in_pack",
        ]
        expected = _oracle(tmp_path)
        assert len(expected) == 0
