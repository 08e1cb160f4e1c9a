"""BPE merge-training tests: pair counting (overlap-inclusive),
leftmost-first merge application, early stop, oracle parity."""

import duckdb
import pandas as pd


def _write(tmp_path, texts):
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


class TestBpeTrain:
    def test_overlap_counting_and_leftmost_merge(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_bpe_train

        # 'aaa' twice: adjacent (a,a) counted twice PER word -> freq 4;
        # merge applies leftmost-first: [a,a,a] -> [aa,a], so round 2
        # learns (aa,a) with freq 2, leaving [aaa]; round 3 has no pairs
        _write(tmp_path, ["aaa aaa"])
        out = doc_bpe_train(str(tmp_path))
        assert out.to_dict("records") == [
            {"rank": 1, "left_sym": "a", "right_sym": "a", "freq": 4},
            {"rank": 2, "left_sym": "aa", "right_sym": "a", "freq": 2},
        ]

    def test_tie_breaks_lexicographic(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_bpe_train

        # 'xy' and 'ab' both freq 2 -> 'a|b' < 'x|y' wins round 1
        _write(tmp_path, ["xy ab xy ab"])
        out = doc_bpe_train(str(tmp_path))
        first = out.iloc[0]
        assert (first["left_sym"], first["right_sym"]) == ("a", "b")
        assert first["freq"] == 2

    def test_matches_sql_oracle_on_crafted_corpus(
        self, ray_session, tmp_path
    ):
        from exstruct_ray.queries import ORACLE_SQL, doc_bpe_train

        _write(
            tmp_path,
            [
                "lower lower lowest low low low",
                "newer newest new new news",
                "wider wide widest UPPER Case mixed",
            ],
        )
        out = doc_bpe_train(str(tmp_path))
        assert len(out) == 8  # enough pair mass for all 8 merges
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_bpe_train"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_pipe_words_excluded(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_bpe_train

        # words containing the symbol marker are excluded from the vocab
        # on both sides; remaining corpus still trains
        _write(tmp_path, ["a|b a|b a|b cd cd"])
        out = doc_bpe_train(str(tmp_path))
        assert out.iloc[0].to_dict() == {
            "rank": 1, "left_sym": "c", "right_sym": "d", "freq": 2,
        }


class TestBpeSubwordVocab:
    def test_vocab_after_merges_and_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import (
            ORACLE_SQL,
            doc_bpe_subword_vocab,
        )

        # 'aaa' x2: merges (a,a) then (aa,a) leave one subword 'aaa' x2
        _write(tmp_path, ["aaa aaa"])
        out = doc_bpe_subword_vocab(str(tmp_path))
        assert out.to_dict("records") == [
            {"subword": "aaa", "n_tokens": 2}
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_bpe_subword_vocab"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_total_mass_conserved(self, ray_session, tmp_path):
        from exstruct_ray.queries import doc_bpe_subword_vocab

        # merging never changes total character mass: sum over subwords
        # of len(subword)*count == total characters in the vocab stream
        texts = ["lower lower lowest low", "newer newest new"]
        _write(tmp_path, texts)
        out = doc_bpe_subword_vocab(str(tmp_path))
        mass = int(
            (out["subword"].str.len() * out["n_tokens"]).sum()
        )
        expected_chars = sum(len(w) for t in texts for w in t.split())
        assert mass == expected_chars


class TestBpeEncodedLen:
    def test_encoding_compresses_and_oracle(self, ray_session, tmp_path):
        from exstruct_ray.queries import (
            ORACLE_SQL,
            doc_bpe_encoded_len,
        )

        # 'aaa' collapses to ONE subword after two merges; 'xyz' words
        # get partial merges depending on learned pairs
        _write(tmp_path, ["aaa aaa aaa", "aaa bc", ""])
        out = doc_bpe_encoded_len(str(tmp_path))
        by = out.set_index("doc_id")
        assert by.loc[0, "n_subwords"] == 3      # three 'aaa' -> 3 tokens
        assert by.loc[2, "n_subwords"] == 0      # empty doc
        # every doc present, counts never exceed character counts
        assert sorted(out["doc_id"]) == [0, 1, 2]

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_bpe_encoded_len"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )

    def test_all_empty_corpus_emits_all_docs_zero(
        self, ray_session, tmp_path
    ):
        import duckdb

        from exstruct_ray.queries import (
            ORACLE_SQL,
            doc_bpe_encoded_len,
        )

        # empty vocabulary: the oracle LEFT JOINs from documents, so the
        # engine must still emit one (doc_id, 0) row per document
        _write(tmp_path, ["", "   ", "\t"])
        out = doc_bpe_encoded_len(str(tmp_path))
        assert sorted(out["doc_id"]) == [0, 1, 2]
        assert (out["n_subwords"] == 0).all()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{tmp_path / 'documents.parquet'}')"
        )
        expected = con.execute(ORACLE_SQL["doc_bpe_encoded_len"]).df()
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)].reset_index(drop=True),
            expected[sorted(expected.columns)].reset_index(drop=True),
            check_dtype=False,
        )
