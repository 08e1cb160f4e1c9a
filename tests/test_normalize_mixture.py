"""doc_normalize_text and doc_mixture_sample semantics + oracle parity."""

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    from exstruct_ray.queries import ORACLE_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(ORACLE_SQL[name]).df()


class TestNormalizeText:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import doc_normalize_text

        got = doc_normalize_text(SF_DIR).reset_index(drop=True)
        want = _oracle("doc_normalize_text", SF_DIR).reset_index(drop=True)
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_kernel_semantics(self):
        """NFC composition, control strip (newline/tab survive as input
        but tabs collapse to spaces), run collapse, end trim."""
        from exstruct_ray.ops.text import normalize_text_batch

        batch = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "éclair",        # NFC: combining acute composes
                    "a\x00b\x07c\x7fd",   # C0/DEL stripped
                    "  x\t\ty  z  ",      # runs collapse, ends trim
                    "keep\nnewlines\n",   # \n untouched
                ],
            }
        )
        out = normalize_text_batch(batch).to_pylist()
        assert out[0]["norm_text"] == "éclair" and out[0]["changed"] == 1
        assert out[1]["norm_text"] == "abcd" and out[1]["changed"] == 1
        assert out[2]["norm_text"] == "x y z" and out[2]["changed"] == 1
        assert out[3]["norm_text"] == "keep\nnewlines\n"
        assert out[3]["changed"] == 0

    def test_crafted_corpus_parity_with_duckdb(self, ray_session, tmp_path):
        """The engine and the oracle agree on strings chosen to stress
        every kernel, not just the synthetic corpus' tame text."""
        from exstruct_ray.queries import ORACLE_SQL, doc_normalize_text

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "café  du\tmonde ",
                    "\x01\x02ctl\x1f chars\x7f",
                    " \t mixed é é ",
                    "",
                    "already clean",
                ],
                "lang": ["en"] * 5,
                "source": ["src0"] * 5,
                "n_chars": [0] * 5,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = doc_normalize_text(str(tmp_path)).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        want = con.execute(ORACLE_SQL["doc_normalize_text"]).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestMixtureSample:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import doc_mixture_sample

        got = doc_mixture_sample(SF_DIR).reset_index(drop=True)
        want = _oracle("doc_mixture_sample", SF_DIR).reset_index(drop=True)
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_quota_proportions_and_rank_determinism(
        self, ray_session, tmp_path
    ):
        """Class-0 sources get 600-permille weight, class-1 300, class-2
        100; within a source the kept docs are exactly the smallest
        md5-hex ranks."""
        rows = []
        # src0 (class 0), src1 (class 1), src2 (class 2): 100 docs each.
        for s in range(3):
            for i in range(100):
                rows.append({"doc_id": s * 1000 + i, "source": f"src{s}"})
        df = pd.DataFrame(rows)
        df["text"] = "x"
        df["lang"] = "en"
        df["n_chars"] = 1
        df.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import doc_mixture_sample

        out = doc_mixture_sample(str(tmp_path))
        counts = out["source"].value_counts().to_dict()
        # quota = w_pm * 200 // (1000 * nk), nk = 1 source per class:
        # 120/60/20 — src0's 120 caps at its 100 available docs.
        assert counts == {"src0": 100, "src1": 60, "src2": 20}
        # Kept docs for src2 are the 20 smallest md5 hexes of its ids.
        ids = [2000 + i for i in range(100)]
        expect = sorted(
            ids, key=lambda d: hashlib.md5(str(d).encode()).hexdigest()
        )[:20]
        got_ids = sorted(out.loc[out["source"] == "src2", "doc_id"])
        assert got_ids == sorted(expect)


class TestDedupLinesWithin:
    def test_matches_oracle(self, ray_session):
        from exstruct_ray.queries import doc_dedup_lines_within

        got = doc_dedup_lines_within(SF_DIR).reset_index(drop=True)
        want = _oracle("doc_dedup_lines_within", SF_DIR).reset_index(
            drop=True
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_first_occurrence_order_preserved(self, ray_session, tmp_path):
        """Duplicates drop from their SECOND occurrence on; order of
        survivors is the original order, and dedup never crosses
        document boundaries."""
        df = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "intro\nbody\nintro\nbody\noutro",
                    "intro\nunique",  # 'intro' here is doc-2's first
                ],
                "lang": ["en"] * 2,
                "source": ["src0"] * 2,
                "n_chars": [0] * 2,
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        from exstruct_ray.queries import doc_dedup_lines_within

        out = doc_dedup_lines_within(str(tmp_path))
        assert out["clean_text"].tolist() == [
            "intro\nbody\noutro",
            "intro\nunique",
        ]
        assert out["n_kept"].tolist() == [3, 2]
        assert out["n_lines"].tolist() == [5, 2]
