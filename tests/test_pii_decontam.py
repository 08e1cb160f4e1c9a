"""PII redaction and benchmark-decontamination operator tests."""

import pandas as pd

from exstruct_ray.ops.text import redact_pii_batch, word_ngram_set


class TestPiiRedaction:
    def test_email_then_number_order(self):
        s = pd.Series(
            [
                "reach me at user123456@example.com or 555123456",
                "no pii here",
                "ids 1234567 and 9876543 only",
            ]
        )
        redacted, n_pii = redact_pii_batch(s)
        # the email's 6-digit local part counts once as EMAIL, not as NUM
        assert redacted[0] == "reach me at <EMAIL> or <NUM>"
        assert n_pii.tolist() == [2, 0, 2]
        assert redacted[1] == "no pii here"
        assert redacted[2] == "ids <NUM> and <NUM> only"

    def test_short_numbers_survive(self):
        redacted, n_pii = redact_pii_batch(pd.Series(["call 12345 now"]))
        assert redacted[0] == "call 12345 now"
        assert n_pii.tolist() == [0]


class TestWordNgrams:
    def test_ascii_whitespace_semantics(self):
        # NBSP (U+00A0) must NOT split — RE2 \s parity with the SQL oracle
        grams = word_ngram_set("a b c d", 3)
        assert grams == {"a b c d"}
        assert word_ngram_set("one two", 3) == set()
        assert word_ngram_set("x y z w", 3) == {"x y z", "y z w"}
        assert word_ngram_set("  pad   ded   toks  ", 3) == {"pad ded toks"}


class TestDecontaminate:
    def test_flags_overlapping_docs_only(self, ray_session):
        import ray
        import ray.data

        from exstruct_ray.ops.text import decontaminate

        bench_grams = word_ngram_set("the quick brown fox jumps", 3)
        ref = ray.put(bench_grams)
        ds = ray.data.from_items(
            [
                {"doc_id": 1, "text": "the quick brown fox sleeps"},  # 2 grams
                {"doc_id": 2, "text": "completely different words here"},
                {"doc_id": 3, "text": "quick brown fox jumps high"},  # 2 grams
            ]
        )
        out = (
            decontaminate(ds, ref, n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 3]
        assert out["n_overlap"].tolist() == [2, 2]
