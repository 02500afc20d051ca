"""Adversarial-input robustness: the text/dedup/curation operators
must survive the documents a real crawl feeds them — NULLs, empties,
whitespace-only, single tokens, unicode+emoji, pathological repetition
— without crashing, and with defined (not arrival-dependent) outputs.
The synthetic corpus is clean, so this is the only place these shapes
are exercised."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import curation as C
from xxt_cdc_spark.functions import dedup as D
from xxt_cdc_spark.functions import text as TX

ROWS = [
    (0, None),                  # NULL text
    (1, ""),                    # empty
    (2, "   "),                 # whitespace only
    (3, "a"),                   # single char
    (4, "héllo wörld 北京 🚀"),   # unicode + emoji
    (5, "the " * 5000),         # pathological repetition
    (6, "\n\t\r"),              # control whitespace
    (7, "word"),                # single token
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


class TestPathologicalText:
    def test_exact_dedup_defined_on_degenerate_docs(self, docs):
        out = D.exact_dedup(docs, "text", "doc_id", bow=True).collect()
        # empty/whitespace-only docs share one empty-bow fingerprint
        # group; NULL text contributes a NULL fingerprint group (or is
        # excluded) — either way the result is deterministic and total
        ids = {r.doc_id for r in out}
        assert 1 in ids  # the empty-bow group survives with min doc_id
        assert all(r.dup_count >= 1 for r in out)

    def test_near_dup_kernels_no_crash_no_degenerate_pairs(self, docs):
        j = D.jaccard_pairs(docs, "text", "doc_id", 3, 0.5).collect()
        assert all(r.i != r.j for r in j)
        m = D.minhash_dedup_pairs(docs, "text", "doc_id").collect()
        assert all(r.i != r.j for r in m)
        s = D.simhash_pairs(docs, "text", "doc_id").collect()
        # the empty-ish docs share the zero signature — pairs are
        # allowed, crashes and self-pairs are not
        assert all(r.i != r.j for r in s)

    def test_text_scores_total_and_bounded(self, docs):
        out = docs.select(
            "doc_id",
            TX.quality_score("text").alias("q"),
            TX.predict_lang("text").alias("lang"),
            TX.bpe_token_count("text").alias("n_tok"),
        ).collect()
        assert len(out) == len(ROWS)
        for r in out:
            if r.q is not None:
                assert 0.0 <= r.q <= 1.0, r
            if r.n_tok is not None:
                assert r.n_tok >= 0

    def test_repetition_stats_flags_the_degenerate_doc(self, docs):
        out = {r.doc_id: r for r in C.repetition_stats(docs, "text", "doc_id").collect()}
        # 'the ' * 5000 is maximal bigram repetition — the gate's target
        assert 5 in out
        top = out[5]
        frac = [v for k, v in top.asDict().items() if "frac" in k or "ratio" in k]
        assert any(v is not None and v > 0.9 for v in frac), top

    def test_pack_and_redact_survive(self, spark, docs):
        non_null = docs.filter(F.col("text").isNotNull())
        red = non_null.select(
            C.redact("text", C.EMAIL_RE, "<EMAIL>").alias("t")
        ).collect()
        assert len(red) == len(ROWS) - 1
        packed = C.pack_bins(non_null, "doc_id", "text", seq_len=64)
        assert packed.count() >= 1
