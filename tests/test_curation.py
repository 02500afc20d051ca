"""Unit tests for the curation operator family (functions/curation.py):
repetition gates, PII scrubbing, stratified sampling, sequence packing,
and domain mixing. Cross-engine value equality is covered by the oracle
sweep; these tests pin the SEMANTICS on crafted inputs where the right
answer is computable by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import curation as CU


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


# --- repetition --------------------------------------------------------------
def test_repetition_flags_degenerate_doc(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam spam", "en", "s"),        # all one token
            (2, "a b c d e f g h i j", "en", "s"),             # all distinct
            (3, "x y x y x y x y", "en", "s"),                 # repeated bigrams
            (4, "solo", "en", "s"),                            # single token
        ],
    )
    out = {
        r["doc_id"]: r
        for r in CU.repetition_stats(df, "text", "doc_id").collect()
    }
    assert out[1]["top_token_frac"] == 1.0 and out[1]["flagged"]
    assert out[2]["top_token_frac"] == pytest.approx(0.1)
    assert out[2]["dup_bigram_frac"] == 0.0 and not out[2]["flagged"]
    # doc 3: bigrams = [x y, y x, x y, y x, x y, y x, x y] → 2 distinct of 7
    assert out[3]["dup_bigram_frac"] == pytest.approx(1 - 2 / 7)
    assert out[3]["flagged"]
    # single-token doc: no bigrams → dup share 0 by definition
    assert out[4]["dup_bigram_frac"] == 0.0 and out[4]["n_tok"] == 1


# --- PII scrub ---------------------------------------------------------------
def test_redact_and_count_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@corp.example.org today"),
            (2, "call +1-555-0192 or +44-555-0000 now"),
            (3, "nothing sensitive here"),
        ],
        "id long, t string",
    )
    out = df.select(
        "id",
        CU.pattern_count("t", CU.EMAIL_RE).alias("em"),
        CU.pattern_count("t", CU.PHONE_RE).alias("ph"),
        CU.redact(CU.redact("t", CU.EMAIL_RE, "[EMAIL]"), CU.PHONE_RE, "[PHONE]").alias("red"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["em"] == 1 and "[EMAIL]" in by_id[1]["red"]
    assert "alice" not in by_id[1]["red"]
    assert by_id[2]["ph"] == 2 and by_id[2]["red"].count("[PHONE]") == 2
    assert by_id[3]["em"] == 0 and by_id[3]["ph"] == 0
    assert by_id[3]["red"] == "nothing sensitive here"


# --- stratified sampling -----------------------------------------------------
def test_stratified_rates_and_determinism(spark):
    rows = [(i, "w " * 5, ["en", "de"][i % 2], "s") for i in range(2000)]
    df = _docs(spark, rows)
    keep = CU.stratified_keep("doc_id", "lang", {"en": "40", "de": "g0"})
    agg = (
        df.select("lang", keep.cast("int").alias("k"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("k").alias("kept"))
        .collect()
    )
    by_lang = {r["lang"]: r for r in agg}
    # de: 'g0' keeps everything; en: '40' = 64/256 = 25% ± sampling noise
    assert by_lang["de"]["kept"] == by_lang["de"]["n"]
    assert 0.18 <= by_lang["en"]["kept"] / by_lang["en"]["n"] <= 0.32
    # repartitioning must not change any document's fate
    again = (
        df.repartition(13)
        .select("doc_id", keep.alias("k"))
        .collect()
    )
    first = dict(
        df.select("doc_id", keep.alias("k")).collect()
    )
    assert dict(again) == first


def test_stratified_unknown_stratum_dropped(spark):
    df = _docs(spark, [(1, "x", "xx", "s"), (2, "x", "en", "s")])
    keep = CU.stratified_keep("doc_id", "lang", {"en": "g0"})
    out = dict(df.select("doc_id", keep).collect())
    assert out[1] is False or out[1] == 0
    assert out[2]


# --- sequence packing --------------------------------------------------------
def test_pack_bins_partitions_and_conserves_tokens(spark):
    rows = [(i, "t " * 100, "en", "s") for i in range(64)]  # 100 tokens each
    df = _docs(spark, rows)
    out = CU.pack_bins(df, "doc_id", "text", seq_len=256).collect()
    # token conservation: every document lands in exactly one bin
    assert sum(r["tokens"] for r in out) == 64 * 100
    # within a shard, bins are dense from 0 and ordered
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, bins in by_shard.items():
        ids = sorted(b["bin"] for b in bins)
        assert ids[0] == 0 and ids == list(range(len(ids)))
        # chop rule: a bin is "full" when the NEXT doc starts past the
        # boundary, so every non-final bin holds ≥ seq_len - 99 tokens
        for b in sorted(bins, key=lambda x: x["bin"])[:-1]:
            assert b["tokens"] >= 256 - 99


def test_pack_bins_deterministic_under_repartition(spark):
    rows = [(i, "t " * (i % 37 + 1), "en", "s") for i in range(200)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, CU.pack_bins(df, "doc_id", "text").collect()))
    b = sorted(map(tuple, CU.pack_bins(df.repartition(17), "doc_id", "text").collect()))
    assert a == b


# --- decontamination ---------------------------------------------------------
def test_decontaminate_flags_only_true_overlaps(spark):
    shared = "alpha beta gamma delta epsilon"           # one full 5-gram
    df = spark.createDataFrame(
        [
            (1, shared + " tail words here", "train"),       # contains the bench 5-gram
            (2, "totally different words with no overlap at all", "train"),
            (3, "alpha beta gamma delta DIFFERENT suffix", "train"),  # only 4-gram overlap
            (4, "short doc", "train"),                        # < n tokens → no grams
            (9, shared + " bench continuation", "test"),      # the benchmark doc
        ],
        "doc_id long, text string, split string",
    )
    out = {r.doc_id: r.contaminated for r in CU.decontaminate(df, "text", "doc_id", "split").collect()}
    assert out == {1: 1, 2: 0, 3: 0, 4: 0}  # test rows excluded from output


def test_unigram_logprob_ranks_rare_docs_lower(spark):
    from xxt_cdc_spark.functions import text as TX

    rows = [(i, "common words common words", "en", "s") for i in range(9)]
    rows.append((100, "rare tokens entirely", "en", "s"))
    df = _docs(spark, rows)
    out = {r.doc_id: r.avg_logprob for r in TX.unigram_logprob(df, "text", "doc_id").collect()}
    # the all-rare doc is less probable under the corpus model
    assert out[100] < out[0] < 0


# --- domain mix --------------------------------------------------------------
def test_domain_mix_weights_normalize_and_upweight_small(spark):
    rows = [(i, "w " * 200, "en", "big") for i in range(90)] + [
        (1000 + i, "w " * 200, "en", "small") for i in range(10)
    ]
    df = _docs(spark, rows)
    out = {r["source"]: r for r in CU.domain_mix(df, "source", "text").collect()}
    assert out["big"]["token_share"] == pytest.approx(0.9)
    assert sum(r["mix_weight"] for r in out.values()) == pytest.approx(1.0, abs=1e-6)
    # alpha < 1 compresses the gap: small domain's weight > its share
    assert out["small"]["mix_weight"] > out["small"]["token_share"]
    assert out["big"]["mix_weight"] < out["big"]["token_share"]


class TestSubstringDedup:
    def test_partial_span_merging(self, spark):
        """Overlapping duplicate windows merge into ONE maximal span at
        the right offsets — pinned on a corpus where the repeat is a
        mid-document substring, not a whole-document duplicate."""
        from xxt_cdc_spark.functions.dedup import duplicate_substring_spans

        boiler = "the quick brown fox jumps over the lazy dog again"  # 10 tokens
        docs = [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"one two three four {boiler} five"),
            (3, "completely unrelated text with no repeats at all here"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        spans = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in duplicate_substring_spans(df, "text", "doc_id", k=4).collect()
        }
        # doc 1 (min doc) is canonical — only doc 2's occurrence is a span:
        # boiler occupies tokens 4..13 of doc 2; its 7 overlapping 4-windows
        # (positions 4..10) merge into exactly one span [4, 13].
        assert spans == {(2, 4, 13, 10)}

    def test_no_repeats_no_spans(self, spark):
        from xxt_cdc_spark.functions.dedup import duplicate_substring_spans

        df = spark.createDataFrame(
            [(1, "all words unique here today"), (2, "different tokens entirely now friend")],
            "doc_id long, text string",
        )
        assert duplicate_substring_spans(df, k=3).count() == 0

    def test_plan_has_no_join(self, spark, sf_dir):
        """The ExactSubstr form is aggregation-only — no self-join, so
        no quadratic fanout for a hot boilerplate window to amplify."""
        from xxt_cdc_spark.functions.dedup import duplicate_substring_spans

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = duplicate_substring_spans(d)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "CartesianProduct" not in plan


class TestNoveltyScores:
    def test_novelty_semantics(self, spark):
        """An exact duplicate of an earlier doc scores 0; the first doc
        scores 1; the plan is join-free (window + aggregate only)."""
        from xxt_cdc_spark.queries.curation import corpus_novelty_scores  # noqa: F401
        from xxt_cdc_spark.functions.dedup import shingle_keys
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        docs = [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (3, "totally fresh words never seen before"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        sh = shingle_keys(df, "text", "doc_id", 3)
        marked = sh.withColumn("first_doc", F.min("doc_id").over(W.partitionBy("sh64")))
        out = (
            marked.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("doc_id") == F.col("first_doc")).cast("long")).alias("novel"),
            )
            .collect()
        )
        by_doc = {r["doc_id"]: r["novel"] / r["n"] for r in out}
        assert by_doc[1] == 1.0 and by_doc[2] == 0.0 and by_doc[3] == 1.0
        plan = marked._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
