"""Curation queries: repetition gates, PII scrubbing, stratified
sampling, sequence packing, and domain mixing over the documents table.

The synthetic corpus contains no real PII, so the scrub query plants
deterministic emails/phones derived from doc_id — IDENTICALLY in both
engines — and then verifies that detection counts and redacted-length
deltas agree; the redaction logic itself is what's under test, with
non-trivial (non-zero, non-uniform) match counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import curation as CU
from xxt_cdc_spark.functions import text as TX
from xxt_cdc_spark.functions.text import token_count

_TOK = "string_split_regex(trim(text), '\\s+')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- per-document repetition profile -----------------------------------------
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: top-token share + duplicate-bigram
    share per document, flag = top > 0.20 OR dup > 0.30."""
    out = CU.repetition_stats(_docs(spark, sf_dir), "text", "doc_id")
    return out.withColumn("flagged", F.col("flagged").cast("int")).orderBy("doc_id")


REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2
),
ts AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tok, MAX(tf) AS top_tf FROM tf GROUP BY 1),
bg AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 2
         THEN list_transform(generate_series(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i + 1])
         ELSE CAST([] AS VARCHAR[]) END) AS bigram
  FROM t
),
btf AS (SELECT doc_id, bigram, count(*) AS tf FROM bg GROUP BY 1, 2),
bs AS (SELECT doc_id, SUM(tf) AS n_bigrams, count(*) AS n_distinct FROM btf GROUP BY 1)
SELECT ts.doc_id, n_tok,
       round(top_tf / n_tok, 9) AS top_token_frac,
       coalesce(round(1.0 - n_distinct / n_bigrams, 9), 0.0) AS dup_bigram_frac,
       CAST(round(top_tf / n_tok, 9) > {CU.TOP_TOKEN_MAX}
            OR coalesce(round(1.0 - n_distinct / n_bigrams, 9), 0.0) > {CU.DUP_BIGRAM_MAX}
            AS INT) AS flagged
FROM ts LEFT JOIN bs USING (doc_id)
ORDER BY doc_id
"""


# --- PII scrub ---------------------------------------------------------------
def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return d.withColumn(
        "aug", F.when(F.col("doc_id") % 3 == 0, planted).otherwise(F.col("text"))
    )


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub pass over the (PII-planted) corpus: per-language match
    counts for email and phone patterns plus the total characters
    removed by redaction. Single projection + one partial-aggregated
    groupBy — the scan-shaped plan a 100 TB scrub job needs."""
    a = _augmented(spark, sf_dir)
    scrubbed = CU.redact(
        CU.redact("aug", CU.EMAIL_RE, "[EMAIL]"), CU.PHONE_RE, "[PHONE]"
    )
    return (
        a.select(
            "lang",
            CU.pattern_count("aug", CU.EMAIL_RE).alias("em"),
            CU.pattern_count("aug", CU.PHONE_RE).alias("ph"),
            (F.length("aug") - F.length(scrubbed)).cast("long").alias("cut"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("em").alias("emails_found"),
            F.sum("ph").alias("phones_found"),
            F.sum("cut").alias("redacted_chars"),
        )
        .orderBy("lang")
    )


PII_SQL = f"""
WITH a AS (
  SELECT lang,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.com call +1-555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS aug
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(aug, '{CU.EMAIL_RE}'))) AS BIGINT) AS emails_found,
       CAST(SUM(len(regexp_extract_all(aug, '{CU.PHONE_RE}'))) AS BIGINT) AS phones_found,
       CAST(SUM(length(aug) - length(
         regexp_replace(regexp_replace(aug, '{CU.EMAIL_RE}', '[EMAIL]', 'g'),
                        '{CU.PHONE_RE}', '[PHONE]', 'g'))) AS BIGINT) AS redacted_chars
FROM a GROUP BY lang ORDER BY lang
"""


# --- deterministic stratified sampling ---------------------------------------
# 2-hex-char thresholds: exact k/256 rates per language ('g0' = keep all)
SAMPLE_RATES = {"en": "40", "de": "g0", "es": "80", "fr": "c0", "zh": "1a"}


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language downsampling report under deterministic hash-gated
    stratified sampling (en 25 %, de 100 %, es 50 %, fr 75 %, zh ~10 %)."""
    d = _docs(spark, sf_dir)
    keep = CU.stratified_keep("doc_id", "lang", SAMPLE_RATES)
    return (
        d.select(
            "lang",
            keep.cast("int").alias("kept"),
            token_count("text").cast("long").alias("n_tok"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("total_docs"),
            F.sum("kept").alias("kept_docs"),
            F.sum(F.col("kept") * F.col("n_tok")).alias("kept_tokens"),
            F.round(F.sum("kept") / F.count("*"), 9).alias("kept_frac"),
        )
        .orderBy("lang")
    )


_rate_cases = " ".join(
    f"WHEN lang = '{s}' THEN '{b}'" for s, b in SAMPLE_RATES.items()
)
STRATIFIED_SQL = f"""
WITH gated AS (
  SELECT lang,
         CASE WHEN substr(md5('{CU.SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
                   < (CASE {_rate_cases} ELSE '00' END)
              THEN 1 ELSE 0 END AS kept,
         len({_TOK}) AS n_tok
  FROM documents
)
SELECT lang, count(*) AS total_docs,
       CAST(SUM(kept) AS BIGINT) AS kept_docs,
       CAST(SUM(kept * n_tok) AS BIGINT) AS kept_tokens,
       round(SUM(kept) / count(*), 9) AS kept_frac
FROM gated GROUP BY lang ORDER BY lang
"""


# --- sequence packing --------------------------------------------------------
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop packing into 256-token sequences across 16 hash
    shards: per-(shard, bin) document and token counts."""
    return CU.pack_bins(_docs(spark, sf_dir), "doc_id", "text").orderBy(
        "shard", "bin"
    )


PACK_SQL = f"""
WITH sized AS (
  SELECT substr(md5('{CU.PACK_SALT}' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tok
  FROM documents
),
binned AS (
  SELECT shard, n_tok,
         CAST((SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok) // {CU.SEQ_LEN}
              AS BIGINT) AS bin
  FROM sized
)
SELECT shard, bin, count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM binned GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- whole-document packing (next-fit decreasing) ----------------------------
def corpus_pack_whole_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document next-fit-decreasing packing into 256-token bins
    across 16 hash shards (no mid-document splits): per-(shard, bin)
    document and token counts. The oracle replays the same sequential
    fold as a recursive CTE — one (bin, fill) state row per shard per
    step — so the greedy assignment itself is value-hash-gated; the
    FFD variant (strictly fewer-or-equal bins, no SQL twin) is
    pytest-gated against this one."""
    packed = CU.pack_bins_whole(_docs(spark, sf_dir), "doc_id", "text")
    return (
        packed.groupBy("shard", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("tokens"))
    )


PACK_WHOLE_SQL = f"""
WITH RECURSIVE sized AS (
  SELECT shard, n_tok,
         row_number() OVER (PARTITION BY shard ORDER BY n_tok DESC, doc_id) AS rn
  FROM (
    SELECT substr(md5('{CU.PACK_SALT}' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tok
    FROM documents
  )
),
packed AS (
  SELECT shard, rn, n_tok, CAST(0 AS BIGINT) AS bin, n_tok AS fill
  FROM sized WHERE rn = 1
  UNION ALL
  SELECT s.shard, s.rn, s.n_tok,
         CASE WHEN p.fill + s.n_tok <= {CU.SEQ_LEN} THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + s.n_tok <= {CU.SEQ_LEN} THEN p.fill + s.n_tok ELSE s.n_tok END
  FROM packed p JOIN sized s ON s.shard = p.shard AND s.rn = p.rn + 1
)
SELECT shard, bin, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM packed GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- domain mixture weights --------------------------------------------------
def corpus_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed (alpha = 0.3) domain sampling weights from
    per-source token shares."""
    return CU.domain_mix(_docs(spark, sf_dir), "source", "text").orderBy("source")


MIX_SQL = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(SUM(len({_TOK})) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
),
sh AS (
  SELECT source, n_docs, tokens,
         tokens / SUM(tokens) OVER () AS share FROM per
),
sm AS (
  SELECT *, CAST(round(pow(share, {CU.MIX_ALPHA}), 12) AS DECIMAL(18,12)) AS smoothed
  FROM sh
)
SELECT source, n_docs, tokens,
       round(share, 9) AS token_share,
       round(CAST(smoothed AS DOUBLE) / CAST(SUM(smoothed) OVER () AS DOUBLE), 9) AS mix_weight
FROM sm ORDER BY source
"""


# --- benchmark decontamination -----------------------------------------------
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination gate composed with the deterministic split: flag
    train/val documents sharing any 5-gram with the md5-assigned test
    split, reported per (split, lang). The gram semi-join keys on
    xxhash64 (8 bytes) Spark-side; the oracle joins the raw gram
    strings — equal results bar a 64-bit collision."""
    d = _docs(spark, sf_dir).withColumn("split", TX.split_assign("doc_id"))
    out = CU.decontaminate(d, "text", "doc_id", "split")
    return (
        out.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("contaminated").alias("n_contaminated"),
            F.round(F.sum("contaminated") / F.count("*"), 9).alias("contamination_rate"),
        )
        .orderBy("split", "lang")
    )


_SPLIT_CASE = f"""CASE
  WHEN substr(md5('{TX.SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) < '{TX.SPLIT_BOUNDS[0][1]}' THEN 'train'
  WHEN substr(md5('{TX.SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) < '{TX.SPLIT_BOUNDS[1][1]}' THEN 'val'
  ELSE 'test' END"""

DECON_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, {_SPLIT_CASE} AS split, {_TOK} AS toks FROM documents
),
grams AS (
  SELECT doc_id, split, unnest(
    CASE WHEN len(toks) >= {CU.DECON_N}
         THEN list_transform(generate_series(1, len(toks) - {CU.DECON_N} + 1),
                             i -> {" || ' ' || ".join(f"toks[i + {j}]" for j in range(CU.DECON_N))})
         ELSE CAST([] AS VARCHAR[]) END) AS g
  FROM t
),
bench AS (SELECT DISTINCT g FROM grams WHERE split = 'test'),
hit AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE split <> 'test' AND g IN (SELECT g FROM bench)
)
SELECT split, lang, count(*) AS n_docs,
       CAST(SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       round(SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END) / count(*), 9) AS contamination_rate
FROM t LEFT JOIN hit USING (doc_id)
WHERE split <> 'test'
GROUP BY split, lang ORDER BY split, lang
"""


# --- unigram-LM quality scoring ----------------------------------------------
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy ranking: per-document average token log-prob
    under the corpus unigram model (KenLM-style quality signal)."""
    return TX.unigram_logprob(_docs(spark, sf_dir), "text", "doc_id").orderBy("doc_id")


LOGPROB_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
n AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_total FROM tf),
model AS (
  SELECT term, round(ln(SUM(tf) / (SELECT n_total FROM n)), 9) AS lp
  FROM tf GROUP BY term
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tok,
       round(CAST(SUM(CAST(tf * lp AS DECIMAL(28,9))) AS DOUBLE) / SUM(tf), 6) AS avg_logprob
FROM tf JOIN model USING (term)
GROUP BY doc_id ORDER BY doc_id
"""


# --- folded families (registry-cap consolidation, r4) ------------------------
def text_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both model-free quality signals in one doc-grain result: the
    Gopher-style repetition gate (top-token share, duplicate-bigram
    share, flag) joined with the unigram-LM average log-prob
    (perplexity proxy). Folds the former text_repetition_stats /
    text_unigram_logprob entries — one row per doc carries both
    operators' outputs, each still value-hashed."""
    rep = text_repetition_stats(spark, sf_dir)
    lp = text_unigram_logprob(spark, sf_dir).drop("n_tok")
    return rep.join(lp, "doc_id", "inner").orderBy("doc_id")


QUALITY_GATES_SQL = f"""
SELECT r.doc_id, r.n_tok, r.top_token_frac, r.dup_bigram_frac, r.flagged,
       l.avg_logprob
FROM ({REPETITION_SQL}) r JOIN ({LOGPROB_SQL}) l USING (doc_id)
ORDER BY r.doc_id
"""


def corpus_sampling_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling policy surface keyed by ``family``: the deterministic
    hash-gated stratified sample report (per language) and the
    temperature-smoothed domain mixture weights (per source). Folds the
    former corpus_stratified_sample / corpus_domain_mix entries.
    Columns: n_docs; v1/v2 = (kept_docs, kept_tokens) or (tokens,
    NULL); f1/f2 = (kept_frac, NULL) or (token_share, mix_weight)."""
    strat = corpus_stratified_sample(spark, sf_dir).select(
        F.lit("stratified").alias("family"),
        F.col("lang").alias("key"),
        F.col("total_docs").alias("n_docs"),
        F.col("kept_docs").cast("long").alias("v1"),
        F.col("kept_tokens").cast("long").alias("v2"),
        F.col("kept_frac").alias("f1"),
        F.lit(None).cast("double").alias("f2"),
    )
    mix = corpus_domain_mix(spark, sf_dir).select(
        F.lit("domain_mix").alias("family"),
        F.col("source").alias("key"),
        "n_docs",
        F.col("tokens").cast("long").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
        F.col("token_share").alias("f1"),
        F.col("mix_weight").alias("f2"),
    )
    return strat.unionByName(mix).orderBy("family", "key")


SAMPLING_MIX_SQL = f"""
SELECT family, key, n_docs, v1, v2, f1, f2 FROM (
  SELECT 'stratified' AS family, lang AS key, total_docs AS n_docs,
         kept_docs AS v1, kept_tokens AS v2, kept_frac AS f1,
         CAST(NULL AS DOUBLE) AS f2
  FROM ({STRATIFIED_SQL})
  UNION ALL
  SELECT 'domain_mix' AS family, source AS key, n_docs,
         tokens AS v1, CAST(NULL AS BIGINT) AS v2, token_share AS f1,
         mix_weight AS f2
  FROM ({MIX_SQL})
)
ORDER BY family, key
"""


def corpus_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`corpus_decontaminate` through the Bloom-prefiltered plan
    (functions/bloom.py: distributed bitmap build, Arrow-batched
    membership, exact semi-join verify over survivors) — same oracle
    SQL as the exact path, because the composition IS exact; what
    changes is the shuffle economics when the benchmark gram set
    outgrows the broadcast-hash-table regime."""
    d = _docs(spark, sf_dir).withColumn("split", TX.split_assign("doc_id"))
    out = CU.decontaminate_bloom(d, "text", "doc_id", "split")
    return (
        out.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("contaminated").alias("n_contaminated"),
            F.round(F.sum("contaminated") / F.count("*"), 9).alias("contamination_rate"),
        )
        .orderBy("split", "lang")
    )


# --- ExactSubstr duplicate-span removal -------------------------------------
SUBSTR_K = 8


def corpus_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicate spans (functions/dedup.py::
    duplicate_substring_spans): maximal token regions covered by
    k-token windows repeated corpus-wide, first occurrence canonical —
    what a "deduplicating training data" cleaner cuts. The oracle
    replays window counting, first-occurrence ranking and the
    gaps-and-islands span merge independently in SQL."""
    from xxt_cdc_spark.functions.dedup import duplicate_substring_spans

    d = _docs(spark, sf_dir)
    return duplicate_substring_spans(d, "text", "doc_id", SUBSTR_K).orderBy(
        "doc_id", "span_start"
    )


SUBSTR_DEDUP_SQL = f"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
wins AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(t[i:i+{SUBSTR_K}-1], ' ') AS win
  FROM toks, LATERAL UNNEST(range(1, GREATEST(len(t)-{SUBSTR_K}+2, 1))) AS u(i)
),
marked AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY win) AS df,
         ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
  FROM wins),
dupw AS (SELECT doc_id, pos, pos + {SUBSTR_K} - 1 AS fin FROM marked WHERE df > 1 AND rn > 1),
isl AS (
  SELECT doc_id, pos, fin,
         MAX(fin) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dupw),
grp AS (SELECT *, SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
        OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM isl)
SELECT doc_id, MIN(pos) AS span_start, MAX(fin) AS span_end,
       MAX(fin) - MIN(pos) + 1 AS span_tokens
FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start
"""


# --- n-gram novelty scoring ---------------------------------------------------
NOVELTY_N = 3


def corpus_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    n-grams whose FIRST corpus occurrence (min doc_id) is this doc —
    the contribution metric a data-selection pass uses to rank
    redundant documents (a near-duplicate of earlier material scores
    ~0, fresh content ~1). Window-only plan: one exchange on the gram
    hash for the min-doc window, one on doc for the final aggregate —
    no self-join, so hot grams cannot fan out."""
    from pyspark.sql import Window as W

    from xxt_cdc_spark.functions.dedup import shingle_keys

    d = _docs(spark, sf_dir)
    sh = shingle_keys(d, "text", "doc_id", NOVELTY_N)
    marked = sh.withColumn("first_doc", F.min("doc_id").over(W.partitionBy("sh64")))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("doc_id") == F.col("first_doc")).cast("long")).alias("novel_grams"),
        )
        .withColumn(
            "novelty", F.col("novel_grams").cast("double") / F.col("n_grams").cast("double")
        )
        .orderBy("doc_id")
    )


NOVELTY_SQL = f"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{NOVELTY_N}-1], ' ') AS gram
  FROM toks, LATERAL UNNEST(range(1, GREATEST(len(t)-{NOVELTY_N}+2, 1))) AS u(i)
),
m AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY gram) AS first_doc FROM sh)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
       CAST(SUM(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty
FROM m GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = {
    "corpus_novelty_scores": corpus_novelty_scores,
    "corpus_substring_dedup": corpus_substring_dedup,
    "text_quality_gates": text_quality_gates,
    "corpus_sampling_mix": corpus_sampling_mix,
    "text_pii_redact": text_pii_redact,
    "corpus_pack_sequences": corpus_pack_sequences,
    "corpus_pack_whole_docs": corpus_pack_whole_docs,
    "corpus_decontaminate": corpus_decontaminate,
    "corpus_decontaminate_bloom": corpus_decontaminate_bloom,
}

ORACLE = {
    "corpus_novelty_scores": NOVELTY_SQL,
    "corpus_substring_dedup": SUBSTR_DEDUP_SQL,
    "text_quality_gates": QUALITY_GATES_SQL,
    "corpus_sampling_mix": SAMPLING_MIX_SQL,
    "text_pii_redact": PII_SQL,
    "corpus_pack_sequences": PACK_SQL,
    "corpus_pack_whole_docs": PACK_WHOLE_SQL,
    "corpus_decontaminate": DECON_SQL,
    "corpus_decontaminate_bloom": DECON_SQL,
}
