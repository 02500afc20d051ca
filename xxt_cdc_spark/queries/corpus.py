"""Corpus-level analytics queries: TF-IDF, BM25 retrieval, dataset
splits, and distribution statistics over the documents table.

These are the relevance/statistics half of the training-data pipeline
surface (dedup lives in queries/text.py): term weighting for quality
and retrieval heuristics, deterministic train/val/test assignment, and
the per-language distribution profiles a 100 TB curation job reports.
All expressions are JVM built-ins; doubles that cross an aggregation
go through the exact decimal path (queries/_util) or integer sums, and
scores that feed a rank are rounded identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import text as TX

TFIDF_K = 5
BM25_TERMS = ("spark", "merge", "window")
BM25_K = 20
QUANTILES = (0.1, 0.5, 0.9, 0.99)
HIST_BUCKET = 50


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_TOK = "string_split_regex(trim(text), '\\s+')"


# --- TF-IDF top terms per document -------------------------------------------
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (smoothed idf). One (doc, term)
    shuffle + a vocab-sized doc-freq join — the plan that survives a
    100 TB corpus because the raw text is read exactly once."""
    return TX.tfidf_topk(_docs(spark, sf_dir), "text", "doc_id", TFIDF_K)


TFIDF_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
n AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
  SELECT term, ln((n_docs + 1) / (df_t + 1)) + 1.0 AS idf
  FROM (SELECT term, count(*) AS df_t FROM tf GROUP BY term), n
)
SELECT doc_id, rank, term, tfidf FROM (
  SELECT tf.doc_id, tf.term, round(tf.tf * idf.idf, 9) AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY round(tf.tf * idf.idf, 9) DESC, tf.term) AS rank
  FROM tf JOIN idf USING (term)
) WHERE rank <= {TFIDF_K}
ORDER BY doc_id, rank
"""


# --- BM25 bag-of-terms retrieval ---------------------------------------------
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed term query. The term filter
    sits before the aggregation, so the shuffle carries only the hit
    set — not the corpus."""
    return TX.bm25_search(
        _docs(spark, sf_dir), "text", "doc_id", BM25_TERMS, BM25_K
    )


_terms_sql = ", ".join(f"'{t}'" for t in BM25_TERMS)
BM25_SQL = f"""
WITH tok AS (
  SELECT doc_id, len({_TOK}) AS dl, unnest({_TOK}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM tok WHERE term IN ({_terms_sql}) GROUP BY 1, 2
),
stats AS (
  SELECT count(*) AS n_docs, SUM(len({_TOK})) / count(*) AS avgdl FROM documents
),
idf AS (
  SELECT term, ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0) AS idf, avgdl
  FROM (SELECT term, count(*) AS df_t FROM tf GROUP BY term), stats
),
contrib AS (
  SELECT tf.doc_id,
         idf.idf * (tf.tf * {TX.BM25_K1 + 1}) /
           (tf.tf + {TX.BM25_K1} * (1 - {TX.BM25_B} + {TX.BM25_B} * tf.dl / idf.avgdl)) AS c
  FROM tf JOIN idf USING (term)
),
scores AS (
  SELECT doc_id, CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS score
  FROM contrib GROUP BY doc_id
)
SELECT rank, doc_id, score FROM (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scores
) WHERE rank <= {BM25_K}
ORDER BY rank
"""


# --- deterministic train/val/test split + shape profile ----------------------
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(split, lang, 50-char length bucket) corpus profile under
    the deterministic md5 split (≈78/11/11). Hash-of-id assignment is
    stable across runs, engines and repartitioning — shards never
    migrate between splits. Folds the former corpus_split_stats /
    corpus_length_histogram entries: split assignment, token counting
    and histogram bucketing in one partial aggregation — the shape
    report a 100 TB curation job emits per shard."""
    d = _docs(spark, sf_dir)
    return (
        d.select(
            TX.split_assign("doc_id").alias("split"),
            "lang",
            (F.floor(F.length("text") / HIST_BUCKET) * HIST_BUCKET)
            .cast("long")
            .alias("len_bucket"),
            TX.token_count("text").cast("long").alias("n_tok"),
        )
        .groupBy("split", "lang", "len_bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
        .orderBy("split", "lang", "len_bucket")
    )


CORPUS_STATS_SQL = f"""
SELECT split, lang, len_bucket, count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM (
  SELECT CASE
           WHEN substr(md5('{TX.SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) < '{TX.SPLIT_BOUNDS[0][1]}' THEN 'train'
           WHEN substr(md5('{TX.SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) < '{TX.SPLIT_BOUNDS[1][1]}' THEN 'val'
           ELSE 'test'
         END AS split,
         lang,
         (length(text) // {HIST_BUCKET}) * {HIST_BUCKET} AS len_bucket,
         len({_TOK}) AS n_tok
  FROM documents
)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --- exact per-language token-count quantiles --------------------------------
def corpus_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p10/p50/p90/p99 of per-doc token counts by language
    (linear interpolation — Spark `percentile` ≡ DuckDB
    `quantile_cont`). Exact percentiles shuffle the group's values;
    at 100 TB swap in approx_percentile and widen the oracle to a
    tolerance — documented, not silently approximated."""
    d = _docs(spark, sf_dir)
    qs = d.select("lang", TX.token_count("text").cast("double").alias("n_tok"))
    pct = F.percentile("n_tok", F.array(*[F.lit(q) for q in QUANTILES]))
    return (
        qs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                F.round(pct[i], 6).alias(f"p{int(q * 100)}")
                for i, q in enumerate(QUANTILES)
            ],
        )
        .orderBy("lang")
    )


QUANTILES_SQL = f"""
SELECT lang, count(*) AS n_docs,
       {", ".join(f"round(quantile_cont(n_tok, {q}), 6) AS p{int(q * 100)}" for q in QUANTILES)}
FROM (SELECT lang, CAST(len({_TOK}) AS DOUBLE) AS n_tok FROM documents)
GROUP BY lang ORDER BY lang
"""


QUERIES = {
    "corpus_stats": corpus_stats,
    "text_tfidf_topk": text_tfidf_topk,
    "text_bm25_search": text_bm25_search,
    "corpus_token_quantiles": corpus_token_quantiles,
}

ORACLE = {
    "corpus_stats": CORPUS_STATS_SQL,
    "text_tfidf_topk": TFIDF_SQL,
    "text_bm25_search": BM25_SQL,
    "corpus_token_quantiles": QUANTILES_SQL,
}
