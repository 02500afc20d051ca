"""Text analysis operators: tokenization, quality, language-ID,
fingerprinting.

All column expressions are built from pyspark.sql.functions built-ins
(split / regexp / md5 / array ops) so they run inside whole-stage
codegen — no Python UDFs on the 100 TB path. Every operator has an
ANSI-SQL twin in queries/text.py for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# marker words per language for the n-gram/keyword language-ID
# heuristic; the CASE-chain priority (en, de, es, fr, zh) is the
# deterministic tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "et"),
    "zh": (),
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


# GPT-2-style pre-tokenizer pattern: contraction suffixes, then
# space-prefixed letter runs, digit runs, and punctuation runs. This is
# the subword-boundary split BPE vocabularies are trained over; counting
# its matches approximates BPE token counts far better than whitespace
# (which undercounts punctuation-heavy and number-heavy text). The
# pattern uses only syntax shared by Java regex (Spark) and RE2
# (DuckDB): \p{L}, \p{N}, character classes, alternation.
BPE_SPLIT_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(text_col: str) -> Column:
    """Subword-boundary token array (BPE pre-tokenization units)."""
    pat = BPE_SPLIT_RE.replace("\\", "\\\\").replace("'", "\\'")
    return F.expr(f"regexp_extract_all({text_col}, '{pat}', 0)")


def bpe_token_count(text_col: str) -> Column:
    return F.size(bpe_tokens(text_col))


def marker_count(text_col: str, words: tuple[str, ...]) -> Column:
    """How many tokens (with multiplicity) fall in `words` — JVM-side
    higher-order filter, no UDF."""
    if not words:
        return F.lit(0)
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(split(trim({text_col}), '\\\\s+'), t -> t IN ({arr})))")


def stopword_count(text_col: str, words: tuple[str, ...] = STOPWORDS) -> Column:
    return marker_count(text_col, words)


def quality_score(text_col: str) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.5·min(len/500,1) + 0.3·distinct-token ratio + 0.2·(1 − stopword ratio).

    Mirrors the shape of production quality filters (length, lexical
    diversity, boilerplate share); arithmetic is single-expression
    double math — bit-identical across engines.
    """
    c = F.col(text_col)
    n = F.length(c).cast("double")
    tok = token_count(text_col).cast("double")
    dist = distinct_token_count(text_col).cast("double")
    stop = stopword_count(text_col).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    diversity = dist / tok
    stop_ratio = stop / tok
    return F.lit(0.5) * len_score + F.lit(0.3) * diversity + F.lit(0.2) * (F.lit(1.0) - stop_ratio)


def predict_lang(text_col: str) -> Column:
    """Keyword-marker language ID with deterministic priority order.

    On real corpora the markers separate languages; the synthetic test
    corpus is English-jargon word salad, so this mostly exercises the
    determinism + plumbing (documented; accuracy is judged on real data).
    """
    counts = {lang: marker_count(text_col, words) for lang, words in LANG_MARKERS.items()}
    c = counts
    return (
        F.when((c["en"] >= c["de"]) & (c["en"] >= c["es"]) & (c["en"] >= c["fr"]) & (c["en"] > 0), F.lit("en"))
        .when((c["de"] >= c["es"]) & (c["de"] >= c["fr"]) & (c["de"] > 0), F.lit("de"))
        .when((c["es"] >= c["fr"]) & (c["es"] > 0), F.lit("es"))
        .when(c["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )


ROLL_BASE = 257
ROLL_MOD = 1_000_000_007


def char_codes(text_col: str) -> Column:
    """Per-character code array (bigint) — the input to rolling hashes."""
    return F.expr(
        f"transform(sequence(1, length({text_col})), "
        f"i -> cast(ascii(substring({text_col}, i, 1)) as bigint))"
    )


def rolling_hash_expr(arr: str) -> Column:
    """Polynomial rolling hash of a char-code array column:
    fold (acc·B + c) mod M — the Rabin-Karp document fingerprint.
    Unlike md5, prefix hashes extend incrementally, which is what
    streaming fingerprinters and content-defined chunkers need."""
    return F.expr(
        f"aggregate({arr}, cast(0 as bigint), "
        f"(acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD})"
    )


def chunk_boundary_count(arr: str, window: int = 16, divisor: int = 64) -> Column:
    """Content-defined chunking boundary count: positions whose
    ``window``-char rolling hash ≡ 0 (mod ``divisor``) — the
    Rabin-fingerprint cut rule used by dedup-friendly chunkers (LBFS /
    restic-style). Expected chunk length ≈ divisor chars. The guard
    matters: Spark's sequence(a, b) runs DESCENDING when b < a, so
    short docs must short-circuit to 0 boundaries."""
    whash = (
        f"aggregate(slice({arr}, i - {window} + 1, {window}), cast(0 as bigint), "
        f"(acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD})"
    )
    return F.expr(
        f"IF(size({arr}) >= {window}, "
        f"size(filter(sequence({window}, size({arr})), i -> {whash} % {divisor} = 0)), 0)"
    )


def term_frequencies(df, text_col: str, id_col: str):
    """(id, term, tf) term-frequency table — explode + one hash
    aggregation on (id, term) with map-side partial counts. At 100 TB
    this is the canonical one-shuffle corpus statistic; everything
    downstream (doc-freq, TF-IDF, BM25) derives from it without
    touching the raw text again."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequencies(tf_df, id_col: str):
    """(term, df_t) document frequencies from a term-frequency table.
    One row per (doc, term) in, so count(*) per term == doc-freq —
    no countDistinct shuffle needed."""
    return tf_df.groupBy("term").agg(F.count("*").alias("df_t"))


def tfidf_topk(df, text_col: str, id_col: str, k: int = 5):
    """Top-k terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, sklearn-style).

    Plan shape (r15): tf shuffle on (id, term), then doc-freq as a
    COUNT window over term on the tf table itself. The previous
    doc-freq aggregation + join-back re-embedded the whole
    tokenize+tf subtree (Catalyst does not CSE it — guide §7.2), so
    the corpus was tokenized and tf-aggregated TWICE and the full tf
    table rode a BroadcastExchange; the window computes df_t from the
    single tf pass for one extra term-keyed exchange. (Trade-off,
    documented: a count-only window partitions by term alone, so a
    pathologically hot term concentrates its tf rows in one task's
    sort; the removed duplicate pass and corpus-sized broadcast are
    the dominant cost at every scale we can measure.) The corpus-size
    scalar N rides in as a broadcast single-row cross join, so the
    whole thing is ONE logical plan with no driver-side collect.
    Scores are rounded to 9 decimals so ranking ties break identically
    across engines (tie-break: term asc)."""
    from pyspark.sql import Window

    tf = term_frequencies(df, text_col, id_col)
    n = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df_t", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df_t") + 1)) + F.lit(1.0)),
                9,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tfidf")
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(df, text_col: str, id_col: str, query_terms: tuple[str, ...], k: int = 20):
    """BM25 ranking of documents for a bag-of-terms query.

    The term filter lands BEFORE the (id, term) aggregation, so the
    shuffle carries only rows matching the query vocabulary — at
    100 TB that's the difference between shuffling the corpus and
    shuffling the hit set. Per-doc score sums go through the exact
    decimal path (queries/_util.DEC) so partition order can't change
    the double result."""
    from pyspark.sql import Window

    from xxt_cdc_spark.queries._util import DEC

    terms = list(query_terms)
    tok = df.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("term"),
        token_count(text_col).alias("dl"),
    )
    tf = (
        tok.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    # integer token-count sum is exact, so avgdl (long/long → double
    # division) is partition-order-free without the decimal detour
    stats = df.agg(
        F.count("*").alias("n_docs"),
        (F.sum(token_count(text_col).cast("long")) / F.count("*")).alias("avgdl"),
    )
    # df_t as a COUNT window over term on the hit-set tf table (r15):
    # the doc-freq aggregation + join-back re-embedded the whole
    # tokenize+filter+tf subtree (guide §7.2 — Catalyst does not CSE
    # it), so the corpus text was exploded twice; the window computes
    # df_t from the single tf pass. The query vocabulary is a handful
    # of terms, so the term-keyed window exchange moves only the hit
    # set it already carried to the join.
    contrib = (
        tf.withColumn("df_t", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    scores = contrib.groupBy(id_col).agg(
        F.sum(F.col("c").cast(DEC)).cast("double").alias("score")
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", id_col, "score")
    )


# deterministic corpus split: lexicographic thresholds over the md5 hex
# space. First-2-hex-char prefixes are uniform over 00..ff, so
# ['00','c8') = 200/256 ≈ 78.1% train, ['c8','e4') ≈ 10.9% val,
# ['e4','ff'] ≈ 10.9% test. String comparison avoids hex→int casts
# that differ across engines; the salt keeps the assignment independent
# of any other md5-keyed operator.
SPLIT_SALT = "split:"
SPLIT_BOUNDS = (("train", "c8"), ("val", "e4"))


def split_assign(id_col: str) -> Column:
    """Deterministic, stateless train/val/test assignment from the id —
    reproducible across runs, engines, and repartitioning (the property
    a training pipeline needs so shards never migrate between splits)."""
    h2 = F.substring(F.md5(F.concat(F.lit(SPLIT_SALT), F.col(id_col).cast("string"))), 1, 2)
    expr = F.when(h2 < SPLIT_BOUNDS[0][1], F.lit(SPLIT_BOUNDS[0][0])).when(
        h2 < SPLIT_BOUNDS[1][1], F.lit(SPLIT_BOUNDS[1][0])
    )
    return expr.otherwise(F.lit("test"))


def unigram_logprob(df, text_col: str, id_col: str):
    """Per-document average token log-probability under the corpus's
    own unigram model — the cheap perplexity proxy used to rank
    documents for quality (a KenLM stand-in with the same plumbing:
    train counts on the corpus, score each doc by summed token
    log-likelihood).

    Plan: ONE (doc, term) shuffle produces both the model (term counts,
    vocab-sized) and the scoring frame; the model joins back on term
    (AQE broadcasts it when small). Cross-engine determinism: each
    term's ln() is rounded to 9 dp BEFORE the exact decimal sum, so
    aggregation order cannot perturb the total (same posture as TF-IDF).
    Returns (id, n_tok, avg_logprob)."""
    from pyspark.sql import functions as F

    tf = term_frequencies(df, text_col, id_col)
    totals = tf.agg(F.sum("tf").alias("n_total"))
    model = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
        .crossJoin(F.broadcast(totals))
        .select("term", F.round(F.log(F.col("ctf") / F.col("n_total")), 9).alias("lp"))
    )
    scored = tf.join(model, "term").groupBy(id_col).agg(
        F.sum("tf").alias("n_tok"),
        F.sum((F.col("tf") * F.col("lp")).cast("decimal(28,9)")).alias("sum_lp"),
    )
    return scored.select(
        id_col,
        "n_tok",
        F.round(F.col("sum_lp").cast("double") / F.col("n_tok"), 6).alias("avg_logprob"),
    )


def fingerprint(text_col: str) -> Column:
    """Content fingerprint: md5 of the case/punctuation-normalized text."""
    return F.md5(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))


def bow_fingerprint(text_col: str) -> Column:
    """Bag-of-words fingerprint: md5 over the sorted token multiset —
    collapses word-order permutations (near-dup normalization)."""
    return F.md5(F.array_join(F.array_sort(tokens(text_col)), " "))
