"""Corpus-curation operators: repetition filters, PII scrubbing,
stratified sampling, sequence packing, and domain mixing.

These are the curation half of a training-data pipeline (dedup lives in
functions/dedup.py, relevance in functions/text.py): the Gopher-style
repetition gates, the scrub pass that strips emails/phones before text
reaches a training shard, deterministic per-stratum downsampling, the
concat-and-chop packing that turns documents into fixed-token training
sequences, and temperature-smoothed domain mixture weights.

Everything is pyspark.sql.functions built-ins (regexp / lambda /
window / hash expressions) running inside whole-stage codegen — no
Python UDFs — and every operator has an ANSI-SQL twin in
queries/curation.py for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from xxt_cdc_spark.functions.text import token_count, tokens

# Patterns use only syntax shared by Java regex (Spark) and RE2
# (DuckDB): classes, bounded repetition, alternation — no backrefs or
# lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pattern_count(col: Column | str, pattern: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern))


def redact(col: Column | str, pattern: str, token: str) -> Column:
    """Replace every match of ``pattern`` with ``token`` (Spark's
    regexp_replace is global; the DuckDB twin needs the 'g' flag)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, token)


# --- repetition statistics (Gopher-style quality gates) ----------------------

TOP_TOKEN_MAX = 0.20
DUP_BIGRAM_MAX = 0.30


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition profile: most-frequent-token share and
    duplicate-bigram share, with the Gopher-style flag
    (top_token_frac > 0.20 OR dup_bigram_frac > 0.30).

    Plan shape for 100 TB: both statistics come from explode →
    (doc, term) hash aggregations with map-side partial counts — the
    same one-shuffle shape as term_frequencies — NOT per-row nested
    lambdas (an O(tokens·distinct) quadratic per document). Documents
    with fewer than two tokens have no bigrams; their duplicate share
    is 0 by definition (left join + coalesce).
    """
    tok_tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    tok_stats = tok_tf.groupBy(id_col).agg(
        F.sum("tf").alias("n_tok"),
        F.max("tf").alias("top_tf"),
    )
    # bigram array via a guarded index lambda: sequence(a, b) runs
    # DESCENDING in Spark when b < a, so single-token docs must
    # short-circuit to an empty array
    t = f"split(trim({text_col}), '\\\\s+')"
    bigrams = F.expr(
        f"IF(size({t}) >= 2, "
        f"transform(sequence(0, size({t}) - 2), i -> concat({t}[i], ' ', {t}[i + 1])), "
        f"array())"
    )
    bi_tf = (
        df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("tf"))
    )
    bi_stats = bi_tf.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
    )
    joined = tok_stats.join(bi_stats, id_col, "left")
    top_frac = F.round(F.col("top_tf") / F.col("n_tok"), 9)
    dup_frac = F.coalesce(
        F.round(
            F.lit(1.0) - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 9
        ),
        F.lit(0.0),
    )
    return joined.select(
        F.col(id_col),
        F.col("n_tok"),
        top_frac.alias("top_token_frac"),
        dup_frac.alias("dup_bigram_frac"),
        (
            (top_frac > TOP_TOKEN_MAX) | (dup_frac > DUP_BIGRAM_MAX)
        ).alias("flagged"),
    )


# --- deterministic stratified sampling ---------------------------------------

SAMPLE_SALT = "sample:"


def stratified_keep(
    id_col: str, stratum_col: str, rates: dict[str, str]
) -> Column:
    """Deterministic keep/drop decision for per-stratum downsampling.

    ``rates`` maps stratum value → 2-hex-char threshold: a document is
    kept iff the first two hex chars of md5(salt ‖ id) sort below the
    stratum's threshold, giving an exact k/256 sampling rate ('40' =
    25 %, '80' = 50 %, 'g0' = keep-all since 'ff' < 'g0'). Hash-of-id
    gating is stable across runs, engines, partitioning and cluster
    size — re-running curation never flips a document's fate, which is
    what makes incremental corpus rebuilds reproducible. Unknown
    strata are dropped (threshold '00')."""
    h2 = F.substring(
        F.md5(F.concat(F.lit(SAMPLE_SALT), F.col(id_col).cast("string"))), 1, 2
    )
    expr = F.lit("00")
    for stratum, bound in rates.items():
        expr = F.when(F.col(stratum_col) == stratum, F.lit(bound)).otherwise(expr)
    return h2 < expr


# --- sequence packing (concat-and-chop) --------------------------------------

PACK_SALT = "shard:"
SEQ_LEN = 256
N_SHARDS = 16


def _sized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shared packing prologue: (id, hash shard, token count) — both
    packers MUST shard identically or a salt/tokenizer change would
    silently fork their assignments."""
    shard = F.substring(
        F.md5(F.concat(F.lit(PACK_SALT), F.col(id_col).cast("string"))), 1, 1
    )
    return df.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count(text_col).cast("long").alias("n_tok"),
    )


def pack_bins(
    df: DataFrame, id_col: str, text_col: str, seq_len: int = SEQ_LEN
) -> DataFrame:
    """Concat-and-chop sequence packing: documents are sharded by a
    hash of their id, concatenated in id order within each shard, and
    chopped into fixed ``seq_len``-token training sequences; a document
    lands in the bin where its first token falls.

    The window (cumulative token count) partitions BY SHARD — there is
    no global ordering, so at 100 TB each shard's packing runs
    independently on its own executor and the shard count scales with
    the cluster, while the assignment stays deterministic (hash + id
    order, not partition order)."""
    sized = _sized(df, id_col, text_col)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.select(
        "shard",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / seq_len).alias("bin"),
    )
    return binned.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("tokens")
    )


# --- whole-document packing (no splitting) -----------------------------------


def pack_bins_whole(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = SEQ_LEN,
    strategy: str = "nfd",
) -> DataFrame:
    """Whole-document bin packing: each document lands entirely in one
    ``seq_len``-capacity training bin (no mid-document splits — the
    variant used when documents must stay contiguous, e.g. long-context
    curricula), sharded by id hash so every shard packs independently
    on its own executor.

    Strategies (both deterministic: size-descending, id-ascending):

    - ``nfd`` (next-fit decreasing): a new bin opens whenever the
      current one can't take the next document. Sequential state is one
      (bin, fill) pair, which is why the DuckDB oracle can replay it as
      a recursive CTE — the registered query uses this mode.
    - ``ffd`` (first-fit decreasing): each document goes into the FIRST
      bin with room (the classic 11/9·OPT+1 heuristic) — never more
      bins than nfd; verified against it in tests, but its open-bin
      vector state has no SQL twin, so it is pytest-gated only.

    A document longer than ``seq_len`` occupies a bin of its own (both
    strategies; no truncation — the caller decides whether to pre-chop
    oversized docs with ``pack_bins``).

    Scale: the per-shard pack runs in one ``applyInPandas`` task over
    (id, n_tok) pairs only — text never enters the shuffle. Shard count
    is the parallelism knob; packing quality degrades only marginally
    with more shards (each shard still packs size-descending).
    """
    if strategy not in ("nfd", "ffd"):
        raise ValueError(f"unknown packing strategy: {strategy!r}")
    sized = _sized(df, id_col, text_col)

    def pack(pdf):
        pdf = pdf.sort_values(["n_tok", id_col], ascending=[False, True]).reset_index(
            drop=True
        )
        bins: list[int] = []
        if strategy == "nfd":
            b, fill = -1, 0
            for n in pdf["n_tok"]:
                if b < 0 or fill + n > seq_len:
                    b, fill = b + 1, int(n)
                else:
                    fill += int(n)
                bins.append(b)
        else:  # ffd
            fills: list[int] = []
            for n in pdf["n_tok"]:
                for i, f0 in enumerate(fills):
                    if f0 + n <= seq_len:
                        fills[i] = f0 + int(n)
                        bins.append(i)
                        break
                else:
                    fills.append(int(n))
                    bins.append(len(fills) - 1)
        pdf["bin"] = bins
        return pdf

    # id field type mirrors the input schema (r4 ADVICE: a hardcoded
    # 'long' broke non-long id columns at execution; pack_bins derives
    # its schema the same way)
    id_type = df.schema[id_col].dataType.simpleString()
    return sized.groupBy("shard").applyInPandas(
        pack, schema=f"{id_col} {id_type}, shard string, n_tok long, bin long"
    )


# --- benchmark decontamination -----------------------------------------------

DECON_N = 5


def ngram_keys(text_col: str, n: int = DECON_N) -> Column:
    """Token n-gram array (space-joined strings) with the same guarded
    index-lambda shape as the bigram builder: Spark's sequence()
    descends when the doc is shorter than n, so short docs must
    short-circuit to an empty array."""
    t = f"split(trim({text_col}), '\\\\s+')"
    gram = " , ' ', ".join(f"{t}[i + {j}]" for j in range(n)).join(["concat(", ")"])
    return F.expr(
        f"IF(size({t}) >= {n}, "
        f"transform(sequence(0, size({t}) - {n}), i -> {gram}), array())"
    )


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    split_col: str,
    n: int = DECON_N,
    benchmark_split: str = "test",
    bloom_fpp: float | None = None,
) -> DataFrame:
    """Flag training documents sharing ANY token n-gram with the
    benchmark split — the dataset-decontamination gate every serious
    training pipeline runs before the eval set means anything.

    Plan shape for 100 TB: one explode to (doc, gram-hash), the
    benchmark gram set is distinct-collapsed (typically millions of
    grams — tiny next to the corpus) and semi-joined back on an 8-byte
    `xxhash64` key, so the corpus shuffles its gram hashes once and
    the join is broadcastable. Returns non-benchmark rows with a
    `contaminated` flag (benchmark rows are the reference set, not
    candidates).

    ``bloom_fpp`` set = Bloom-prefiltered variant, IDENTICAL results
    (the bitmap has no false negatives; its false positives are
    removed by the exact semi-join that follows): for the regime where
    the benchmark gram set is too large to broadcast as a join hash
    table (~60 B/key) but fits as a bitmap (~1.2 B/key at 1% FPP),
    the corpus-side gram stream is cut to ~contamination-rate + FPP
    BEFORE the only wide shuffle. See functions/bloom.py."""
    grams = df.select(
        F.col(id_col),
        F.col(split_col).alias("_split"),
        F.explode(ngram_keys(text_col, n)).alias("gram"),
    ).select(id_col, "_split", F.xxhash64("gram").alias("gh"))
    bench = grams.filter(F.col("_split") == benchmark_split).select("gh").distinct()
    corpus = grams.filter(F.col("_split") != benchmark_split)
    if bloom_fpp is not None:
        from xxt_cdc_spark.functions.bloom import build_bloom, might_contain

        bench = bench.localCheckpoint(eager=True)  # built once, probed twice
        bloom = build_bloom(bench, "gh", expected_items=max(bench.count(), 1), fpp=bloom_fpp)
        # no-shuffle prefilter; the semi-join below stays the exact verify
        corpus = corpus.filter(might_contain(df.sparkSession, bloom, F.col("gh")))
    hit = (
        corpus.join(bench, "gh", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    return (
        df.filter(F.col(split_col) != benchmark_split)
        .join(hit, id_col, "left")
        .withColumn("contaminated", F.coalesce(F.col("contaminated"), F.lit(0)))
    )


def decontaminate_bloom(
    df: DataFrame,
    text_col: str,
    id_col: str,
    split_col: str,
    n: int = DECON_N,
    benchmark_split: str = "test",
    fpp: float = 0.01,
) -> DataFrame:
    """``decontaminate`` with the Bloom prefilter on (kept as a named
    entry point; one implementation — review finding r5)."""
    return decontaminate(
        df, text_col, id_col, split_col, n, benchmark_split, bloom_fpp=fpp
    )


# --- domain mixture weights --------------------------------------------------

MIX_ALPHA = 0.3
MIX_DEC = "decimal(18,12)"


def domain_mix(
    df: DataFrame, source_col: str, text_col: str, alpha: float = MIX_ALPHA
) -> DataFrame:
    """Per-domain token shares and temperature-smoothed sampling
    weights w_d = share_d^alpha / Σ share^alpha (the multilingual /
    multi-domain mixing rule; alpha < 1 upweights small domains).

    One corpus-wide aggregation to domain granularity (thousands of
    rows at worst), then window normalizations over that tiny frame.
    Double sums at domain granularity go through exact decimal casts so
    partition order can't perturb the normalizing constants."""
    per_domain = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(text_col).cast("long")).alias("tokens"),
    )
    everything = Window.partitionBy()
    share = F.col("tokens") / F.sum("tokens").over(everything)
    # round share^alpha to a fixed decimal BEFORE the normalizing sum:
    # exact decimal addition is order-free, so both engines compute the
    # identical normalizer regardless of aggregation order
    smoothed = F.round(F.pow(share, F.lit(alpha)), 12).cast(MIX_DEC)
    # divide as doubles: decimal÷decimal rounding rules differ between
    # engines, but decimal→double casts and double division do not
    weight = smoothed.cast("double") / F.sum(smoothed).over(everything).cast("double")
    return per_domain.select(
        F.col(source_col),
        "n_docs",
        "tokens",
        F.round(share, 9).alias("token_share"),
        F.round(weight, 9).alias("mix_weight"),
    )
