"""Text-analysis + deduplication queries over the documents corpus.

Covers the north-star operators: token counting, quality scoring,
language-ID, fingerprinting, exact dedup, n-gram Jaccard near-dup,
MinHash+LSH, SimHash. All Spark expressions are JVM built-ins; each
has an exact ANSI-SQL mirror (md5-based hashing is portable, double
arithmetic is order-fixed) so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import dedup as D
from xxt_cdc_spark.functions import text as TX

SHINGLE_N = 3
NUM_HASHES = 6
ROWS_PER_BAND = 2
JACCARD_T = 0.5
# candidate-generation document-frequency cut for the n-gram Jaccard
# query: shingles in more docs than this are stop-shingles whose
# self-join fanout grows quadratically with corpus scale (measured at
# sf1: 87% of pair-weight sits in DF>50 shingles; slope 11.1x for 10x
# data without the cap, see SCALING.md). At the oracle scale factors
# the max DF is 25 (sf0.1) / 7 (sf0.01), so the cap never binds there
# and results are byte-identical to the exact all-pairs form.
JACCARD_DF_CAP = 50
# LSH hot-bucket cut for dedup_minhash_lsh: band buckets larger than
# this are dropped before the candidate self-join (s²/2 pairs per
# bucket — measured at sf10, 71% of candidate pair-weight sat in
# DF>50 buckets, max bucket 635; slope 19x for 10x data without the
# cap). Max bucket at the oracle gate SFs is 3 (sf0.01) / 10 (sf0.1),
# so the cap provably never binds there.
LSH_BUCKET_CAP = 50
# same cut for the simhash half-key join branches (64-bit simhash →
# 32-bit half keys: random collisions are n²/2³² and negligible, but a
# replicated near-identical cluster makes its half-keys quadratic)
SIMHASH_BUCKET_CAP = 50
# 64-bit signatures (SCALING.md: 2^32 half-key buckets — the 32-bit
# half-keys saturated at ~2^16 buckets, too few for a huge corpus)
SIMHASH_BITS = 64
MAX_HAMMING = 4


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- token stats ----------------------------------------------------------
# BPE pre-tokenizer regex, SQL-escaped (used by the profile oracle)
_BPE_RE_SQL = TX.BPE_SPLIT_RE.replace("'", "''")


# --- language-ID marker fragments (used by the profile oracle) ---------------
def _marker_count_sql(words: tuple[str, ...]) -> str:
    if not words:
        return "0"
    arr = ", ".join(f"'{w}'" for w in words)
    return f"len([t for t in w if t IN ({arr})])"


_c = {lang: _marker_count_sql(words) for lang, words in TX.LANG_MARKERS.items()}
# --- rolling-hash fingerprint + content-defined chunking ---------------------
CDC_CHUNK_W = 16
CDC_CHUNK_DIV = 64


def text_rolling_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp document fingerprint + content-defined chunk count
    per doc (boundary where the 16-char window hash ≡ 0 mod 64) — the
    dedup-friendly chunking a 100 TB ingest pipeline applies before
    block-level dedup."""
    d = _docs(spark, sf_dir)
    d2 = d.select(
        "doc_id", F.length("text").alias("n_chars"), TX.char_codes("text").alias("cs")
    )
    return d2.select(
        "doc_id",
        "n_chars",
        (TX.chunk_boundary_count("cs", CDC_CHUNK_W, CDC_CHUNK_DIV) + F.lit(1)).alias("n_chunks"),
        TX.rolling_hash_expr("cs").alias("doc_hash"),
    ).orderBy("doc_id")


ROLLING_CHUNKS_SQL = f"""
WITH cs AS (
  SELECT doc_id, length(text) AS n_chars,
         [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')] AS cs
  FROM documents
)
SELECT doc_id, n_chars,
  1 + len([i for i in range({CDC_CHUNK_W}, len(cs) + 1)
           if list_reduce(list_slice(cs, i - {CDC_CHUNK_W - 1}, i),
                          (acc, c) -> (acc * {TX.ROLL_BASE} + c) % {TX.ROLL_MOD})
              % {CDC_CHUNK_DIV} = 0]) AS n_chunks,
  list_reduce(cs, (acc, c) -> (acc * {TX.ROLL_BASE} + c) % {TX.ROLL_MOD}) AS doc_hash
FROM cs ORDER BY doc_id
"""


# --- exact dedup ------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return D.exact_dedup(d, "text", "doc_id", bow=True).orderBy("doc_id")


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id,
       md5(array_to_string(list_sort(string_split_regex(trim(text), '\\s+')), ' ')) AS fp,
       count(*) AS dup_count
FROM documents GROUP BY 2 ORDER BY doc_id
"""


# --- incremental cross-batch exact dedup ------------------------------------
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch dedup against the persistent fingerprint store
    (IncrementalDeduper): documents arrive in two batches (even ids
    first), and batch 2 must reject content already accepted in batch 1.
    Returns batch 2's accepted (doc_id, fp) rows — checkpoint-backed,
    so the temp state dir can be dropped before the driver collects."""
    import shutil
    import tempfile

    d = _docs(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="xxt_incr_dedup_")
    try:
        dd = D.IncrementalDeduper(spark, state)
        dd.process(d.filter(F.col("doc_id") % 2 == 0))
        accepted = dd.process(d.filter(F.col("doc_id") % 2 == 1))
        return accepted.orderBy("doc_id")
    finally:
        shutil.rmtree(state, ignore_errors=True)


# mirror of functions/text.fingerprint(): DuckDB regexp_replace needs
# the 'g' flag (Spark replaces all matches by default)
DEDUP_INCREMENTAL_SQL = """
WITH fp AS (
  SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
  FROM documents
),
b1 AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
local AS (SELECT fp, min(doc_id) AS doc_id FROM fp WHERE doc_id % 2 = 1 GROUP BY fp)
SELECT doc_id, fp FROM local
WHERE fp NOT IN (SELECT fp FROM b1)
ORDER BY doc_id
"""


# --- n-gram Jaccard near-dup ---------------------------------------------------------
_SHINGLES_SQL = f"""
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= {SHINGLE_N}
         THEN [array_to_string(w[i:i+{SHINGLE_N - 1}], ' ') for i in range(1, len(w) - {SHINGLE_N - 2})]
         ELSE [] END)) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return D.jaccard_pairs(
        d, "text", "doc_id", SHINGLE_N, JACCARD_T, df_cap=JACCARD_DF_CAP
    )


# the oracle mirrors the stop-shingle semantics exactly: shingles with
# DF > cap are dropped from both the pair join and the size
# denominators — both engines drop the same shingles, so results are
# identical by construction (and the cap provably never binds at the
# oracle scale factors: max DF 25 at sf0.1, 7 at sf0.01)
JACCARD_SQL = f"""
WITH {_SHINGLES_SQL},
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {JACCARD_DF_CAP}),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
rsizes AS (SELECT doc_id, count(*) AS n FROM shr GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i, j, CAST(shared AS DOUBLE) / (na.n + nb.n - shared) AS jaccard
FROM pairs JOIN rsizes na ON na.doc_id = i JOIN rsizes nb ON nb.doc_id = j
WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= {JACCARD_T}
ORDER BY i, j
"""


# --- MinHash + LSH ---------------------------------------------------------------------
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return D.minhash_dedup_pairs(
        d, "text", "doc_id", NUM_HASHES, ROWS_PER_BAND, SHINGLE_N, JACCARD_T,
        bucket_cap=LSH_BUCKET_CAP,
    )


_sig_cols = ", ".join(
    f"min(md5('s{s}:' || shingle)) AS h{s}" for s in range(NUM_HASHES)
)
_band_selects = "\nUNION ALL\n".join(
    f"SELECT doc_id, {bi} AS band_index, h{bi * ROWS_PER_BAND} || '|' || h{bi * ROWS_PER_BAND + 1} AS band_key FROM sig"
    for bi in range(NUM_HASHES // ROWS_PER_BAND)
)
MINHASH_SQL = f"""
WITH {_SHINGLES_SQL},
sig AS (SELECT doc_id, {_sig_cols} FROM sh GROUP BY doc_id),
bands0 AS ({_band_selects}),
okb AS (
  SELECT band_index, band_key FROM bands0
  GROUP BY 1, 2 HAVING count(*) <= {LSH_BUCKET_CAP}
),
bands AS (SELECT bands0.* FROM bands0 JOIN okb USING (band_index, band_key)),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM bands a JOIN bands b ON a.band_index = b.band_index AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
shared AS (
  SELECT c.i, c.j, count(*) AS shared
  FROM cand c JOIN sh a ON a.doc_id = c.i JOIN sh b ON b.doc_id = c.j AND a.shingle = b.shingle
  GROUP BY 1, 2
)
SELECT i, j, CAST(shared AS DOUBLE) / (na.n + nb.n - shared) AS jaccard
FROM shared JOIN sizes na ON na.doc_id = i JOIN sizes nb ON nb.doc_id = j
WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= {JACCARD_T}
ORDER BY i, j
"""


# --- incremental cross-batch NEAR-dup ----------------------------------------
def dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch near-dup rejection via the persistent MinHash band
    store (IncrementalNearDeduper): documents arrive in two batches
    (even ids first); batch 2 must drop near-copies of anything batch 1
    accepted. Returns batch 2's accepted ids."""
    import shutil
    import tempfile

    d = _docs(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="xxt_incr_near_")
    try:
        nd = D.IncrementalNearDeduper(
            spark, state, num_hashes=NUM_HASHES, rows_per_band=ROWS_PER_BAND,
            n=SHINGLE_N, threshold=JACCARD_T,
        )
        nd.process(d.filter(F.col("doc_id") % 2 == 0))
        accepted = nd.process(d.filter(F.col("doc_id") % 2 == 1))
        return accepted.orderBy("doc_id")
    finally:
        shutil.rmtree(state, ignore_errors=True)


def _batch_bands(src: str) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT doc_id, {bi} AS band_index, "
        f"h{bi * ROWS_PER_BAND} || '|' || h{bi * ROWS_PER_BAND + 1} AS band_key FROM {src}"
        for bi in range(NUM_HASHES // ROWS_PER_BAND)
    )


def _est_sql(a: str, b: str) -> str:
    agree = " + ".join(
        f"CASE WHEN {a}.h{s} = {b}.h{s} THEN 1 ELSE 0 END" for s in range(NUM_HASHES)
    )
    return f"({agree}) / {NUM_HASHES}.0"


# full mirror of IncrementalNearDeduper over the two-batch delivery:
# per-batch signature-estimated edges + transitive closure (recursive
# CTE, same pattern as CLUSTERS_SQL) for the internal collapse, then
# band-join + estimate against batch-1's accepted owners
DEDUP_INCREMENTAL_NEAR_SQL = f"""
WITH RECURSIVE {_SHINGLES_SQL},
sig AS (SELECT doc_id, {_sig_cols} FROM sh GROUP BY doc_id),
b1 AS (SELECT * FROM sig WHERE doc_id % 2 = 0),
b2 AS (SELECT * FROM sig WHERE doc_id % 2 = 1),
b1bands AS ({_batch_bands('b1')}),
b2bands AS ({_batch_bands('b2')}),
b1edges AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM b1bands a
  JOIN b1bands b ON a.band_index = b.band_index AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
  JOIN b1 sa ON sa.doc_id = a.doc_id
  JOIN b1 sb ON sb.doc_id = b.doc_id
  WHERE {_est_sql('sa', 'sb')} >= {JACCARD_T}
),
b1sym AS (SELECT i AS a, j AS b FROM b1edges UNION SELECT j, i FROM b1edges),
b1reach AS (
  SELECT doc_id AS id, doc_id AS r FROM b1
  UNION
  SELECT s.a, b1reach.r FROM b1sym s JOIN b1reach ON s.b = b1reach.id
),
b1surv AS (SELECT DISTINCT MIN(r) OVER (PARTITION BY id) AS doc_id FROM b1reach),
b2edges AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
  FROM b2bands a
  JOIN b2bands b ON a.band_index = b.band_index AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
  JOIN b2 sa ON sa.doc_id = a.doc_id
  JOIN b2 sb ON sb.doc_id = b.doc_id
  WHERE {_est_sql('sa', 'sb')} >= {JACCARD_T}
),
b2sym AS (SELECT i AS a, j AS b FROM b2edges UNION SELECT j, i FROM b2edges),
b2reach AS (
  SELECT doc_id AS id, doc_id AS r FROM b2
  UNION
  SELECT s.a, b2reach.r FROM b2sym s JOIN b2reach ON s.b = b2reach.id
),
b2surv AS (SELECT DISTINCT MIN(r) OVER (PARTITION BY id) AS doc_id FROM b2reach),
matches AS (
  SELECT DISTINCT sb2.doc_id
  FROM b2bands sb2
  JOIN b2surv s ON s.doc_id = sb2.doc_id
  JOIN b1bands ob ON ob.band_index = sb2.band_index AND ob.band_key = sb2.band_key
  JOIN b1surv os ON os.doc_id = ob.doc_id
  JOIN b2 q ON q.doc_id = sb2.doc_id
  JOIN b1 o ON o.doc_id = ob.doc_id
  WHERE {_est_sql('q', 'o')} >= {JACCARD_T} AND ob.doc_id <> sb2.doc_id
)
SELECT doc_id FROM b2surv
WHERE doc_id NOT IN (SELECT doc_id FROM matches)
ORDER BY doc_id
"""


# --- SimHash ------------------------------------------------------------------------------
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return D.simhash_pairs(
        d, "text", "doc_id", SIMHASH_BITS, MAX_HAMMING, bucket_cap=SIMHASH_BUCKET_CAP
    )


_votes_sql = ", ".join(
    "list_sum([CASE WHEN substr(md5(t), {d}, 1) IN {s} "
    "THEN 1 ELSE -1 END for t in w]) AS v{b}".format(
        d=D.simhash_bit_predicate(b, SIMHASH_BITS)[0],
        s=D.simhash_bit_predicate(b, SIMHASH_BITS)[1],
        b=b,
    )
    for b in range(SIMHASH_BITS)
)
_sig_sql = " || ".join(
    f"CASE WHEN v{b} > 0 THEN '1' ELSE '0' END" for b in range(SIMHASH_BITS)
)
_half = SIMHASH_BITS // 2
_hamming_sql = " + ".join(
    f"CASE WHEN substr(sig_i, {b + 1}, 1) <> substr(sig_j, {b + 1}, 1) THEN 1 ELSE 0 END"
    for b in range(SIMHASH_BITS)
)
SIMHASH_SQL = f"""
WITH votes AS (
  SELECT doc_id, {_votes_sql}
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
),
sig AS (SELECT doc_id, {_sig_sql} AS simhash FROM votes),
fh_ok AS (
  SELECT substr(simhash, 1, {_half}) AS k FROM sig
  GROUP BY 1 HAVING count(*) <= {SIMHASH_BUCKET_CAP}
),
sh_ok AS (
  SELECT substr(simhash, {_half + 1}, {_half}) AS k FROM sig
  GROUP BY 1 HAVING count(*) <= {SIMHASH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j, a.simhash AS sig_i, b.simhash AS sig_j
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE (substr(a.simhash, 1, {_half}) = substr(b.simhash, 1, {_half})
         AND substr(a.simhash, 1, {_half}) IN (SELECT k FROM fh_ok))
     OR (substr(a.simhash, {_half + 1}, {_half}) = substr(b.simhash, {_half + 1}, {_half})
         AND substr(a.simhash, {_half + 1}, {_half}) IN (SELECT k FROM sh_ok)
         AND substr(a.simhash, 1, {_half}) <> substr(b.simhash, 1, {_half}))
)
SELECT i, j, {_hamming_sql} AS hamming
FROM cand
WHERE {_hamming_sql} <= {MAX_HAMMING}
ORDER BY i, j
"""


# --- incremental cross-batch SimHash near-dup --------------------------------
def dedup_incremental_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch SimHash near-dup rejection via the persistent
    block-key store (IncrementalSimHashDeduper): even-id docs arrive
    first; odd-id docs within MAX_HAMMING of anything accepted must be
    dropped. The oracle mirrors the SEMANTICS with brute-force
    all-pairs hamming — the (max_hamming+1)-block candidate join is
    pigeonhole-lossless, so the two must agree exactly (this oracle
    would catch a lossy candidate filter, unlike a mechanism mirror)."""
    import shutil
    import tempfile

    d = _docs(spark, sf_dir)
    state = tempfile.mkdtemp(prefix="xxt_incr_simhash_")
    try:
        dd = D.IncrementalSimHashDeduper(
            spark, state, bits=SIMHASH_BITS, max_hamming=MAX_HAMMING
        )
        dd.process(d.filter(F.col("doc_id") % 2 == 0))
        return dd.process(d.filter(F.col("doc_id") % 2 == 1)).orderBy("doc_id")
    finally:
        shutil.rmtree(state, ignore_errors=True)


def _closure_sql(src: str) -> str:
    """Recursive-CTE connected-components collapse of one batch under
    brute-force hamming ≤ MAX_HAMMING edges; yields <src>surv."""
    return f"""
{src}edges AS (
  SELECT a.doc_id AS i, b.doc_id AS j FROM {src} a JOIN {src} b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig::BIT, b.sig::BIT)) <= {MAX_HAMMING}
),
{src}sym AS (SELECT i AS a, j AS b FROM {src}edges UNION SELECT j, i FROM {src}edges),
{src}reach AS (
  SELECT doc_id AS id, doc_id AS r FROM {src}
  UNION
  SELECT s.a, {src}reach.r FROM {src}sym s JOIN {src}reach ON s.b = {src}reach.id
),
{src}surv AS (SELECT id AS doc_id FROM {src}reach GROUP BY id HAVING id = MIN(r))"""


DEDUP_INCREMENTAL_SIMHASH_SQL = f"""
WITH RECURSIVE votes AS (
  SELECT doc_id, {_votes_sql}
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
),
sig AS (SELECT doc_id, {_sig_sql} AS sig FROM votes),
b1 AS (SELECT * FROM sig WHERE doc_id % 2 = 0),
b2 AS (SELECT * FROM sig WHERE doc_id % 2 = 1),
{_closure_sql('b1')},
{_closure_sql('b2')},
matches AS (
  SELECT DISTINCT q.doc_id
  FROM b2 q
  JOIN b2surv s2 ON s2.doc_id = q.doc_id
  JOIN b1 o ON bit_count(xor(q.sig::BIT, o.sig::BIT)) <= {MAX_HAMMING}
  JOIN b1surv s1 ON s1.doc_id = o.doc_id
)
SELECT doc_id FROM b2surv
WHERE doc_id NOT IN (SELECT doc_id FROM matches)
ORDER BY doc_id
"""


# --- transitive dedup closure (connected components) ------------------------
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return D.dedup_clusters(d, "text", "doc_id", SHINGLE_N, JACCARD_T)


CLUSTERS_SQL = f"""
WITH RECURSIVE {_SHINGLES_SQL},
pairs AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT i, j FROM pairs JOIN sizes na ON na.doc_id = i JOIN sizes nb ON nb.doc_id = j
  WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= {JACCARD_T}
),
sym AS (SELECT i AS a, j AS b FROM edges UNION SELECT j, i FROM edges),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM documents
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster, (id = MIN(r)) AS is_representative
FROM reach GROUP BY id ORDER BY doc_id
"""


# --- end-to-end training-data curation -----------------------------------
def training_data_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline in one plan: near-dup cluster
    representatives ∩ quality gate ∩ language allowlist — what a 100 TB
    pretraining-data job runs per shard. Composes dedup_clusters,
    quality_score and the labeled language column."""
    d = _docs(spark, sf_dir)
    reps = D.dedup_clusters(d, "text", "doc_id", SHINGLE_N, JACCARD_T).filter(
        F.col("is_representative")
    )
    scored = d.select(
        "doc_id", "lang", TX.quality_score("text").alias("quality"), F.length("text").alias("len_chars")
    )
    return (
        scored.join(reps.select("doc_id"), "doc_id")
        .filter(F.col("quality") >= 0.5)
        .filter(F.col("lang").isin("en", "de", "es"))
    )


_QUALITY_EXPR = """
  0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
  + 0.3 * (CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
           / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE))
  + 0.2 * (1.0 - CAST(len([t for t in string_split_regex(trim(text), '\\s+')
                           if t IN ('the','a','of','and','to','in')]) AS DOUBLE)
                 / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE))
"""

TRAINING_SELECTION_SQL = f"""
WITH RECURSIVE {_SHINGLES_SQL},
pairs AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT i, j FROM pairs JOIN sizes na ON na.doc_id = i JOIN sizes nb ON nb.doc_id = j
  WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= {JACCARD_T}
),
sym AS (SELECT i AS a, j AS b FROM edges UNION SELECT j, i FROM edges),
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM documents
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id
),
reps AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING id = MIN(r))
SELECT d.doc_id, d.lang, {_QUALITY_EXPR} AS quality, length(text) AS len_chars
FROM documents d JOIN reps USING (doc_id)
WHERE {_QUALITY_EXPR} >= 0.5 AND d.lang IN ('en', 'de', 'es')
ORDER BY d.doc_id
"""


# --- folded families (registry-cap consolidation, r4) ------------------------
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole doc-grain analysis surface in ONE corpus pass: token
    stats (whitespace + distinct + stopword), BPE subword counts,
    quality score, n-gram language ID, and both fingerprints. Folds the
    former text_token_stats / text_bpe_token_stats / text_quality /
    text_langid / text_fingerprint registry entries — every operator is
    still oracle-gated, and the single-pass form is also the shape a
    100 TB curation job wants (one scan, all per-doc columns)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.token_count("text").alias("n_tokens"),
        TX.distinct_token_count("text").alias("n_distinct"),
        F.length("text").alias("len_chars"),
        TX.stopword_count("text").alias("n_stop"),
        TX.bpe_token_count("text").alias("n_bpe_tokens"),
        (
            TX.bpe_token_count("text").cast("double")
            / TX.token_count("text").cast("double")
        ).alias("bpe_per_word"),
        TX.quality_score("text").alias("quality"),
        TX.predict_lang("text").alias("predicted_lang"),
        TX.fingerprint("text").alias("fp"),
        TX.bow_fingerprint("text").alias("bow_fp"),
    )


TEXT_PROFILE_SQL = f"""
WITH w AS (
  SELECT doc_id, lang, text, string_split_regex(trim(text), '\\s+') AS w
  FROM documents
),
m AS (
  SELECT doc_id, lang, text, w,
         {_c['en']} AS c_en, {_c['de']} AS c_de, {_c['es']} AS c_es, {_c['fr']} AS c_fr
  FROM w
)
SELECT doc_id, lang AS labeled_lang,
  len(w) AS n_tokens,
  len(list_distinct(w)) AS n_distinct,
  length(text) AS len_chars,
  len([t for t in w if t IN ('the','a','of','and','to','in')]) AS n_stop,
  len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS DOUBLE) / len(w) AS bpe_per_word,
  0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
  + 0.3 * (CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE))
  + 0.2 * (1.0 - CAST(len([t for t in w if t IN ('the','a','of','and','to','in')]) AS DOUBLE)
                 / CAST(len(w) AS DOUBLE)) AS quality,
  CASE
    WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en > 0 THEN 'en'
    WHEN c_de >= c_es AND c_de >= c_fr AND c_de > 0 THEN 'de'
    WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
    WHEN c_fr > 0 THEN 'fr'
    ELSE 'unknown'
  END AS predicted_lang,
  md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
  md5(array_to_string(list_sort(w), ' ')) AS bow_fp
FROM m ORDER BY doc_id
"""


def dedup_incremental_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three persistent-store incremental dedup operators
    (exact-fingerprint, MinHash-band near-dup, SimHash block near-dup)
    run over the same two-batch arrival, unioned with a ``method``
    discriminator. Folds the former dedup_incremental /
    dedup_incremental_near / dedup_incremental_simhash entries; each
    store's accept set is still independently oracle-gated because the
    method column keys the hash."""
    exact = dedup_incremental(spark, sf_dir).select(
        F.lit("exact").alias("method"), "doc_id"
    )
    near = dedup_incremental_near(spark, sf_dir).select(
        F.lit("near").alias("method"), "doc_id"
    )
    sim = dedup_incremental_simhash(spark, sf_dir).select(
        F.lit("simhash").alias("method"), "doc_id"
    )
    return exact.unionByName(near).unionByName(sim).orderBy("method", "doc_id")


DEDUP_INCREMENTAL_FAMILY_SQL = f"""
SELECT method, doc_id FROM (
  SELECT 'exact' AS method, doc_id FROM ({DEDUP_INCREMENTAL_SQL})
  UNION ALL
  SELECT 'near' AS method, doc_id FROM ({DEDUP_INCREMENTAL_NEAR_SQL})
  UNION ALL
  SELECT 'simhash' AS method, doc_id FROM ({DEDUP_INCREMENTAL_SIMHASH_SQL})
)
ORDER BY method, doc_id
"""


# --- fuzzy (edit-distance) join ----------------------------------------------
FUZZY_MAX_DIST = 2


def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join (operators/fuzzy_join.py): every
    part name matched against a deterministically perturbed name set
    (one substituted or deleted character — the PII-planting pattern:
    the corpus has no natural near-identical names, so the match set is
    planted IDENTICALLY in both engines). The Spark side runs the
    lossless PassJoin segment blocking + threshold-levenshtein verify;
    the oracle brute-forces the cross join — equal output proves the
    blocking dropped no true pair."""
    from xxt_cdc_spark.operators.fuzzy_join import edit_distance_join

    # entity RECORDS, not bare names: p_name is ~10 chars from a tiny
    # vocabulary, so its distance-2 neighborhood is dense (thousands of
    # true pairs per name — a degenerate workload where no exact
    # blocking can beat the output size). Real entity resolution joins
    # composite records; the ~40-char name|brand|type|size record
    # gives the planted perturbations sparse, meaningful neighborhoods
    # and the q-gram count bound real pruning power.
    rec = "concat(p_name, '|', p_brand, '|', p_type, '|', cast(p_size as string))"
    part = spark.read.parquet(f"{sf_dir}/part.parquet").withColumn("rec", F.expr(rec))
    pert = part.filter(F.col("p_partkey") % 5 == 0).select(
        F.col("p_partkey").alias("b_key"),
        F.when(
            F.col("p_partkey") % 10 == 0,
            F.expr("concat(substring(rec, 1, 2), substring(rec, 4))"),
        )
        .otherwise(F.expr("concat(substring(rec, 1, 4), '#', substring(rec, 6))"))
        .alias("b_rec"),
    )
    pairs = edit_distance_join(
        part, pert, "p_partkey", "b_key", "rec", "b_rec", FUZZY_MAX_DIST
    )
    return pairs.select(
        F.col("l_key").alias("a_key"),
        F.col("r_key").alias("b_key"),
        F.col("dist").cast("long").alias("dist"),
    )


FUZZY_JOIN_SQL = f"""
WITH recs AS (
  SELECT p_partkey, p_name || '|' || p_brand || '|' || p_type || '|' || CAST(p_size AS VARCHAR) AS rec
  FROM part
),
pert AS (
  SELECT p_partkey AS b_key,
         CASE WHEN p_partkey % 10 = 0 THEN substr(rec, 1, 2) || substr(rec, 4)
              ELSE substr(rec, 1, 4) || '#' || substr(rec, 6) END AS b_rec
  FROM recs WHERE p_partkey % 5 = 0
)
SELECT a.p_partkey AS a_key, p.b_key AS b_key,
       CAST(levenshtein(a.rec, p.b_rec) AS BIGINT) AS dist
FROM recs a, pert p
WHERE abs(length(a.rec) - length(p.b_rec)) <= {FUZZY_MAX_DIST}
  AND levenshtein(a.rec, p.b_rec) <= {FUZZY_MAX_DIST}
ORDER BY a_key, b_key
"""


# --- semantic (embedding-cluster) dedup --------------------------------------
# 0.38 drops ~4% of the sf0.01 corpus (21/500) — a realistic SemDeDup
# rate on this synthetic embedding space (0.45 drops only 4)
SEMDEDUP_T = 0.38
SEMDEDUP_CENTROIDS = 16


def dedup_semantic_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup in BOTH execution modes under one oracle rule (r8 —
    replaces the batch-only dedup_semantic entry; same greedy min-id
    sweep within deterministic fixed-seed clusters):

    - ``batch``: functions/similarity.py::semantic_dedup (fold
      strategy — ordered JVM cosine, bit-identical to the DuckDB
      list-fold; the vectorized BLAS twin stays pytest-gated against
      it). Cluster labels are the seed vec_ids.
    - ``incremental``: IncrementalSemDedup — the corpus arrives in
      three id-ordered chunks folded into a persistent
      centroid-bucketed store (chunk 0 replayed: the keyed LWW merge
      must be a no-op), centroids pinned from chunk 0's lowest ids.
      Cluster labels are the pinned 0-based centroid indexes.

    Because the keep/drop rule keys on id (not arrival), the
    incremental mode's flags are BIT-EQUAL to the batch sweep of the
    full corpus — this query gates that equivalence in the driver's
    value hash: the oracle replays the SAME SQL rule for both modes,
    differing only in each mode's native cluster labeling."""
    import shutil
    import tempfile

    from xxt_cdc_spark.functions import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch = (
        S.semantic_dedup(emb, SEMDEDUP_T, n_centroids=SEMDEDUP_CENTROIDS, strategy="fold")
        .select(F.lit("batch").alias("mode"), "vec_id", "centroid", "kept")
    )
    state = tempfile.mkdtemp(prefix="xxt_incr_semdd_")
    try:
        idx = S.IncrementalSemDedup(
            spark, state, threshold=SEMDEDUP_T, n_centroids=SEMDEDUP_CENTROIDS
        )
        # Tertile cuts from the ORDERED id distribution, not max-id
        # arithmetic (r8 ADVICE): a sparse or high-offset id space
        # still yields three ~equal chunks, so chunk 0 always carries
        # enough rows to pin the same lowest-16 centroids the batch
        # sweep uses (IncrementalSemDedup.init now also raises on a
        # short seed). Exact percentile here; at corpus scale the
        # engine-side chunker would use approx_percentile.
        b = emb.agg(
            F.min("vec_id").alias("lo"),
            F.expr("percentile(vec_id, array(1.0D/3, 2.0D/3))").alias("p"),
            F.max("vec_id").alias("hi"),
        ).first()
        cuts = [b["lo"], int(b["p"][0]) + 1, int(b["p"][1]) + 1, b["hi"] + 1]
        idx.init(emb.filter(F.col("vec_id") < cuts[1]))
        for k in (0, 1, 2, 0):  # chunk 0 twice: replay must be a no-op
            lo, hi = cuts[k], cuts[k + 1]
            idx.update(
                emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), chunk_id=k
            )
        inc = idx.state().select(
            F.lit("incremental").alias("mode"), "vec_id", "centroid", "kept"
        )
        return (
            batch.unionByName(inc)
            .orderBy("mode", "vec_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)


def _semdedup_sql() -> str:
    # the cosine SQL mirror lives with the ANN oracles; reuse it so the
    # fold-vs-list determinism argument has a single source of truth
    from xxt_cdc_spark.queries.vector import _cos_sql

    return f"""
WITH seeds AS (
  SELECT vec_id AS centroid, embedding AS cvec
  FROM embeddings ORDER BY vec_id LIMIT {SEMDEDUP_CENTROIDS}
),
assigned AS (
  SELECT item_id, cv, centroid FROM (
    SELECT c.vec_id AS item_id, c.embedding AS cv, s.centroid,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
                              ORDER BY {_cos_sql('c.embedding', 's.cvec')} DESC, s.centroid) AS arank
    FROM embeddings c CROSS JOIN seeds s
  ) WHERE arank = 1
),
dups AS (
  SELECT DISTINCT b.item_id
  FROM assigned a JOIN assigned b ON a.centroid = b.centroid AND a.item_id < b.item_id
  WHERE {_cos_sql('a.cv', 'b.cv')} >= {SEMDEDUP_T}
),
-- incremental mode: SAME rule, cluster labels are the pinned 0-based
-- centroid indexes (monotone renumbering of the seed ids, so the
-- assignment tie-break is unchanged)
iseeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid, embedding AS cvec
  FROM embeddings ORDER BY vec_id LIMIT {SEMDEDUP_CENTROIDS}
),
iassigned AS (
  SELECT item_id, cv, centroid FROM (
    SELECT c.vec_id AS item_id, c.embedding AS cv, s.centroid,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
                              ORDER BY {_cos_sql('c.embedding', 's.cvec')} DESC, s.centroid) AS arank
    FROM embeddings c CROSS JOIN iseeds s
  ) WHERE arank = 1
),
idups AS (
  SELECT DISTINCT b.item_id
  FROM iassigned a JOIN iassigned b ON a.centroid = b.centroid AND a.item_id < b.item_id
  WHERE {_cos_sql('a.cv', 'b.cv')} >= {SEMDEDUP_T}
)
SELECT * FROM (
  SELECT 'batch' AS mode, a.item_id AS vec_id, CAST(a.centroid AS BIGINT) AS centroid,
         CAST(CASE WHEN d.item_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
  FROM assigned a LEFT JOIN dups d ON d.item_id = a.item_id
  UNION ALL
  SELECT 'incremental' AS mode, a.item_id AS vec_id, CAST(a.centroid AS BIGINT) AS centroid,
         CAST(CASE WHEN d.item_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
  FROM iassigned a LEFT JOIN idups d ON d.item_id = a.item_id
)
ORDER BY mode, vec_id
"""


QUERIES = {
    "dedup_semantic_family": dedup_semantic_family,
    "text_profile": text_profile,
    "fuzzy_join_part_names": fuzzy_join_part_names,
    "dedup_incremental_family": dedup_incremental_family,
    "training_data_selection": training_data_selection,
    "dedup_clusters": dedup_clusters_q,
    "text_rolling_chunks": text_rolling_chunks,
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
}

ORACLE = {
    "dedup_semantic_family": _semdedup_sql(),
    "text_profile": TEXT_PROFILE_SQL,
    "fuzzy_join_part_names": FUZZY_JOIN_SQL,
    "dedup_incremental_family": DEDUP_INCREMENTAL_FAMILY_SQL,
    "training_data_selection": TRAINING_SELECTION_SQL,
    "dedup_clusters": CLUSTERS_SQL,
    "text_rolling_chunks": ROLLING_CHUNKS_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": JACCARD_SQL,
    "dedup_minhash_lsh": MINHASH_SQL,
    "dedup_simhash": SIMHASH_SQL,
}
