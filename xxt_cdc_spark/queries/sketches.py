"""Sketch-summary queries: mergeable HLL distinct-count rollup and
count-min frequency estimation, oracle-gated end to end.

Both queries exercise the MERGE algebra explicitly — the 'ALL' rollup
row is computed by merging per-group summaries (max for HLL registers,
sum for CM counters), never by rescanning the base table — because
that composition is what makes sketches the 100 TB answer: partial
summaries fold across partitions/days/tables at O(sketch) cost. The
kernels hash through the md5-prefix path (functions/sketches.py), so
DuckDB reproduces every register/counter bit and the driver's
value-hash gate covers the full estimator, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import sketches as SK

_ALPHA_LIT = repr(float(SK.alpha_mm(SK.HLL_P) * (1 << 60)))
CM_PROBE_MAX = 50


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


# --- HLL distinct customers per priority + merged rollup ---------------------
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per order priority, plus an 'ALL'
    row whose registers come from MERGING the five per-priority
    summaries (union + per-bucket max) — one scan of orders total.
    Output carries the exact NDV next to the estimate so the oracle
    hash also pins the accuracy snapshot."""
    orders = _orders(spark, sf_dir)
    reg = SK.hll_registers(orders, "o_custkey", ["o_orderpriority"])
    all_reg = SK.hll_merge(
        [reg.withColumn("o_orderpriority", F.lit("ALL"))], ["o_orderpriority"]
    )
    est = SK.hll_estimate(reg.unionByName(all_reg), ["o_orderpriority"])
    exact = (
        orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact_ndv"))
        .unionByName(
            orders.agg(
                F.lit("ALL").alias("o_orderpriority"),
                F.countDistinct("o_custkey").alias("exact_ndv"),
            )
        )
    )
    return (
        est.join(exact, "o_orderpriority")
        .select(F.col("o_orderpriority").alias("grp"), "ndv_est", "exact_ndv")
    )


_HLL_REG = """
h AS (
  SELECT o_orderpriority AS grp,
         CAST(('0x' || substring(md5('hll1|' || CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM orders),
reg0 AS (
  SELECT grp, h % 512 AS bucket,
         max(CASE WHEN (h >> 9) = 0 THEN 52
             ELSE bit_count((~(h >> 9)) & ((h >> 9) - 1)) + 1 END) AS rho
  FROM h GROUP BY 1, 2),
reg AS (
  SELECT * FROM reg0
  UNION ALL
  SELECT 'ALL' AS grp, bucket, max(rho) AS rho FROM reg0 GROUP BY 2, bucket)
"""

SKETCH_HLL_SQL = f"""
WITH {_HLL_REG},
acc AS (
  SELECT grp, count(*) AS npresent,
         sum(CAST((CAST(1 AS BIGINT) << (60 - rho)) AS HUGEINT)) AS s
  FROM reg GROUP BY 1),
fin AS (
  SELECT grp, (512 - npresent) AS zeros,
         CAST(s + CAST(512 - npresent AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT) AS DOUBLE) AS sd
  FROM acc),
e AS (
  SELECT grp,
         CASE WHEN zeros > 0 AND ({_ALPHA_LIT} / sd) <= 1280.0
              THEN 512.0 * ln(512.0 / zeros)
              ELSE {_ALPHA_LIT} / sd END AS est
  FROM fin),
exact AS (
  SELECT o_orderpriority AS grp, count(DISTINCT o_custkey) AS exact_ndv FROM orders GROUP BY 1
  UNION ALL
  SELECT 'ALL' AS grp, count(DISTINCT o_custkey) AS exact_ndv FROM orders)
SELECT e.grp AS grp, round(est, 6) AS ndv_est, CAST(exact_ndv AS BIGINT) AS exact_ndv
FROM e JOIN exact ON e.grp = exact.grp
ORDER BY e.grp
"""


# --- count-min frequency rollup ----------------------------------------------
def sketch_cm_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-count estimates from a count-min sketch built
    per order status and MERGED (cell-wise sum — the CM sketch is a
    linear projection, so partial sketches add exactly). Probes are a
    fixed customer slice; true counts ride along so the oracle hash
    pins the overestimate-only error profile."""
    orders = _orders(spark, sf_dir).withColumn(
        "o_custkey", F.col("o_custkey").cast("long")
    )
    # weighted construction (r12): the sketch is linear, so inserting
    # each (status, custkey)'s exact count once equals inserting every
    # raw order row — 4 md5s per DISTINCT pair instead of per row
    # (6M → 1.2M hash evaluations at sf0.1, −40%); the query pays a
    # per-key aggregation for its truth column anyway
    pre = orders.groupBy("o_orderstatus", "o_custkey").agg(
        F.count("*").alias("_wt")
    )
    per = SK.cm_counters_weighted(pre, "o_custkey", "_wt", ["o_orderstatus"])
    merged = SK.cm_merge([per.select("j", "i", "cnt")])
    probes = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") <= CM_PROBE_MAX)
        .select(F.col("c_custkey").cast("long").alias("custkey"))
    )
    est = SK.cm_estimate(merged, probes, "custkey")
    truth = orders.groupBy("o_custkey").agg(F.count("*").alias("true_cnt"))
    return (
        est.join(truth, est["custkey"] == truth["o_custkey"], "left")
        .select("custkey", "cm_est", F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"))
    )


SKETCH_CM_SQL = f"""
WITH keys AS (
  SELECT CAST(o_custkey AS BIGINT) AS k, o_orderstatus AS g FROM orders),
cells AS (
  SELECT g, j,
         CAST(('0x' || substring(md5('cm' || CAST(j AS VARCHAR) || '|' || coalesce(CAST(k AS VARCHAR), '__null__')), 1, 15)) AS BIGINT) % 256 AS i
  FROM keys, (SELECT unnest([0, 1, 2, 3]) AS j)),
per AS (SELECT g, j, i, count(*) AS cnt FROM cells GROUP BY 1, 2, 3),
merged AS (SELECT j, i, CAST(sum(cnt) AS BIGINT) AS cnt FROM per GROUP BY 1, 2),
probes AS (
  SELECT CAST(c_custkey AS BIGINT) AS custkey FROM customer WHERE c_custkey <= {CM_PROBE_MAX}),
pc AS (
  SELECT custkey, j,
         CAST(('0x' || substring(md5('cm' || CAST(j AS VARCHAR) || '|' || coalesce(CAST(custkey AS VARCHAR), '__null__')), 1, 15)) AS BIGINT) % 256 AS i
  FROM probes, (SELECT unnest([0, 1, 2, 3]) AS j)),
est AS (
  SELECT custkey, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS cm_est
  FROM pc LEFT JOIN merged USING (j, i) GROUP BY 1),
truth AS (SELECT CAST(o_custkey AS BIGINT) AS custkey, count(*) AS true_cnt FROM orders GROUP BY 1)
SELECT est.custkey, cm_est, CAST(coalesce(true_cnt, 0) AS BIGINT) AS true_cnt
FROM est LEFT JOIN truth USING (custkey)
ORDER BY custkey
"""


# --- sketch-pruned exact heavy hitters ---------------------------------------
HH_THRESHOLD = 16


def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥16 orders, computed EXACTLY through the
    CM-pruned plan (candidate superset from the sketch, exact count
    only over surviving rows — functions/sketches.py
    ``cm_heavy_hitters``). The oracle is a plain GROUP BY/HAVING:
    hash-matching it proves the sketch pruning is lossless, which is
    the whole point of the operator."""
    orders = _orders(spark, sf_dir).withColumn(
        "o_custkey", F.col("o_custkey").cast("long")
    )
    return (
        SK.cm_heavy_hitters(orders, "o_custkey", HH_THRESHOLD)
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey")
    )


SKETCH_HH_SQL = f"""
SELECT CAST(o_custkey AS BIGINT) AS custkey, count(*) AS n
FROM orders GROUP BY 1 HAVING count(*) >= {HH_THRESHOLD}
ORDER BY custkey
"""


# --- incremental HLL maintenance ---------------------------------------------
def sketch_incremental_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order status maintained INCREMENTALLY:
    orders replay in four key chunks, each batch's registers max-merged
    into a persistent bucket-pruned state table (IncrementalHLL), with
    the last chunk replayed once more to exercise the idempotent-merge
    exactly-once property. The oracle computes the one-shot register
    algebra in SQL — a hash-match proves four merges (plus a replay)
    land on exactly the from-scratch sketch and estimate."""
    import shutil
    import tempfile

    orders = _orders(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="hll_inc_q_")
    try:
        inc = SK.IncrementalHLL(spark, f"{tmp}/state", group_cols=["o_orderstatus"])
        chunks = [orders.filter(F.col("o_orderkey") % 4 == i) for i in range(4)]
        for c in chunks:
            inc.update(c, "o_custkey")
        inc.update(chunks[3], "o_custkey")  # foreachBatch crash-replay
        # eager checkpoint so the result survives the state-dir removal
        # (same posture as the sibling incremental queries)
        return (
            inc.estimate()
            .select(F.col("o_orderstatus").alias("grp"), "ndv_est")
            .orderBy("grp")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_HLL_STATUS_REG = """
h AS (
  SELECT o_orderstatus AS grp,
         CAST(('0x' || substring(md5('hll1|' || CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM orders),
reg AS (
  SELECT grp, h % 512 AS bucket,
         max(CASE WHEN (h >> 9) = 0 THEN 52
             ELSE bit_count((~(h >> 9)) & ((h >> 9) - 1)) + 1 END) AS rho
  FROM h GROUP BY 1, 2)
"""

SKETCH_INC_HLL_SQL = f"""
WITH {_HLL_STATUS_REG},
acc AS (
  SELECT grp, count(*) AS npresent,
         sum(CAST((CAST(1 AS BIGINT) << (60 - rho)) AS HUGEINT)) AS s
  FROM reg GROUP BY 1),
fin AS (
  SELECT grp, (512 - npresent) AS zeros,
         CAST(s + CAST(512 - npresent AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT) AS DOUBLE) AS sd
  FROM acc)
SELECT grp,
       round(CASE WHEN zeros > 0 AND ({_ALPHA_LIT} / sd) <= 1280.0
                  THEN 512.0 * ln(512.0 / zeros)
                  ELSE {_ALPHA_LIT} / sd END, 6) AS ndv_est
FROM fin
ORDER BY grp
"""


# --- mergeable quantile histogram --------------------------------------------
H_LO, H_HI, H_BINS = 0.0, 110_000.0, 256
H_QS = (0.5, 0.9, 0.99)
_H_W = (H_HI - H_LO) / H_BINS  # 429.6875, exact in binary


def sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price quantiles per return flag from a fixed-bin histogram
    sketch, plus an 'ALL' row whose bins come from MERGING the three
    per-flag histograms (per-bin sum — the summary is linear, like CM).
    Error ≤ one bin width on the value domain; the oracle reproduces
    bin math, cumulative ranks, and interpolation exactly, so the hash
    gates the full estimator."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cnt = SK.hist_counts(li, "l_extendedprice", H_LO, H_HI, H_BINS, ["l_returnflag"])
    all_cnt = SK.hist_merge(
        [cnt.withColumn("l_returnflag", F.lit("ALL"))], ["l_returnflag"]
    )
    both = cnt.unionByName(all_cnt)
    return (
        SK.hist_quantiles(both, H_QS, H_LO, H_HI, H_BINS, ["l_returnflag"])
        .select(F.col("l_returnflag").alias("grp"), "q", "est_q")
        .orderBy("grp", "q")
    )


SKETCH_QH_SQL = f"""
WITH b AS (
  SELECT l_returnflag AS grp,
         least({H_BINS - 1}, greatest(0, CAST(floor((l_extendedprice - {H_LO!r}) / {_H_W!r}) AS BIGINT))) AS bin
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
cnt0 AS (SELECT grp, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
cnt AS (
  SELECT * FROM cnt0
  UNION ALL
  SELECT 'ALL' AS grp, bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM cnt0 GROUP BY 2, bin),
c AS (
  SELECT grp, bin, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM cnt),
c2 AS (SELECT grp, bin, cnt, cum, cum - cnt AS prev FROM c),
n AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM cnt GROUP BY 1),
q AS (SELECT unnest([{", ".join(repr(q) for q in H_QS)}]) AS q)
SELECT grp, q,
       round({H_LO!r} + {_H_W!r} * (bin + (q * (n - 1) - prev) / cnt), 6) AS est_q
FROM c2 JOIN n USING (grp) CROSS JOIN q
WHERE prev <= q * (n - 1) AND q * (n - 1) < cum
ORDER BY grp, q
"""


QUERIES = {
    "sketch_hll_rollup": sketch_hll_rollup,
    "sketch_cm_heavy": sketch_cm_heavy,
    "sketch_heavy_hitters": sketch_heavy_hitters,
    "sketch_incremental_hll": sketch_incremental_hll,
    "sketch_quantile_hist": sketch_quantile_hist,
}

ORACLE = {
    "sketch_hll_rollup": SKETCH_HLL_SQL,
    "sketch_cm_heavy": SKETCH_CM_SQL,
    "sketch_heavy_hitters": SKETCH_HH_SQL,
    "sketch_incremental_hll": SKETCH_INC_HLL_SQL,
    "sketch_quantile_hist": SKETCH_QH_SQL,
}
