"""Incremental sketch-store queries.

A separate module (not queries/sketches.py) ONLY for sweep-rotation
placement: group B sits at the driver's 50-query cap, so new sketch
rows join group A (see queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import sketches as SK
from xxt_cdc_spark.queries.sketches import CM_PROBE_MAX, SKETCH_CM_SQL
from xxt_cdc_spark.session import load_tables


def sketch_incremental_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persistent count-min store (functions/sketches.IncrementalCM)
    built INCREMENTALLY: orders arrive in three interleaved chunks plus
    one full replay of chunk 1 (CM's sum-merge is NOT naturally
    idempotent — this exercises the versioned-dir + commit-marker
    protocol), then the committed counter table serves the same probe
    estimates as the one-shot sketch. The oracle is the one-shot CM in
    SQL — hash equality proves chunked maintenance ≡ from-scratch,
    because the ungrouped cells are exactly the status-merged cells of
    the one-shot build (the sketch is a linear projection)."""
    import shutil
    import tempfile

    tables = load_tables(spark, sf_dir, ["orders", "customer"])
    orders = tables["orders"].withColumn("o_custkey", F.col("o_custkey").cast("long"))
    root = tempfile.mkdtemp(prefix="xxt_incr_cm_")
    try:
        inc = SK.IncrementalCM(spark, root, "o_custkey")
        for i in range(3):
            inc.update(orders.filter(F.col("o_orderkey") % 3 == i), i)
            if i == 1:
                inc.update(orders.filter(F.col("o_orderkey") % 3 == 1), 1)  # replay
        merged = inc.counters()
        probes = (
            tables["customer"]
            .filter(F.col("c_custkey") <= CM_PROBE_MAX)
            .select(F.col("c_custkey").cast("long").alias("custkey"))
        )
        est = SK.cm_estimate(merged, probes, "custkey")
        truth = orders.groupBy("o_custkey").agg(F.count("*").alias("true_cnt"))
        out = (
            est.join(truth, est["custkey"] == truth["o_custkey"], "left")
            .select(
                "custkey", "cm_est", F.coalesce("true_cnt", F.lit(0)).alias("true_cnt")
            )
            .orderBy("custkey")
        )
        return out.localCheckpoint(eager=True)  # survive the state cleanup
    finally:
        shutil.rmtree(root, ignore_errors=True)


DECAY_HL_S = 86_400  # daily half-life
DECAY_CAP = 30
DECAY_TOPK = 20


def stream_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted heavy hitters ("trending now"): per-user event
    counts decayed with a daily half-life (functions/sketches.py
    ``decayed_counts`` — exact integer weights 2^(cap−age) summed in
    decimal, so the score is order-free and engine-exact), top 20 by
    decayed score with deterministic ties."""
    from pyspark.sql import Window

    from xxt_cdc_spark.queries.streaming import _events

    ev = _events(spark, sf_dir).select("user_id", "ts")
    scores = SK.decayed_counts(ev, "user_id", "ts", DECAY_HL_S, cap=DECAY_CAP)
    w = Window.orderBy(F.col("decayed_count").desc(), "user_id")
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= DECAY_TOPK)
        .select("rank", "user_id", F.round("decayed_count", 6).alias("score"))
        .orderBy("rank")
    )


DECAYED_TOPK_SQL = f"""
WITH b AS (
  SELECT user_id,
         CAST(epoch_us(ts) // {DECAY_HL_S * 1_000_000} AS BIGINT) AS bkt
  FROM events
),
m AS (SELECT MAX(bkt) AS maxb FROM b),
aged AS (
  SELECT user_id, (SELECT maxb FROM m) - bkt AS age FROM b
  WHERE (SELECT maxb FROM m) - bkt <= {DECAY_CAP}
),
scores AS (
  SELECT user_id,
         CAST(SUM(CAST(CAST(1 AS BIGINT) << ({DECAY_CAP} - age) AS HUGEINT)) AS DOUBLE)
           / CAST(CAST(1 AS BIGINT) << {DECAY_CAP} AS DOUBLE) AS decayed
  FROM aged GROUP BY user_id
)
SELECT CAST(rank AS INT) AS rank, user_id, ROUND(decayed, 6) AS score FROM (
  SELECT user_id, decayed,
         ROW_NUMBER() OVER (ORDER BY decayed DESC, user_id) AS rank
  FROM scores
) WHERE rank <= {DECAY_TOPK}
ORDER BY rank
"""


QUERIES = {
    "sketch_incremental_cm": sketch_incremental_cm,
    "stream_decayed_topk": stream_decayed_topk,
}
ORACLE = {
    "sketch_incremental_cm": SKETCH_CM_SQL,
    "stream_decayed_topk": DECAYED_TOPK_SQL,
}
