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


QUERIES = {"sketch_incremental_cm": sketch_incremental_cm}
ORACLE = {"sketch_incremental_cm": SKETCH_CM_SQL}
