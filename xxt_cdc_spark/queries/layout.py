"""Data-layout queries: z-order clustering correctness.

The pruning ECONOMICS (files skipped per dimension, vs a linearly
sorted layout) are asserted in tests/test_layout.py with parquet
footer stats; the oracle row here pins the CORRECTNESS contract —
layout changes bytes read, never results: a rectangle predicate over
the z-ordered copy is value-hash-equal to the same predicate over the
source table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xxt_cdc_spark.queries._util import dsum, sql_dsum

# rectangle: selective on BOTH clustered dimensions; user ids 2-8
# exist at every SF (the id domain scales with SF from 0..14 at
# sf0.001), values 10-60 are mid-mass in the heavy-tailed value dist
UID_LO, UID_HI = 2, 8
VAL_LO, VAL_HI = 10.0, 60.0


def layout_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rewrite events z-ordered on (user_id, value), then answer a
    two-sided rectangle aggregate FROM THE REWRITTEN COPY. Hash
    equality with the source-table SQL proves the rewrite is
    content-preserving under the clustering shuffle; the files-skipped
    measurement lives in tests (it is a property of the layout, not of
    the result)."""
    import shutil
    import tempfile

    from xxt_cdc_spark.functions.layout import zorder_write
    from xxt_cdc_spark.queries.streaming import _events

    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    out_dir = tempfile.mkdtemp(prefix="xxt_zorder_")
    try:
        zorder_write(ev, ["user_id", "value"], out_dir, num_files=32)
        zdf = spark.read.parquet(out_dir)
        res = (
            zdf.filter(
                F.col("user_id").between(UID_LO, UID_HI)
                & F.col("value").between(VAL_LO, VAL_HI)
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum(F.col("value")).alias("sum_value"),
            )
            .orderBy("event_type")
        )
        return res.localCheckpoint(eager=True)  # survive the dir cleanup
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


ZORDER_SQL = f"""
SELECT event_type, COUNT(*) AS n, {sql_dsum('value')} AS sum_value
FROM events
WHERE user_id BETWEEN {UID_LO} AND {UID_HI}
  AND value BETWEEN {VAL_LO} AND {VAL_HI}
GROUP BY event_type
ORDER BY event_type
"""

QUERIES = {"layout_zorder_prune": layout_zorder_prune}
ORACLE = {"layout_zorder_prune": ZORDER_SQL}
