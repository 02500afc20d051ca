"""Bucketed-table co-location: the pre-shuffle that makes repeated
big-big joins and aggregations on the same key free at read time.

SCALING.md claims "co-locate joins via bucketing"; this module makes
that concrete with Spark's native bucketed tables (`bucketBy` +
`saveAsTable`): both sides written with the same bucket count and key
hash-agree bucket-for-bucket, so a SortMergeJoin on the bucket key
needs NO Exchange on either side — the one-time write cost replaces a
shuffle on EVERY subsequent join/agg of that key.

At 100 TB this is the difference between re-shuffling the fact table
per query and shuffling it once at ingest: the CDC snapshot path
(engine.py) writes its target bucketed by PK, and every downstream
key-join (changefeed merge, dedup verification, enrichment) rides the
co-location. Spark requirements to keep the exchange-free plan:
identical ``n_buckets`` on both sides, join keys exactly the bucket
keys, and ``spark.sql.sources.bucketing.enabled`` (default true).

Reference parity note: the reference's hash router
(router/EventRouter.scala:25-32) co-locates events per table+PK at
RUNTIME per batch; bucketing is the storage-level analogue that
persists the same property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally removes the join-time
    Sort for sort-merge joins on the bucket key."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the physical plan carries no Exchange on either side
    (verified by tests/test_bucketing.py's plan assertion)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
