"""Hash routing / partition fan-out.

Parity targets: R1 hash router (reference router/EventRouter.scala:25-32 —
``partition = abs(hash(table:pk)) % partitionCount``, same table+PK →
same partition, preserving per-key order) and R2 partition fan-out
(pipeline/CDCStreamPipeline.scala:90-92).

Spark's ``repartition(n, cols)`` IS this operator: hash partitioning
on the key columns with deterministic placement. ``sortWithinPartitions``
then restores per-key event order inside each partition (the reference
got ordering from single-threaded substreams; we get it from an
explicit in-partition sort, which is shuffle-free after repartition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route(
    df: DataFrame,
    num_partitions: int,
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition by key and sort each partition by binlog order.

    After this, a per-partition sequential writer observes every key's
    events in total order — the same guarantee as the reference's
    Partition(64) + mapAsync(1) pipeline.
    """
    from xxt_cdc_spark.operators.collapse import order_exprs

    key_cols = key_cols or ["db", "table", "key"]
    order_cols = order_cols or ["pos_file", "pos_offset"]
    # rotation-safe file ordering (see collapse.order_exprs): plain
    # column sort would invert the binlog clock when the rotation
    # suffix widens past 999999
    return df.repartition(num_partitions, *key_cols).sortWithinPartitions(
        *order_exprs(order_cols)
    )


def with_partition_id(
    df: DataFrame,
    num_partitions: int,
    key_cols: list[str] | None = None,
    out_col: str = "partition_id",
) -> DataFrame:
    """Materialize the router's partition assignment as a column.

    ``pmod(hash(keys), n)`` — the exact formula of the reference router
    (abs(hash) % n), useful for routing audits and for sinks that need
    an explicit shard id (e.g. Kafka partition key).
    """
    key_cols = key_cols or ["db", "table", "key"]
    return df.withColumn(out_col, F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(num_partitions)))
