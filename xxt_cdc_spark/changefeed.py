"""Deterministic changefeed derivation over the test corpus.

The corpus (TESTDATA.md) ships base tables, not binlogs, so the engine
derives a deterministic change-event history from ``orders``:

- INSERT of every row at ``pos = o_orderkey*10 + 1``
- UPDATE of every 3rd key at ``pos = o_orderkey*10 + 2`` (price bump,
  status → 'U')
- duplicate delivery of that UPDATE for keys divisible by 33 (same
  position — exercises effectively-once dedup, reference README.md:526-548)
- DELETE of every 7th key at ``pos = o_orderkey*10 + 3``

The same history is expressible in ANSI SQL (see queries/cdc.py), so
every CDC operator downstream of it is oracle-checkable. Per-key
positions are monotone; interleavings include insert→update→delete.

The envelope form (JSON key/images, CHANGE_EVENT_SCHEMA) feeds the
streaming/normalize paths; the typed form feeds collapse/apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ORDERS_PAYLOAD = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def orders_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed changefeed: op, pos_file, pos_offset + orders payload columns."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")

    inserts = orders.select(
        F.lit("I").alias("op"),
        (k * 10 + 1).alias("pos_offset"),
        *ORDERS_PAYLOAD,
    )

    updates = orders.filter(k % 3 == 0).select(
        F.lit("U").alias("op"),
        (k * 10 + 2).alias("pos_offset"),
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        F.col("o_orderdate"),
        F.col("o_orderpriority"),
    )
    dup_updates = updates.filter(F.col("o_orderkey") % 33 == 0)

    deletes = orders.filter(k % 7 == 0).select(
        F.lit("D").alias("op"),
        (k * 10 + 3).alias("pos_offset"),
        F.col("o_orderkey"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        # corpus timestamps are TIMESTAMP_NTZ; an LTZ null here would
        # coerce the union to LTZ and break the JSON round-trip
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )

    cf = inserts.unionByName(updates).unionByName(dup_updates).unionByName(deletes)
    return cf.withColumn("pos_file", F.lit("binlog.000001")).select(
        "op", "pos_file", "pos_offset", *ORDERS_PAYLOAD
    )


# The same history as ANSI SQL for the DuckDB oracle. CAST(1.1 AS
# DOUBLE) keeps the price-bump arithmetic bit-identical across engines.
ORDERS_CHANGEFEED_SQL = """
SELECT 'I' AS op, 'binlog.000001' AS pos_file, o_orderkey*10+1 AS pos_offset,
       o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders
UNION ALL
SELECT 'U', 'binlog.000001', o_orderkey*10+2,
       o_orderkey, o_custkey, 'U', o_totalprice * CAST(1.1 AS DOUBLE), o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 'U', 'binlog.000001', o_orderkey*10+2,
       o_orderkey, o_custkey, 'U', o_totalprice * CAST(1.1 AS DOUBLE), o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 33 = 0
UNION ALL
SELECT 'D', 'binlog.000001', o_orderkey*10+3,
       o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
       CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR)
FROM orders WHERE o_orderkey % 7 = 0
"""


def to_envelope(cf: DataFrame, db: str = "testdb", table: str = "orders") -> DataFrame:
    """Typed changefeed → transport envelope (CHANGE_EVENT_SCHEMA).

    Key and row images become canonical JSON strings; UPDATE before
    images are omitted (row-image=minimal parity is acceptable because
    apply is PK-upsert-based, like the reference sink O16).
    """
    payload = F.to_json(F.struct(*[F.col(c) for c in ORDERS_PAYLOAD]))
    key = F.to_json(F.struct(F.col("o_orderkey")))
    return cf.select(
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        F.col("op"),
        F.col("o_orderdate").alias("ts"),
        F.col("pos_file"),
        F.col("pos_offset"),
        F.lit(None).cast("string").alias("gtid"),
        key.alias("key"),
        F.when(F.col("op") == "D", payload).otherwise(F.lit(None).cast("string")).alias("before"),
        F.when(F.col("op") != "D", payload).otherwise(F.lit(None).cast("string")).alias("after"),
    )
