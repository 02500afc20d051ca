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
    from xxt_cdc_spark.session import normalize_timestamps

    orders = normalize_timestamps(spark.read.parquet(f"{sf_dir}/orders.parquet"))
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
        # typed null must match the normalized (LTZ) o_orderdate or the
        # union coerces and breaks the JSON round-trip
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )

    cf = inserts.unionByName(updates).unionByName(dup_updates).unionByName(deletes)
    return cf.withColumn("pos_file", F.lit("binlog.000001")).select(
        "op", "pos_file", "pos_offset", *ORDERS_PAYLOAD
    )


LINEITEM_PAYLOAD = [
    "l_orderkey",
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_extendedprice",
]


def lineitem_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key representative of lineitem.

    The synthetic corpus does NOT have unique (l_orderkey,
    l_linenumber) pairs (sf0.01: 60k rows, 45.8k distinct keys), so a
    keyed changefeed must first collapse to one row per key — with a
    full deterministic tie-break, or the two engines pick different
    representatives.
    """
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*LINEITEM_PAYLOAD)
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    return (
        li.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


LINEITEM_BASE_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
FROM lineitem
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_linenumber
                           ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice) = 1
"""


def lineitem_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-PK changefeed over lineitem (l_orderkey, l_linenumber):
    exercises multi-column key routing/collapse (reference
    router/EventRouter.scala:28-31 hashes the full PK map).

    History: INSERT all; UPDATE (qty+1) where (okey+line) % 5 = 0;
    DELETE where (okey+line) % 9 = 0. pos = (okey*8 + line)*10 + step.
    """
    li = lineitem_base(spark, sf_dir)
    k = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    sel = [F.col(c) for c in LINEITEM_PAYLOAD]

    inserts = li.select(F.lit("I").alias("op"), (k * 10 + 1).alias("pos_offset"), *sel)
    updates = li.filter((F.col("l_orderkey") + F.col("l_linenumber")) % 5 == 0).select(
        F.lit("U").alias("op"),
        (k * 10 + 2).alias("pos_offset"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_partkey"),
        F.col("l_suppkey"),
        (F.col("l_quantity") + 1).alias("l_quantity"),
        F.col("l_extendedprice"),
    )
    deletes = li.filter((F.col("l_orderkey") + F.col("l_linenumber")) % 9 == 0).select(
        F.lit("D").alias("op"),
        (k * 10 + 3).alias("pos_offset"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.lit(None).cast("long").alias("l_partkey"),
        F.lit(None).cast("long").alias("l_suppkey"),
        F.lit(None).cast("double").alias("l_quantity"),
        F.lit(None).cast("double").alias("l_extendedprice"),
    )
    cf = inserts.unionByName(updates).unionByName(deletes)
    return cf.withColumn("pos_file", F.lit("binlog.000001")).select(
        "op", "pos_file", "pos_offset", *LINEITEM_PAYLOAD
    )


LINEITEM_CHANGEFEED_SQL = f"""
WITH li_base AS ({LINEITEM_BASE_SQL})
SELECT 'I' AS op, 'binlog.000001' AS pos_file, (l_orderkey*8 + l_linenumber)*10 + 1 AS pos_offset,
       l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
FROM li_base
UNION ALL
SELECT 'U', 'binlog.000001', (l_orderkey*8 + l_linenumber)*10 + 2,
       l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity + 1, l_extendedprice
FROM li_base WHERE (l_orderkey + l_linenumber) % 5 = 0
UNION ALL
SELECT 'D', 'binlog.000001', (l_orderkey*8 + l_linenumber)*10 + 3,
       l_orderkey, l_linenumber, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM li_base WHERE (l_orderkey + l_linenumber) % 9 = 0
"""


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


def to_envelope(
    cf: DataFrame,
    db: str = "testdb",
    table: str = "orders",
    key_cols: list[str] | None = None,
    payload_cols: list[str] | None = None,
    ts_col: str | None = "o_orderdate",
) -> DataFrame:
    """Typed changefeed → transport envelope (CHANGE_EVENT_SCHEMA).

    Key and row images become canonical JSON strings; UPDATE before
    images are omitted (row-image=minimal parity is acceptable because
    apply is PK-upsert-based, like the reference sink O16).
    """
    from xxt_cdc_spark.model.envelope import JSON_OPTS

    key_cols = key_cols or ["o_orderkey"]
    payload_cols = payload_cols or ORDERS_PAYLOAD
    payload = F.to_json(F.struct(*[F.col(c) for c in payload_cols]), JSON_OPTS)
    key = F.to_json(F.struct(*[F.col(c) for c in key_cols]), JSON_OPTS)
    ts = F.col(ts_col).cast("timestamp") if ts_col else F.lit(None).cast("timestamp")
    return cf.select(
        F.lit(db).alias("db"),
        F.lit(table).alias("table"),
        F.col("op"),
        ts.alias("ts"),
        F.col("pos_file"),
        F.col("pos_offset"),
        F.lit(None).cast("string").alias("gtid"),
        key.alias("key"),
        F.when(F.col("op") == "D", payload).otherwise(F.lit(None).cast("string")).alias("before"),
        F.when(F.col("op") != "D", payload).otherwise(F.lit(None).cast("string")).alias("after"),
    )
