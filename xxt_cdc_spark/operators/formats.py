"""Wire-format adapters: Debezium and Canal JSON → canonical envelope.

The reference consumes the MySQL binlog directly via BinaryLogClient
(S1). In the Spark engine the production transport is a Kafka topic
populated by a CDC connector, and the two dominant wire formats are:

- **Debezium** (`{"op": "c|u|d|r", "before": {...}, "after": {...},
  "source": {"db", "table", "file", "pos", "gtid"}, "ts_ms": ...}`)
- **Canal** (`{"type": "INSERT|UPDATE|DELETE", "database", "table",
  "data": [{...}], "old": [{...}], "es": ms, "ts": ms}` — data/old are
  ARRAYS: one Canal message carries many rows, like a multi-row binlog
  event)

Both adapters are pure column expressions (from_json / explode /
to_json) — fully JVM-side, streaming-safe (usable directly on a Kafka
``value`` column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# generic payload: row images kept as raw JSON strings (schema-agnostic
# transport; per-table typing happens downstream in envelope_to_typed)
_DEBEZIUM_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", T.StringType()),
        T.StructField("after", T.StringType()),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("db", T.StringType()),
                    T.StructField("table", T.StringType()),
                    T.StructField("file", T.StringType()),
                    T.StructField("pos", T.LongType()),
                    T.StructField("gtid", T.StringType()),
                ]
            ),
        ),
    ]
)

_CANAL_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("es", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("data", T.ArrayType(T.StringType())),
        T.StructField("old", T.ArrayType(T.StringType())),
        T.StructField("pkNames", T.ArrayType(T.StringType())),
    ]
)


def _key_from_image(image_col, pk_cols_by_table: dict[str, list[str]], table_col):
    """Project the PK fields of a JSON row image into a canonical JSON
    key object, dispatched per table (broadcastable metadata)."""
    expr = F.lit(None).cast("string")
    for table, pks in pk_cols_by_table.items():
        parts = []
        for pk in pks:
            parts.append(F.lit(f'"{pk}":'))
            parts.append(F.coalesce(F.get_json_object(image_col, f"$.{pk}"), F.lit("null")))
            parts.append(F.lit(","))
        inner = F.concat(*parts[:-1]) if parts else F.lit("")
        expr = F.when(table_col == table, F.concat(F.lit("{"), inner, F.lit("}"))).otherwise(expr)
    return expr


def from_debezium(
    raw: DataFrame,
    pk_cols_by_table: dict[str, list[str]],
    value_col: str = "value",
) -> DataFrame:
    """Debezium JSON → CHANGE_EVENT envelope.

    Debezium ``op``: c(reate)/r(ead, snapshot)→I, u→U, d→D. The binlog
    coordinates (source.file, source.pos) become the total order.

    The nested before/after objects survive as raw JSON via Spark's
    JSON-string-within-schema trick: declaring them StringType inside
    from_json re-serializes the nested object to its source text.
    """
    e = F.from_json(F.col(value_col).cast("string"), _DEBEZIUM_SCHEMA).alias("e")
    df = raw.select(e).select("e.*")
    op = (
        F.when(F.col("op").isin("c", "r"), F.lit("I"))
        .when(F.col("op") == "u", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    image = F.when(op == "D", F.col("before")).otherwise(F.col("after"))
    return df.select(
        F.col("source.db").alias("db"),
        F.col("source.table").alias("table"),
        op.alias("op"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        F.col("source.file").alias("pos_file"),
        F.col("source.pos").alias("pos_offset"),
        F.col("source.gtid").alias("gtid"),
        _key_from_image(image, pk_cols_by_table, F.col("source.table")).alias("key"),
        F.col("before"),
        F.col("after"),
    )


def from_canal(
    raw: DataFrame,
    pk_cols_by_table: dict[str, list[str]],
    value_col: str = "value",
) -> DataFrame:
    """Canal JSON → CHANGE_EVENT envelope, exploding ALL rows of each
    message (multi-row semantics the reference normalizer skipped).

    Canal has no binlog file/offset in the standard JSON; the (es, ts)
    millisecond pair is the best available order — documented lossy
    edge (same-ms events tie; a Kafka offset column should be appended
    upstream when available).
    """
    e = F.from_json(F.col(value_col).cast("string"), _CANAL_SCHEMA).alias("e")
    df = raw.select(e).select("e.*")
    op = (
        F.when(F.col("type") == "INSERT", F.lit("I"))
        .when(F.col("type") == "UPDATE", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    zipped = F.arrays_zip(
        F.coalesce(F.col("data"), F.array()).alias("a"),
        F.coalesce(F.col("old"), F.expr("transform(data, x -> cast(null as string))")).alias("b"),
    )
    df = df.withColumn("op", op).withColumn("__pair", F.explode(zipped))
    after = F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(F.col("__pair.a"))
    # Canal DELETE carries the deleted row in `data`
    before = F.when(F.col("op") == "D", F.col("__pair.a")).otherwise(F.col("__pair.b"))
    image = F.when(F.col("op") == "D", before).otherwise(after)
    return df.select(
        F.col("database").alias("db"),
        F.col("table"),
        F.col("op"),
        F.timestamp_millis(F.col("es")).alias("ts"),
        F.lit(None).cast("string").alias("pos_file"),
        F.col("es").alias("pos_offset"),
        F.lit(None).cast("string").alias("gtid"),
        _key_from_image(image, pk_cols_by_table, F.col("table")).alias("key"),
        before.alias("before"),
        after.alias("after"),
    )
