"""Event normalization: raw binlog records → canonical envelope → typed rows.

Parity target: T1 (reference normalizer/MySQLEventNormalizer.scala:29-256):
``RawBinlogEvent → ChangeEvent`` — build the column map from the row
using the cached schema, extract the PK, set before/after per op.

Two deliberate improvements over the reference:

- ALL rows of a multi-row event are emitted (the reference processed
  only the first row — acknowledged at MySQLEventNormalizer.scala:73,
  107, 143). Here that is a single ``explode``.
- The whole transform is declarative (from_json / explode / struct),
  so it runs JVM-side inside whole-stage codegen; no Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xxt_cdc_spark.model.envelope import OP_DELETE, OP_INSERT, OP_UPDATE

_ROW_EVENT_OPS = {
    "WRITE_ROWS": OP_INSERT,
    "UPDATE_ROWS": OP_UPDATE,
    "DELETE_ROWS": OP_DELETE,
}


def normalize_raw_events(
    raw: DataFrame,
    pk_cols_by_table: dict[str, list[str]],
    source_db: str | None = None,
) -> DataFrame:
    """Raw binlog-event frame (RAW_BINLOG_EVENT_SCHEMA) → envelope frame
    (CHANGE_EVENT_SCHEMA).

    - Filters to row events (T6 routes QUERY/DDL to a side channel).
    - Applies the source-database predicate (T4, reference
      MySQLEventNormalizer.scala:31-39).
    - Explodes every row of multi-row events, pairing before/after by
      index for UPDATE_ROWS (arrays_zip).
    - Extracts the PK as a JSON object of pk column → value, using the
      per-table PK map (schema cache parity: MySQLEventNormalizer.scala:27).
    """
    df = raw.filter(F.col("event_type").isin(*_ROW_EVENT_OPS.keys()))
    if source_db is not None:
        df = df.filter(F.col("db") == F.lit(source_db))

    op = (
        F.when(F.col("event_type") == "WRITE_ROWS", F.lit(OP_INSERT))
        .when(F.col("event_type") == "UPDATE_ROWS", F.lit(OP_UPDATE))
        .otherwise(F.lit(OP_DELETE))
    )
    df = df.withColumn("op", op)

    # Pair up before/after row images positionally; explode ALL of them.
    zipped = F.arrays_zip(
        F.coalesce(F.col("rows_before"), F.expr("transform(rows_after, x -> cast(null as string))")).alias("b"),
        F.coalesce(F.col("rows_after"), F.expr("transform(rows_before, x -> cast(null as string))")).alias("a"),
    )
    df = df.withColumn("__pair", F.explode(zipped))
    before = F.col("__pair.b")
    after = F.col("__pair.a")

    # PK extraction (T3): pull pk columns out of the authoritative image
    # (after for I/U, before for D) as a canonical JSON object.
    image = F.when(F.col("op") == OP_DELETE, before).otherwise(after)
    key = _pk_json(image, pk_cols_by_table)

    return df.select(
        F.col("db"),
        F.col("table"),
        F.col("op"),
        F.col("ts"),
        F.col("pos_file"),
        F.col("pos_offset"),
        F.lit(None).cast("string").alias("gtid"),
        key.alias("key"),
        before.alias("before"),
        after.alias("after"),
    )


def _pk_json(image_json, pk_cols_by_table: dict[str, list[str]]):
    """Build the key JSON by projecting pk fields from the row image.

    The per-table dispatch is a CASE over the (small) table set —
    broadcastable metadata, evaluated JVM-side.

    Canonical form — byte-identical to ``to_json(struct(...))`` (the
    ``to_envelope`` path), so streams mixing the two producers compute
    equal keys for the same logical row: each value is re-emitted by
    ``to_json(variant_get(parse_json(image), '$.pk'))``, which quotes
    and escapes strings properly (``get_json_object`` returns string
    scalars UNQUOTED — a string PK would yield invalid JSON like
    ``{"id":abc}`` and break dedup/routing/LWW key equality), and null
    or absent pk fields are dropped exactly as to_json drops null
    struct fields (concat_ws skips SQL nulls).
    """
    expr = F.lit(None).cast("string")
    parsed = F.parse_json(image_json)
    for table, pks in pk_cols_by_table.items():
        pairs = []
        for pk in pks:
            val = F.to_json(F.try_variant_get(parsed, f"$.{pk}", "variant"))
            pairs.append(
                F.when(
                    val.isNotNull() & (val != F.lit("null")),
                    F.concat(F.lit(f'"{pk}":'), val),
                )
            )
        obj = F.concat(F.lit("{"), F.concat_ws(",", *pairs), F.lit("}"))
        expr = F.when(F.col("table") == table, obj).otherwise(expr)
    return expr


def envelope_to_typed(
    env: DataFrame,
    table: str,
    schema: T.StructType,
    image: str = "after",
) -> DataFrame:
    """Envelope frame → typed per-table frame.

    Parses the requested JSON row image against the discovered table
    schema (type casts per SURVEY.md §1.3 happen inside from_json) and
    keeps the envelope metadata columns for ordering/collapse.

    ``image='auto'`` dispatches per-op in one pass — before-image for
    deletes, after-image otherwise (the reference normalizer's per-op
    dispatch, MySQLEventNormalizer.scala:61-162) — so callers don't
    need a filter+union over two parses of the same stream.
    """
    from xxt_cdc_spark.model.envelope import JSON_OPTS

    df = env.filter(F.col("table") == table)
    if image == "auto":
        img = F.when(F.col("op") == OP_DELETE, F.col("before")).otherwise(F.col("after"))
    else:
        img = F.col(image)
    parsed = F.from_json(img, schema, JSON_OPTS)
    return df.select(
        "db",
        "table",
        "op",
        "ts",
        "pos_file",
        "pos_offset",
        "key",
        parsed.alias("row"),
    ).select("db", "table", "op", "ts", "pos_file", "pos_offset", "key", "row.*")
