"""The canonical change-event envelope.

Parity target: ``ChangeEvent`` in the reference
(src/main/scala/cn/xuyinyin/cdc/model/ChangeEvent.scala:16-24) — a
Debezium-style row-change record ``(tableId, operation, primaryKey,
before, after, timestamp, position)`` — re-expressed as a Spark
``StructType`` so a stream of changes is just a DataFrame.

Transport form keeps ``key``/``before``/``after`` as JSON strings
(schema-agnostic, multi-table); per-table typed frames parse them with
``from_json`` against the discovered table schema (see
operators/normalize.py).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"

# JSON row-image timestamp format. Spark's default to_json truncates
# timestamps to MILLIseconds; binlog row images carry microseconds, so
# the envelope pins a micro-precision format for both encode and
# decode (pass as options to to_json/from_json).
TS_JSON_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
JSON_OPTS = {"timestampFormat": TS_JSON_FORMAT, "timestampNTZFormat": TS_JSON_FORMAT}


class Operation(str, Enum):
    """Sealed op ADT (reference model/ChangeEvent.scala:40-43)."""

    INSERT = OP_INSERT
    UPDATE = OP_UPDATE
    DELETE = OP_DELETE


# Multi-table transport envelope. (pos_file, pos_offset) is the total
# order — the engine's logical clock (reference model/BinlogPosition.scala:14-25).
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("op", T.StringType(), False),  # 'I' | 'U' | 'D'
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("pos_file", T.StringType(), True),
        T.StructField("pos_offset", T.LongType(), False),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("key", T.StringType(), False),  # JSON: pk col -> value
        T.StructField("before", T.StringType(), True),  # JSON row image (U/D)
        T.StructField("after", T.StringType(), True),  # JSON row image (I/U)
    ]
)

# Raw (pre-normalization) record, parity with RawBinlogEvent
# (reference reader/BinlogReader.scala:44-50): event types at :55-63.
RAW_EVENT_TYPES = (
    "WRITE_ROWS",
    "UPDATE_ROWS",
    "DELETE_ROWS",
    "QUERY",
    "ROTATE",
    "FORMAT_DESCRIPTION",
    "XID",
    "TABLE_MAP",
)

RAW_BINLOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("pos_file", T.StringType(), True),
        T.StructField("pos_offset", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("db", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        # rows carried as JSON arrays so one WRITE_ROWS event can hold
        # many rows; normalize() explodes ALL of them (the reference
        # only handled the first row — MySQLEventNormalizer.scala:73).
        T.StructField("rows_before", T.ArrayType(T.StringType()), True),
        T.StructField("rows_after", T.ArrayType(T.StringType()), True),
        T.StructField("sql", T.StringType(), True),  # QUERY events
    ]
)
