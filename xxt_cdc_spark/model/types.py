"""MySQL ⇄ Spark type mapping.

Parity targets: the 18-variant ``MySQLDataType`` (reference
model/MySQLDataType.scala:6-25), the database-agnostic ``DataType``
family and ``TypeMapper`` contract (connector/DataType.scala:9-191),
and the concrete MySQL/StarRocks mappers
(connector/source/mysql/MySQLTypeMapper.scala:16-135,
connector/sink/starrocks/StarRocksTypeMapper.scala:12-86).

The Spark engine needs one canonical direction — native type *string*
(as found in information_schema.DATA_TYPE / COLUMN_TYPE) → Spark
``DataType`` — plus the reverse for DDL generation at sinks. Documented
lossy edges: MySQL TIME → StringType (Spark has no TIME), JSON →
StringType (parse on demand with from_json), unsigned BIGINT →
DecimalType(20,0).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_PAREN = re.compile(r"^\s*([a-zA-Z ]+?)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?\s*(unsigned)?\s*$", re.IGNORECASE)


def mysql_to_spark_type(native: str) -> T.DataType:
    """Parse a MySQL type string ('VARCHAR(255)', 'DECIMAL(10,2)',
    'bigint unsigned') into a Spark type.

    Mirrors the string-pattern parse at reference
    connector/source/mysql/MySQLTypeMapper.scala:18 and the
    information_schema parse at catalog/MySQLCatalogService.scala:175-205
    (unknown types degrade to string with the same "treat as TEXT"
    posture, :201-203).
    """
    m = _PAREN.match(native)
    if not m:
        return T.StringType()
    base = m.group(1).strip().lower()
    p = int(m.group(2)) if m.group(2) else None
    s = int(m.group(3)) if m.group(3) else None
    unsigned = bool(m.group(4))

    if base in ("tinyint",):
        # tinyint(1) is MySQL's boolean idiom (sink maps back, reference
        # connector/sink/mysql/MySQLTypeMapper.scala:131)
        if p == 1:
            return T.BooleanType()
        return T.ShortType() if unsigned else T.ByteType()
    if base in ("smallint",):
        return T.IntegerType() if unsigned else T.ShortType()
    if base in ("mediumint", "int", "integer"):
        return T.LongType() if unsigned else T.IntegerType()
    if base in ("bigint",):
        return T.DecimalType(20, 0) if unsigned else T.LongType()
    if base in ("decimal", "numeric"):
        return T.DecimalType(p or 10, s or 0)
    if base in ("float",):
        return T.FloatType()
    if base in ("double", "double precision", "real"):
        return T.DoubleType()
    if base in ("char", "varchar", "text", "tinytext", "mediumtext", "longtext", "enum", "set"):
        return T.StringType()
    if base in ("datetime", "timestamp"):
        return T.TimestampType()
    if base in ("date",):
        return T.DateType()
    if base in ("time",):
        return T.StringType()  # documented lossy edge: no TIME in Spark
    if base in ("year",):
        return T.IntegerType()
    if base in ("json",):
        return T.StringType()  # from_json on demand
    if base in ("blob", "tinyblob", "mediumblob", "longblob", "binary", "varbinary", "bit"):
        return T.BinaryType()
    if base in ("boolean", "bool"):
        return T.BooleanType()
    return T.StringType()


def spark_to_mysql_type(dt: T.DataType) -> str:
    """Spark type → MySQL column DDL type (sink direction, parity with
    connector/sink/mysql/MySQLTypeMapper.scala:12-75)."""
    if isinstance(dt, T.BooleanType):
        return "TINYINT(1)"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "TEXT"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "DATETIME(6)"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        # StarRocks mapper collapses complex types to JSON (reference
        # StarRocksTypeMapper.scala:40); MySQL sink does the same.
        return "JSON"
    return "TEXT"


def spark_to_starrocks_type(dt: T.DataType) -> str:
    """Spark type → StarRocks DDL type (parity with
    connector/sink/starrocks/StarRocksTypeMapper.scala:12-86: DECIMAL
    precision buckets, TIME→STRING, BLOB→STRING, complex→JSON)."""
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.DecimalType):
        # precision buckets → DECIMAL32/64/128 (reference :53-56)
        if dt.precision <= 9:
            return f"DECIMAL32({dt.precision},{dt.scale})"
        if dt.precision <= 18:
            return f"DECIMAL64({dt.precision},{dt.scale})"
        return f"DECIMAL128({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "STRING"
    if isinstance(dt, T.BinaryType):
        return "STRING"  # BLOB → STRING w/ UTF-8 decode (reference :78-82)
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "DATETIME"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSON"
    return "STRING"
