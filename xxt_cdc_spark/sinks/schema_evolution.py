"""Additive sink schema evolution.

The reference detects DDL but never propagates it (README.md:32, 717 —
C31 is alert-only). This module goes one step further for the safe
subset: when incoming change events carry columns the target table
lacks, issue additive ``ALTER TABLE … ADD COLUMN`` statements and
continue replicating. Only ADDs are automated — type changes, renames
and drops remain alert-only (destructive evolution needs a human, same
posture as the reference).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import types as T

from xxt_cdc_spark.model.types import spark_to_mysql_type


@dataclass(frozen=True)
class NewColumn:
    name: str
    ddl_type: str
    spark_type: T.DataType


_SQLITE_TYPES: dict[str, str] = {
    # sqlite's affinity system: map the MySQL DDL type to an affinity class
    "TINYINT": "INTEGER", "SMALLINT": "INTEGER", "INT": "INTEGER",
    "BIGINT": "INTEGER", "TINYINT(1)": "INTEGER",
    "FLOAT": "REAL", "DOUBLE": "REAL",
    "DATE": "TEXT", "DATETIME(6)": "TEXT", "TEXT": "TEXT", "JSON": "TEXT",
    "BLOB": "BLOB",
}


def diff_new_columns(
    incoming: T.StructType,
    existing_cols: set[str],
    dialect: str = "mysql",
) -> list[NewColumn]:
    """Columns present in the incoming row image but absent at the sink.

    Name comparison is case-insensitive (MySQL identifier semantics).
    """
    existing = {c.lower() for c in existing_cols}
    out = []
    for f in incoming.fields:
        if f.name.lower() in existing:
            continue
        ddl = spark_to_mysql_type(f.dataType)
        if dialect == "sqlite":
            base = ddl if ddl in _SQLITE_TYPES else ddl.split("(")[0]
            ddl = _SQLITE_TYPES.get(base, "TEXT")
        out.append(NewColumn(f.name, ddl, f.dataType))
    return out


def evolve_table(
    connect_fn: Callable[[], object],
    table: str,
    incoming: T.StructType,
    dialect: str = "sqlite",
) -> list[NewColumn]:
    """Ensure the sink table has every incoming column; returns the
    columns added. New columns are nullable (additive-safe: existing
    rows get NULL, exactly what a MySQL ADD COLUMN does)."""
    conn = connect_fn()
    try:
        if dialect == "sqlite":
            cur = conn.execute(f"PRAGMA table_info({table})")
            existing = {row[1] for row in cur.fetchall()}
        else:  # pragma: no cover - needs a server
            cur = conn.cursor()
            cur.execute(
                "SELECT COLUMN_NAME FROM information_schema.COLUMNS "
                "WHERE TABLE_NAME = %s AND TABLE_SCHEMA = DATABASE()",
                (table,),
            )
            existing = {row[0] for row in cur.fetchall()}
        added = diff_new_columns(incoming, existing, dialect)
        for col in added:
            stmt = f"ALTER TABLE {table} ADD COLUMN {col.name} {col.ddl_type} NULL"
            if dialect == "sqlite":
                conn.execute(stmt)
            else:  # pragma: no cover
                conn.cursor().execute(stmt)
        conn.commit()
        return added
    finally:
        conn.close()
