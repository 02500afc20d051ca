"""DDL detection / classification — detect-and-alert only, no propagation.

Parity targets: T6 DDL statement detector (reference
reader/MySQLBinlogReader.scala:232-249 prefix match; richer regex
classifier ddl/DDLHandler.scala:105-194 — type patterns :108-116,
table-name extraction :119-125) and C31 handling strategies
Ignore/Log/Alert/Fail with severity Critical for DROP/TRUNCATE
(ddl/DDLHandler.scala:71-75, 229-243). Like the reference, DDL is a
side channel: detected, classified, logged — never auto-applied
(reference README.md:32, 717).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Prefix detector (reference MySQLBinlogReader.scala:307-314).
DDL_PREFIX_RE = r"(?i)^\s*(CREATE|ALTER|DROP|TRUNCATE|RENAME)\b"

_TYPE_PATTERNS: list[tuple[str, str]] = [
    ("CREATE_TABLE", r"(?i)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([`\"\w.]+)"),
    ("ALTER_TABLE", r"(?i)^\s*ALTER\s+TABLE\s+([`\"\w.]+)"),
    ("DROP_TABLE", r"(?i)^\s*DROP\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+EXISTS\s+)?([`\"\w.]+)"),
    ("TRUNCATE_TABLE", r"(?i)^\s*TRUNCATE\s+(?:TABLE\s+)?([`\"\w.]+)"),
    ("RENAME_TABLE", r"(?i)^\s*RENAME\s+TABLE\s+([`\"\w.]+)"),
    ("CREATE_INDEX", r"(?i)^\s*CREATE\s+(?:UNIQUE\s+)?INDEX\s+[`\"\w]+\s+ON\s+([`\"\w.]+)"),
    ("DROP_INDEX", r"(?i)^\s*DROP\s+INDEX\s+[`\"\w]+\s+ON\s+([`\"\w.]+)"),
]

CRITICAL_TYPES = {"DROP_TABLE", "TRUNCATE_TABLE"}


class DDLStrategy(str, Enum):
    IGNORE = "IGNORE"
    LOG = "LOG"
    ALERT = "ALERT"
    FAIL = "FAIL"


@dataclass(frozen=True)
class DDLEvent:
    ddl_type: str
    database: str | None
    table: str | None
    severity: str
    sql: str


def classify_ddl(sql: str, default_db: str | None = None) -> DDLEvent | None:
    """Driver-side classifier (unit-testable truth table)."""
    if not re.match(DDL_PREFIX_RE, sql or ""):
        return None
    for ddl_type, pat in _TYPE_PATTERNS:
        m = re.match(pat, sql)
        if m:
            name = m.group(1).replace("`", "").replace('"', "")
            db, _, tbl = name.rpartition(".")
            return DDLEvent(
                ddl_type=ddl_type,
                database=db or default_db,
                table=tbl,
                severity="CRITICAL" if ddl_type in CRITICAL_TYPES else "INFO",
                sql=sql,
            )
    return DDLEvent("OTHER_DDL", default_db, None, "INFO", sql)


def is_ddl(sql_col: Column) -> Column:
    """DataFrame predicate: is this QUERY-event SQL a DDL statement?"""
    return sql_col.rlike(DDL_PREFIX_RE)


def classify_ddl_df(df: DataFrame, sql_col: str = "sql") -> DataFrame:
    """Vectorized classifier over a QUERY-event frame → DDL side-output.

    All regexes run JVM-side (rlike / regexp_extract) so the side
    channel costs no Python time on the hot path.
    """
    sql = F.col(sql_col)
    ddl_type = F.lit("OTHER_DDL")
    table_name = F.lit(None).cast("string")
    for t, pat in reversed(_TYPE_PATTERNS):
        # regexp_extract returns '' on no-match; guard with rlike.
        hit = sql.rlike(pat.replace("(?i)^", "(?i)^"))
        ddl_type = F.when(hit, F.lit(t)).otherwise(ddl_type)
        table_name = F.when(hit, F.regexp_extract(sql, pat, 1)).otherwise(table_name)
    clean = F.regexp_replace(table_name, '[`"]', "")
    return (
        df.filter(is_ddl(sql))
        .withColumn("ddl_type", ddl_type)
        .withColumn(
            "ddl_db",
            F.when(clean.contains("."), F.substring_index(clean, ".", 1)).otherwise(F.lit(None).cast("string")),
        )
        .withColumn("ddl_table", F.substring_index(clean, ".", -1))
        .withColumn(
            "severity",
            F.when(ddl_type.isin(*CRITICAL_TYPES), F.lit("CRITICAL")).otherwise(F.lit("INFO")),
        )
    )
