"""DDL detection / classification / handling.

Parity targets: T6 DDL statement detector (reference
reader/MySQLBinlogReader.scala:232-249 prefix match; richer regex
classifier ddl/DDLHandler.scala:105-194 — type patterns :108-116,
table-name extraction :119-125) and C31 handling strategies
Ignore/Log/Alert/Fail with severity Critical for DROP/TRUNCATE
(ddl/DDLHandler.scala:71-75, 229-243).

Beyond the reference (which is detect-only, its README.md:32, 717):
an explicit opt-in ``DDLStrategy.APPLY`` auto-applies the SAFE subset
— an ALTER TABLE consisting purely of ADD COLUMN clauses — through
``sinks/schema_evolution.py``'s additive policy. Everything else
(DROP/TRUNCATE, non-additive ALTERs, renames) falls back to ALERT
even under APPLY: destructive evolution always needs a human.
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
    # opt-in: auto-apply purely-additive ALTERs (ADD COLUMN only);
    # everything else still alerts — see handle_ddl
    APPLY = "APPLY"


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


# --- additive-ALTER parsing + strategy dispatch (beyond-reference APPLY) ------

# one ADD COLUMN clause: name + type (optional precision args), then
# optionally NULL / NOT NULL / DEFAULT <literal> — anything else makes
# the clause (and so the whole statement) non-additive
_ADD_CLAUSE_RE = re.compile(
    r"(?i)^ADD\s+(?:COLUMN\s+)?([`\"\w]+)\s+"
    r"([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
    r"(?:\s+(?:NOT\s+)?NULL)?(?:\s+DEFAULT\s+[\w.'\"-]+)?\s*$"
)


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parentheses (DECIMAL(10,2) stays whole)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def parse_add_columns(sql: str) -> list[tuple[str, str]] | None:
    """(column, ddl_type) list iff ``sql`` is a PURELY additive ALTER
    TABLE — every top-level clause an ADD COLUMN — else None.

    Conservative by design: a statement mixing ADD with any other
    clause (DROP/MODIFY/RENAME COLUMN, index changes) returns None and
    is handled as alert-only, because auto-applying half an ALTER
    would leave the sink in a state the source never had.
    """
    m = re.match(r"(?i)^\s*ALTER\s+TABLE\s+[`\"\w.]+\s+(.*)$", (sql or "").strip())
    if not m:
        return None
    cols: list[tuple[str, str]] = []
    for clause in _split_top_level(m.group(1)):
        cm = _ADD_CLAUSE_RE.match(clause)
        if not cm:
            return None
        name = cm.group(1).replace("`", "").replace('"', "")
        cols.append((name, re.sub(r"\s+", "", cm.group(2)).upper()))
    return cols or None


def handle_ddl(
    event: DDLEvent,
    strategy: DDLStrategy,
    apply_fn=None,
    log_fn=None,
    alert_fn=None,
) -> str:
    """C31 strategy dispatch; returns the action taken.

    Ignore/Log/Alert/Fail keep the reference's semantics exactly
    (ddl/DDLHandler.scala:71-75). APPLY — the beyond-reference opt-in —
    applies ONLY a purely-additive ALTER (``parse_add_columns``)
    through ``apply_fn(event, cols)``; every other statement under
    APPLY falls back to ALERT, so DROP/TRUNCATE (severity CRITICAL)
    and non-additive ALTERs can never mutate the sink automatically.
    """
    if strategy is DDLStrategy.IGNORE:
        return "ignored"
    if strategy is DDLStrategy.LOG:
        (log_fn or (lambda e: None))(event)
        return "logged"
    if strategy is DDLStrategy.FAIL:
        raise RuntimeError(f"DDL detected with strategy=FAIL: {event.sql!r}")
    if strategy is DDLStrategy.APPLY:
        cols = parse_add_columns(event.sql) if event.ddl_type == "ALTER_TABLE" else None
        if cols and apply_fn is not None:
            apply_fn(event, cols)
            return "applied"
    (alert_fn or (lambda e: None))(event)
    return "alerted"
