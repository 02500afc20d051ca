"""Shared helpers for oracle-matched queries.

Cross-engine float determinism: double addition is order-sensitive, and
Spark/DuckDB aggregate in different orders. Casting inputs to DECIMAL
before SUM makes the aggregation exact (order-free); casting the exact
decimal result back to DOUBLE is then deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18,6: the narrowest decimal whose SUM buffer (p+10 = 28 digits)
# still holds a 100-TB-scale total; narrower input decimals aggregate
# measurably faster than (25,6) and the corpus doubles never exceed
# the 12 integer digits
DEC = "decimal(18,6)"


def dsum(col: Column | str) -> Column:
    """Order-insensitive SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-insensitive AVG of a double column, returned as double.

    Exact decimal sum → double, then double/int division — decimal
    division itself is avoided because its rounding rules differ
    between engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"
