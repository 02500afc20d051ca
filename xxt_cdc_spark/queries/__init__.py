"""Query registry — the engine's operator coverage surface.

Every implemented operator from SURVEY.md §2 (plus the north-star
data-pipeline operators) registers here as a pair:

- ``QUERIES[name]``: callable (spark, sf_dir) → DataFrame, built with
  the engine's operator modules;
- ``ORACLE[name]``: equivalent ANSI SQL for the DuckDB oracle (same
  column names — aggregates are aliased identically on both sides).

Aggregate determinism: float sums are computed through exact decimal
arithmetic and cast to double at the end, so results are bit-identical
across engines regardless of partition/summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xxt_cdc_spark.queries import cdc, relational, relational2, streaming, text, vector

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for mod in (relational, relational2, cdc, text, vector, streaming):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)
