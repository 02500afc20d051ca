"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in xxt_cdc_spark.queries — one entry per implemented
operator from SURVEY.md §2 plus the north-star data-pipeline operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CDC apply — replay the
    derived changefeed onto the orders snapshot (upsert-merge, LWW,
    effectively-once) and return the converged state."""
    from xxt_cdc_spark.queries import QUERIES

    return QUERIES["cdc_apply_upsert"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from xxt_cdc_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from xxt_cdc_spark.queries import ORACLE

    return dict(ORACLE)
