"""Data-quality operators: column profiling and integrity checks —
the dbt-test / Deequ surface a pipeline runs before trusting a table.

Two shapes, both scan-bounded:

- ``profile``: one pass over the table computing, per column, the
  null count, approx-exact distinct count (exact here — a grouped
  distinct per column collapses map-side; swap in HLL via
  functions/sketches for the approximate form at extreme widths),
  and min/max rendered as strings (type-agnostic wire format). The
  whole result is O(columns) rows.
- ``integrity_violations``: declarative checks (primary-key
  uniqueness, referential containment, accepted-value sets) that
  return the VIOLATING keys — empty means trusted. Each check is one
  aggregation or anti-join; a clean table costs the scan and ships
  nothing.

Reference parity: the reference trusts its feed end-to-end (no
validation surface at all); this is operational armor its users ask
for first.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame, columns: list[str] | None = None, approx_ndv: bool = False
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct,
    min_str, max_str), one aggregate job with an O(columns) result.

    Cost honesty (review finding r5): with EXACT distinct counts
    (default — what the oracle gate needs), Spark's multi-distinct
    rewrite expands each row ×(N_cols+1) and funnels every column's
    distinct values through ONE final-aggregation task — an O(Σ NDV)
    single-task reduction, fine at report cadence but not a per-batch
    hot path. ``approx_ndv=True`` swaps in HLL
    (``approx_count_distinct``), which keeps partials sketch-sized
    map-side — the form to run at 100 TB widths."""
    ndv = F.approx_count_distinct if approx_ndv else F.countDistinct
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(ndv(c).alias(f"{c}__ndv"))
        aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__max"))
    row = df.agg(*aggs)
    # unpivot the one-row aggregate with a single explode instead of a
    # per-column union of selects over `row` (r14): each union branch
    # re-embedded the WHOLE aggregation subtree, so the profile pass —
    # including the multi-distinct Expand and the string min/max
    # SortAggregate — executed once PER COLUMN (10 SortAggregate nodes
    # for 5 columns). One array-of-structs explode over the single agg
    # row computes the identical rows in one pass.
    fields = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_null"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(fields).alias("_p")).select("_p.*")


def pk_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys appearing more than once (or with a NULL part) — the
    uniqueness + not-null test in one grouped pass. SQL uniqueness
    semantics: NULLs are never equal, so null-keyed rows are reported
    ONLY as ``null_key``, never as duplicates of each other."""
    null_pred = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in key_cols]
    )
    dup = (
        df.filter(~null_pred)
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(*key_cols, F.lit("duplicate").alias("violation"))
    )
    nulls = (
        df.filter(null_pred)
        .select(*key_cols)
        .distinct()
        .withColumn("violation", F.lit("null_key"))
    )
    return dup.unionByName(nulls)


def fk_orphans(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child keys with no parent — referential integrity as one
    anti-join on a (distinct-collapsed, typically broadcastable)
    parent key set. NULL child keys are not orphans (SQL FK
    semantics)."""
    keys = child.filter(F.col(child_key).isNotNull()).select(child_key).distinct()
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return keys.join(parents, child_key, "left_anti")


def accepted_values_violations(
    df: DataFrame, col: str, allowed: list
) -> DataFrame:
    """Distinct values outside the accepted set (NULLs excluded — pair
    with a not-null check when needed)."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(col)
        .distinct()
        .filter(~F.col(col).isin(allowed))
    )
