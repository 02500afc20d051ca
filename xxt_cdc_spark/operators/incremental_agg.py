"""Incremental aggregate maintenance over a CDC changelog.

The materialized-view-over-CDC posture (Flink dynamic tables,
Materialize, TimescaleDB continuous aggregates): a grouped aggregate
of the replicated table is kept current by applying per-batch DELTAS
derived from the change stream, never recomputing from the base.

Why it scales: each micro-batch touches O(batch) rows — the old images
come from a bucket-pruned keyed-state lookup (sinks/parquet_state.py),
the delta is one partial aggregation of ±contributions, and the
aggregate table merge is additive (`apply_additive`) over only the
touched groups. A 100 TB base table is never re-scanned; maintenance
cost tracks change volume.

Correctness contract (oracle-checked by ``cdc_incremental_agg``):
- INSERT contributes (+1, +value) to its group;
- DELETE contributes (−1, −old value) to the OLD image's group;
- UPDATE contributes both — which handles group migration (a row whose
  group column changes moves its count/sum between groups) with no
  special case;
- sums accumulate in exact decimal so the maintained value is
  bit-identical to a from-scratch aggregate, regardless of how many
  increments it took (float accumulation would drift).

The reference has no analogue (its sinks materialize only row state);
this is part of the relational surface the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xxt_cdc_spark.model.envelope import OP_DELETE

DECIMAL = "decimal(25,6)"


def cdc_agg_delta(
    collapsed: DataFrame,
    old_images: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Per-group aggregate delta of ONE collapsed change batch.

    ``collapsed``: one event per key (LWW within the batch), carrying
    ``op`` + the payload columns. ``old_images``: the PRIOR row images
    of exactly those batch keys that already existed in the state
    (payload columns only; keys new to the state are simply absent).

    Returns ``group_cols + n_delta + <c>_delta`` (decimal) — the
    amounts to add into the maintained aggregate.
    """
    adds = collapsed.filter(F.col(op_col) != OP_DELETE).select(
        *group_cols,
        F.lit(1).alias("__n"),
        *[F.col(c).cast(DECIMAL).alias(c) for c in sum_cols],
    )
    subs = old_images.select(
        *group_cols,
        F.lit(-1).alias("__n"),
        *[(-F.col(c).cast(DECIMAL)).alias(c) for c in sum_cols],
    )
    return (
        adds.unionByName(subs)
        .groupBy(*group_cols)
        .agg(
            F.sum("__n").alias("n_delta"),
            *[F.sum(c).alias(f"{c}_delta") for c in sum_cols],
        )
    )


def merge_agg(
    agg: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Fold a delta into the maintained aggregate frame
    (``group_cols + n + <c>_sum``); groups reaching n == 0 drop out,
    so a fully-deleted group disappears exactly as a recomputed
    aggregate would omit it."""
    d = delta.select(
        *group_cols,
        F.col("n_delta").alias("n"),
        *[F.col(f"{c}_delta").alias(f"{c}_sum") for c in sum_cols],
    )
    merged = (
        agg.unionByName(d)
        .groupBy(*group_cols)
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"{c}_sum").cast(DECIMAL).alias(f"{c}_sum") for c in sum_cols],
        )
    )
    return merged.filter(F.col("n") != 0)
