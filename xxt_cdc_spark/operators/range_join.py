"""Binned range join — hash-join execution for interval containment.

A point-in-interval join with no equi-key (``l.t BETWEEN r.lo AND
r.hi``) gives Catalyst nothing to hash on: the plan degenerates to
BroadcastNestedLoopJoin (small side) or a cartesian product — O(n·m)
predicate evaluations, the classic 100 TB range-join cliff. Engines
with native range-join optimization (DuckDB's IEJoin, Databricks'
range join hint) fix this inside the optimizer; stock Spark needs the
join re-expressed.

The standard fix, implemented here: quantize time into fixed-width
bins. Each interval is exploded to the bins it overlaps; each point
computes the single bin containing it; the join becomes an EQUI-join
on bin id (plus any extra equi-keys), post-filtered by the exact range
predicate. With bin_width ≥ the typical interval length each interval
lands in ≤2 bins, so the fanout is bounded and the shuffle is a plain
hash partition on bin — AQE handles skewed bins like any hot key.

This composes with (not replaces) the equi-key range join: when a real
equi-key exists (queries/relational2.range_join_order_events) Catalyst
already hash-joins on it and the bin column is unnecessary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BIN_COL = "__range_bin"


def _bin_of(ts: Column, width_s: int) -> Column:
    return (F.unix_micros(ts.cast("timestamp")) / F.lit(width_s * 1_000_000)).cast("long")


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    bin_width_s: int,
    extra_eq: list[str] | None = None,
    how: str = "inner",
    broadcast_intervals: bool | None = None,
) -> DataFrame:
    """Join ``points`` (event time ``point_ts``) to ``intervals``
    (half-open ``[lo_col, hi_col)``) on containment, executed as a hash
    join on the bin id.

    ``bin_width_s`` trades fanout against bin selectivity: each
    interval explodes into ``ceil(len/width)+1`` rows. Choose it near
    the typical interval length.

    ``broadcast_intervals``: pass True when the caller KNOWS the
    interval set is small. Catalyst cannot size an explode output, so
    with both inputs under the auto-broadcast threshold it may build
    the hash table from the POINTS side and stream the few interval
    rows — which serializes the (points × overlap) join output and the
    partial aggregation above it into as many tasks as the interval
    side has partitions (r12: the sf0.1 global-window query produced
    its 1.5M matched rows on ONE task that way). True pins BuildRight
    on the exploded intervals so the match volume is produced across
    the points-side partitions. None (default) leaves the choice to
    Catalyst/AQE — the right posture when intervals may be data-sized.
    """
    lo_bin = _bin_of(F.col(lo_col), bin_width_s)
    # half-open interval: hi itself is excluded, but its bin still
    # overlaps unless hi is exactly on a bin edge — sequence() is
    # inclusive so the edge case only costs one empty-candidate bin
    hi_bin = _bin_of(F.col(hi_col), bin_width_s)
    exploded = intervals.withColumn(BIN_COL, F.explode(F.sequence(lo_bin, hi_bin)))
    if broadcast_intervals:
        exploded = F.broadcast(exploded)
    binned_points = points.withColumn(BIN_COL, _bin_of(F.col(point_ts), bin_width_s))
    keys = [BIN_COL, *(extra_eq or [])]
    joined = binned_points.join(exploded, keys, how)
    return joined.filter(
        (F.col(point_ts) >= F.col(lo_col)) & (F.col(point_ts) < F.col(hi_col))
    ).drop(BIN_COL)
