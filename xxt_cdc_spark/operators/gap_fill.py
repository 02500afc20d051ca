"""Time-series gap filling: dense per-key time grids with LOCF and
linear interpolation — the hypertable/`time_bucket_gapfill` surface
(TimescaleDB, QuestDB `FILL`, Flink's windowed interpolation) expressed
with nothing but DataFrame primitives.

The reference engine has no time-series surface at all (its operators
are CDC dataflow stages); this belongs to the relational/analytics
layer the Spark rebuild adds, next to the as-of join and the binned
range join.

Plan shape at 100 TB:

- the observed frame is one partial-aggregated ``groupBy(key, bucket)``
  — map-side combine collapses rows before the only data-sized shuffle;
- both fill directions are RUNNING window frames
  (unboundedPreceding → currentRow) over the OBSERVED rows only: the
  backward pass on ascending bucket order, the forward pass on
  DESCENDING order. Spark evaluates running frames in O(rows); the
  naive forward frame (currentRow → unboundedFollowing) re-scans the
  partition tail per row — O(rows²) per key, measured 17.6 s vs 1.4 s
  on a 1M-row grid;
- the dense grid is exploded FROM the observed rows (one gap segment
  per observed bucket: itself plus the missing buckets up to the next
  observed one), with every fill input riding the segment as a
  constant — so the grid is generated DISTRIBUTED, never joined back
  to the observations, and window/shuffle work scales with OBSERVED
  rows while the grid can be 10-100× larger (r12: windowing the
  exploded grid instead cost two 1M-row sorts + a grid⋈observed join
  at sf0.1 — 2.44 s vs 1.41 s for the identical result).

LOCF (last observation carried forward) and linear interpolation follow
the standard semantics: the grid spans each key's [min, max] observed
bucket, so the first/last grid cells are always observed and neither
fill extrapolates beyond the data. The fills bridge null VALUES —
whether the bucket was absent from ``observed`` or present with a null
value — while the ``observed`` flag reports row PRESENCE, so an
observed-but-null bucket is never misreported as a gap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_OBS = "_gap_fill_present"


def bucketize(ts_col: str, bucket_seconds: int) -> Column:
    """Fixed-width time bucket index. FLOOR division (not
    cast-truncation, which rounds toward zero and would disagree with
    the DuckDB mirror ``epoch_us(ts) // N`` on pre-epoch timestamps)."""
    return F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(bucket_seconds * 1_000_000)
    ).cast("long")


def dense_grid(observed: DataFrame, key_cols: list[str], bucket_col: str) -> DataFrame:
    """Per-key dense bucket grid spanning each key's observed range,
    left-joined with the observations (missing buckets -> null values).

    ``sequence`` is evaluated per key row and exploded on the executors
    — a key with a huge time range produces a long array in one task,
    so callers with multi-year ranges at fine grain should bucket
    coarser or split ranges; for typical (key x time) densities the
    array is thousands of elements, well under Spark's limits.
    """
    rng = observed.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = rng.select(
        *key_cols, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(bucket_col)
    )
    return grid.join(observed, [*key_cols, bucket_col], "left")


def gap_fill(
    observed: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
    count_cols: list[str] | None = None,
) -> DataFrame:
    """Fill each key's missing buckets.

    ``observed``: one row per (key, bucket) actually present, with
    ``value_cols`` (numeric, interpolatable) and optional ``count_cols``
    (zero-filled, e.g. event counts). Adds, per value column ``v``:

    - ``<v>_locf``  — last non-null value at or before the bucket;
    - ``<v>_interp`` — linear interpolation between the surrounding
      non-null values (equals the value on non-null buckets);

    plus ``observed`` — 1 iff the (key, bucket) row was PRESENT in the
    input (independent of value nullness).
    """
    # Fills are computed on the OBSERVED frame and propagated to the
    # grid as per-gap-segment constants (r12). Every grid cell strictly
    # between observed buckets b_i and b_{i+1} shares b_i's "last
    # non-null at or before" and b_{i+1}'s "first non-null at or after"
    # — so the running-frame windows only need to scan the observed
    # rows, and the dense grid is exploded FROM the observed rows with
    # the fill inputs riding along. The previous shape windowed the
    # exploded grid itself: at sf0.1 that meant two sorts of the
    # 1M-row grid plus a grid⋈observed join; this shape sorts the 96k
    # observed rows twice and needs no join. At 100 TB the win grows
    # with grid density — window and shuffle work scales with OBSERVED
    # rows (the grid can be 10-100× larger), while the explode fan-out
    # is unchanged. Semantics and output schema are identical
    # (tests/test_gap_fill_packing.py pins both).
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(bucket_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lead = Window.partitionBy(*key_cols).orderBy(F.col(bucket_col).asc())

    # "observed" is the flag's name: an input column with that name was
    # REPLACED by the flag in the pre-r12 shape (withColumn semantics) —
    # keep that contract instead of emitting a duplicate column
    payload = [
        c for c in observed.columns if c not in {*key_cols, bucket_col, "observed"}
    ]
    zero_fill = set(count_cols or [])
    df = observed
    for v in value_cols:
        # per observed row i: last non-null value/bucket AT OR BEFORE i
        # (ascending running frame) and first non-null AT OR AFTER i+1
        # (descending running frame, shifted one row via lead). A
        # generated cell after row i uses exactly those; an observed
        # row with a null value does too (its own inclusive "next"
        # skips the null current row, so lead-shifting changes nothing).
        prv_v = F.last(v, ignorenulls=True).over(w_back)
        prv_b = F.last(
            F.when(F.col(v).isNotNull(), F.col(bucket_col)), ignorenulls=True
        ).over(w_back)
        nxt_v_incl = F.last(v, ignorenulls=True).over(w_fwd)
        nxt_b_incl = F.last(
            F.when(F.col(v).isNotNull(), F.col(bucket_col)), ignorenulls=True
        ).over(w_fwd)
        df = (
            df.withColumn(f"__prv_{v}", prv_v)
            .withColumn(f"__prvb_{v}", prv_b)
            .withColumn(f"__nxti_{v}", nxt_v_incl)
            .withColumn(f"__nxtbi_{v}", nxt_b_incl)
        )
    for v in value_cols:
        df = (
            df.withColumn(f"__nxt_{v}", F.lead(f"__nxti_{v}").over(w_lead))
            .withColumn(f"__nxtb_{v}", F.lead(f"__nxtbi_{v}").over(w_lead))
        )
    # gap segment: this observed bucket plus the missing buckets up to
    # (not including) the next observed one. greatest() guards a
    # duplicate-bucket input from producing a DESCENDING sequence.
    df = df.withColumn("__next_b", F.lead(bucket_col).over(w_lead))
    cell = "__gap_fill_cell"
    exploded = df.withColumn(
        cell,
        F.explode(
            F.sequence(
                F.col(bucket_col),
                F.greatest(
                    F.coalesce(F.col("__next_b") - 1, F.col(bucket_col)),
                    F.col(bucket_col),
                ),
            )
        ),
    )
    is_obs = F.col(cell) == F.col(bucket_col)
    proj = [*[F.col(k) for k in key_cols], F.col(cell).alias(bucket_col)]
    for c in payload:
        v = F.when(is_obs, F.col(c))
        if c in zero_fill:
            v = F.coalesce(v, F.lit(0))
        proj.append(v.alias(c))
    proj.append(F.when(is_obs, F.lit(1)).otherwise(F.lit(0)).alias("observed"))
    b = F.col(cell).cast("double")
    for v in value_cols:
        v_cell = F.when(is_obs, F.col(v))
        interp = F.when(v_cell.isNotNull(), v_cell).otherwise(
            F.col(f"__prv_{v}")
            + (F.col(f"__nxt_{v}") - F.col(f"__prv_{v}"))
            * (
                (b - F.col(f"__prvb_{v}").cast("double"))
                / (F.col(f"__nxtb_{v}").cast("double") - F.col(f"__prvb_{v}").cast("double"))
            )
        )
        proj.append(F.col(f"__prv_{v}").alias(f"{v}_locf"))
        proj.append(interp.alias(f"{v}_interp"))
    return exploded.select(*proj)
