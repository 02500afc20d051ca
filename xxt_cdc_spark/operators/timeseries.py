"""Time-series downsampling operators: OHLC (first/high/low/last per
bucket) and time-weighted average — the hypertable rollup surface next
to the gap filler (operators/gap_fill.py).

Both are deterministic under ties and mirrorable in ANSI SQL:

- OHLC's open/close use a total order (ts, then value) rather than
  ``min_by``/``arg_min``, whose tie-breaking is engine- and
  partition-order-dependent — a hash-gate killer;
- the TWA weights each sample by its distance to the NEXT sample in
  the same bucket (the last sample carries no weight), a pure
  ``lead()`` formulation that needs no bucket-boundary bookkeeping and
  is exactly the recursive-free SQL a warehouse would write.

Plan shape: one shuffle on (key, bucket). OHLC is a pure hash
aggregate (map-side partial min/max of (ts, value) structs); TWA is
one window pass (lead) feeding the same grouped aggregate. At 100 TB
both scale as the scan: nothing downstream of the exchange exceeds
(keys × buckets) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# exact-decimal accumulator width — wider than queries/_util.DEC: the summand is value*dt with dt in MICROS (up to 8.64e10 per daily bucket), so the integer part needs ~22 digits of headroom
# (kept local: operators must not import the queries package)
DEC = "decimal(28,6)"


def ohlc(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Open/high/low/close of ``value_col`` per (key, bucket).

    Open/close are the values at the min/max of the total order
    ``(ts, tiebreak, value)`` — deterministic even with duplicate
    timestamps.
    """
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    order.append(F.col(value_col))
    tagged = F.struct(*order)
    return df.groupBy(*key_cols, bucket_col).agg(
        F.min(tagged).getField(value_col).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(tagged).getField(value_col).alias("close"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average per (key, bucket): each sample weighted by
    the micros until the bucket's next sample (sample-to-next; the
    bucket's last sample carries no weight). Buckets with a single
    sample have zero total weight -> null TWA (callers fall back to the
    plain mean if they want one).

    The weighted sum accumulates in exact decimal so the result is
    order-insensitive and hash-stable across engines.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*key_cols, bucket_col).orderBy(*order)
    dt = (F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))).alias("_dt")
    weighted = df.withColumn("_dt", dt)
    # the span>0 guard is semantic AND cross-engine: zero-span buckets
    # (all samples at one instant) would hit double 0/0, whose result
    # (null vs NaN vs inf) is engine-dependent — pin it to null
    return weighted.groupBy(*key_cols, bucket_col).agg(
        F.when(
            F.sum("_dt") > 0,
            F.sum((F.col(value_col) * F.col("_dt")).cast(DEC)).cast("double")
            / F.sum("_dt").cast("double"),
        ).alias("twa"),
        F.sum("_dt").alias("span_us"),
        F.count(F.lit(1)).alias("n_samples"),
    )
