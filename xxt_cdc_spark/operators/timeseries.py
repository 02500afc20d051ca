"""Time-series downsampling operators: OHLC (first/high/low/last per
bucket) and time-weighted average — the hypertable rollup surface next
to the gap filler (operators/gap_fill.py).

Both are deterministic under ties and mirrorable in ANSI SQL:

- OHLC's open/close use a total order (ts, then value); ``min_by``/
  ``max_by`` — whose tie-breaking is engine- and partition-order-
  dependent, a hash-gate killer — are used ONLY where the caller
  asserts the ordering value is total/unique (``unique_order=True``,
  ``ohlc_coarsen``'s per-key-unique bucket ids), which keeps the
  result deterministic while the mutable agg buffer keeps the
  aggregation a HashAggregate;
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
    unique_order: bool = False,
) -> DataFrame:
    """Open/high/low/close of ``value_col`` per (key, bucket).

    Open/close are the values at the min/max of the total order
    ``(ts, tiebreak, value)`` — deterministic even with duplicate
    timestamps.

    ``unique_order=True`` is the caller's assertion that ``(ts,
    tiebreak)`` (or ``ts`` alone when no tiebreak is given) is UNIQUE
    within every group, NON-NULL, and the tiebreak is a non-negative
    integer. Non-nullness is part of the contract because the packed
    path diverges from the struct order on null ordering values:
    ``min_by``/``max_by`` IGNORE rows whose ordering value is null,
    while struct min/max sorts null fields first — open/close could
    differ on a null-ts row. The
    value column then never participates in the order, and open/close
    become ``min_by``/``max_by`` over the pair packed into ONE
    fixed-width column — a DECIMAL(38,0) built as
    ``unix_micros(ts) * 2^63 + tiebreak`` (monotone in (ts, tiebreak)
    for any ts sign while tiebreak ∈ [0, 2^63); |unix_micros| < 2^53
    up to year ~2255, so the product stays < 2^117 « 10^38 — no
    decimal overflow). Why it matters: a struct min/max buffer is not
    UnsafeRow-mutable, so the struct form plans as **SortAggregate**
    (per-task sort of the raw sample stream before both partial and
    final aggregation); double and decimal buffers are mutable, so the
    packed form plans as **HashAggregate** with map-side combine and
    no sort — the shape the 100 TB argument in this module's header
    always claimed. Row-identical to the struct form whenever the
    uniqueness + non-null assertion holds (pinned by
    TestOhlcPackedOrder in tests/test_timeseries.py).
    """
    if unique_order:
        if tiebreak_col:
            ordc = F.unix_micros(F.col(ts_col)).cast("decimal(38,0)") * F.expr(
                "CAST(9223372036854775808 AS DECIMAL(38,0))"
            ) + F.col(tiebreak_col).cast("decimal(38,0)")
        else:
            ordc = F.unix_micros(F.col(ts_col))
        return df.groupBy(*key_cols, bucket_col).agg(
            F.min_by(F.col(value_col), ordc).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), ordc).alias("close"),
            F.count(F.lit(1)).alias("n_samples"),
        )
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


def ohlc_coarsen(
    candles: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    factor: int,
    coarse_bucket_col: str = "B",
) -> DataFrame:
    """Fold fine candles into ``factor``-times-coarser ones WITHOUT
    re-reading the raw samples — the continuous-aggregate hierarchy
    (TimescaleDB's 1m → 1h → 1d rollup chain). Correct because every
    OHLC field is a lattice over the fine candles: coarse high/low are
    max/min, coarse open/close are the open of the EARLIEST and close
    of the LATEST contributing fine bucket (bucket ids are unique per
    key, so the (bucket, value) struct order is total — deterministic
    with no tie rule needed). At 100 TB this is the point: each rollup
    level aggregates candle rows (keys × buckets), never the raw
    samples, so a refresh of the coarse level costs O(fine candles
    touched), exactly like :class:`IncrementalOHLC`'s per-batch merge.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    b = F.col(bucket_col)
    # min_by/max_by on the bare bucket id, not min/max of a (bucket,
    # value) struct: the stated contract (bucket ids unique per key)
    # already makes the order total with no value tiebreak, and a
    # (long, double) agg buffer is UnsafeRow-mutable where a struct
    # buffer is not — HashAggregate with map-side combine instead of a
    # SortAggregate that re-sorts the candle stream per task.
    return (
        candles.groupBy(
            *key_cols, F.floor(b / factor).cast("long").alias(coarse_bucket_col)
        )
        .agg(
            F.min_by(F.col("open"), b).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by(F.col("close"), b).alias("close"),
            F.sum("n_samples").alias("n_samples"),
        )
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


class IncrementalOHLC:
    """Persistent per-(key, bucket) OHLC maintained incrementally from
    sample batches — the continuous-rollup form of :func:`ohlc`.

    Every field is a LATTICE merge (open = min of the (ts, tiebreak,
    value) struct, close = max of it, high = max, low = min), so
    folding a batch in is associative, commutative, and IDEMPOTENT:
    replaying a micro-batch cannot move the state, which makes the
    store exactly-once under foreachBatch replay with no versioned
    commits — the same argument as the incremental HLL registers
    (functions/sketches.py), and the reason n_samples (a sum, NOT
    replay-idempotent) is deliberately absent here.

    Storage is a bucket-pruned ParquetStateTable keyed by
    (key_cols..., bucket): an update touches only the hash buckets its
    (key, time-bucket) pairs land in, so maintenance cost tracks batch
    spread, not history size — a year of minute candles is never
    rescanned to fold in today's ticks.
    """

    def __init__(self, spark, root: str, key_cols: list[str], n_buckets: int = 16) -> None:
        from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable

        self.key_cols = key_cols
        self.state = ParquetStateTable(spark, root, [*key_cols, "b"], n_buckets=n_buckets)

    _VALS = ["open_t", "close_t", "high", "low"]
    _HOWS = {"open_t": "min", "close_t": "max", "high": "max", "low": "min"}

    def _partial(self, df, bucket_col, ts_col, value_col, tiebreak_col):
        order = [F.col(ts_col)]
        if tiebreak_col:
            order.append(F.col(tiebreak_col))
        order.append(F.col(value_col))
        tagged = F.struct(*order)
        return df.groupBy(*self.key_cols, F.col(bucket_col).alias("b")).agg(
            F.min(tagged).alias("open_t"),
            F.max(tagged).alias("close_t"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
        )

    def update(
        self,
        batch: DataFrame,
        bucket_col: str,
        ts_col: str,
        value_col: str,
        tiebreak_col: str | None = None,
    ) -> dict:
        partial = self._partial(batch, bucket_col, ts_col, value_col, tiebreak_col)
        if not self.state.exists():
            self.state.init(partial.limit(0))
        return self.state.apply_merge(partial, self._VALS, how=self._HOWS)

    def read(self, value_field: str | None = None) -> DataFrame:
        """Current candles: key cols + bucket + open/high/low/close.
        ``value_field`` names the value inside the order struct
        (defaults to the last struct field)."""
        st = self.state.read()
        field = value_field or st.schema["open_t"].dataType.names[-1]
        return st.select(
            *self.key_cols,
            "b",
            F.col("open_t").getField(field).alias("open"),
            "high",
            "low",
            F.col("close_t").getField(field).alias("close"),
        )
