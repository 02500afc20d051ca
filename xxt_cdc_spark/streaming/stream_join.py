"""Watermarked stream-stream interval join.

The missing piece of the streaming relational surface: correlate two
live event streams on an equi-key within an event-time interval
(click→purchase attribution, order→shipment matching, CDC feed vs CDC
feed). Spark's stream-stream join is the right engine primitive — each
side's state store holds only rows whose join window the other side's
watermark has not yet passed, so state is bounded by (watermark delay
+ interval width) × arrival rate instead of the full history. This
wrapper pins the two things Spark makes easy to get wrong:

- **Both sides must carry a watermark** and the join condition must
  bound BOTH event times, or state grows without bound (Spark accepts
  the query but never evicts). `interval_join` derives the canonical
  range predicate from (lower_s, upper_s) so the state-cleanup
  constraint is correct by construction.
- **Outer results are watermark-gated**: unmatched rows emit only
  once the watermark passes their join window, so a finite input
  produces outer rows only for windows the final watermark cleared —
  asserted in tests (this is semantics, not a bug, and downstream
  consumers must expect it).
- **Lateness is enforced by state eviction, not an input filter**: a
  late row still matches partner state that has not been evicted yet
  (eviction runs at batch end), and silently misses partners evicted
  in an earlier batch. Pinned empirically in tests — consumers get
  at-most-complete results bounded by the watermark delay, not an
  exact late-row cutoff.

The same function applied to batch DataFrames degrades to a plain
interval join (watermarks are streaming-only), which is how the
oracle-checked query pins the semantics while tests exercise the
streaming execution (multi-batch, eviction, availableNow).

Reference parity: the reference engine has no stream-stream join (its
pipeline is single-feed apply; `processor/DataProcessor.scala` routes
one changefeed). Beyond-parity surface, same contract style as
`operators/range_join.py` for the batch keyless case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark: str | None = None,
    how: str = "inner",
    extra: Column | None = None,
) -> DataFrame:
    """Join rows where ``right.right_ts ∈ [left.left_ts + lower_s,
    left.left_ts + upper_s]`` and the equi-keys match.

    ``watermark`` (e.g. ``"1 hour"``) is applied to BOTH sides when
    the inputs are streaming; with the two-sided time bound it makes
    the join's state finite. ``left_ts`` and ``right_ts`` must be
    distinct column names (rename before calling) so the output carries
    both event times unambiguously.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    keys = [on] if isinstance(on, str) else list(on)
    if (left.isStreaming or right.isStreaming) and not watermark:
        # Spark would accept the query and grow state forever; the
        # whole point of this wrapper is that the bound exists
        raise ValueError(
            "streaming inputs require a watermark (state is unbounded without one)"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    lo = right[right_ts] >= left[left_ts] + F.expr(f"INTERVAL {int(lower_s)} SECOND")
    hi = right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {int(upper_s)} SECOND")
    cond = cond & lo & hi
    if extra is not None:
        cond = cond & extra
    joined = left.join(right, cond, how)
    # collapse the duplicated equi-key columns into one: coalesce so
    # right_outer/full_outer unmatched rows keep their key value
    # instead of surfacing NULL from the dropped side
    for k in keys:
        joined = (
            joined.withColumn(f"__ij_{k}", F.coalesce(left[k], right[k]))
            .drop(left[k])
            .drop(right[k])
            .withColumnRenamed(f"__ij_{k}", k)
        )
    return joined
