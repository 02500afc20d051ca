"""Streaming gap fill (LOCF): the online form of
operators/gap_fill.py, emitting one finalized dense bucket row per
(key, bucket) as the event-time watermark passes the bucket's end.

Only LOCF is possible online — linear interpolation needs the NEXT
observation, which for a just-finalized bucket may be arbitrarily far
in the future; batch `gap_fill` provides it for closed ranges.

Mechanics (applyInPandasWithState, the engine's custom-stateful tool):

- per-key state = (last finalized bucket, its carried value, pending
  per-bucket partial aggregates as JSON) — O(open buckets) per key,
  bounded by lateness horizon / bucket width;
- each trigger folds the group's new rows into the pending partials
  (count + exact-pennies-free double sum of one micro-batch's rows —
  order within a batch is not replayed, so the streaming form's sums
  are at normal floating-point determinism, unlike the oracle-gated
  batch twin);
- every OBSERVED pending bucket strictly below the watermark bucket
  finalizes in order, emitting the interior gap rows (zero-counted,
  carry-filled) between consecutive observations — trailing gaps are
  never emitted, so the output matches the batch twin's grid on every
  watermark-closed prefix; an event-time timeout armed at the earliest
  pending bucket's end re-invokes quiet keys so their tails flush;
- rows at or above the watermark bucket stay pending, and late rows
  into a NOT-yet-finalized bucket still fold in — lateness is
  state-eviction-based, not an input filter (the stream_join posture);
  rows into an already-finalized bucket are dropped.

Correctness is pinned against the batch twin in
tests/test_gap_fill_stream.py: a multi-batch checkpointed run emits
precisely the batch LOCF rows for every bucket the final watermark
closed, with no duplicates.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_SCHEMA = "last_bucket long, last_value double, pending string"


def _fill_group(key, pdfs: Iterator[pd.DataFrame], state, bucket_us: int, key_col: str):
    if state.exists:
        last_b, last_v, pending_json = state.get
        pending = {int(k): v for k, v in json.loads(pending_json).items()}
    else:
        last_b, last_v, pending = None, None, {}

    for pdf in pdfs:
        for b, n, s in zip(pdf["b"], pdf["n"], pdf["s"]):
            b = int(b)
            if last_b is not None and b <= last_b:
                continue  # too late: bucket already finalized and emitted
            cur = pending.get(b, (0, 0.0))
            pending[b] = (cur[0] + int(n), cur[1] + float(s))

    wm_bucket = int(state.getCurrentWatermarkMs() * 1000 // bucket_us)
    out = []
    # finalize OBSERVED buckets below the watermark in order, emitting
    # the interior gap rows between consecutive observations — trailing
    # gaps are never emitted (a live series has no last bucket yet), so
    # the emitted set matches the batch twin's grid exactly on every
    # watermark-closed prefix
    for b in sorted(x for x in pending if x < wm_bucket):
        n, s = pending.pop(b)
        if last_b is not None:
            for g in range(last_b + 1, b):
                out.append((key[0], g, 0, 0, last_v))
        out.append((key[0], b, 1, n, s))
        last_b, last_v = b, s
    state.update((last_b, last_v, json.dumps(pending)))
    if pending:
        # arm an event-time timeout at the earliest pending bucket's
        # end so the group is re-invoked (and finalizes) when the
        # watermark passes it even if no further data arrives for this
        # key — without this, a quiet key's last buckets never flush
        state.setTimeoutTimestamp((min(pending) + 1) * bucket_us // 1000)
    if out:
        yield pd.DataFrame(out, columns=[key_col, "b", "observed", "n_events", "sum_value"])


def streaming_gap_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Watermarked event stream -> dense finalized LOCF bucket rows.

    ``watermark`` (e.g. ``"1 hour"``) is applied to ``ts_col`` and is
    REQUIRED for streaming inputs (same posture as
    streaming/stream_join.py): the watermark is the bucket-finalization
    clock, and without one no bucket would ever finalize.
    """
    if events.isStreaming and not watermark:
        raise ValueError(
            "streaming_gap_fill requires a watermark - it is the "
            "bucket-finalization clock"
        )
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    bucket_us = bucket_seconds * 1_000_000
    # output/state schemas derive the key field from the INPUT schema
    # (r4 ADVICE: a hardcoded 'user_id long' broke non-long keys at
    # runtime despite the parametrized API); the key keeps its name
    key_type = events.schema[key_col].dataType.simpleString()
    for reserved in ("b", "observed", "n_events", "sum_value"):
        if key_col == reserved:
            raise ValueError(f"key_col {key_col!r} collides with an output column")
    out_schema = (
        f"{key_col} {key_type}, b long, observed int, n_events long, sum_value double"
    )
    # the watermarked event-time column must SURVIVE the projection —
    # dropping it detaches the watermark and getCurrentWatermarkMs()
    # inside the state function raises
    partial = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col),
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(bucket_us))
        .cast("long")
        .alias("b"),
        F.lit(1).alias("n"),
        F.col(value_col).cast("double").alias("s"),
        F.col(ts_col).alias("_et"),
    )

    def fn(key, pdfs, state):
        return _fill_group(key, pdfs, state, bucket_us, key_col)

    return partial.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
