"""Streaming windowed top-k heavy hitters: per tumbling event-time
window, the k keys with the highest event counts, emitted as one
finalized block when the watermark passes the window's end.

This is the online form of the batch `stream_topk_per_window` query
(queries/streaming.py) — rank-within-window is not expressible with
built-in streaming aggregations in append mode (a rank over an
aggregated stream needs the window CLOSED first), so it runs as a
custom stateful operator (applyInPandasWithState, the same tool as
streaming/gap_fill_stream.py).

Mechanics:

- groups are keyed by the WINDOW BUCKET (floor(ts / window)): all of a
  window's events meet in one group, which is what makes an exact
  global rank possible;
- per-group state = the window's key→count map (JSON) — O(distinct
  keys per window), NOT O(events); each trigger folds the new rows in;
- when the event-time watermark passes the window's end (observed at
  an invoke, or via the event-time timeout armed at creation so quiet
  windows flush), the group emits its top-k block — rank by
  (count DESC, key ASC), deterministic — and REMOVES its state;
- rows for a window whose state is gone and whose end is already below
  the watermark are dropped (the window was finalized — re-emitting
  would duplicate output); rows into a still-open window always fold,
  so lateness is state-eviction-based, not an input filter (the
  stream_join / gap_fill posture).

Scale, stated honestly: one group per window serializes each window's
fold through one task. The dict fold is O(rows) cheap, but a 100 TB
stream's hottest window should not transit one executor — at that
volume, run the TWO-STAGE form instead: maintain per-(window, key)
counts with an incremental aggregate (operators/incremental_agg.py's
ContinuousAggregate over the same stream) and rank the closed windows
at read time. This single-operator form is for k-of-bounded-cardinality
monitoring (event types, error codes, table names) where the per-window
key map is small by construction; state size is capped by
``max_keys`` — exceeding it raises rather than silently degrading to
an arrival-order-dependent (non-deterministic) sketch.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_SCHEMA = "counts string"


def _topk_group(
    key, pdfs: Iterator[pd.DataFrame], state, window_us: int, k: int,
    key_col: str, max_keys: int,
):
    w = int(key[0])
    wm_bucket = state.getCurrentWatermarkMs() * 1000 // window_us
    if state.exists:
        counts = json.loads(state.get[0])
    else:
        counts = None

    new_rows = 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        if counts is None:
            if w < wm_bucket:
                # the window was already finalized (state removed) —
                # these stragglers must not resurrect it
                continue
            counts = {}
        for kv in pdf["_k"]:
            counts[kv] = counts.get(kv, 0) + 1
            new_rows += 1
    if counts is not None and len(counts) > max_keys:
        raise ValueError(
            f"streaming_topk: window {w} holds {len(counts)} distinct keys "
            f"(> max_keys={max_keys}); this operator is for bounded-cardinality "
            "keys — use the two-stage ContinuousAggregate form for open domains"
        )

    if counts is None:
        # timeout fired for an already-cleared window, or only-late rows
        if state.exists:
            state.remove()
        return
    if w < wm_bucket:
        top = sorted(counts.items(), key=lambda it: (-it[1], it[0]))[:k]
        state.remove()
        yield pd.DataFrame(
            {
                "w": [w] * len(top),
                "rank": list(range(1, len(top) + 1)),
                key_col: [t[0] for t in top],
                "n": [t[1] for t in top],
            }
        )
        return
    state.update((json.dumps(counts),))
    # flush the window once the watermark passes its end even if no
    # further rows arrive for it (must stay above the current watermark
    # or the runtime rejects the timestamp)
    end_ms = (w + 1) * window_us // 1000
    state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))


def streaming_topk(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    k: int = 5,
    watermark: str | None = None,
    max_keys: int = 100_000,
) -> DataFrame:
    """Watermarked event stream -> finalized per-window top-k blocks.

    Output: ``(window_start timestamp, rank, <key_col>, n)`` — one
    block of ≤ k rows per closed window, identical to the batch twin's
    rows for every watermark-closed window. ``watermark`` is REQUIRED
    for streaming inputs: it is the window-finalization clock.
    """
    if events.isStreaming and not watermark:
        raise ValueError(
            "streaming_topk requires a watermark - it is the "
            "window-finalization clock"
        )
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    window_us = window_seconds * 1_000_000
    # the watermarked event-time column must survive the projection
    # (dropping it detaches the watermark — gap_fill_stream posture)
    prepared = events.filter(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(window_us))
        .cast("long")
        .alias("_w"),
        F.col(key_col).cast("string").alias("_k"),
        F.col(ts_col).alias("_et"),
    )

    def fn(key, pdfs, state):
        return _topk_group(key, pdfs, state, window_us, k, key_col, max_keys)

    out = prepared.groupBy("_w").applyInPandasWithState(
        fn,
        outputStructType=f"w long, rank int, {key_col} string, n long",
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
    return out.select(
        F.timestamp_micros(F.col("w") * window_us).alias("window_start"),
        "rank",
        key_col,
        "n",
    )
