"""Streaming sessionization with Spark's native ``session_window``:
gap-merged event-time sessions per user, finalized by the watermark.

This is the ONLINE form of the batch ``stream_sessionize`` query
(queries/streaming.py — lag/gap + running-sum session ids): Spark's
session windows start at each event and merge while successive events
arrive within the gap, which yields exactly the same (user, session)
partition of events as the batch lag-rule, hence identical per-session
counts/durations (session START identifies the session across the two
forms; the batch ordinal id is a different label for the same group).

Unlike the custom stateful operators in this package
(gap_fill_stream, topk_stream — applyInPandasWithState because their
semantics don't exist as builtins), sessionization IS a builtin: the
whole operator is a groupBy(session_window(...)) aggregation, JVM-side
state store, watermark-driven finalization in append mode, no Python
on the hot path. That's the preferred shape whenever the engine
offers the semantics natively (see the repo guideline: UDFs are the
slow path).

Scale: state is per OPEN session (user's current window + partial
aggregates), evicted at finalization; hot users don't serialize the
stream — the session merge is per-key state-store work spread across
shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """Watermarked event stream -> finalized session rows.

    Output: ``(user_id, session_start timestamp, n_events, duration_s)``
    — one row per closed session, emitted when the watermark passes the
    session end + gap. ``watermark`` is REQUIRED for streaming inputs
    (it is the session-finalization clock).
    """
    if events.isStreaming and not watermark:
        raise ValueError(
            "streaming_sessionize requires a watermark - it is the "
            "session-finalization clock"
        )
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("sw"),
            F.col(user_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
                / F.lit(1_000_000.0)
            ).alias("duration_s"),
        )
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            "n_events",
            "duration_s",
        )
    )
