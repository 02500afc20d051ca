"""Streaming windowed top-k on ``transformWithStateInPandas`` — the
same operator as streaming/topk_stream.py, carried by Spark 4's
arbitrary-state API (SPARK-49564 transformWithState) instead of the
older ``applyInPandasWithState``.

Why a second implementation exists (and is kept deliberately small):

- **typed, incremental state** — the window's key→count map is a real
  ``MapState`` (per-entry point reads/writes against the state store)
  instead of one JSON blob value re-serialized whole every trigger; at
  a 100 TB stream's state sizes the blob rewrite is O(state) per
  trigger while MapState touches only the keys the trigger saw;
- **first-class timers** — window finalization is a registered
  event-time timer (``handleExpiredTimer``), not a timeout re-armed by
  hand inside the fold;
- the old-API twin stays registered as the compatibility form (TWS
  requires the RocksDB state store provider in some modes and is the
  newer, less battle-tested engine path); both are pinned equal by
  tests/test_topk_tws.py on the same feed.

ENVIRONMENT GATE (same class as the Kafka adapter): TWS's Python
driver worker imports ``google.protobuf`` at runtime
(StateMessage_pb2), which is absent in this image — the query crashes
with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE/ImportError
(verified 2026-08-15, root cause pinned in tests/test_topk_tws.py,
which skips cleanly). The moment the environment carries protobuf,
the equivalence tests light up unchanged.

Semantics are IDENTICAL to streaming_topk: groups keyed by window
bucket, one ≤k block emitted when the watermark passes the window end,
stragglers into finalized windows dropped, ``max_keys`` refusal rather
than a silent arrival-order sketch. See topk_stream.py's docstring for
the scale posture (this single-operator form is for bounded-cardinality
keys; the two-stage ContinuousAggregate form is the hottest-window
answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class _WindowTopKProcessor(StatefulProcessor):
    def __init__(self, window_us: int, k: int, key_col: str, max_keys: int) -> None:
        self.window_us = window_us
        self.k = k
        self.key_col = key_col
        self.max_keys = max_keys

    def init(self, handle) -> None:
        self.handle = handle
        # per-entry map state: this is the whole point of the TWS form
        self.counts = handle.getMapState("counts", "k string", "n long")
        # distinct-key count (MapState has no O(1) size) + timer-armed flag
        self.meta = handle.getValueState("meta", "n_keys long")

    def handleInputRows(self, key, rows, timerValues):
        w = int(key[0])
        window_end_ms = (w + 1) * self.window_us // 1000
        wm = timerValues.getCurrentWatermarkInMs()
        armed = self.meta.exists()
        if not armed and window_end_ms <= wm:
            # window already finalized (state cleared): stragglers must
            # not resurrect it — same posture as the old-API twin
            return iter([])
        folded: dict[str, int] = {}
        for pdf in rows:
            for kv in pdf["_k"]:
                folded[kv] = folded.get(kv, 0) + 1
        n_keys = int(self.meta.get()[0]) if armed else 0
        for kv, c in folded.items():
            kt = (kv,)
            if self.counts.containsKey(kt):
                self.counts.updateValue(kt, (int(self.counts.getValue(kt)[0]) + c,))
            else:
                n_keys += 1
                if n_keys > self.max_keys:
                    raise ValueError(
                        f"streaming_topk_tws: window {w} exceeds max_keys="
                        f"{self.max_keys} distinct keys; use the two-stage "
                        "ContinuousAggregate form for unbounded cardinality"
                    )
                self.counts.updateValue(kt, (c,))
        self.meta.update((n_keys,))
        if not armed:
            # event-time timer at the window end: fires when the
            # watermark passes it, even if the window goes quiet
            self.handle.registerTimer(window_end_ms)
        return iter([])

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        w = int(key[0])
        items = sorted(
            ((str(kt[0]), int(v[0])) for kt, v in self.counts.iterator()),
            key=lambda t: (-t[1], t[0]),
        )[: self.k]
        self.counts.clear()
        self.meta.clear()
        if items:
            yield pd.DataFrame(
                {
                    "w": [w] * len(items),
                    "rank": list(range(1, len(items) + 1)),
                    self.key_col: [t[0] for t in items],
                    "n": [t[1] for t in items],
                }
            )

    def close(self) -> None:
        pass


def streaming_topk_tws(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    k: int = 5,
    watermark: str | None = None,
    max_keys: int = 100_000,
) -> DataFrame:
    """``streaming_topk`` on the transformWithState API — identical
    output contract: ``(window_start timestamp, rank, <key_col>, n)``,
    one finalized block per closed window."""
    if events.isStreaming and not watermark:
        raise ValueError(
            "streaming_topk_tws requires a watermark - it is the "
            "window-finalization clock"
        )
    if watermark:
        events = events.withWatermark(ts_col, watermark)
    window_us = window_seconds * 1_000_000
    prepared = events.filter(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(window_us))
        .cast("long")
        .alias("_w"),
        F.col(key_col).cast("string").alias("_k"),
        F.col(ts_col).alias("_et"),
    )
    out = prepared.groupBy("_w").transformWithStateInPandas(
        statefulProcessor=_WindowTopKProcessor(window_us, k, key_col, max_keys),
        outputStructType=f"w long, rank int, {key_col} string, n long",
        outputMode="append",
        timeMode="eventTime",
    )
    return out.select(
        F.timestamp_micros(F.col("w") * window_us).alias("window_start"),
        "rank",
        key_col,
        "n",
    )
