"""Stream-stream watermarked interval join: streaming execution
semantics (multi-batch completeness, late-row drop, outer-row
watermark gating, state eviction).

The batch form of the same `interval_join` wrapper is oracle-gated via
the `stream_interval_join` registry entry; these tests cover what the
oracle can't — behavior across micro-batch boundaries and watermark
state movement.
"""

from __future__ import annotations

import datetime
import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from xxt_cdc_spark.streaming.stream_join import interval_join

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("rid", LongType()),
    ]
)

T0 = 1_700_000_000  # epoch seconds base


def _rows(spark, triples):
    """triples: (user_id, offset_s, rid)"""
    return spark.createDataFrame(
        [
            (u, datetime.datetime.fromtimestamp(T0 + off, datetime.timezone.utc).replace(tzinfo=None), r)
            for u, off, r in triples
        ],
        SCHEMA,
    )


def _write_files(spark, base, name, batches):
    """Write each batch as one parquet file with increasing mtime so the
    file source (maxFilesPerTrigger=1) replays them in order."""
    d = os.path.join(base, name)
    os.makedirs(d, exist_ok=True)
    t = time.time() - 1000
    for i, triples in enumerate(batches):
        sub = os.path.join(base, f"_stage_{name}_{i}")
        _rows(spark, triples).coalesce(1).write.mode("overwrite").parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"b{i:03d}.parquet")
        os.replace(os.path.join(sub, part), dst)
        os.utime(dst, (t + i, t + i))
    return d


def _stream(spark, path, ts_name):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
        .withColumnRenamed("ts", ts_name)
        .withColumnRenamed("rid", ts_name.replace("_ts", "_id"))
    )


def _run(joined, spark, name):
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    return spark.table(name), progress


class TestStreamStreamJoin:
    def test_inner_multi_batch_matches_batch(self, spark, tmp_path):
        """With a watermark wider than the data span, the streaming
        inner join over several micro-batches equals the batch join."""
        left_batches = [
            [(1, 0, 10), (2, 100, 11)],
            [(1, 500, 12), (3, 900, 13)],
        ]
        right_batches = [
            [(1, 30, 20), (2, 90, 21)],
            [(1, 560, 22), (3, 850, 23), (4, 950, 24)],
        ]
        lb = _write_files(spark, str(tmp_path), "L1", left_batches)
        rb = _write_files(spark, str(tmp_path), "R1", right_batches)
        sl = _stream(spark, lb, "l_ts")
        sr = _stream(spark, rb, "r_ts")
        out, _ = _run(
            interval_join(sl, sr, "user_id", "l_ts", "r_ts", -60, 60, watermark="1 day"),
            spark,
            "ssj_inner",
        )
        batch_l = _rows(spark, [t for b in left_batches for t in b]).withColumnRenamed("ts", "l_ts").withColumnRenamed("rid", "l_id")
        batch_r = _rows(spark, [t for b in right_batches for t in b]).withColumnRenamed("ts", "r_ts").withColumnRenamed("rid", "r_id")
        expected = interval_join(batch_l, batch_r, "user_id", "l_ts", "r_ts", -60, 60)
        got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
        want = sorted((r["l_id"], r["r_id"]) for r in expected.collect())
        assert got == want and len(want) == 4  # (10,20) (11,21) (12,22) (13,23)

    def test_late_row_misses_evicted_state(self, spark, tmp_path):
        """Lateness in a stream-stream join is enforced through STATE
        EVICTION, not an input filter: a late row arriving in the same
        batch the watermark passes its partner still matches (state is
        evicted at batch end), but one arriving after the eviction
        batch finds nothing. The missing pair exists in the batch
        join — that delta is the documented semantics."""
        left_batches = [
            [(1, 0, 10)],
            [(2, 10_000, 11)],
            [(3, 20_000, 12)],
        ]
        right_batches = [
            [(2, 10_010, 21)],
            [(3, 20_010, 22)],
            [(9, 25_000, 29)],  # watermark already past l_id=10's window; eviction done
            [(1, 30, 20)],  # late: its partner's state was evicted a batch ago
        ]
        lb = _write_files(spark, str(tmp_path), "L2", left_batches)
        rb = _write_files(spark, str(tmp_path), "R2", right_batches)
        sl = _stream(spark, lb, "l_ts")
        sr = _stream(spark, rb, "r_ts")
        out, progress = _run(
            interval_join(
                sl, sr, "user_id", "l_ts", "r_ts", -60, 60, watermark="10 seconds"
            ),
            spark,
            "ssj_late",
        )
        pairs = sorted((r["l_id"], r["r_id"]) for r in out.collect())
        assert (10, 20) not in pairs  # partner state evicted before arrival
        assert (11, 21) in pairs and (12, 22) in pairs
        removed = sum(
            s.get("numRowsRemoved", 0)
            for p in progress
            for s in (p.get("stateOperators") or [])
        )
        assert removed > 0  # the tight watermark actually evicted state
        # the batch join would have found the late pair
        batch_l = _rows(spark, [t for b in left_batches for t in b]).withColumnRenamed("ts", "l_ts").withColumnRenamed("rid", "l_id")
        batch_r = _rows(spark, [t for b in right_batches for t in b]).withColumnRenamed("ts", "r_ts").withColumnRenamed("rid", "r_id")
        full = interval_join(batch_l, batch_r, "user_id", "l_ts", "r_ts", -60, 60)
        assert (10, 20) in {(r["l_id"], r["r_id"]) for r in full.collect()}

    def test_left_outer_rows_watermark_gated(self, spark, tmp_path):
        """Unmatched left rows emit with NULL right only after the
        watermark passes their join window; rows still inside the
        final watermark window are withheld."""
        left_batches = [
            [(1, 0, 10), (2, 5, 11)],  # 11 never matches
            [(5, 50_000, 14)],  # sentinel advances watermark; also unmatched but inside window
        ]
        right_batches = [
            [(1, 20, 20)],
            [(9, 50_000, 29)],
        ]
        lb = _write_files(spark, str(tmp_path), "L3", left_batches)
        rb = _write_files(spark, str(tmp_path), "R3", right_batches)
        sl = _stream(spark, lb, "l_ts")
        sr = _stream(spark, rb, "r_ts")
        out, _ = _run(
            interval_join(
                sl, sr, "user_id", "l_ts", "r_ts", -60, 60, watermark="30 seconds", how="left_outer"
            ),
            spark,
            "ssj_outer",
        )
        rows = {(r["l_id"], r["r_id"]) for r in out.collect()}
        assert (10, 20) in rows  # matched pair
        assert (11, None) in rows  # watermark passed its window -> NULL emitted
        assert (14, None) not in rows  # window not yet cleared -> withheld

    def test_rejects_same_ts_name(self, spark):
        df = _rows(spark, [(1, 0, 1)])
        with pytest.raises(ValueError):
            interval_join(df, df, "user_id", "ts", "ts", 0, 60)


class TestReviewRegressions:
    def test_right_outer_preserves_key(self, spark):
        l = _rows(spark, [(1, 0, 10)]).withColumnRenamed("ts", "l_ts").withColumnRenamed("rid", "l_id")
        r = _rows(spark, [(1, 20, 20), (7, 30, 21)]).withColumnRenamed("ts", "r_ts").withColumnRenamed("rid", "r_id")
        out = interval_join(l, r, "user_id", "l_ts", "r_ts", -60, 60, how="full_outer")
        rows = {(x["user_id"], x["l_id"], x["r_id"]) for x in out.collect()}
        assert (7, None, 21) in rows  # unmatched right row keeps its key

    def test_streaming_without_watermark_rejected(self, spark, tmp_path):
        d = _write_files(spark, str(tmp_path), "WM", [[(1, 0, 1)]])
        s = _stream(spark, d, "l_ts")
        b = _rows(spark, [(1, 0, 2)]).withColumnRenamed("ts", "r_ts").withColumnRenamed("rid", "r_id")
        with pytest.raises(ValueError, match="watermark"):
            interval_join(s, b, "user_id", "l_ts", "r_ts", -60, 60)
