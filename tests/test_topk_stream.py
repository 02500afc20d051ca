"""Streaming windowed top-k vs its batch twin."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.streaming.topk_stream import streaming_topk

SCHEMA = "event_type string, ts timestamp"

# hour 0: a=3, b=2, c=1 → top2 = [a, b]; hour 1: b=1, c=1 → ties rank
# by key → [b, c]; hour 3: d only
ROWS = [
    ("a", "2024-01-01 00:05:00"),
    ("a", "2024-01-01 00:15:00"),
    ("b", "2024-01-01 00:20:00"),
    ("a", "2024-01-01 00:25:00"),
    ("c", "2024-01-01 00:40:00"),
    ("b", "2024-01-01 00:50:00"),
    ("c", "2024-01-01 01:10:00"),
    ("b", "2024-01-01 01:30:00"),
    ("d", "2024-01-01 03:45:00"),
]
# Two sentinel files, BOTH inside one far-future window: the second
# sentinel's data batch runs with the watermark already past every real
# window's end, so all pending event-time timeouts fire in a DATA batch
# deterministically — finalization does not depend on whether the
# engine schedules a trailing no-data batch before availableNow
# terminates (observed racy: ~1-in-10 runs missed the final window).
# The sentinel window itself never closes, so it never emits.
SENTINEL = [("z", "2024-02-01 00:00:00")]
SENTINEL2 = [("z", "2024-02-01 00:10:00")]


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for (k, ts) in rows:
            f.write(json.dumps({"event_type": k, "ts": ts}) + "\n")


from conftest import stamp_feed


def _run(spark, src, out, ck, k=2):
    stamp_feed(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(src))
    )
    q = (
        streaming_topk(stream, k=k, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "streaming query did not terminate"


class TestStreamingTopK:
    def test_matches_batch_twin_across_restart(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _write(src, "f0.json", ROWS[:4])
        _write(src, "f1.json", ROWS[4:])
        _run(spark, src, tmp_path / "out", tmp_path / "ck")
        # restart with the sentinels: the watermark jumps past every real
        # window, finalizing them; the sentinel window itself never emits
        _write(src, "f2.json", SENTINEL)
        _write(src, "f3.json", SENTINEL2)
        _run(spark, src, tmp_path / "out", tmp_path / "ck")

        got = sorted(
            (r.window_start.isoformat(), r.rank, r.event_type, r.n)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )
        assert got == [
            ("2024-01-01T00:00:00", 1, "a", 3),
            ("2024-01-01T00:00:00", 2, "b", 2),
            ("2024-01-01T01:00:00", 1, "b", 1),
            ("2024-01-01T01:00:00", 2, "c", 1),
            ("2024-01-01T03:00:00", 1, "d", 1),
        ]
        # no duplicate (window, rank) across the restart
        assert len(got) == len({(w, r) for (w, r, *_rest) in got})

    def test_requires_watermark(self, spark, tmp_path):
        src = tmp_path / "s"
        src.mkdir()
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        with pytest.raises(ValueError, match="watermark"):
            streaming_topk(stream)

    def test_late_rows_cannot_resurrect_finalized_window(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _write(src, "f0.json", [("a", "2024-01-01 00:30:00")])
        _write(src, "f1.json", [("x", "2024-01-05 00:00:00")])  # advances wm
        # this batch runs with wm = Jan 5: hour 0's timeout fires and the
        # window FINALIZES with only 'a' (lateness is state-eviction-
        # based — had hour 0 still been open, a late row would fold in,
        # same posture as gap_fill/stream_join)
        _write(src, "f2.json", [("y", "2024-01-06 00:00:00")])
        _write(src, "f3.json", [("b", "2024-01-01 00:45:00")])  # too late
        _write(src, "f4.json", [("z", "2024-03-01 00:00:00")])  # sentinel
        _write(src, "f5.json", [("z", "2024-03-01 00:10:00")])  # sentinel 2
        _run(spark, src, tmp_path / "out", tmp_path / "ck", k=3)
        got = sorted(
            (r.window_start.isoformat(), r.rank, r.event_type, r.n)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )
        # hour 0 emitted once, with only the on-time event; the late 'b'
        # neither re-emits the window nor appears anywhere
        assert got == [
            ("2024-01-01T00:00:00", 1, "a", 1),
            ("2024-01-05T00:00:00", 1, "x", 1),
            ("2024-01-06T00:00:00", 1, "y", 1),
        ]

    def test_bounded_key_guard(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _write(src, "f0.json", [(f"k{i}", "2024-01-01 00:30:00") for i in range(40)])
        _write(src, "f1.json", SENTINEL)
        stamp_feed(src)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = (
            streaming_topk(stream, k=2, watermark="0 seconds", max_keys=10)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception, match="max_keys"):
            q.awaitTermination(120)
            raise AssertionError("stream should have failed on the key guard")


class TestStreamingTopKAtScale:
    def test_sf0001_events_match_batch_twin(self, spark, tmp_path):
        """The whole sf0.001 events table streamed in four files: every
        watermark-closed window's block equals the batch twin query."""
        from xxt_cdc_spark.queries.streaming import (
            TOPK_WINDOW_K,
            _events,
            stream_topk_per_window,
        )

        ev = _events(spark, "/root/testdata/sf0.001").select("event_type", "ts", "event_id")
        rows = ev.orderBy("ts", "event_id").collect()
        src = tmp_path / "src"
        src.mkdir()
        chunk = (len(rows) + 3) // 4
        for i in range(4):
            with open(src / f"f{i}.json", "w") as f:
                for r in rows[i * chunk : (i + 1) * chunk]:
                    f.write(
                        json.dumps({"event_type": r.event_type, "ts": r.ts.isoformat()})
                        + "\n"
                    )
        with open(src / "f9.json", "w") as f:
            f.write(json.dumps({"event_type": "z", "ts": "2030-01-01T00:00:00"}) + "\n")
        with open(src / "f9b.json", "w") as f:
            f.write(json.dumps({"event_type": "z", "ts": "2030-01-01T00:10:00"}) + "\n")

        _run(spark, src, tmp_path / "out", tmp_path / "ck", k=TOPK_WINDOW_K)
        got = sorted(
            (r.window_start, r.rank, r.event_type, r.n)
            for r in spark.read.parquet(str(tmp_path / "out"))
            .filter(F.col("window_start") < "2029-01-01")
            .collect()
        )
        want = sorted(
            (r.window_start, r.rank, r.event_type, r.n)
            for r in stream_topk_per_window(spark, "/root/testdata/sf0.001").collect()
        )
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        assert got == want, f"missing={missing[:10]} extra={extra[:10]}"
        assert len(want) > 100
