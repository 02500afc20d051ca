"""Streaming LOCF gap fill vs its batch twin."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.gap_fill import bucketize, gap_fill
from xxt_cdc_spark.streaming.gap_fill_stream import streaming_gap_fill

# event values are binary-exact so the streaming path's plain double
# sums equal the batch twin's exact-decimal sums bit-for-bit
ROWS = [
    # (user, iso ts, value) — user 1 has interior gaps at hours 1-2, 4
    (1, "2024-01-01 00:10:00", 2.0),
    (1, "2024-01-01 00:40:00", 4.0),   # two events in hour 0
    (1, "2024-01-01 03:30:00", 8.0),
    (1, "2024-01-01 05:20:00", 16.0),
    # user 2: single hour
    (2, "2024-01-01 02:15:00", 1.5),
]
SENTINELS = [(1, "2024-02-01 00:00:00", 0.0), (2, "2024-02-01 00:00:00", 0.0)]
SCHEMA = "user_id long, ts timestamp, value double"


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for (u, ts, v) in rows:
            f.write(json.dumps({"user_id": u, "ts": ts, "value": v}) + "\n")
    from conftest import stamp_feed

    stamp_feed(src)


class TestStreamingGapFill:
    def test_matches_batch_twin_across_restart(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _write(src, "f0.json", ROWS[:2])
        _write(src, "f1.json", ROWS[2:])

        def run():
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .json(str(src))
            )
            filled = streaming_gap_fill(stream, watermark="0 seconds")
            q = (
                filled.writeStream.format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        # restart with the sentinel file: the watermark jumps past every
        # real bucket, finalizing them; the sentinel itself never emits
        _write(src, "f2.json", SENTINELS)
        run()

        got = sorted(
            (r.user_id, r.b, r.observed, r.n_events, r.sum_value)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )

        batch = spark.createDataFrame(ROWS, "user_id long, ts string, value double").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        observed = (
            batch.select("user_id", bucketize("ts", 3600).alias("b"), "value")
            .groupBy("user_id", "b")
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sv"))
        )
        want = sorted(
            (r.user_id, r.b, r.observed, r.n_events, r.sv_locf)
            for r in gap_fill(observed, ["user_id"], "b", ["sv"], ["n_events"]).collect()
        )
        assert got == want and len(want) == 7
        # no duplicates across the restart
        assert len(got) == len({(u, b) for (u, b, *_ ) in got})

    def test_streaming_requires_watermark(self, spark, tmp_path):
        import pytest

        src = tmp_path / "s"
        src.mkdir()
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        with pytest.raises(ValueError, match="watermark"):
            streaming_gap_fill(stream)

    def test_late_event_below_finalized_bucket_is_dropped(self, spark, tmp_path):
        """An event older than its key's last finalized bucket arrives
        after finalization: it must be ignored, not re-emitted."""
        src = tmp_path / "src"
        src.mkdir()
        _write(src, "f0.json", [(5, "2024-01-01 00:30:00", 2.0)])
        _write(src, "f1.json", [(5, "2024-01-05 00:00:00", 4.0)])  # advances wm
        # this batch runs with wm = Jan 5, FINALIZING hour 0 (lateness is
        # state-eviction-based: had hour 0 still been pending, a late
        # event would fold in — same posture as stream_join)
        _write(src, "f2.json", [(5, "2024-01-06 00:00:00", 8.0)])
        _write(src, "f3.json", [(5, "2024-01-01 00:45:00", 99.0)])  # too late
        _write(src, "f4.json", [(5, "2024-03-01 00:00:00", 0.0)])  # sentinel

        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = (
            streaming_gap_fill(stream, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {
            (r.b, r.observed): (r.n_events, r.sum_value)
            for r in spark.read.parquet(str(tmp_path / "out"))
            .filter("observed = 1")
            .collect()
        }
        # hour-0 bucket holds ONLY the on-time event; the late 99.0 never lands
        first_b = min(b for (b, _o) in rows)
        assert rows[(first_b, 1)] == (1, 2.0)


class TestStreamingGapFillAtScale:
    def test_sf0001_events_match_batch_twin(self, spark, tmp_path):
        """The whole sf0.001 events table streamed in four files: every
        watermark-closed bucket matches the batch twin (values to 1e-9
        — multi-event buckets sum in arrival order on the stream)."""
        from xxt_cdc_spark.queries.streaming import _events

        ev = _events(spark, "/root/testdata/sf0.001").select("user_id", "ts", "value", "event_id")
        rows = ev.orderBy("ts", "event_id").collect()
        src = tmp_path / "src"
        src.mkdir()
        chunk = (len(rows) + 3) // 4
        for i in range(4):
            with open(src / f"f{i}.json", "w") as f:
                for r in rows[i * chunk : (i + 1) * chunk]:
                    f.write(json.dumps({"user_id": r.user_id, "ts": r.ts.isoformat(), "value": r.value}) + "\n")
        # sentinel far past the data finalizes every real bucket
        with open(src / "f9.json", "w") as f:
            for u in {r.user_id for r in rows}:
                f.write(json.dumps({"user_id": u, "ts": "2030-01-01T00:00:00", "value": 0.0}) + "\n")

        stream = (
            spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(src))
        )
        q = (
            streaming_gap_fill(stream, bucket_seconds=3600, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        got = {
            (r.user_id, r.b): (r.observed, r.n_events, r.sum_value)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        observed = (
            ev.select("user_id", bucketize("ts", 3600).alias("b"), "value")
            .groupBy("user_id", "b")
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sv"))
        )
        want = {
            (r.user_id, r.b): (r.observed, r.n_events, r.sv_locf)
            for r in gap_fill(observed, ["user_id"], "b", ["sv"], ["n_events"]).collect()
        }
        assert set(got) == set(want) and len(want) > 1000
        for k, (obs, n, v) in want.items():
            g_obs, g_n, g_v = got[k]
            assert (g_obs, g_n) == (obs, n), k
            assert abs(g_v - v) <= 1e-9 * max(1.0, abs(v)), k
