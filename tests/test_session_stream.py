"""Native session_window streaming sessionization vs the batch twin."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.streaming.session_stream import streaming_sessionize

SCHEMA = "user_id long, ts timestamp"


from conftest import stamp_feed


def _run(spark, src, out, ck, gap_minutes=30):
    stamp_feed(src)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(src))
    )
    q = (
        streaming_sessionize(stream, gap_minutes=gap_minutes, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "streaming query did not terminate"


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for (u, ts) in rows:
            f.write(json.dumps({"user_id": u, "ts": ts}) + "\n")


class TestStreamingSessionize:
    def test_gap_merge_semantics(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        # user 1: 3 events within the gap = one session; a 4th event
        # 2h later = a second session. user 2: one singleton.
        _write(src, "f0.json", [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:10:00"),
            (1, "2024-01-01 00:25:00"),
            (2, "2024-01-01 00:05:00"),
        ])
        _write(src, "f1.json", [(1, "2024-01-01 02:30:00")])
        # double sentinel (same far-future session): finalization fires
        # in a DATA batch, not a racy trailing no-data batch
        _write(src, "f2.json", [(9, "2024-06-01 00:00:00")])
        _write(src, "f3.json", [(9, "2024-06-01 00:10:00")])
        _run(spark, src, tmp_path / "out", tmp_path / "ck")
        got = sorted(
            (r.user_id, r.session_start.isoformat(), r.n_events, r.duration_s)
            for r in spark.read.parquet(str(tmp_path / "out"))
            .filter(F.col("session_start") < "2024-06-01")
            .collect()
        )
        assert got == [
            (1, "2024-01-01T00:00:00", 3, 1500.0),
            (1, "2024-01-01T02:30:00", 1, 0.0),
            (2, "2024-01-01T00:05:00", 1, 0.0),
        ]

    def test_requires_watermark(self, spark, tmp_path):
        src = tmp_path / "s"
        src.mkdir()
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        with pytest.raises(ValueError, match="watermark"):
            streaming_sessionize(stream)

    def test_sf0001_matches_batch_twin(self, spark, tmp_path):
        """The full sf0.001 events table streamed in four files: closed
        sessions equal the batch lag-rule sessionization (keyed by
        session START — the two forms label sessions differently but
        partition events identically)."""
        from xxt_cdc_spark.queries.streaming import SESSION_GAP_MIN, _events

        ev = _events(spark, "/root/testdata/sf0.001").select("user_id", "ts", "event_id")
        rows = ev.orderBy("ts", "event_id").collect()
        src = tmp_path / "src"
        src.mkdir()
        chunk = (len(rows) + 3) // 4
        for i in range(4):
            with open(src / f"f{i}.json", "w") as f:
                for r in rows[i * chunk : (i + 1) * chunk]:
                    f.write(
                        json.dumps({"user_id": r.user_id, "ts": r.ts.isoformat()}) + "\n"
                    )
        _write(src, "f8.json", [(99, "2030-01-01 00:00:00")])
        _write(src, "f9.json", [(99, "2030-01-01 00:10:00")])

        _run(spark, src, tmp_path / "out", tmp_path / "ck", gap_minutes=SESSION_GAP_MIN)
        got = sorted(
            (r.user_id, r.session_start, r.n_events, round(r.duration_s, 6))
            for r in spark.read.parquet(str(tmp_path / "out"))
            .filter(F.col("session_start") < "2029-01-01")
            .collect()
        )

        # batch twin re-keyed by session start (the shared label)
        want = sorted(
            (r.user_id, r.session_start, r.n_events, round(r.duration_s, 6))
            for r in _batch_by_start(spark).collect()
        )
        assert got == want and len(want) > 100


def _batch_by_start(spark):
    """Batch lag-rule sessionization keyed by session start."""
    from pyspark.sql import Window

    from xxt_cdc_spark.queries.streaming import SESSION_GAP_MIN, _events

    ev = _events(spark, "/root/testdata/sf0.001")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = (gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000)).cast("int")
    sessioned = ev.withColumn("session_id", F.sum(new_session).over(w))
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / F.lit(1_000_000.0)
            ).alias("duration_s"),
        )
        .select("user_id", "session_start", "n_events", "duration_s")
    )
