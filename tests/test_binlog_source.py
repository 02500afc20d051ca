"""The binlog MicroBatchStream transport (S1) — source-owned offsets.

Covers the semantics the reference's BinaryLogClient machinery provides
(reader/MySQLBinlogReader.scala:63-140): position seek (file + GTID),
bounded-queue backpressure, rotation, and checkpoint-exact resume.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.streaming.binlog_source import (
    BinlogLogWriter,
    _complete_end,
    read_binlog_stream,
    register,
)


def _mk_records(lo: int, hi: int, gtid_uuid: str = "aaaa-bbbb"):
    return [
        {
            "db": "testdb",
            "table": "orders",
            "op": "I",
            "ts": None,
            "gtid": f"{gtid_uuid}:{i}",
            "key": json.dumps({"id": i}),
            "before": None,
            "after": json.dumps({"id": i, "v": i * 10}),
        }
        for i in range(lo, hi)
    ]


def _drain(spark, sdf, ckpt, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


class TestBinlogStream:
    def test_basic_read_offsets_are_file_positions(self, spark, tmp_path):
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 20))
        out = _drain(
            spark,
            read_binlog_stream(spark, log),
            str(tmp_path / "ck"),
            "bl_basic",
        ).collect()
        assert len(out) == 20
        assert {r.pos_file for r in out} == {"binlog.000001"}
        # pos_offset = real byte offset of each record start: strictly
        # increasing, first at 0, and re-reading the file at that offset
        # yields exactly that record
        offs = sorted(r.pos_offset for r in out)
        assert offs[0] == 0 and len(set(offs)) == 20
        with open(os.path.join(log, "binlog.000001"), "rb") as f:
            f.seek(offs[3])
            assert json.loads(f.readline())["key"] == json.dumps({"id": 3})

    def test_backpressure_bounds_each_batch(self, spark, tmp_path):
        # NOTE: Python stream sources fall back to single-batch execution
        # under Trigger.AvailableNow, so the bounded advance is observed
        # with a continuous trigger + poll instead. The FIRST batch of a
        # run is deliberately unbudgeted (the restart-safety contract:
        # latestOffset cannot see the checkpointed start, so the first
        # call returns the true end — see BinlogStreamReader), so the
        # budget is asserted on records appended AFTER the stream start.
        import time

        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 10))  # small seed drains in batch 0
        per_rec = _complete_end(os.path.join(log, "binlog.000001")) // 10
        sdf = read_binlog_stream(spark, log, max_bytes_per_trigger=per_rec * 30)
        q = (
            sdf.writeStream.format("memory")
            .queryName("bl_bp")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline:
                if spark.sql("SELECT count(*) n FROM bl_bp").first().n >= 10:
                    break
                time.sleep(0.2)
            w.append(_mk_records(10, 210))  # steady-state backlog: 200 records
            deadline = time.monotonic() + 90
            while time.monotonic() < deadline:
                if spark.sql("SELECT count(*) n FROM bl_bp").first().n >= 210:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(30)
        assert spark.sql("SELECT count(*) n FROM bl_bp").first().n == 210
        # the bounded advance must split the appended backlog into >1
        # batch (~30 records/budget over 200 appended records)
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(progress) >= 5, [p["numInputRows"] for p in progress]

    def test_rotation_keeps_composite_order(self, spark, tmp_path):
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 10))
        w.rotate()
        w.append(_mk_records(10, 25))
        out = _drain(
            spark, read_binlog_stream(spark, log), str(tmp_path / "ck"), "bl_rot"
        )
        rows = out.select("pos_file", "pos_offset", "key").collect()
        assert len(rows) == 25
        by_file = {}
        for r in rows:
            by_file.setdefault(r.pos_file, []).append(r.pos_offset)
        assert set(by_file) == {"binlog.000001", "binlog.000002"}
        # offsets RESET on rotation — both files start at 0; the
        # composite (file, offset) sort must replay insertion order
        assert min(by_file["binlog.000002"]) == 0
        ids = [
            json.loads(r.key)["id"]
            for r in sorted(rows, key=lambda r: (r.pos_file, r.pos_offset))
        ]
        assert ids == list(range(25))

    def test_seek_file_position(self, spark, tmp_path):
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 10))
        mid_file, mid_off = w.append(_mk_records(10, 15))
        w.append(_mk_records(15, 20))
        out = _drain(
            spark,
            read_binlog_stream(
                spark, log, starting_position=f"file:{mid_file}:{mid_off}"
            ),
            str(tmp_path / "ck"),
            "bl_seek",
        ).collect()
        ids = sorted(json.loads(r.key)["id"] for r in out)
        assert ids == list(range(15, 20))

    def test_seek_latest_sees_only_new(self, spark, tmp_path):
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 50))
        sdf = read_binlog_stream(spark, log, starting_position="latest")
        # initialOffset resolves at stream start; append after
        q = (
            sdf.writeStream.format("memory")
            .queryName("bl_latest")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            import time

            time.sleep(2)
            w.append(_mk_records(50, 55))
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                if spark.sql("SELECT count(*) n FROM bl_latest").first().n >= 5:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(30)
        ids = sorted(
            json.loads(r.key)["id"]
            for r in spark.sql("SELECT key FROM bl_latest").collect()
        )
        assert ids == list(range(50, 55))

    def test_gtid_seek_skips_executed_set(self, spark, tmp_path):
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(1, 31))  # gtids aaaa-bbbb:1-30
        # executed set with a GAP (7 missing) — a string compare would
        # misplace this; interval containment starts at the gap
        out = _drain(
            spark,
            read_binlog_stream(spark, log, starting_gtids="aaaa-bbbb:1-6:8-30"),
            str(tmp_path / "ck"),
            "bl_gtid",
        ).collect()
        ids = sorted(json.loads(r.key)["id"] for r in out)
        assert ids[0] == 7  # first non-contained transaction

    def test_checkpoint_resume_exactly_once(self, spark, tmp_path):
        """Kill/restart across appends and a rotation: every record
        delivered exactly once, on checkpoint offsets alone."""
        log = str(tmp_path / "log")
        ck = str(tmp_path / "ck")
        sink = str(tmp_path / "sink")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 40))

        def run_once():
            q = (
                read_binlog_stream(spark, log)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        w.append(_mk_records(40, 60))
        w.rotate()
        w.append(_mk_records(60, 75))
        run_once()
        got = spark.read.parquet(sink).select("key").collect()
        ids = sorted(json.loads(r.key)["id"] for r in got)
        assert ids == list(range(75))  # no gaps, no duplicates

    def test_torn_tail_line_is_withheld(self, spark, tmp_path):
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 5))
        # simulate a crash mid-append: no trailing newline
        with open(os.path.join(log, "binlog.000001"), "a") as f:
            f.write('{"db":"testdb","table":"orders","op":"I","key":"{')
        out = _drain(
            spark, read_binlog_stream(spark, log), str(tmp_path / "ck"), "bl_torn"
        )
        assert out.count() == 5  # torn record invisible until completed

    def test_batch_reader_bounded_range(self, spark, tmp_path):
        """The T8 catchup cut executed against the transport itself."""
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 10))
        lo_file, lo_off = w.current, _complete_end(os.path.join(log, w.current))
        w.append(_mk_records(10, 30))
        hi_file, hi_off = w.current, _complete_end(os.path.join(log, w.current))
        w.append(_mk_records(30, 40))
        register(spark)
        df = (
            spark.read.format("xxt_binlog")
            .option("path", log)
            .option("lowerBound", f"file:{lo_file}:{lo_off}")
            .option("upperBound", f"file:{hi_file}:{hi_off}")
            .load()
        )
        ids = sorted(json.loads(r.key)["id"] for r in df.collect())
        assert ids == list(range(10, 30))

    def test_stream_into_upsert_sink_converges(self, spark, tmp_path):
        """e2e: transport → LWW collapse → keyed state; duplicates of the
        same position collapse (effectively-once downstream of the
        exactly-once transport)."""
        from xxt_cdc_spark.operators.collapse import last_write_wins

        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        recs = _mk_records(0, 10)
        # two versions of key 3: later position must win
        upd = dict(recs[3])
        upd["op"] = "U"
        upd["after"] = json.dumps({"id": 3, "v": 999})
        w.append(recs + [upd])
        env = _drain(
            spark, read_binlog_stream(spark, log), str(tmp_path / "ck"), "bl_ups"
        )
        typed = env.select(
            "op",
            "pos_file",
            "pos_offset",
            F.from_json("after", "id long, v long").alias("p"),
        ).select("op", "pos_file", "pos_offset", "p.*")
        state = last_write_wins(
            typed.withColumn("key_id", F.col("id")), ["key_id"], ["pos_file", "pos_offset"]
        )
        vals = {r.id: r.v for r in state.collect()}
        assert vals[3] == 999 and vals[2] == 20 and len(vals) == 10


class TestPipelineOverBinlogTransport:
    def test_filter_and_transport_dedup_compose(self, spark, tmp_path):
        """CDCStreamPipeline's stages (table include/exclude filter,
        watermarked transport dedup) run unchanged on the binlog
        source: duplicate deliveries of the same (table, key, position)
        collapse, and excluded tables never reach the sink."""
        from xxt_cdc_spark.operators.table_filter import TableFilter
        from xxt_cdc_spark.streaming.pipeline import CDCStreamPipeline

        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        now = "2024-01-01T00:00:00"

        def rec(table, k, seq):
            return {
                "db": "testdb", "table": table, "op": "I", "ts": now,
                "gtid": None, "key": json.dumps({"id": k}),
                "before": None, "after": json.dumps({"id": k, "seq": seq}),
            }

        w.append(
            [rec("orders", k, k) for k in range(10)]
            + [rec("orders", 3, 3)]          # duplicate delivery of key 3
            + [rec("audit_log", 1, 1)]        # excluded table
        )
        seen: list[tuple] = []

        def collect(batch_df, _id):
            seen.extend(
                (r.table, json.loads(r.key)["id"]) for r in batch_df.collect()
            )

        # NOTE: the source assigns pos_offset = real byte offsets, so the
        # duplicate DELIVERY has a distinct position; transport dedup must
        # key on the logical identity (db, table, key) within the
        # watermark, not the transport position
        pipe = CDCStreamPipeline(
            spark=spark,
            source=read_binlog_stream(spark, log),
            apply_fn=collect,
            checkpoint_dir=str(tmp_path / "ck"),
            table_filter=TableFilter(include_tables=["orders"]),
            dedup_watermark=("ts", "10 minutes"),
        )
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        assert all(t == "orders" for t, _ in seen)
        # key 3 delivered twice at two byte positions: both survive a
        # (key, pos)-keyed dedup — they are distinct transport events —
        # so downstream LWW absorbs them; the excluded table is gone
        ids = sorted(k for _, k in seen)
        assert set(ids) == set(range(10))


class TestCompleteEnd:
    def test_torn_record_longer_than_probe_window_withheld(self, tmp_path):
        """A torn tail record larger than the 64 KB probe must still be
        withheld — the back-scan widens until it finds the last real
        newline (or the file start)."""
        fp = tmp_path / "binlog.000001"
        good = b'{"k":1}\n{"k":2}\n'
        torn = b'{"big":"' + b"x" * (200 << 10)  # 200 KB, no newline
        fp.write_bytes(good + torn)
        assert _complete_end(str(fp)) == len(good)

    def test_whole_file_is_one_torn_record(self, tmp_path):
        fp = tmp_path / "binlog.000001"
        fp.write_bytes(b"no-newline-" * (20 << 10))
        assert _complete_end(str(fp)) == 0


class TestRestartRecovery:
    def test_restart_with_backlog_beyond_budget(self, spark, tmp_path):
        """A restarted query whose backlog-from-earliest exceeds
        maxBytesPerTrigger must resume AT the checkpointed frontier:
        the old budgeted-from-initial latestOffset deterministically
        landed exactly ON the frontier, planning no-op windows forever
        (measured stall: 62/2200 records delivered, stream never
        progressed again)."""
        log = str(tmp_path / "log")
        ck = str(tmp_path / "ck")
        sink = str(tmp_path / "sink")
        w = BinlogLogWriter(log)
        w.append(_mk_records(0, 300))

        def run_once():
            q = (
                read_binlog_stream(spark, log, max_bytes_per_trigger=4096)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()  # availableNow + budget: delivers ≥1 budget's worth
        first = spark.read.parquet(sink).count()
        assert first >= 1
        w.append(_mk_records(300, 340))
        run_once()  # restart: recovery batch must cover frontier → true end
        got = spark.read.parquet(sink).select("key").collect()
        ids = sorted(json.loads(r.key)["id"] for r in got)
        assert ids == list(range(340))  # no gaps, no duplicates, no stall
