"""The DBLog watermark protocol executed over the REAL transport.

test_engine.py proves the protocol against a derived changefeed; here
every phase runs on the binlog source itself: positions are actual
(file, byte-offset) pairs reported by the log writer, catchup is a
bounded BATCH read through the xxt_binlog reader, and the streaming
tail is the MicroBatchStream gated by the resume position — including
a file rotation between catchup and streaming, where a scalar offset
compare would replay or drop events.
"""

from __future__ import annotations

import json
import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.engine import CDCEngine
from xxt_cdc_spark.model.states import CDCState
from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch
from xxt_cdc_spark.streaming.binlog_source import (
    BinlogLogWriter,
    _complete_end,
    read_binlog_stream,
    register,
)


def _rec(op, k, v=None):
    return {
        "db": "d",
        "table": "t",
        "op": op,
        "ts": None,
        "gtid": None,
        "key": json.dumps({"id": k}),
        "before": json.dumps({"id": k, "v": v}) if op == "D" else None,
        "after": None if op == "D" else json.dumps({"id": k, "v": v}),
    }


ERA1 = [_rec("I", k, k) for k in range(50)]
ERA2 = [_rec("U", k, k * 100) for k in range(0, 50, 5)] + [_rec("D", k) for k in (7, 14)]
ERA3 = [_rec("I", k, k) for k in range(50, 60)] + [_rec("U", 3, 333), _rec("D", 21)]


def _expected():
    state: dict[int, int] = {}
    for r in ERA1 + ERA2 + ERA3:
        k = json.loads(r["key"])["id"]
        if r["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = json.loads(r["after"])["v"]
    return sorted(state.items())


class TestEngineOverBinlogTransport:
    def test_full_lifecycle_converges(self, spark, tmp_path):
        log = str(tmp_path / "log")
        db = str(tmp_path / "t.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        w = BinlogLogWriter(log)
        w.append(ERA1)
        register(spark)

        def master_pos():
            return (w.current, _complete_end(os.path.join(log, w.current)))

        def decode(env_df):
            return env_df.select(
                "op",
                "pos_file",
                "pos_offset",
                F.from_json("key", "id long").getField("id").alias("id"),
                F.coalesce(
                    F.from_json("after", "id long, v long").getField("v"),
                    F.lit(None).cast("long"),
                ).alias("v"),
            )

        def snapshot_source():
            # source-table state as of "now" — and, mid-snapshot, more
            # writes land (ERA2): the DBLog overlap the protocol absorbs
            state = {}
            for r in ERA1:
                state[json.loads(r["key"])["id"]] = json.loads(r["after"])["v"]
            w.append(ERA2)  # concurrent writes DURING the snapshot scan
            rows = [(k, v) for k, v in sorted(state.items())]
            return (
                spark.createDataFrame(rows, "id long, v long")
                .withColumn("op", F.lit("I"))
                .withColumn("pos_file", F.lit(""))
                .withColumn("pos_offset", F.lit(0))
            )

        def changelog(lo, hi):
            r = spark.read.format("xxt_binlog").option("path", log)
            if lo:
                r = r.option("lowerBound", f"file:{lo[0]}:{lo[1]}")
            if hi:
                r = r.option("upperBound", f"file:{hi[0]}:{hi[1]}")
            return decode(r.load())

        def apply_fn(df):
            apply_batch(
                df.select("op", "pos_file", "pos_offset", "id", "v"),
                lambda: JdbcUpsertWriter(
                    connect_fn=lambda: sqlite3.connect(db, timeout=30),
                    table="t",
                    columns=["id", "v"],
                    key_cols=["id"],
                    dialect="sqlite",
                ),
                ["id"],
                ["pos_file", "pos_offset"],
                num_partitions=2,
            )

        eng = CDCEngine(
            spark=spark,
            snapshot_source=snapshot_source,
            changelog=changelog,
            current_position=master_pos,
            apply_fn=apply_fn,
            checkpoint_dir=str(tmp_path / "ck"),
        )
        stats = eng.start(enable_snapshot=True, stream=False)
        assert eng.history == ["SNAPSHOT", "CATCHUP", "STREAMING"]
        # low was taken before ERA2 landed, high after: catchup replayed it
        assert stats["phases"][1]["low"] != stats["phases"][1]["high"]

        # --- streaming tail, across a ROTATION -------------------------
        w.rotate()
        w.append(ERA3)
        q = eng.start_streaming_query(
            decode(read_binlog_stream(spark, log)),
            lambda batch_df, _id: apply_fn(batch_df),
            available_now=True,
        )
        q.awaitTermination(120)

        con = sqlite3.connect(db)
        got = sorted(con.execute("SELECT id, v FROM t").fetchall())
        con.close()
        assert got == _expected()

    def test_stream_gate_survives_rotation(self, spark, tmp_path):
        """Resume position in file 000001; fresh events in 000002 start
        at byte 0 — the composite gate must keep them (a scalar
        pos_offset > resume_offset gate would drop every one)."""
        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(ERA1)
        resume = (w.current, _complete_end(os.path.join(log, w.current)))
        w.rotate()
        w.append([_rec("I", 100 + i, i) for i in range(5)])

        eng = CDCEngine(
            spark=spark,
            snapshot_source=lambda: None,
            changelog=lambda lo, hi: None,
            current_position=lambda: resume,
            apply_fn=lambda df: None,
            checkpoint_dir=str(tmp_path / "ck"),
        )
        eng.state = CDCState.CATCHUP
        seen: list[int] = []

        def collect(batch_df, _id):
            seen.extend(
                json.loads(r.key)["id"] for r in batch_df.select("key").collect()
            )

        q = eng.start_streaming_query(
            read_binlog_stream(spark, log), collect, available_now=True
        )
        q.awaitTermination(120)
        assert sorted(seen) == [100, 101, 102, 103, 104]
