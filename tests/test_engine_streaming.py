"""Full lifecycle integration: snapshot + catchup (batch phases), then a
real checkpointed streaming tail picking up exactly where catchup
stopped — the complete C30 phase machine end to end."""

from __future__ import annotations

import json
import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD, orders_changefeed, to_envelope
from xxt_cdc_spark.engine import CDCEngine
from xxt_cdc_spark.operators.apply import apply_changes
from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch
from xxt_cdc_spark.streaming.pipeline import read_envelope_stream

HIGH = 80000  # catchup stops here; the stream replays the rest


@pytest.fixture()
def target_db(tmp_path):
    path = str(tmp_path / "target.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
        " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
    )
    con.commit()
    con.close()
    return path


def _apply_typed(df, target_db):
    cast = df.selectExpr(
        "op", "pos_offset", "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "cast(o_orderdate as string) AS o_orderdate", "o_orderpriority",
    )
    apply_batch(
        cast,
        lambda: JdbcUpsertWriter(
            connect_fn=lambda: sqlite3.connect(target_db, timeout=30),
            table="orders",
            columns=ORDERS_PAYLOAD,
            key_cols=["o_orderkey"],
            dialect="sqlite",
        ),
        ["o_orderkey"],
        ["pos_offset"],
        4,
    )


class TestFullLifecycle:
    def test_snapshot_catchup_then_streaming_tail(self, spark, sf_dir, tmp_path, target_db):
        base = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cf = orders_changefeed(spark, sf_dir)

        # the "binlog tail" arrives as envelope JSON files
        src = str(tmp_path / "tail")
        os.makedirs(src)
        env = to_envelope(cf).orderBy("pos_offset")
        rows = [r.asDict() for r in env.collect()]
        for r in rows:
            r["ts"] = r["ts"].isoformat() if r["ts"] else None
        with open(os.path.join(src, "tail.json"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

        positions = iter([0, HIGH])
        eng = CDCEngine(
            spark=spark,
            snapshot_source=lambda: apply_changes(
                base, cf.filter(F.col("pos_offset") <= HIGH), ["o_orderkey"], ["pos_offset"]
            ).withColumn("op", F.lit("I")).withColumn("pos_offset", F.lit(0)),
            changelog=lambda lo, hi: cf.filter(F.col("pos_offset") > lo).filter(
                F.col("pos_offset") <= hi if hi is not None else F.lit(True)
            ),
            current_position=lambda: next(positions),
            apply_fn=lambda df: _apply_typed(df, target_db),
            checkpoint_dir=str(tmp_path / "ck"),
        )
        eng.start(enable_snapshot=True, stream=False)
        assert eng.history == ["SNAPSHOT", "CATCHUP", "STREAMING"]

        # streaming tail: the WHOLE feed is in the file (includes events
        # catchup already applied — the position gate must skip them)
        def stream_apply(batch_df, _id):
            from xxt_cdc_spark.operators.normalize import envelope_to_typed

            schema = base.schema
            iu = envelope_to_typed(batch_df.filter(F.col("op") != "D"), "orders", schema, "after")
            d = envelope_to_typed(batch_df.filter(F.col("op") == "D"), "orders", schema, "before")
            _apply_typed(iu.unionByName(d), target_db)

        q = eng.start_streaming_query(
            read_envelope_stream(spark, src), stream_apply, available_now=True
        )
        q.awaitTermination(180)

        # converged state must equal full replay
        expected = apply_changes(base, cf, ["o_orderkey"], ["pos_offset"])
        exp = sorted(
            (r.o_orderkey, r.o_orderstatus) for r in expected.select("o_orderkey", "o_orderstatus").collect()
        )
        con = sqlite3.connect(target_db)
        got = sorted(con.execute("SELECT o_orderkey, o_orderstatus FROM orders").fetchall())
        con.close()
        assert got == [tuple(t) for t in exp]


class TestStreamingDeadLetters:
    def test_writer_failures_persisted_not_dropped(self, spark, tmp_path):
        dead_dir = str(tmp_path / "dead")
        db = str(tmp_path / "nodb.db")  # table never created → NON_RETRYABLE
        changes = spark.createDataFrame(
            [("I", 1, 1, "a"), ("I", 2, 2, "b")],
            "op string, pos_offset long, k long, v string",
        )
        apply_batch(
            changes,
            lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=5),
                table="missing",
                columns=["k", "v"],
                key_cols=["k"],
                dialect="sqlite",
            ),
            ["k"],
            ["pos_offset"],
            2,
            dead_letter_dir=dead_dir,
        )
        files = os.listdir(dead_dir)
        assert files
        letters = []
        for fn in files:
            with open(os.path.join(dead_dir, fn)) as f:
                letters.extend(json.loads(line) for line in f)
        assert len(letters) == 2
        assert all("no such table" in l["error"] for l in letters)
