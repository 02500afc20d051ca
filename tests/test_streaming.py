"""Structured Streaming pipeline tests: file-source envelope stream →
filter → foreachBatch apply, with checkpoint resume."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from xxt_cdc_spark.changefeed import orders_changefeed, to_envelope
from xxt_cdc_spark.operators.apply import apply_changes
from xxt_cdc_spark.operators.table_filter import TableFilter
from xxt_cdc_spark.streaming.pipeline import CDCStreamPipeline, read_envelope_stream


def _write_envelope_chunks(spark, sf_dir, out_dir: str, n_chunks: int = 3) -> int:
    """Materialize the derived changefeed as JSON-lines files (the
    streaming source), split into position ranges to mimic arrival."""
    env = to_envelope(orders_changefeed(spark, sf_dir)).orderBy("pos_offset")
    rows = [r.asDict() for r in env.collect()]
    for r in rows:
        r["ts"] = r["ts"].isoformat() if r["ts"] else None
    os.makedirs(out_dir, exist_ok=True)
    chunk = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        with open(os.path.join(out_dir, f"chunk_{i}.json"), "w") as f:
            for r in rows[i * chunk : (i + 1) * chunk]:
                f.write(json.dumps(r) + "\n")
    return len(rows)


def _write_binlog_chunks(spark, sf_dir, log_dir: str, n_chunks: int = 3) -> int:
    """Same changefeed, written through the native binlog transport —
    one log file per chunk (rotate() between chunks), so the e2e also
    exercises source-owned offsets and mid-stream rotation."""
    from xxt_cdc_spark.streaming.binlog_source import BinlogLogWriter

    env = to_envelope(orders_changefeed(spark, sf_dir)).orderBy("pos_offset")
    recs = [
        {k: r[k] for k in ("db", "table", "op", "ts", "gtid", "key", "before", "after")}
        for r in env.collect()
    ]
    w = BinlogLogWriter(log_dir)
    chunk = (len(recs) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        if i:
            w.rotate()
        w.append(recs[i * chunk : (i + 1) * chunk])
    return len(recs)


def _make_source(spark, transport: str, src_dir: str):
    if transport == "binlog":
        from xxt_cdc_spark.streaming.binlog_source import read_binlog_stream

        return read_binlog_stream(spark, src_dir)
    return read_envelope_stream(spark, src_dir, max_files_per_trigger=1)


import pytest  # noqa: E402


class TestStreamingPipeline:
    @pytest.mark.parametrize("transport", ["file", "binlog"])
    def test_stream_applies_and_converges(self, spark, sf_dir, tmp_path, transport):
        src_dir = str(tmp_path / "envelopes")
        if transport == "binlog":
            total = _write_binlog_chunks(spark, sf_dir, src_dir)
        else:
            total = _write_envelope_chunks(spark, sf_dir, src_dir)

        applied_batches: list[int] = []
        state_holder = {"state": spark.read.parquet(f"{sf_dir}/orders.parquet")}
        orders_schema = state_holder["state"].schema

        def apply_fn(batch_df, batch_id):
            from xxt_cdc_spark.operators.normalize import envelope_to_typed

            typed_iu = envelope_to_typed(batch_df.filter(F.col("op") != "D"), "orders", orders_schema, "after")
            typed_d = envelope_to_typed(batch_df.filter(F.col("op") == "D"), "orders", orders_schema, "before")
            changes = typed_iu.unionByName(typed_d)
            applied_batches.append(changes.count())
            state_holder["state"] = apply_changes(
                state_holder["state"].localCheckpoint(),
                changes,
                ["o_orderkey"],
                ["pos_file", "pos_offset"],
            ).localCheckpoint()

        pipe = CDCStreamPipeline(
            spark=spark,
            source=_make_source(spark, transport, src_dir),
            apply_fn=apply_fn,
            checkpoint_dir=str(tmp_path / "ckpt"),
            table_filter=TableFilter(include_tables=["orders"]),
        )
        q = pipe.start(available_now=True)
        q.awaitTermination(120)

        assert sum(applied_batches) == total
        # converged state == batch oracle (apply whole feed at once)
        expected = apply_changes(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            orders_changefeed(spark, sf_dir),
            ["o_orderkey"],
            ["pos_offset"],
        )
        got = state_holder["state"]
        assert got.count() == expected.count()
        diff = got.select("o_orderkey", "o_orderstatus", "o_totalprice").exceptAll(
            expected.select("o_orderkey", "o_orderstatus", "o_totalprice")
        )
        assert diff.count() == 0

    def test_checkpoint_resume_skips_processed_files(self, spark, sf_dir, tmp_path):
        src_dir = str(tmp_path / "envelopes")
        ckpt = str(tmp_path / "ckpt")
        _write_envelope_chunks(spark, sf_dir, src_dir, n_chunks=2)

        counts: list[int] = []

        def apply_fn(batch_df, batch_id):
            counts.append(batch_df.count())

        def run():
            pipe = CDCStreamPipeline(
                spark=spark,
                source=read_envelope_stream(spark, src_dir),
                apply_fn=apply_fn,
                checkpoint_dir=ckpt,
            )
            q = pipe.start(available_now=True)
            q.awaitTermination(120)

        run()
        first_total = sum(counts)
        assert first_total > 0

        # restart with no new files: the checkpoint must suppress replay
        counts.clear()
        run()
        assert sum(counts) == 0

        # new file arrives → only it is processed (offset WAL parity, C22/C23)
        extra = os.path.join(src_dir, "chunk_late.json")
        with open(extra, "w") as f:
            f.write(
                json.dumps(
                    {
                        "db": "testdb",
                        "table": "orders",
                        "op": "I",
                        "ts": None,
                        "pos_file": "binlog.000002",
                        "pos_offset": 1,
                        "gtid": None,
                        "key": '{"o_orderkey":999999}',
                        "before": None,
                        "after": '{"o_orderkey":999999}',
                    }
                )
                + "\n"
            )
        counts.clear()
        run()
        assert sum(counts) == 1

    def test_table_filter_drops_excluded(self, spark, sf_dir, tmp_path):
        src_dir = str(tmp_path / "envelopes")
        _write_envelope_chunks(spark, sf_dir, src_dir, n_chunks=1)
        seen: list[int] = []

        pipe = CDCStreamPipeline(
            spark=spark,
            source=read_envelope_stream(spark, src_dir),
            apply_fn=lambda df, _id: seen.append(df.count()),
            checkpoint_dir=str(tmp_path / "ckpt"),
            table_filter=TableFilter(exclude_tables=["orders"]),
        )
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        assert sum(seen) == 0


class TestKafkaAdapter:
    def test_kafka_records_round_trip_envelope(self, spark, sf_dir):
        """Kafka record (binary key/value) → envelope: the decode/parse
        transform must reproduce the original envelope rows exactly.
        (The Kafka socket transport itself is jar-gated; this covers
        every line of logic the adapter adds on top of it.)"""
        from xxt_cdc_spark.streaming.pipeline import kafka_records_to_envelope

        env = to_envelope(orders_changefeed(spark, sf_dir)).limit(500)
        # serialize exactly as a Debezium-ish producer would: key = pk
        # JSON bytes, value = envelope JSON bytes (micros ts format)
        from xxt_cdc_spark.model.envelope import TS_JSON_FORMAT

        records = env.select(
            F.col("key").cast("binary").alias("key"),
            F.to_json(
                F.struct(*[F.col(c) for c in env.columns]),
                {"timestampFormat": TS_JSON_FORMAT, "timestampNTZFormat": TS_JSON_FORMAT},
            ).cast("binary").alias("value"),
            F.lit("cdc.testdb.orders").alias("topic"),
            F.lit(0).alias("partition"),
            F.monotonically_increasing_id().alias("offset"),
        )
        decoded = kafka_records_to_envelope(records)
        assert decoded.columns == env.columns
        assert decoded.count() == env.count()
        # row-level equality both directions
        assert decoded.exceptAll(env).count() == 0
        assert env.exceptAll(decoded).count() == 0

    def test_kafka_records_feed_pipeline_filter(self, spark, sf_dir):
        """Decoded Kafka records compose with the pipeline's T5 filter
        and LWW collapse the same as the file source."""
        from xxt_cdc_spark.operators.collapse import last_write_wins
        from xxt_cdc_spark.streaming.pipeline import kafka_records_to_envelope

        env = to_envelope(orders_changefeed(spark, sf_dir))
        records = env.select(F.to_json(F.struct(*env.columns)).cast("binary").alias("value"))
        decoded = kafka_records_to_envelope(records)
        flt = TableFilter(include_tables=["orders"])
        kept = decoded.filter(flt.predicate())
        assert kept.count() == env.count()
        collapsed = last_write_wins(kept, ["key"], ["pos_offset"])
        expected = last_write_wins(env, ["key"], ["pos_offset"])
        assert collapsed.count() == expected.count()


class TestTypedEnvelopeSource:
    def test_single_parse_matches_double_parse(self, spark, sf_dir, tmp_path):
        """read_typed_envelope_stream (text + ONE from_json with the
        payload struct inlined — the Debezium nested-image wire shape)
        must yield the same typed rows as the two-step shape (JSON
        envelope source + a second from_json of the row images)."""
        import json as _json

        from xxt_cdc_spark.streaming.pipeline import read_typed_envelope_stream

        env = to_envelope(orders_changefeed(spark, sf_dir)).orderBy("pos_offset").limit(2000)
        rows = [r.asDict() for r in env.collect()]
        src = str(tmp_path / "src")
        os.makedirs(src)
        with open(os.path.join(src, "c0.json"), "w") as f:
            for i, r in enumerate(rows):
                # half the rows carry a micro-precision ts, half a
                # plain ISO second — the lenient decode must take both
                r["ts"] = r["ts"].isoformat() if r["ts"] else None
                for c in ("before", "after"):
                    r[c] = _json.loads(r[c]) if r[c] else None
                f.write(_json.dumps(r) + "\n")

        payload = (
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string"
        )
        got_rows = []

        def sink(batch_df, _id):
            got_rows.extend(
                batch_df.selectExpr(
                    "op", "pos_offset", "coalesce(after, before) p"
                ).selectExpr("op", "pos_offset", "p.*").collect()
            )

        q = (
            read_typed_envelope_stream(spark, src, payload)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        expected = (
            env.selectExpr(
                "op", "pos_offset",
                f"from_json(coalesce(after, before), '{payload}') AS p",
            )
            .selectExpr("op", "pos_offset", "p.*")
            .collect()
        )
        assert len(got_rows) == len(expected) == 2000
        key = lambda r: (r.pos_offset, r.op)  # noqa: E731
        assert sorted(got_rows, key=key) == sorted(expected, key=key)
        # no row was nulled by a parse failure
        assert all(r.o_orderkey is not None for r in got_rows)


class TestLowLatencyPipeline:
    def test_packaged_low_latency_posture_converges(self, spark, sf_dir, tmp_path):
        """read_typed_envelope_stream + low_latency_apply_fn (the r7
        latency posture as a first-class API) must converge the
        changefeed to the same state as the batch apply."""
        import json as _json
        import sqlite3

        from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD
        from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch
        from xxt_cdc_spark.streaming.pipeline import (
            CDCStreamPipeline,
            low_latency_apply_fn,
            read_typed_envelope_stream,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        env = to_envelope(orders_changefeed(spark, sf_dir)).orderBy("pos_offset")
        rows = [r.asDict() for r in env.collect()]
        for i in range(3):
            lo, hi = i * len(rows) // 3, (i + 1) * len(rows) // 3
            with open(os.path.join(src, f"c{i}.json"), "w") as f:
                for r in rows[lo:hi]:
                    r = dict(r)
                    r["ts"] = r["ts"].isoformat() if r["ts"] else None
                    for c in ("before", "after"):
                        r[c] = _json.loads(r[c]) if r[c] else None
                    f.write(_json.dumps(r) + "\n")

        payload = (
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string"
        )

        def mk_db(name):
            db = str(tmp_path / name)
            con = sqlite3.connect(db)
            con.execute(
                "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
                " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
            )
            con.commit()
            con.close()
            return db

        def wf(db):
            return lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=60),
                table="orders", columns=ORDERS_PAYLOAD, key_cols=["o_orderkey"],
                dialect="sqlite",
            )

        db_stream = mk_db("s.db")
        pipe = CDCStreamPipeline(
            spark=spark,
            source=read_typed_envelope_stream(spark, src, payload, max_files_per_trigger=1),
            apply_fn=low_latency_apply_fn(wf(db_stream), ["o_orderkey"], ["pos_offset"]),
            checkpoint_dir=str(tmp_path / "ck"),
        )
        q = pipe.start(available_now=True)
        q.awaitTermination(240)

        db_batch = mk_db("b.db")
        cf = orders_changefeed(spark, sf_dir).selectExpr(
            "op", "pos_offset", "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "cast(o_orderdate as string) AS o_orderdate", "o_orderpriority",
        )
        apply_batch(cf, wf(db_batch), ["o_orderkey"], ["pos_offset"], 4)

        def state(db):
            con = sqlite3.connect(db)
            out = sorted(con.execute(
                "SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS TEXT) FROM orders"
            ).fetchall())
            con.close()
            return out

        assert state(db_stream) == state(db_batch)
