"""Additive sink schema evolution: new envelope columns → ALTER TABLE
ADD COLUMN → replication continues with the widened schema."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F
from pyspark.sql import types as T

from xxt_cdc_spark.sinks.schema_evolution import diff_new_columns, evolve_table
from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch


class TestDiff:
    def test_detects_new_and_ignores_case(self):
        incoming = T.StructType(
            [
                T.StructField("ID", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        new = diff_new_columns(incoming, {"id", "NAME"})
        assert [c.name for c in new] == ["score"]
        assert new[0].ddl_type == "DOUBLE"

    def test_sqlite_affinity_mapping(self):
        incoming = T.StructType([T.StructField("flags", T.LongType())])
        new = diff_new_columns(incoming, set(), dialect="sqlite")
        assert new[0].ddl_type == "INTEGER"


class TestEvolveAndReplicate:
    def test_new_column_added_then_applied(self, spark, tmp_path):
        db = str(tmp_path / "evolve.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
        con.execute("INSERT INTO t VALUES (1, 'old-row')")
        con.commit()
        con.close()

        # source grew a column `extra`
        changes = spark.createDataFrame(
            [("I", 10, 2, "new-row", 3.5), ("U", 11, 1, "old-row-upd", 9.9)],
            "op string, pos_offset long, k long, v string, extra double",
        )
        added = evolve_table(
            lambda: sqlite3.connect(db), "t", changes.drop("op", "pos_offset").schema, "sqlite"
        )
        assert [c.name for c in added] == ["extra"]

        apply_batch(
            changes,
            lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=30),
                table="t",
                columns=["k", "v", "extra"],
                key_cols=["k"],
                dialect="sqlite",
            ),
            ["k"],
            ["pos_offset"],
            2,
        )
        con = sqlite3.connect(db)
        rows = {r[0]: r for r in con.execute("SELECT k, v, extra FROM t").fetchall()}
        con.close()
        assert rows[1] == (1, "old-row-upd", 9.9)
        assert rows[2] == (2, "new-row", 3.5)

    def test_idempotent_no_new_columns(self, tmp_path):
        db = str(tmp_path / "e2.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
        con.commit()
        con.close()
        schema = T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        )
        assert evolve_table(lambda: sqlite3.connect(db), "t", schema, "sqlite") == []
        assert evolve_table(lambda: sqlite3.connect(db), "t", schema, "sqlite") == []


class TestStreamingEvolution:
    def test_midstream_new_column_evolves_sink(self, spark, tmp_path):
        """Envelope stream whose payload grows a column mid-stream: the
        EvolvingTableSink must ALTER the sqlite sink once, backfill NULL
        for old rows, and keep replicating with the widened schema."""
        import json

        from pyspark.sql import types as T

        from xxt_cdc_spark.sinks.schema_evolution import EvolvingTableSink
        from xxt_cdc_spark.streaming.pipeline import CDCStreamPipeline, read_envelope_stream

        src = str(tmp_path / "src")
        import os

        os.makedirs(src)

        def env_row(op, pos, payload):
            return {
                "db": "d", "table": "t", "op": op,
                "ts": "2026-01-01T00:00:00", "pos_file": "b.1", "pos_offset": pos,
                "gtid": None, "key": json.dumps({"k": payload["k"]}),
                "before": None, "after": json.dumps(payload),
            }

        # batch 1: original 2-column schema; batch 2: grows `score`
        with open(f"{src}/c0.json", "w") as f:
            f.write(json.dumps(env_row("I", 1, {"k": 1, "v": "a"})) + "\n")
            f.write(json.dumps(env_row("I", 2, {"k": 2, "v": "b"})) + "\n")
        with open(f"{src}/c1.json", "w") as f:
            f.write(json.dumps(env_row("I", 3, {"k": 3, "v": "c", "score": 1.5})) + "\n")
            f.write(json.dumps(env_row("U", 4, {"k": 1, "v": "a2", "score": 9.25})) + "\n")

        db = str(tmp_path / "t.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
        con.commit()
        con.close()

        sink = EvolvingTableSink(
            connect_fn=lambda: sqlite3.connect(db, timeout=30),
            table="t",
            initial_schema=T.StructType(
                [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
            ),
            key_cols=["k"],
            dialect="sqlite",
            num_partitions=2,
        )
        pipe = CDCStreamPipeline(
            spark=spark,
            source=read_envelope_stream(spark, src, max_files_per_trigger=1),
            apply_fn=sink,
            checkpoint_dir=str(tmp_path / "ck"),
        )
        q = pipe.start(available_now=True)
        q.awaitTermination(120)

        assert [c.name for c in sink.evolved] == ["score"]
        assert [f.name for f in sink.schema.fields] == ["k", "v", "score"]
        con = sqlite3.connect(db)
        rows = {r[0]: r for r in con.execute("SELECT k, v, score FROM t").fetchall()}
        con.close()
        # old row updated with the new column; pre-evolution insert has NULL
        assert rows[1] == (1, "a2", 9.25)
        assert rows[2] == (2, "b", None)
        assert rows[3] == (3, "c", 1.5)

    def test_inferred_types_long_double_string(self, spark):
        import json

        from pyspark.sql import types as T

        from xxt_cdc_spark.sinks.schema_evolution import EvolvingTableSink

        sink = EvolvingTableSink(
            connect_fn=lambda: None, table="t",
            initial_schema=T.StructType([T.StructField("k", T.LongType())]),
            key_cols=["k"],
        )
        batch = spark.createDataFrame(
            [(json.dumps({"k": 1, "n": 7, "x": 1.5, "s": "hi"}), None)],
            "after string, before string",
        )
        fields = {f.name: f.dataType for f in sink._infer_types(batch, {"n", "x", "s"})}
        assert fields == {
            "n": T.LongType(), "x": T.DoubleType(), "s": T.StringType(),
        }

    def test_midstream_evolution_over_binlog_transport(self, spark, tmp_path):
        """Same mid-stream column growth, but fed by the binlog source:
        the evolution detector sees payload keys regardless of
        transport, and the ALTER lands once even though the second era
        arrives after a checkpointed restart."""
        import json

        from pyspark.sql import types as T

        from xxt_cdc_spark.sinks.schema_evolution import EvolvingTableSink
        from xxt_cdc_spark.streaming.binlog_source import (
            BinlogLogWriter,
            read_binlog_stream,
        )
        from xxt_cdc_spark.streaming.pipeline import CDCStreamPipeline

        def rec(op, payload):
            return {
                "db": "d", "table": "t", "op": op, "ts": None, "gtid": None,
                "key": json.dumps({"k": payload["k"]}),
                "before": None, "after": json.dumps(payload),
            }

        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append([rec("I", {"k": 1, "v": "a"}), rec("I", {"k": 2, "v": "b"})])

        db = str(tmp_path / "t.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
        con.commit()
        con.close()

        sink = EvolvingTableSink(
            connect_fn=lambda: sqlite3.connect(db, timeout=30),
            table="t",
            initial_schema=T.StructType(
                [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
            ),
            key_cols=["k"],
            dialect="sqlite",
            num_partitions=2,
        )

        def run():
            pipe = CDCStreamPipeline(
                spark=spark,
                source=read_binlog_stream(spark, log),
                apply_fn=sink,
                checkpoint_dir=str(tmp_path / "ck"),
            )
            q = pipe.start(available_now=True)
            q.awaitTermination(120)

        run()  # era 1: original schema
        w.append([rec("I", {"k": 3, "v": "c", "score": 1.5}),
                  rec("U", {"k": 1, "v": "a2", "score": 9.25})])
        run()  # era 2 after restart: schema grows

        assert [c.name for c in sink.evolved] == ["score"]
        con = sqlite3.connect(db)
        rows = {r[0]: r for r in con.execute("SELECT k, v, score FROM t").fetchall()}
        con.close()
        assert rows[1] == (1, "a2", 9.25)
        assert rows[2] == (2, "b", None)
        assert rows[3] == (3, "c", 1.5)
