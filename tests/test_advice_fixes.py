"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. parquet_state.apply(): a bucket whose rows are ALL deleted by a
   batch must not resurrect its old rows (dynamic overwrite never
   rewrites a partition absent from the output).
2. Stale-position gating must order on the composite
   (pos_file, pos_offset) — offsets reset when the binlog rotates.
3. _pk_json must emit canonical, properly-quoted key JSON identical to
   the to_json(struct(...)) path (string PKs were emitted unquoted).
4. connection_init must run through a cursor (Connection.execute is a
   sqlite3-only shortcut; pymysql connections don't have it).
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from xxt_cdc_spark.model.envelope import RAW_BINLOG_EVENT_SCHEMA
from xxt_cdc_spark.model.positions import FilePosition, position_after, position_in_range
from xxt_cdc_spark.operators.normalize import normalize_raw_events
from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable
from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch


class TestEmptiedBucketDeletes:
    def test_bucket_fully_deleted_does_not_resurrect(self, spark, tmp_path):
        # 1 bucket → ANY delete-only batch that removes every key empties it
        table = ParquetStateTable(spark, str(tmp_path / "state"), ["k"], n_buckets=1)
        table.init(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
        deletes = spark.createDataFrame(
            [("D", 1, 1, None), ("D", 2, 2, None)], "op string, pos_offset long, k long, v string"
        )
        stats = table.apply(deletes, ["pos_offset"])
        assert stats["deletes"] == 2 and stats["emptied_buckets"] == stats["touched_buckets"]
        assert table.read().count() == 0  # pre-fix: rows resurrected here

    def test_partial_delete_keeps_other_buckets(self, spark, tmp_path):
        table = ParquetStateTable(spark, str(tmp_path / "state"), ["k"], n_buckets=8)
        table.init(spark.createDataFrame([(i, f"v{i}") for i in range(40)], "k long, v string"))
        # delete every key of bucket(k=0) only: find its bucketmates
        b0 = F.pmod(F.hash(F.col("k")), F.lit(8))
        mates = [
            r.k for r in table.read().withColumn("b", b0).filter(
                F.col("b") == F.pmod(F.hash(F.lit(0)), F.lit(8))
            ).collect()
        ]
        deletes = spark.createDataFrame(
            [("D", i + 1, k, None) for i, k in enumerate(mates)],
            "op string, pos_offset long, k long, v string",
        )
        table.apply(deletes, ["pos_offset"])
        remaining = {r.k for r in table.read().collect()}
        assert remaining == set(range(40)) - set(mates)

    def test_overwrite_mode_restored(self, spark, tmp_path):
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        table = ParquetStateTable(spark, str(tmp_path / "state"), ["k"], n_buckets=2)
        table.init(spark.createDataFrame([(1, "a")], "k long, v string"))
        table.apply(
            spark.createDataFrame([("U", 1, 1, "b")], "op string, pos_offset long, k long, v string"),
            ["pos_offset"],
        )
        assert spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static") == prev


class TestCompositePositionGate:
    def test_rotation_keeps_fresh_small_offsets(self, spark):
        df = spark.createDataFrame(
            [
                ("binlog.000001", 900, "old"),
                ("binlog.000001", 1000, "at-gate"),
                ("binlog.000002", 4, "fresh-after-rotate"),
                ("binlog.000002", 500, "fresh"),
            ],
            "pos_file string, pos_offset long, tag string",
        )
        kept = {
            r.tag
            for r in df.filter(position_after(FilePosition("binlog.000001", 1000))).collect()
        }
        # the scalar gate (pos_offset > 1000) would drop BOTH fresh events
        assert kept == {"fresh-after-rotate", "fresh"}

    def test_tuple_and_string_forms(self, spark):
        df = spark.createDataFrame(
            [("binlog.000002", 4, "x")], "pos_file string, pos_offset long, tag string"
        )
        for start in [("binlog.000001", 1000), "file:binlog.000001:1000"]:
            assert df.filter(position_after(start)).count() == 1

    def test_scalar_fallback(self, spark):
        df = spark.createDataFrame(
            [("f", 5, "lo"), ("f", 15, "hi")], "pos_file string, pos_offset long, tag string"
        )
        assert [r.tag for r in df.filter(position_after(10)).collect()] == ["hi"]

    def test_range_spans_rotation(self, spark):
        df = spark.createDataFrame(
            [
                ("binlog.000001", 999, None),
                ("binlog.000001", 1500, None),
                ("binlog.000002", 4, None),
                ("binlog.000002", 800, None),
                ("binlog.000002", 801, None),
            ],
            "pos_file string, pos_offset long, x string",
        )
        got = df.filter(
            position_in_range(FilePosition("binlog.000001", 1000), FilePosition("binlog.000002", 800))
        )
        assert {(r.pos_file, r.pos_offset) for r in got.collect()} == {
            ("binlog.000001", 1500),
            ("binlog.000002", 4),
            ("binlog.000002", 800),
        }


class TestPkJsonCanonical:
    def _raw(self, spark, rows_after, table="t"):
        return spark.createDataFrame(
            [("binlog.1", 1, None, "WRITE_ROWS", "db", table, None, rows_after, None)],
            RAW_BINLOG_EVENT_SCHEMA,
        )

    def test_string_pk_quoted(self, spark):
        raw = self._raw(spark, ['{"id":"abc","v":1}'])
        env = normalize_raw_events(raw, {"t": ["id"]})
        assert env.first().key == '{"id":"abc"}'  # pre-fix: {"id":abc}

    def test_string_pk_with_special_chars_escaped(self, spark):
        raw = self._raw(spark, ['{"id":"a,\\"}b","v":1}'])
        env = normalize_raw_events(raw, {"t": ["id"]})
        key = env.first().key
        import json

        assert json.loads(key) == {"id": 'a,"}b'}

    def test_matches_to_json_struct_path(self, spark):
        # same logical row through both producers → byte-identical keys
        raw = self._raw(spark, ['{"id":"k-1","n":7}'])
        env_key = normalize_raw_events(raw, {"t": ["id", "n"]}).first().key
        struct_key = (
            spark.createDataFrame([("k-1", 7)], "id string, n long")
            .select(F.to_json(F.struct("id", "n")).alias("k"))
            .first()
            .k
        )
        assert env_key == struct_key == '{"id":"k-1","n":7}'

    def test_numeric_pk_unquoted(self, spark):
        raw = self._raw(spark, ['{"id":42,"v":1}'])
        env = normalize_raw_events(raw, {"t": ["id"]})
        assert env.first().key == '{"id":42}'


class TestConnectionInitViaCursor:
    def test_init_statements_on_cursor_only_driver(self, spark, tmp_path):
        # defined in function scope so cloudpickle ships it by value to
        # executors (a module-level test class isn't importable there)
        class _NoExecuteConn:
            """DB-API connection WITHOUT Connection.execute — models pymysql."""

            def __init__(self, path):
                self._c = sqlite3.connect(path)

            def cursor(self):
                return self._c.cursor()

            def commit(self):
                self._c.commit()

            def rollback(self):
                self._c.rollback()

            def close(self):
                self._c.close()

            def __getattr__(self, name):
                if name == "execute":
                    raise AttributeError("no Connection.execute on this driver")
                raise AttributeError(name)

        db = str(tmp_path / "t.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
        con.commit()
        con.close()
        batch = spark.createDataFrame([("I", 1, 1, "a")], "op string, pos_offset long, k long, v string")
        apply_batch(
            batch,
            lambda: JdbcUpsertWriter(
                connect_fn=lambda: _NoExecuteConn(db),
                table="t",
                columns=["k", "v"],
                key_cols=["k"],
                dialect="sqlite",
                connection_init=["PRAGMA synchronous=OFF"],
            ),
            ["k"],
            ["pos_offset"],
            num_partitions=1,
        )
        con = sqlite3.connect(db)
        assert con.execute("SELECT v FROM t WHERE k=1").fetchone() == ("a",)
        con.close()
