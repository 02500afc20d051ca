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
