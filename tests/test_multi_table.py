"""Multi-table envelope pipeline: one stream carrying two tables
(composite-PK lineitem + orders) fanned out to per-table sinks."""

from __future__ import annotations

import sqlite3

import pytest

from xxt_cdc_spark.changefeed import (
    LINEITEM_PAYLOAD,
    ORDERS_PAYLOAD,
    lineitem_changefeed,
    orders_changefeed,
    to_envelope,
)
from xxt_cdc_spark.operators.apply import apply_changes
from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, TableSink, apply_batch_multi


@pytest.fixture()
def target_db(tmp_path):
    path = str(tmp_path / "multi.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
        " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
    )
    con.execute(
        "CREATE TABLE lineitem (l_orderkey INTEGER, l_linenumber INTEGER, l_partkey INTEGER,"
        " l_suppkey INTEGER, l_quantity REAL, l_extendedprice REAL,"
        " PRIMARY KEY (l_orderkey, l_linenumber))"
    )
    con.commit()
    con.close()
    return path


def _sink(path, table, columns, keys):
    return TableSink(
        writer_factory=lambda: JdbcUpsertWriter(
            connect_fn=lambda: sqlite3.connect(path, timeout=30),
            table=table,
            columns=columns,
            key_cols=keys,
            dialect="sqlite",
        ),
        key_cols=keys,
        schema=None,  # filled in test
    )


class TestMultiTableApply:
    def test_two_tables_converge(self, spark, sf_dir, target_db):
        orders_cast = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*LINEITEM_PAYLOAD)

        env = to_envelope(orders_changefeed(spark, sf_dir)).unionByName(
            to_envelope(
                lineitem_changefeed(spark, sf_dir),
                table="lineitem",
                key_cols=["l_orderkey", "l_linenumber"],
                payload_cols=LINEITEM_PAYLOAD,
                ts_col=None,
            )
        )

        orders_sink = _sink(target_db, "orders", ORDERS_PAYLOAD, ["o_orderkey"])
        orders_sink.schema = orders_cast.schema
        li_sink = _sink(target_db, "lineitem", LINEITEM_PAYLOAD, ["l_orderkey", "l_linenumber"])
        li_sink.schema = li.schema

        applied = apply_batch_multi(env, {"orders": orders_sink, "lineitem": li_sink}, 4)
        assert set(applied) == {"orders", "lineitem"}

        con = sqlite3.connect(target_db)
        # orders converge to the single-table oracle
        got_orders = con.execute("SELECT count(*) FROM orders").fetchone()[0]
        exp_orders = apply_changes(
            orders_cast, orders_changefeed(spark, sf_dir), ["o_orderkey"], ["pos_offset"]
        ).count()
        assert got_orders == exp_orders
        # lineitem (composite PK) converges too
        got_li = con.execute("SELECT count(*) FROM lineitem").fetchone()[0]
        exp_li = apply_changes(
            li, lineitem_changefeed(spark, sf_dir), ["l_orderkey", "l_linenumber"], ["pos_offset"]
        ).count()
        assert got_li == exp_li
        # spot-check an updated composite-key row
        row = con.execute(
            "SELECT l_quantity FROM lineitem WHERE (l_orderkey + l_linenumber) % 5 = 0"
            " AND (l_orderkey + l_linenumber) % 9 <> 0 LIMIT 1"
        ).fetchone()
        assert row is not None
        con.close()

    def test_unregistered_table_skipped(self, spark, sf_dir, target_db):
        env = to_envelope(orders_changefeed(spark, sf_dir), table="unknown_table")
        applied = apply_batch_multi(env, {}, 4)
        assert applied == {}

    def test_applied_counts_from_writer_stats(self, spark, sf_dir, target_db):
        """applied[table] equals rows the writers actually executed
        (collapsed count), with no per-table count() job."""
        orders_cast = spark.read.parquet(f"{sf_dir}/orders.parquet")
        env = to_envelope(orders_changefeed(spark, sf_dir))
        orders_sink = _sink(target_db, "orders", ORDERS_PAYLOAD, ["o_orderkey"])
        orders_sink.schema = orders_cast.schema
        applied = apply_batch_multi(env, {"orders": orders_sink}, 4)
        from xxt_cdc_spark.operators.collapse import last_write_wins

        expected = last_write_wins(env, ["key"], ["pos_offset"]).count()
        assert applied["orders"] == expected


class TestFanoutApply:
    def test_fanout_converges_same_as_per_table(self, spark, sf_dir, tmp_path, target_db):
        """The single-job fanout path produces the same converged sqlite
        state as the per-table JVM-parsed path."""
        from xxt_cdc_spark.sinks.upsert import apply_batch_fanout

        orders_cast = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*LINEITEM_PAYLOAD)
        env = to_envelope(orders_changefeed(spark, sf_dir)).unionByName(
            to_envelope(
                lineitem_changefeed(spark, sf_dir),
                table="lineitem",
                key_cols=["l_orderkey", "l_linenumber"],
                payload_cols=LINEITEM_PAYLOAD,
                ts_col=None,
            )
        )
        orders_sink = _sink(target_db, "orders", ORDERS_PAYLOAD, ["o_orderkey"])
        orders_sink.schema = orders_cast.schema
        li_sink = _sink(target_db, "lineitem", LINEITEM_PAYLOAD, ["l_orderkey", "l_linenumber"])
        li_sink.schema = li.schema

        applied = apply_batch_fanout(env, {"orders": orders_sink, "lineitem": li_sink}, 4)
        assert set(applied) == {"orders", "lineitem"}

        con = sqlite3.connect(target_db)
        exp_orders = apply_changes(
            orders_cast, orders_changefeed(spark, sf_dir), ["o_orderkey"], ["pos_offset"]
        ).count()
        assert con.execute("SELECT count(*) FROM orders").fetchone()[0] == exp_orders
        exp_li = apply_changes(
            li, lineitem_changefeed(spark, sf_dir), ["l_orderkey", "l_linenumber"], ["pos_offset"]
        ).count()
        assert con.execute("SELECT count(*) FROM lineitem").fetchone()[0] == exp_li
        con.close()

    def test_fanout_job_count_independent_of_table_count(self, spark, sf_dir, tmp_path):
        """Widening 1 table → 12 tables must not widen the Spark job
        count (the round-1 verdict's 100k-tables scale concern)."""
        import sqlite3 as sq

        from pyspark.sql import functions as F

        from xxt_cdc_spark.sinks.upsert import apply_batch_fanout

        def run_group(group, n_tables):
            db = str(tmp_path / f"fan{n_tables}.db")
            con = sq.connect(db)
            sinks = {}
            base = to_envelope(orders_changefeed(spark, sf_dir)).filter(
                F.col("pos_offset") % 200 == 1
            )
            parts = []
            for i in range(n_tables):
                t = f"t{i}"
                con.execute(
                    f"CREATE TABLE {t} (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
                    " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
                )
                sinks[t] = _sink(db, t, ORDERS_PAYLOAD, ["o_orderkey"])
                parts.append(base.withColumn("table", F.lit(t)))
            con.commit()
            con.close()
            env = parts[0]
            for p in parts[1:]:
                env = env.unionByName(p)
            sc = spark.sparkContext
            sc.setJobGroup(group, group)
            try:
                applied = apply_batch_fanout(env, sinks, 4)
            finally:
                sc.setJobGroup(None, None)
            assert len(applied) == n_tables
            return len(sc.statusTracker().getJobIdsForGroup(group))

        jobs_1 = run_group("fanout-narrow", 1)
        jobs_12 = run_group("fanout-wide", 12)
        assert jobs_12 == jobs_1, (jobs_1, jobs_12)


class TestMultiTableOverBinlogTransport:
    def test_streamed_fanout_converges_per_table(self, spark, tmp_path, target_db):
        """One binlog log carrying two tables with different schemas,
        streamed through CDCStreamPipeline into apply_batch_multi:
        each table's slice decodes against its own schema and lands in
        its own target, with the transport's (file, byte-pos) clock
        ordering the LWW."""
        import json as _json

        from xxt_cdc_spark.streaming.binlog_source import (
            BinlogLogWriter,
            read_binlog_stream,
        )
        from xxt_cdc_spark.streaming.pipeline import CDCStreamPipeline

        con = sqlite3.connect(target_db)
        con.execute("CREATE TABLE users (uid INTEGER PRIMARY KEY, name TEXT)")
        con.execute(
            "CREATE TABLE items (a INTEGER, b INTEGER, qty REAL, PRIMARY KEY (a, b))"
        )
        con.commit()
        con.close()

        def urec(op, uid, name=None):
            img = _json.dumps({"uid": uid, "name": name})
            return {
                "db": "d", "table": "users", "op": op, "ts": None, "gtid": None,
                "key": _json.dumps({"uid": uid}),
                "before": img if op == "D" else None,
                "after": None if op == "D" else img,
            }

        def irec(op, a, b, qty=None):
            img = _json.dumps({"a": a, "b": b, "qty": qty})
            return {
                "db": "d", "table": "items", "op": op, "ts": None, "gtid": None,
                "key": _json.dumps({"a": a, "b": b}),
                "before": img if op == "D" else None,
                "after": None if op == "D" else img,
            }

        log = str(tmp_path / "log")
        w = BinlogLogWriter(log)
        w.append(
            [urec("I", u, f"u{u}") for u in range(20)]
            + [irec("I", a, b, float(a + b)) for a in range(5) for b in range(4)]
        )
        w.rotate()  # interleave a rotation mid-history
        w.append(
            [urec("U", 3, "renamed"), urec("D", 7)]
            + [irec("U", 1, 1, 99.0), irec("D", 2, 2)]
        )

        users_sink = _sink(target_db, "users", ["uid", "name"], ["uid"])
        users_sink.schema = spark.createDataFrame([], "uid long, name string").schema
        items_sink = _sink(target_db, "items", ["a", "b", "qty"], ["a", "b"])
        items_sink.schema = spark.createDataFrame([], "a long, b long, qty double").schema
        sinks = {"users": users_sink, "items": items_sink}

        pipe = CDCStreamPipeline(
            spark=spark,
            source=read_binlog_stream(spark, log),
            apply_fn=lambda df, _id: apply_batch_multi(df, sinks, 2),
            checkpoint_dir=str(tmp_path / "ck"),
        )
        q = pipe.start(available_now=True)
        q.awaitTermination(120)

        con = sqlite3.connect(target_db)
        assert con.execute("SELECT count(*) FROM users").fetchone()[0] == 19
        assert con.execute("SELECT name FROM users WHERE uid = 3").fetchone()[0] == "renamed"
        assert con.execute("SELECT count(*) FROM users WHERE uid = 7").fetchone()[0] == 0
        assert con.execute("SELECT count(*) FROM items").fetchone()[0] == 19
        assert con.execute("SELECT qty FROM items WHERE a = 1 AND b = 1").fetchone()[0] == 99.0
        con.close()


class TestCoalescedCommits:
    """R7 commit coalescing at table granularity: deferred-commit
    writers ride one transaction per (partition, connection),
    committed once via commit_pooled — measured 3.0 → 0.14 ms/table
    on the 1000-table fanout (the per-table COMMIT was 95% of cost)."""

    def test_defer_commit_requires_pool(self):
        with pytest.raises(ValueError, match="pool_key"):
            JdbcUpsertWriter(
                connect_fn=lambda: None, table="t", columns=["k"], key_cols=["k"],
                dialect="sqlite", defer_commit=True,
            )

    def test_deferred_rows_invisible_until_commit_pooled(self, tmp_path):
        from xxt_cdc_spark.sinks.upsert import _CONN_POOL, commit_pooled

        db = str(tmp_path / "defer.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE a (k INTEGER PRIMARY KEY, v INTEGER)")
        con.execute("CREATE TABLE b (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        key = f"defer:{db}"
        try:
            for table in ("a", "b"):
                w = JdbcUpsertWriter(
                    connect_fn=lambda: sqlite3.connect(db, timeout=30),
                    table=table, columns=["k", "v"], key_cols=["k"],
                    dialect="sqlite", pool_key=key, defer_commit=True,
                )
                w.apply_rows([{"op": "I", "k": i, "v": i} for i in range(5)])

            # both tables' statements sit in ONE open transaction:
            # a second connection sees neither
            peek = sqlite3.connect(db)
            assert peek.execute("SELECT count(*) FROM a").fetchone()[0] == 0
            assert peek.execute("SELECT count(*) FROM b").fetchone()[0] == 0

            commit_pooled({key})
            assert peek.execute("SELECT count(*) FROM a").fetchone()[0] == 5
            assert peek.execute("SELECT count(*) FROM b").fetchone()[0] == 5
            peek.close()
        finally:
            conn = _CONN_POOL.pop(key, None)
            if conn is not None:
                conn.close()

    def test_deferred_failure_rolls_back_sibling_tables(self, tmp_path):
        """A failure on table b tosses table a's uncommitted statements
        too (partition-transaction atomicity); the writer evicts the
        wedged connection so nothing ever becomes visible."""
        from xxt_cdc_spark.sinks.upsert import _CONN_POOL, commit_pooled

        db = str(tmp_path / "atomic.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE a (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        key = f"atomic:{db}"
        try:
            wa = JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=30),
                table="a", columns=["k", "v"], key_cols=["k"],
                dialect="sqlite", pool_key=key, defer_commit=True,
            )
            wa.apply_rows([{"op": "I", "k": i, "v": i} for i in range(5)])
            wmissing = JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=30),
                table="no_such_table", columns=["k", "v"], key_cols=["k"],
                dialect="sqlite", pool_key=key, defer_commit=True,
            )
            with pytest.raises(Exception):
                wmissing.apply_rows([{"op": "I", "k": 1, "v": 1}])
            assert key not in _CONN_POOL  # wedged connection evicted
            commit_pooled({key})  # no-op: nothing left to commit
            peek = sqlite3.connect(db)
            assert peek.execute("SELECT count(*) FROM a").fetchone()[0] == 0
            peek.close()
        finally:
            conn = _CONN_POOL.pop(key, None)
            if conn is not None:
                conn.close()

    def test_coalesced_fanout_converges(self, spark, sf_dir, target_db):
        """apply_batch_fanout(coalesce_commits=True) with one shared
        pool per DB produces the same converged state as the
        per-table-commit default."""
        from xxt_cdc_spark.sinks.upsert import apply_batch_fanout

        orders_cast = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*LINEITEM_PAYLOAD)
        env = to_envelope(orders_changefeed(spark, sf_dir)).unionByName(
            to_envelope(
                lineitem_changefeed(spark, sf_dir),
                table="lineitem",
                key_cols=["l_orderkey", "l_linenumber"],
                payload_cols=LINEITEM_PAYLOAD,
                ts_col=None,
            )
        )

        def pooled_sink(table, columns, keys):
            return TableSink(
                writer_factory=lambda: JdbcUpsertWriter(
                    connect_fn=lambda: sqlite3.connect(target_db, timeout=60),
                    table=table, columns=columns, key_cols=keys, dialect="sqlite",
                    connection_init=["PRAGMA journal_mode=WAL", "PRAGMA busy_timeout=60000"],
                    pool_key=f"coalesce:{target_db}",
                ),
                key_cols=keys,
                schema=None,
            )

        sinks = {
            "orders": pooled_sink("orders", ORDERS_PAYLOAD, ["o_orderkey"]),
            "lineitem": pooled_sink("lineitem", LINEITEM_PAYLOAD, ["l_orderkey", "l_linenumber"]),
        }
        applied = apply_batch_fanout(env, sinks, 4, coalesce_commits=True)
        assert set(applied) == {"orders", "lineitem"}

        con = sqlite3.connect(target_db)
        exp_orders = apply_changes(
            orders_cast, orders_changefeed(spark, sf_dir), ["o_orderkey"], ["pos_offset"]
        ).count()
        assert con.execute("SELECT count(*) FROM orders").fetchone()[0] == exp_orders
        exp_li = apply_changes(
            li, lineitem_changefeed(spark, sf_dir), ["l_orderkey", "l_linenumber"], ["pos_offset"]
        ).count()
        assert con.execute("SELECT count(*) FROM lineitem").fetchone()[0] == exp_li
        con.close()


class TestSinkFactoryTemplate:
    def test_factory_equals_registry(self, spark, tmp_path):
        """sink_factory template path applies identically to the
        explicit registry path (the 100k-table serialization shape)."""
        import json as _json
        import sqlite3

        from pyspark.sql import functions as F

        from xxt_cdc_spark.sinks.upsert import (
            JdbcUpsertWriter,
            TableSink,
            apply_batch_fanout,
        )

        n_tables, n_events = 20, 400
        env = spark.range(n_events).select(
            F.lit("d").alias("db"),
            F.concat(F.lit("t"), (F.col("id") % n_tables)).alias("table"),
            F.lit("I").alias("op"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit("binlog.000001").alias("pos_file"),
            F.col("id").alias("pos_offset"),
            F.lit(None).cast("string").alias("gtid"),
            F.to_json(F.struct(F.floor(F.col("id") / n_tables).alias("k"))).alias("key"),
            F.lit(None).cast("string").alias("before"),
            F.to_json(
                F.struct(F.floor(F.col("id") / n_tables).alias("k"), F.col("id").alias("v"))
            ).alias("after"),
        )

        def setup_db(path):
            con = sqlite3.connect(path)
            for i in range(n_tables):
                con.execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
            con.commit()
            con.close()

        def mk_sink(db, table):
            return TableSink(
                writer_factory=lambda: JdbcUpsertWriter(
                    connect_fn=lambda: sqlite3.connect(db, timeout=60),
                    table=table,
                    columns=["k", "v"],
                    key_cols=["k"],
                    dialect="sqlite",
                ),
                key_cols=["k"],
                schema=None,
            )

        db1 = str(tmp_path / "reg.db")
        db2 = str(tmp_path / "fac.db")
        setup_db(db1)
        setup_db(db2)
        reg = {f"t{i}": mk_sink(db1, f"t{i}") for i in range(n_tables)}
        a1 = apply_batch_fanout(env, sinks=reg, num_partitions=2)
        a2 = apply_batch_fanout(
            env, sink_factory=lambda t: mk_sink(db2, t), num_partitions=2
        )
        assert a1 == a2 and sum(a1.values()) == n_events

        def dump(path):
            con = sqlite3.connect(path)
            out = {
                t: con.execute(f"SELECT k, v FROM {t} ORDER BY k").fetchall()
                for t in (f"t{i}" for i in range(n_tables))
            }
            con.close()
            return out

        assert dump(db1) == dump(db2)

    def test_requires_exactly_one_source(self, spark):
        import pytest as _pytest

        from xxt_cdc_spark.sinks.upsert import apply_batch_fanout

        df = spark.range(1).selectExpr("'d' db")
        with _pytest.raises(ValueError):
            apply_batch_fanout(df)


class TestFanoutArrowParity:
    def test_arrow_equals_row_path(self, spark, tmp_path):
        """The Arrow-block fanout (default) must converge each target
        to exactly what the legacy per-row RDD path produces, deletes
        and unregistered tables included."""
        import sqlite3

        from pyspark.sql import functions as F

        from xxt_cdc_spark.sinks.upsert import (
            JdbcUpsertWriter,
            TableSink,
            apply_batch_fanout,
        )

        n_tables, n_events = 8, 300
        base = spark.range(n_events).select(
            F.lit("d").alias("db"),
            F.concat(F.lit("t"), (F.col("id") % n_tables)).alias("table"),
            # every 10th key becomes a delete of the row its earlier
            # upsert created (higher pos_offset wins the LWW collapse)
            F.when(F.col("id") % 10 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit("binlog.000001").alias("pos_file"),
            (F.col("id") + 1_000_000).alias("pos_offset"),
            F.lit(None).cast("string").alias("gtid"),
            F.to_json(F.struct(F.floor(F.col("id") / n_tables).alias("k"))).alias("key"),
            F.lit(None).cast("string").alias("before"),
            F.when(
                F.col("id") % 10 == 0, F.lit(None).cast("string")
            ).otherwise(
                F.to_json(
                    F.struct(
                        F.floor(F.col("id") / n_tables).alias("k"), F.col("id").alias("v")
                    )
                )
            ).alias("after"),
        )
        # one table stays unregistered on both paths
        registered = [f"t{i}" for i in range(n_tables - 1)]

        def setup_db(path):
            con = sqlite3.connect(path)
            for t in registered:
                con.execute(f"CREATE TABLE {t} (k INTEGER PRIMARY KEY, v INTEGER)")
            con.commit()
            con.close()

        def mk_sinks(db):
            return {
                t: TableSink(
                    writer_factory=lambda t=t: JdbcUpsertWriter(
                        connect_fn=lambda: sqlite3.connect(db, timeout=60),
                        table=t,
                        columns=["k", "v"],
                        key_cols=["k"],
                        dialect="sqlite",
                    ),
                    key_cols=["k"],
                    schema=None,
                )
                for t in registered
            }

        db_a, db_r = str(tmp_path / "arrow.db"), str(tmp_path / "rowp.db")
        setup_db(db_a)
        setup_db(db_r)
        # tiny Arrow batches force every table to span several blocks —
        # the shape where a per-block apply_rows would double-count
        # (writer stats are cumulative; caught by the fanout bench)
        prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
        try:
            a_arrow = apply_batch_fanout(base, sinks=mk_sinks(db_a), num_partitions=3)
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
        a_rows = apply_batch_fanout(
            base, sinks=mk_sinks(db_r), num_partitions=3, arrow=False
        )
        # equality of per-table applied counts is the double-count
        # gate: the row path applies once per table, so any repeated
        # per-block accounting on the arrow side breaks it
        assert a_arrow == a_rows

        def dump(path):
            con = sqlite3.connect(path)
            out = {
                t: con.execute(f"SELECT k, v FROM {t} ORDER BY k").fetchall()
                for t in registered
            }
            con.close()
            return out

        assert dump(db_a) == dump(db_r)


class TestShardAlignedFanout:
    def test_aligned_tokens_place_each_shard_in_one_partition(self, spark):
        from pyspark.sql import functions as F

        from xxt_cdc_spark.operators.routing import (
            aligned_shard_tokens,
            shard_token_column,
        )

        n = 4
        toks = aligned_shard_tokens(spark, n)
        assert len(set(toks)) == n
        # hash alignment: token i lands in partition i exactly
        placed = (
            spark.createDataFrame([(t,) for t in toks], "tok int")
            .repartition(n, "tok")
            .select(F.col("tok"), F.spark_partition_id().alias("pid"))
            .collect()
        )
        by_tok = {r.tok: r.pid for r in placed}
        assert sorted(by_tok.values()) == list(range(n))
        # python-side crc agrees with the JVM crc on the shard choice
        import zlib

        df = spark.createDataFrame(
            [(f"t{i}",) for i in range(200)], "table string"
        ).withColumn("tok", shard_token_column(F.col("table"), toks))
        for r in df.collect():
            assert r.tok == toks[zlib.crc32(r.table.encode()) % n]

    def test_fanout_route_cols_override_converges(self, spark, tmp_path):
        """apply_batch_fanout(route_cols=[shard]) — coarser routing
        still co-locates every (table, key) and converges identically
        to the default routing."""
        import json as _json
        import sqlite3
        import zlib

        from pyspark.sql import functions as F

        from xxt_cdc_spark.operators.routing import (
            aligned_shard_tokens,
            shard_token_column,
        )
        from xxt_cdc_spark.sinks.upsert import (
            JdbcUpsertWriter,
            TableSink,
            apply_batch_fanout,
            close_pooled_connections,
        )

        n_tables, n_shards, n_events = 20, 2, 2000
        env = spark.range(n_events).select(
            F.lit("d").alias("db"),
            F.concat(F.lit("t"), (F.col("id") % n_tables)).alias("table"),
            F.when(F.col("id") % 11 == 0, "D").otherwise("U").alias("op"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit("binlog.000001").alias("pos_file"),
            F.col("id").alias("pos_offset"),
            F.lit(None).cast("string").alias("gtid"),
            F.to_json(F.struct((F.col("id") % 97).alias("k"))).alias("key"),
            F.lit(None).cast("string").alias("before"),
            F.to_json(
                F.struct((F.col("id") % 97).alias("k"), F.col("id").alias("v"))
            ).alias("after"),
        )
        toks = aligned_shard_tokens(spark, n_shards)
        env_sh = env.withColumn("shard_tok", shard_token_column(F.col("table"), toks))

        def state(db):
            con = sqlite3.connect(db)
            out = {}
            for i in range(n_tables):
                out[i] = sorted(con.execute(f"SELECT k, v FROM t{i}").fetchall())
            con.close()
            return out

        def run(df, db, route_cols, pool_tag):
            con = sqlite3.connect(db)
            for i in range(n_tables):
                con.execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
            con.commit()
            con.close()

            def factory(table):
                return lambda: JdbcUpsertWriter(
                    connect_fn=lambda: sqlite3.connect(db, timeout=60),
                    table=table, columns=["k", "v"], key_cols=["k"],
                    dialect="sqlite", pool_key=f"{pool_tag}:{db}",
                )

            sinks = {f"t{i}": TableSink(factory(f"t{i}"), ["k"], None) for i in range(n_tables)}
            applied = apply_batch_fanout(
                df, sinks, num_partitions=n_shards,
                coalesce_commits=True, route_cols=route_cols,
            )
            return applied

        try:
            db_a = str(tmp_path / "a.db")
            applied_a = run(env, db_a, None, "ta")
            db_b = str(tmp_path / "b.db")
            applied_b = run(env_sh, db_b, ["shard_tok"], "tb")
            assert applied_a == applied_b
            assert state(db_a) == state(db_b)
        finally:
            close_pooled_connections()
