"""Regression tests for the round-7 ADVICE findings.

1 (medium) — apply_batch_fanout: tables whose batch contains KEYLESS
   rows apply order-preserving (apply_ordered_params, kind-flip
   flushes in frame order) instead of the two-group
   apply_param_groups — an insert-then-delete sequence for one
   underlying row must not replay as delete-then-insert and resurrect
   the row.
2 (medium) — multi_values flushes clamp rows per multi-VALUES
   statement to a bind-parameter budget (999 // len(columns)) so a
   wide table can never exceed SQLITE_MAX_VARIABLE_NUMBER / MySQL
   packet limits and dead-letter whole chunks on a config-shaped
   limit.
3 (low) — ann_recall_report LEFT-joins hit counts onto the static
   family list: a kernel whose recall collapses to zero shows
   recall_at_k=0 instead of vanishing from the certified report.
4 (low) — apply_batch(driver_apply=True) and the transport-aligned
   branch sort with rotation-safe order_exprs, so the pandas
   keep="last" LWW collapse survives a binlog suffix widening
   (binlog.999999 → binlog.1000000).
"""

from __future__ import annotations

import json
import sqlite3

import pytest

from xxt_cdc_spark.sinks.upsert import (
    JdbcUpsertWriter,
    TableSink,
    apply_batch,
    apply_batch_fanout,
)


def _writer(db, table="t", columns=("k", "v"), keys=("k",), **kw):
    return JdbcUpsertWriter(
        connect_fn=lambda: sqlite3.connect(db, timeout=30),
        table=table,
        columns=list(columns),
        key_cols=list(keys),
        dialect="sqlite",
        **kw,
    )


class TestKeylessOrderPreserved:
    def test_apply_ordered_params_preserves_interleaving(self, tmp_path):
        """insert→delete for the same row must leave the row absent;
        the two-group apply would resurrect it."""
        db = str(tmp_path / "o.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        w = _writer(db)
        w.apply_ordered_params([("upsert", (1, 10)), ("delete", (1,))])
        con = sqlite3.connect(db)
        assert con.execute("SELECT * FROM t").fetchall() == []
        con.close()

        # the two-group shape on the same sequence WOULD resurrect —
        # the contrast that makes the ordered path load-bearing
        db2 = str(tmp_path / "g.db")
        con = sqlite3.connect(db2)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()
        _writer(db2).apply_param_groups([(1, 10)], [(1,)])
        con = sqlite3.connect(db2)
        assert con.execute("SELECT * FROM t").fetchall() == [(1, 10)]
        con.close()

    def test_fanout_keyless_insert_then_delete_not_resurrected(self, spark, tmp_path):
        """A fanout batch mixing a keyless audit table (insert→delete
        on the same row) with a normal keyed table: the keyless table
        must converge empty, the keyed table must LWW-converge."""
        rows = [
            # keyless audit table: insert then delete the same row
            ("d", "audit", "I", None, "binlog.000001", 1, None, "", None,
             json.dumps({"k": 7, "v": 70})),
            ("d", "audit", "D", None, "binlog.000001", 2, None, "",
             json.dumps({"k": 7, "v": 70}), None),
            # keyed table: two upserts for one key (LWW keeps v=21)
            ("d", "kt", "I", None, "binlog.000001", 3, None,
             json.dumps({"k": 2}), None, json.dumps({"k": 2, "v": 20})),
            ("d", "kt", "U", None, "binlog.000001", 4, None,
             json.dumps({"k": 2}), json.dumps({"k": 2, "v": 20}),
             json.dumps({"k": 2, "v": 21})),
        ]
        env = spark.createDataFrame(
            rows,
            "db string, table string, op string, ts timestamp, pos_file string,"
            " pos_offset long, gtid string, key string, before string, after string",
        )
        db = str(tmp_path / "fan.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE audit (k INTEGER PRIMARY KEY, v INTEGER)")
        con.execute("CREATE TABLE kt (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()
        def factory(table):
            # self-contained closure: executors can't import the test
            # module, so nothing module-level may be referenced
            def make():
                import sqlite3 as _sq

                from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter as _W

                return _W(
                    connect_fn=lambda: _sq.connect(db, timeout=30),
                    table=table, columns=["k", "v"], key_cols=["k"],
                    dialect="sqlite",
                )

            return make

        sinks = {
            t: TableSink(writer_factory=factory(t), key_cols=["k"], schema=None)
            for t in ("audit", "kt")
        }
        apply_batch_fanout(env, sinks, num_partitions=1)
        con = sqlite3.connect(db)
        assert con.execute("SELECT * FROM audit").fetchall() == [], (
            "keyless insert→delete was reordered and resurrected the row"
        )
        assert con.execute("SELECT * FROM kt").fetchall() == [(2, 21)]
        con.close()


class TestMultiValuesPlaceholderCap:
    def test_cap_derives_from_width(self, tmp_path):
        w = _writer(str(tmp_path / "x.db"), columns=[f"c{i}" for i in range(150)],
                    keys=["c0"], multi_values=True)
        assert w._multi_rows_cap == 999 // 150

    def test_wide_table_multi_values_does_not_dead_letter(self, tmp_path):
        """150 cols × 250 rows = 37.5k placeholders — over every
        SQLite build's variable cap. The budgeted split must apply all
        rows cleanly (pre-fix: one giant statement, non-retryable
        'too many SQL variables', whole chunk dead-lettered)."""
        n_cols, n_rows = 150, 250
        cols = [f"c{i}" for i in range(n_cols)]
        db = str(tmp_path / "wide.db")
        con = sqlite3.connect(db)
        con.execute(
            f"CREATE TABLE t ({', '.join(f'{c} INTEGER' for c in cols)},"
            " PRIMARY KEY (c0))"
        )
        con.commit()
        con.close()

        w = _writer(db, columns=cols, keys=["c0"], multi_values=True,
                    batch_size=500)
        params = [tuple(r * n_cols + i for i in range(n_cols)) for r in range(n_rows)]
        stats = w.apply_param_groups(params, [])
        assert stats["upserts"] == n_rows
        assert stats["failures"] == 0 and not w.dead_letters
        con = sqlite3.connect(db)
        assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == n_rows
        con.close()


class TestRecallReportStaticFamilies:
    def test_zero_hit_family_reports_zero_not_absent(self, spark, sf_dir, monkeypatch):
        """Monkeypatch the PQ kernel to return disjoint ids: the
        certified report must still carry a 'pq' row with hits=0 and
        recall_at_k=0.0 (pre-fix it vanished)."""
        from pyspark.sql import functions as F

        from xxt_cdc_spark.queries import vector as V

        def _bogus_pq(spark_, sf_dir_):
            real = V.ann_ivf_topk(spark_, sf_dir_)
            # shift item ids out of the corpus range → zero overlap
            return real.withColumn("item_id", F.col("item_id") + F.lit(10_000_000))

        monkeypatch.setattr(V, "ann_pq_topk", _bogus_pq)
        rows = {r["family"]: r for r in V.ann_recall_report(spark, sf_dir).collect()}
        assert set(rows) == {"ivf", "lsh", "lsh_multi", "pq"}
        assert rows["pq"]["hits"] == 0
        assert rows["pq"]["recall_at_k"] == 0.0
        # sane families still score
        assert rows["ivf"]["hits"] > 0


class TestDriverApplyRotationSafeOrder:
    def test_rotation_widening_keeps_post_rotation_row(self, spark, tmp_path):
        """Suffix widening binlog.999999 → binlog.1000000: plain
        lexicographic sort puts the POST-rotation row first (as '1' <
        '9'), so pandas keep='last' would keep the stale value. The
        rotation-safe (length, value) sort must keep v=2."""
        db = str(tmp_path / "rot.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        cf = spark.createDataFrame(
            [("U", "binlog.999999", 50, 1, 1), ("U", "binlog.1000000", 10, 1, 2)],
            "op string, pos_file string, pos_offset long, k long, v long",
        ).coalesce(1)
        stats = apply_batch(
            cf,
            lambda: _writer(db),
            key_cols=["k"],
            order_cols=["pos_file", "pos_offset"],
            num_partitions=None,
            collapse=True,
            driver_apply=True,
        )
        assert stats["upserts"] == 1  # collapsed to one statement
        con = sqlite3.connect(db)
        assert con.execute("SELECT k, v FROM t").fetchall() == [(1, 2)]
        con.close()

    def test_transport_aligned_rotation_order(self, spark, tmp_path):
        """The num_partitions=None distributed branch shares the fix:
        run-ordered flushes must apply the post-rotation row LAST."""
        db = str(tmp_path / "rot2.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        cf = spark.createDataFrame(
            [("U", "binlog.999999", 50, 1, 1), ("U", "binlog.1000000", 10, 1, 2)],
            "op string, pos_file string, pos_offset long, k long, v long",
        ).coalesce(1)

        def factory():
            # self-contained for executor pickling (distributed path)
            import sqlite3 as _sq

            from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter as _W

            return _W(
                connect_fn=lambda: _sq.connect(db, timeout=30),
                table="t", columns=["k", "v"], key_cols=["k"], dialect="sqlite",
            )

        apply_batch(
            cf,
            factory,
            key_cols=["k"],
            order_cols=["pos_file", "pos_offset"],
            num_partitions=None,
            collapse=False,
        )
        con = sqlite3.connect(db)
        assert con.execute("SELECT k, v FROM t").fetchall() == [(1, 2)]
        con.close()


class TestFanoutWriterCache:
    def test_cached_writers_delta_account_and_converge(self, spark, tmp_path):
        """cache_writers: batch 2 reuses batch 1's writers (cumulative
        stats), yet applied counts must be per-batch (delta) and the
        final state identical to the uncached path."""
        import json as _json

        from pyspark.sql import functions as F

        from xxt_cdc_spark.sinks.upsert import close_pooled_connections

        n_events, n_tables = 2_000, 50
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
        db = str(tmp_path / "wc.db")
        con = sqlite3.connect(db)
        for i in range(n_tables):
            con.execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        def sink_factory(table):
            def make():
                import sqlite3 as _sq

                from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter as _W

                return _W(
                    connect_fn=lambda: _sq.connect(db, timeout=60),
                    table=table, columns=["k", "v"], key_cols=["k"],
                    dialect="sqlite", pool_key=f"wc:{db}",
                )

            return TableSink(make, ["k"], None)

        try:
            for batch in range(2):
                applied = apply_batch_fanout(
                    env, sink_factory=sink_factory, num_partitions=2,
                    coalesce_commits=True, cache_writers=f"wc:{db}",
                )
                assert sum(applied.values()) == n_events, (
                    f"batch {batch}: cached writers must delta-account, "
                    f"got {sum(applied.values())}"
                )
        finally:
            close_pooled_connections()
        con = sqlite3.connect(db)
        # LWW: per (table, k) the max id wins
        for i in range(0, n_tables, 17):
            got = dict(con.execute(f"SELECT k, v FROM t{i}").fetchall())
            want = {
                k: max(v for v in range(n_events) if v % n_tables == i and v // n_tables == k)
                for k in set(v // n_tables for v in range(n_events) if v % n_tables == i)
            }
            assert got == want, (i, got, want)
        con.close()

    def test_cached_writer_commit_posture_reconciled(self, spark, tmp_path):
        """A writer cached by a coalescing batch must not keep
        defer_commit when a later batch runs uncoalesced — its
        statements would sit uncommitted on the pooled connection."""
        import json as _json

        from pyspark.sql import functions as F

        from xxt_cdc_spark.sinks.upsert import close_pooled_connections

        env = spark.createDataFrame(
            [("d", "t0", "I", None, "binlog.000001", 1, None,
              _json.dumps({"k": 1}), None, _json.dumps({"k": 1, "v": 10}))],
            "db string, table string, op string, ts timestamp, pos_file string,"
            " pos_offset long, gtid string, key string, before string, after string",
        )
        db = str(tmp_path / "cp.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t0 (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        def sink_factory(table):
            def make():
                import sqlite3 as _sq

                from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter as _W

                return _W(
                    connect_fn=lambda: _sq.connect(db, timeout=60),
                    table=table, columns=["k", "v"], key_cols=["k"],
                    dialect="sqlite", pool_key=f"cp:{db}",
                )

            return TableSink(make, ["k"], None)

        try:
            # batch 1 coalesced (caches a defer_commit writer), batch 2
            # UNCOALESCED with a new value — it must be durably visible
            apply_batch_fanout(env, sink_factory=sink_factory, num_partitions=1,
                               coalesce_commits=True, cache_writers=f"cp:{db}")
            env2 = env.withColumn("pos_offset", F.lit(2)).withColumn(
                "after", F.lit(_json.dumps({"k": 1, "v": 20}))
            )
            apply_batch_fanout(env2, sink_factory=sink_factory, num_partitions=1,
                               coalesce_commits=False, cache_writers=f"cp:{db}")
        finally:
            close_pooled_connections()
        con = sqlite3.connect(db)
        assert con.execute("SELECT k, v FROM t0").fetchall() == [(1, 20)], (
            "uncoalesced batch on a cached coalescing writer was never committed"
        )
        con.close()
