"""Regression tests for the round-9 ADVICE items.

1. (medium) sinks/upsert.py fingerprint-drift eviction: rebuilding the
   writer is not enough when the caller reuses the same ``pool_key``
   for a re-pointed target — the POOLED CONNECTION must be evicted too,
   or the rebuilt writer silently keeps writing to the old target. The
   r8 test masked this by embedding the DB path in pool_key; here the
   pool_key is deliberately SHARED across the two targets.
2. (low) _trim_cached_dead_letters: mutation is _POOL_LOCK-guarded
   (cached writers are shared cross-thread) and the dispatch trims only
   writers actually placed in the cache (pool_key is not None).
"""

import sqlite3
import threading

from pyspark.sql import functions as F

from xxt_cdc_spark.sinks.upsert import (
    _CONN_POOL,
    TableSink,
    _trim_cached_dead_letters,
    apply_batch_fanout,
    close_pooled_connections,
    evict_pooled_connection,
)


def _env(spark, n_events: int, n_tables: int):
    return spark.range(n_events).select(
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


def _mk_db(path: str, n_tables: int) -> None:
    con = sqlite3.connect(path)
    for i in range(n_tables):
        con.execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
    con.commit()
    con.close()


def _sink_shared_pool(db: str, table: str, fingerprint: str) -> TableSink:
    """Sink whose pool_key does NOT embed the target — the contract
    violation the fingerprint safety net must now survive."""

    def make():
        import sqlite3 as _sq

        from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter as _W

        return _W(
            connect_fn=lambda: _sq.connect(db, timeout=60),
            table=table,
            columns=["k", "v"],
            key_cols=["k"],
            dialect="sqlite",
            pool_key="r9adv:shared",  # deliberately target-agnostic
        )

    return TableSink(make, ["k"], None, fingerprint=fingerprint)


class TestFingerprintDriftEvictsPooledConnection:
    def test_repoint_with_shared_pool_key_lands_in_new_target(self, spark, tmp_path):
        """Batch 1 applies to db_a; the registration is then re-pointed
        at db_b with a new fingerprint but the SAME pool_key. Pre-fix,
        the rebuilt writer borrowed db_a's pooled connection and every
        batch-2 row landed in the OLD target."""
        n_tables = 2
        db_a = str(tmp_path / "a.db")
        db_b = str(tmp_path / "b.db")
        _mk_db(db_a, n_tables)
        _mk_db(db_b, n_tables)
        env = _env(spark, 200, n_tables)
        ns = "r9-repoint"
        try:
            sinks_a = {
                f"t{i}": _sink_shared_pool(db_a, f"t{i}", fingerprint=db_a)
                for i in range(n_tables)
            }
            apply_batch_fanout(
                env, sinks_a, num_partitions=2, coalesce_commits=True, cache_writers=ns
            )
            sinks_b = {
                f"t{i}": _sink_shared_pool(db_b, f"t{i}", fingerprint=db_b)
                for i in range(n_tables)
            }
            applied = apply_batch_fanout(
                env, sinks_b, num_partitions=2, coalesce_commits=True, cache_writers=ns
            )
            assert sum(applied.values()) == 200
        finally:
            close_pooled_connections()
        con = sqlite3.connect(db_b)
        n_b = sum(
            con.execute(f"SELECT COUNT(*) FROM t{i}").fetchone()[0]
            for i in range(n_tables)
        )
        con.close()
        assert n_b == 200, f"rows must land in the NEW target, got {n_b} in db_b"

    def test_evict_pooled_connection_unit(self):
        """evict_pooled_connection closes + removes exactly its key and
        is a no-op for absent keys."""

        class FakeConn:
            closed = False

            def close(self):
                self.closed = True

        keep, drop = FakeConn(), FakeConn()
        _CONN_POOL["r9:keep"] = keep
        _CONN_POOL["r9:drop"] = drop
        try:
            evict_pooled_connection("r9:drop")
            evict_pooled_connection("r9:absent")  # no-op, no raise
            assert drop.closed and not keep.closed
            assert "r9:drop" not in _CONN_POOL and "r9:keep" in _CONN_POOL
        finally:
            _CONN_POOL.pop("r9:keep", None)
            _CONN_POOL.pop("r9:drop", None)


class _FakeWriter:
    def __init__(self, n: int):
        self.dead_letters = [("upsert", (i,), "boom") for i in range(n)]


class TestDeadLetterTrim:
    def test_trims_to_cap_keeping_most_recent(self):
        w = _FakeWriter(25)
        _trim_cached_dead_letters(w, cap=10)
        assert len(w.dead_letters) == 10
        assert w.dead_letters[0][1] == (15,) and w.dead_letters[-1][1] == (24,)

    def test_noop_at_or_below_cap(self):
        w = _FakeWriter(10)
        _trim_cached_dead_letters(w, cap=10)
        assert len(w.dead_letters) == 10

    def test_concurrent_append_and_trim_never_lose_recent(self):
        """The lock-guarded trim must tolerate a concurrent appender
        (cached writers are shared across streams in one process): no
        exception, and the newest letters always survive."""
        from xxt_cdc_spark.sinks.upsert import _POOL_LOCK

        w = _FakeWriter(0)
        stop = threading.Event()
        errs: list[Exception] = []

        def appender():
            i = 0
            try:
                while not stop.is_set():
                    with _POOL_LOCK:
                        w.dead_letters.append(("upsert", (i,), "x"))
                    i += 1
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        def trimmer():
            try:
                for _ in range(2000):
                    _trim_cached_dead_letters(w, cap=50)
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        ta = threading.Thread(target=appender)
        tb = threading.Thread(target=trimmer)
        ta.start()
        tb.start()
        tb.join()
        stop.set()
        ta.join()
        assert not errs
        # after the final trim + any trailing appends, the list tail is
        # still the most recent contiguous run
        tail = [p[1][0] for p in w.dead_letters[-10:]]
        assert tail == sorted(tail)
