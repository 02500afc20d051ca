#!/usr/bin/env python
"""A/B the 10000-table single-file fanout across dispatch variants
(r7 verdict item 6): same envelope, same pooled-WAL posture as
bench.py's bench_fanout_tables, one timed pass per variant after a
shared warmup. Variants: ex (executemany baseline), mv (multi-row
VALUES), opt (writer cache + sqlite statement cache), all
(mv+opt). Usage: python tools/fanout_ab.py [variant] [n_events] —
run each variant in its OWN process (A/B protocol)."""

from __future__ import annotations

import json
import os
import sqlite3
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, variant: str, n_events: int, n_tables: int, timed: bool) -> float:
    from pyspark.sql import functions as F

    from xxt_cdc_spark.sinks.upsert import (
        JdbcUpsertWriter,
        TableSink,
        apply_batch_fanout,
        close_pooled_connections,
    )

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
    with tempfile.TemporaryDirectory() as tmp:
        db = os.path.join(tmp, "fan.db")
        con = sqlite3.connect(db)
        for i in range(n_tables):
            con.execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()

        mv = variant in ("mv", "all")
        opt = variant in ("opt", "all")
        cached = 20000 if opt else 128

        def factory(table: str):
            return lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=60, cached_statements=cached),
                table=table,
                columns=["k", "v"],
                key_cols=["k"],
                dialect="sqlite",
                batch_size=5000,
                multi_values=mv,
                connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                pool_key=f"fan:{db}",
            )

        def sink_factory(table: str):
            return TableSink(factory(table), ["k"], None)

        # THREE batches against the SAME target: batch 1 is the cold
        # batch (pool connect + writer construction + plan warm), the
        # steady-state number is the best of batches 2-3 — the honest
        # production posture, where the writer cache actually gets hits
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            applied = apply_batch_fanout(
                env, sink_factory=sink_factory, num_partitions=2, coalesce_commits=True,
                # namespace MUST be config-unique: the db path changes
                # per run, and a stale cached writer would write to a
                # ghost db
                cache_writers=f"ab:{db}" if opt else None,
            )
            times.append(time.monotonic() - t0)
            assert sum(applied.values()) == n_events
        close_pooled_connections()
    return min(times[1:])


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "ex"
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from xxt_cdc_spark.session import get_spark

    spark = get_spark("fanout-ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    run(spark, variant, n_events, 10, timed=False)  # codegen/worker warmup
    best = run(spark, variant, n_events, 10_000, timed=True)
    spark.stop()
    print(json.dumps({"variant": variant,
                      "events_per_sec": round(n_events / best), "sec": round(best, 3)}))


if __name__ == "__main__":
    main()
