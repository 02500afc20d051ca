#!/usr/bin/env python
"""Full-width fanout demonstration: the reference's "100,000+ active
tables" claim (its README.md:516) exercised at FULL width, not the
bench's 1/10th point — 100,000 sqlite tables behind one
apply_batch_fanout call, sink_factory + cached writers + coalesced
commits, the documented 100k-active-tables posture.

Measures the same three-batch shape as bench_fanout_tables (cold batch
= pool connect + 100k writer constructions + schema parse; steady state
= best of batches 2-3 with the writer cache hot) at widths 10k / 30k /
100k with events-per-table FIXED at 2, so the per-table overhead slope
is read directly from the wall clocks. One JSON line per width.

Usage: python tools/fanout_100k.py [widths_csv] [events_per_table]
Defaults: 10000,30000,100000 and 2. Each width runs in its OWN
subprocess (fresh JVM + fresh Python workers): the pooled connections
and cached writers live in the WORKER processes, where a driver-side
close_pooled_connections() cannot reach them — without isolation an
earlier width's ~10-30k resident cached writers would bias exactly the
steady-state slope this tool exists to measure (r10 review finding).
`--one <width> <ept>` is the per-width entry the parent spawns.

sqlite posture notes at 100k tables: cached_statements is sized to the
table count ×3 (an upsert + occasional delete per table; the default
128 re-prepares every statement, measured 2× at 10k — SCALING.md
round-8), and the one pooled connection parses the 100k-table schema
once per process, not per batch.
"""

from __future__ import annotations

import json
import os
import sqlite3
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_width(spark, n_tables: int, events_per_table: int) -> dict:
    from pyspark.sql import functions as F

    from xxt_cdc_spark.sinks.upsert import (
        JdbcUpsertWriter,
        TableSink,
        apply_batch_fanout,
        close_pooled_connections,
    )

    n_events = n_tables * events_per_table
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
        t0 = time.monotonic()
        con = sqlite3.connect(db)
        con.execute("PRAGMA journal_mode=WAL")
        cur = con.cursor()
        for i in range(n_tables):
            cur.execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
        con.commit()
        con.close()
        setup_sec = time.monotonic() - t0

        cached = max(20_000, n_tables * 3)

        def factory(table: str):
            return lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(
                    db, timeout=60, cached_statements=cached
                ),
                table=table,
                columns=["k", "v"],
                key_cols=["k"],
                dialect="sqlite",
                batch_size=5000,
                connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                pool_key=f"fan:{db}",
            )

        def sink_factory(table: str):
            return TableSink(factory(table), ["k"], None)

        def one_batch():
            return apply_batch_fanout(
                env,
                sink_factory=sink_factory,
                num_partitions=2,
                coalesce_commits=True,
                cache_writers=f"fan100k:{db}",
            )

        t0 = time.monotonic()
        applied = one_batch()
        cold_sec = time.monotonic() - t0
        assert sum(applied.values()) == n_events, (sum(applied.values()), n_events)
        steady = None
        for _ in range(2):
            t0 = time.monotonic()
            applied = one_batch()
            dt = time.monotonic() - t0
            steady = dt if steady is None else min(steady, dt)
        assert sum(applied.values()) == n_events
        close_pooled_connections()
    return {
        "n_tables": n_tables,
        "n_events": n_events,
        "setup_sec": round(setup_sec, 2),
        "cold_sec": round(cold_sec, 3),
        "steady_sec": round(steady, 3),
        "events_per_sec": round(n_events / steady),
        "events_per_sec_cold": round(n_events / cold_sec),
        "us_per_table_steady": round(1e6 * steady / n_tables, 2),
    }


def run_one(width: int, ept: int) -> None:
    from xxt_cdc_spark.session import get_spark

    spark = get_spark(
        "fanout-100k", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    run_width(spark, 10, ept)  # codegen/worker warmup, untimed
    out = run_width(spark, width, ept)
    spark.stop()
    print(json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), int(sys.argv[3]))
        return
    widths = (
        [int(w) for w in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [10_000, 30_000, 100_000]
    )
    ept = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import subprocess

    for w in widths:
        # one process per width: worker-side pools/caches die with it
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(w), str(ept)],
                capture_output=True,
                text=True,
                timeout=3600,
            )
        except subprocess.TimeoutExpired:
            # report and keep sweeping the remaining widths
            print(json.dumps({"n_tables": w, "error": "timeout after 3600s"}), flush=True)
            continue
        for line in reversed(p.stdout.strip().splitlines()):
            if line.startswith("{"):
                print(line, flush=True)
                break
        else:
            tail = (p.stderr or "").strip().splitlines()[-3:]
            print(
                json.dumps(
                    {"n_tables": w, "error": f"no JSON (rc={p.returncode})", "stderr": tail}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
