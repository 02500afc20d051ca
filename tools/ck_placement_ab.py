#!/usr/bin/env python
"""Checkpoint-placement A/B for the foreachBatch latency posture
(r7 verdict item 4): the decomposition pinned ~128 ms/batch of
streaming-engine overhead (walCommit + commitOffsets + latestOffset —
checkpoint fsyncs and file-source listing on ext4). This bounds that
term by replaying the bench's exact latency pipeline (typed source,
1 file/trigger, driver_apply+collapse) with checkpoint / source / db
placed on ext4 (/tmp — bench posture) vs tmpfs (/dev/shm).

Variants: base (all ext4) | ck (checkpoint on tmpfs) |
all (src+ck+db on tmpfs). Usage:
  python tools/ck_placement_ab.py <variant>   # one process per variant
Prints per-phase durationMs percentiles + trigger p50/p95.
"""

from __future__ import annotations

import json
import os
import shutil
import sqlite3
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pct(vals, q):
    vals = sorted(vals)
    return round(vals[min(len(vals) - 1, int(q * len(vals)))], 1) if vals else None


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD, orders_changefeed, to_envelope
    from xxt_cdc_spark.session import get_spark
    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch
    from xxt_cdc_spark.streaming.pipeline import (
        CDCStreamPipeline,
        read_typed_envelope_stream,
    )

    spark = get_spark("ck-ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "200")

    env = to_envelope(orders_changefeed(spark, SF_DIR)).orderBy("pos_offset")
    rows = [r.asDict() for r in env.collect()]
    for r in rows:
        r["ts"] = r["ts"].isoformat() if r["ts"] else None
        for c in ("before", "after"):
            r[c] = json.loads(r[c]) if r[c] else None

    ext4 = tempfile.mkdtemp(dir="/tmp")
    shm = tempfile.mkdtemp(dir="/dev/shm")
    src_root = shm if variant == "all" else ext4
    ck_root = shm if variant in ("ck", "all") else ext4
    db_root = shm if variant == "all" else ext4
    try:
        src = os.path.join(src_root, "src")
        os.makedirs(src)
        n_files = 32
        chunk = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            with open(os.path.join(src, f"c{i:03d}.json"), "w") as f:
                for r in rows[i * chunk : (i + 1) * chunk]:
                    f.write(json.dumps(r) + "\n")
        db = os.path.join(db_root, "t.db")
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
            " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
        )
        con.commit()
        con.close()

        PAYLOAD_DDL = (
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string"
        )

        def apply_fn(batch_df, _id):
            typed = batch_df.selectExpr(
                "op", "pos_file", "pos_offset", "coalesce(after, before) p"
            ).selectExpr("op", "pos_file", "pos_offset", "p.*")
            apply_batch(
                typed,
                lambda: JdbcUpsertWriter(
                    connect_fn=lambda: sqlite3.connect(db, timeout=60),
                    table="orders",
                    columns=ORDERS_PAYLOAD,
                    key_cols=["o_orderkey"],
                    dialect="sqlite",
                    batch_size=5000,
                    connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                ),
                ["o_orderkey"],
                ["pos_offset"],
                num_partitions=None,
                collapse=True,
                arrow=False,
                driver_apply=True,
            )

        def one_pass(ck):
            pipe = CDCStreamPipeline(
                spark=spark,
                source=read_typed_envelope_stream(
                    spark, src, PAYLOAD_DDL, max_files_per_trigger=1
                ),
                apply_fn=apply_fn,
                checkpoint_dir=ck,
            )
            q = pipe.start(available_now=True)
            q.awaitTermination(600)
            return q.recentProgress

        one_pass(os.path.join(ck_root, "warm_ck"))  # warm pass, untimed
        best = None
        for attempt in range(2):
            prog = one_pass(os.path.join(ck_root, f"ck{attempt}"))
            trig = [p["durationMs"]["triggerExecution"] for p in prog]
            if best is None or pct(trig, 0.5) < best["p50"]:
                phases = {}
                for key in ("addBatch", "walCommit", "commitOffsets", "latestOffset",
                            "getBatch", "queryPlanning"):
                    vals = [p["durationMs"].get(key, 0) for p in prog]
                    phases[key] = {"p50": pct(vals, 0.5), "p95": pct(vals, 0.95)}
                best = {"variant": variant, "batches": len(prog),
                        "p50": pct(trig, 0.5), "p95": pct(trig, 0.95),
                        "p99": pct(trig, 0.99), "phases": phases}
        spark.stop()
        print(json.dumps(best))
    finally:
        shutil.rmtree(ext4, ignore_errors=True)
        shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
