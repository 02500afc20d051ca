#!/usr/bin/env python
"""Micro-batch latency decomposition for the streaming apply path.

Replays the bench's streaming phase under several configurations and
prints per-phase durationMs percentiles (triggerExecution, addBatch,
walCommit, getBatch, queryPlanning) so the latency budget is measured,
not guessed. Used to drive the P50 work (VERDICT round 1 item 4).
"""

from __future__ import annotations

import json
import os
import sqlite3
import sys

# runnable as `python tools/latency_probe.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_variant(spark, rows, name, shuffle_parts, num_partitions, apply_mode, extra_conf=None):
    from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD
    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch
    from xxt_cdc_spark.streaming.pipeline import CDCStreamPipeline, read_envelope_stream

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        n_files = 32
        chunk = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            with open(os.path.join(src, f"c{i:03d}.json"), "w") as f:
                for r in rows[i * chunk : (i + 1) * chunk]:
                    f.write(json.dumps(r) + "\n")
        db = os.path.join(tmp, "t.db")
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
            " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
        )
        con.commit()
        con.close()

        def apply_fn(batch_df, _id):
            typed = batch_df.selectExpr(
                "op", "pos_file", "pos_offset",
                "from_json(coalesce(after, before), 'o_orderkey long, o_custkey long,"
                " o_orderstatus string, o_totalprice double, o_orderdate string,"
                " o_orderpriority string') AS p",
            ).selectExpr("op", "pos_file", "pos_offset", "p.*")
            if apply_mode == "arrow":
                # Arrow-batched apply: rows reach Python as pandas blocks
                # (no per-row pickle); writer consumes itertuples
                part = typed.sortWithinPartitions("pos_offset")
                writer_kwargs = dict(
                    connect_fn=lambda: sqlite3.connect(db, timeout=60),
                    table="orders", columns=ORDERS_PAYLOAD, key_cols=["o_orderkey"],
                    dialect="sqlite", batch_size=5000,
                    connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                )

                def _arrow_apply(it):
                    import pandas as pd

                    w = JdbcUpsertWriter(**writer_kwargs)
                    cols = ["op"] + list(ORDERS_PAYLOAD)

                    def rows_iter():
                        for pdf in it:
                            for t in pdf[cols].itertuples(index=False, name=None):
                                yield dict(zip(cols, t))

                    w.apply_rows(rows_iter())
                    yield pd.DataFrame({"n": [w.stats["upserts"] + w.stats["deletes"]]})

                part.mapInPandas(_arrow_apply, "n long").collect()
            elif apply_mode == "local_sorted":
                # no shuffle at all: sort within the source partitions and
                # apply; correct when the micro-batch is a single partition
                part = typed.sortWithinPartitions("pos_offset")
                writer_kwargs = dict(
                    connect_fn=lambda: sqlite3.connect(db, timeout=60),
                    table="orders", columns=ORDERS_PAYLOAD, key_cols=["o_orderkey"],
                    dialect="sqlite", batch_size=5000,
                    connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                )

                def _run(it):
                    w = JdbcUpsertWriter(**writer_kwargs)
                    w.apply_rows(it)

                part.foreachPartition(_run)
            else:
                apply_batch(
                    typed,
                    lambda: JdbcUpsertWriter(
                        connect_fn=lambda: sqlite3.connect(db, timeout=60),
                        table="orders", columns=ORDERS_PAYLOAD, key_cols=["o_orderkey"],
                        dialect="sqlite", batch_size=5000,
                        connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                    ),
                    ["o_orderkey"], ["pos_offset"],
                    num_partitions=num_partitions, collapse=False,
                )

        prev = {}
        conf = {"spark.sql.shuffle.partitions": str(shuffle_parts),
                "spark.sql.streaming.numRecentProgressUpdates": "200"}
        conf.update(extra_conf or {})
        for k, v in conf.items():
            try:
                prev[k] = spark.conf.get(k)
            except Exception:
                prev[k] = None
            spark.conf.set(k, v)
        try:
            t0 = time.monotonic()
            pipe = CDCStreamPipeline(
                spark=spark,
                source=read_envelope_stream(spark, src, max_files_per_trigger=1),
                apply_fn=apply_fn,
                checkpoint_dir=os.path.join(tmp, "ck"),
            )
            q = pipe.start(available_now=True)
            q.awaitTermination(600)
            dt = time.monotonic() - t0
            prog = []
            for p in q.recentProgress:
                if not isinstance(p, dict):
                    j = p.json() if callable(getattr(p, "json", None)) else p.json
                    p = json.loads(j)
                if p.get("numInputRows"):
                    prog.append(p)
        finally:
            for k, v in prev.items():
                if v is not None:
                    spark.conf.set(k, v)

        def pct(xs, p):
            xs = sorted(xs)
            return xs[min(len(xs) - 1, int(round(p * (len(xs) - 1))))] if xs else None

        phases = {}
        for key in ("triggerExecution", "addBatch", "walCommit", "getBatch",
                    "latestOffset", "queryPlanning", "commitOffsets"):
            vals = [float((p.get("durationMs") or {}).get(key, 0.0)) for p in prog]
            phases[key] = {"p50": pct(vals, 0.5), "p95": pct(vals, 0.95)}
        out = {
            "variant": name,
            "batches": len(prog),
            "events_per_sec": round(len(rows) / dt),
            "p50_ms": pct([p["durationMs"]["triggerExecution"] for p in prog], 0.5),
            "p95_ms": pct([p["durationMs"]["triggerExecution"] for p in prog], 0.95),
            "phases": phases,
        }
        print(json.dumps(out), flush=True)
        return out


def main():
    from xxt_cdc_spark.changefeed import orders_changefeed, to_envelope
    from xxt_cdc_spark.session import get_spark

    spark = get_spark("latency-probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    env = to_envelope(orders_changefeed(spark, SF_DIR)).orderBy("pos_offset")
    rows = [r.asDict() for r in env.collect()]
    for r in rows:
        r["ts"] = r["ts"].isoformat() if r["ts"] else None

    variants = sys.argv[1:] or ["baseline", "fg2", "local_sorted", "async_wal"]
    # warm-up run (codegen/JIT)
    run_variant(spark, rows[:3000], "warmup", 4, 2, "apply_batch")
    if "baseline" in variants:
        run_variant(spark, rows, "baseline_shuffle4_np2", 4, 2, "apply_batch")
    if "fg2" in variants:
        run_variant(spark, rows, "shuffle2_np1", 2, 1, "apply_batch")
    if "local_sorted" in variants:
        run_variant(spark, rows, "local_sorted_noshuffle", 4, 1, "local_sorted")
    if "async_wal" in variants:
        run_variant(spark, rows, "async_progress", 4, 2, "apply_batch",
                    {"spark.sql.streaming.asyncProgressTrackingEnabled": "true"})
    if "arrow" in variants:
        run_variant(spark, rows, "arrow_apply", 4, 1, "arrow")
    if "arrow_async" in variants:
        run_variant(spark, rows, "arrow_async", 4, 1, "arrow",
                    {"spark.sql.streaming.asyncProgressTrackingEnabled": "true"})
    spark.stop()


if __name__ == "__main__":
    main()
