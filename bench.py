#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys report the CDC throughput numbers comparable to BASELINE.md
(change events applied/s vs the reference's 10k/50k TPS claims):
- cdc_events_per_sec: LWW-collapse + hash-route + sink apply of the
  derived changefeed into a real (sqlite) PK-upsert target — the full
  apply path (O16/O19/R1/R5).
- snapshot_rows_per_sec: partitioned snapshot read → sink write (S5/O18).
"""

from __future__ import annotations

import json
import os
import sqlite3
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "cdc_apply_upsert",
    "cdc_lww_collapse",
    "cdc_envelope_roundtrip",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_topk_cosine",
    "emb_neardup_pairs",
    "emb_neardup_fast",
    "text_quality",
    "stream_window_agg",
    "stream_sessionize",
    "asof_join_events_orders",
]


def _materialize(df) -> int:
    """Run the full plan without driver-side collection overhead."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def bench_sink_apply(spark) -> dict:
    """The real CDC apply path: changefeed → collapse → route → sqlite upserts."""
    from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD, orders_changefeed
    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch

    cf = orders_changefeed(spark, SF_DIR).selectExpr(
        "op", "pos_offset", "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "cast(o_orderdate as string) AS o_orderdate", "o_orderpriority",
    )
    n_events = cf.count()
    with tempfile.TemporaryDirectory() as tmp:
        db = os.path.join(tmp, "target.db")
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
            " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
        )
        con.commit()
        con.close()
        t0 = time.monotonic()
        apply_batch(
            cf,
            lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=60),
                table="orders",
                columns=ORDERS_PAYLOAD,
                key_cols=["o_orderkey"],
                dialect="sqlite",
                batch_size=5000,
                # sqlite-as-MySQL-stand-in: WAL + async commits mirror a
                # real server's group commit; a MySQL target would use
                # rewriteBatchedStatements (O20)
                connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
            ),
            ["o_orderkey"],
            ["pos_offset"],
            num_partitions=2,  # sqlite serializes writers; more partitions just contend
        )
        dt = time.monotonic() - t0
    return {"events": n_events, "sec": dt, "events_per_sec": n_events / dt}


def bench_snapshot(spark) -> dict:
    """Snapshot path: full partitioned read → noop write (isolates scan)."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = df.count()
    t0 = time.monotonic()
    _materialize(df.repartition(int(CPUS)))
    dt = time.monotonic() - t0
    return {"rows": n, "sec": dt, "rows_per_sec": n / dt}


def main() -> None:
    from xxt_cdc_spark.queries import QUERIES
    from xxt_cdc_spark.session import get_spark

    # keep stdout clean: the one JSON line must be parseable
    spark = get_spark("xxt-cdc-bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    # warm up the JVM/codegen so per-query numbers measure the plan, not startup
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.monotonic()
        _materialize(QUERIES[name](spark, SF_DIR))
        dt = round(time.monotonic() - t0, 3)
        per_query[name] = dt
        total += dt

    sink = bench_sink_apply(spark)
    snap = bench_snapshot(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf),
                "cdc_events_per_sec": round(sink["events_per_sec"]),
                "cdc_apply_events": sink["events"],
                "cdc_apply_sec": round(sink["sec"], 3),
                "snapshot_rows_per_sec": round(snap["rows_per_sec"]),
                "cpus": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    main()
