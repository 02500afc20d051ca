#!/usr/bin/env python
"""Per-process A/B of MOR append-path latency knobs (SCALING.md
"Latency posture"). One variant per process — within-session variance
is ±20-40%, so cross-variant comparisons inside one JVM are noise.

Usage: python tools/mor_ab.py <variant> [seconds]
Prints one JSON line {"variant": ..., "p50_ms": ..., "p95_ms": ..., "batches": N}.
"""

from __future__ import annotations

# runnable as `python tools/<name>.py` from anywhere — the repo
# root is one level up from this file (same as tools/sweep.py)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import tempfile
import time

VARIANTS = {
    # current bench_mor_latency posture (r3 official: p50 189 ms)
    "base": {},
    # parquet codec init is per-file; 1 tiny file per batch pays it every time
    "uncompressed": {"spark.sql.parquet.compression.codec": "uncompressed"},
    # cheaper offset/commit-log maintenance (fewer retained entries to scan)
    "retain2": {"spark.sql.streaming.minBatchesToRetain": "2"},
    # no dedicated no-data batches interleaving with the measured ones
    "nodata_off": {"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
    # the checkpoint manager goes through FileContext/AbstractFileSystem,
    # where scheme file resolves to ChecksumFs-wrapped LocalFs regardless
    # of fs.file.impl — offset/commit-log writes still pay .crc shadow
    # writes unless the AbstractFileSystem binding is ALSO raw
    "rawfc": {
        "spark.hadoop.fs.AbstractFileSystem.file.impl": "org.apache.hadoop.fs.local.RawLocalFs"
    },
    "rawfc_all": {
        "spark.hadoop.fs.AbstractFileSystem.file.impl": "org.apache.hadoop.fs.local.RawLocalFs",
        "spark.sql.streaming.noDataMicroBatches.enabled": "false",
    },
    "rawfc_max": {
        "spark.hadoop.fs.AbstractFileSystem.file.impl": "org.apache.hadoop.fs.local.RawLocalFs",
        "spark.sql.streaming.noDataMicroBatches.enabled": "false",
        "spark.sql.streaming.minBatchesToRetain": "2",
        "spark.sql.parquet.compression.codec": "uncompressed",
    },
    "all": {
        "spark.sql.parquet.compression.codec": "uncompressed",
        "spark.sql.streaming.minBatchesToRetain": "2",
        "spark.sql.streaming.noDataMicroBatches.enabled": "false",
    },
}


def run(variant: str, seconds: float) -> dict:
    from xxt_cdc_spark.session import get_spark
    from xxt_cdc_spark.sinks.changelog_mor import ChangelogMorTable
    from xxt_cdc_spark.streaming.pipeline import read_rate_envelope_stream

    spark = get_spark(
        f"mor-ab-{variant}",
        extra_conf={"spark.ui.showConsoleProgress": "false", **VARIANTS[variant]},
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
        spark.conf.set("spark.sql.streaming.fileSink.log.compactInterval", "100")
        if "spark.sql.streaming.minBatchesToRetain" not in VARIANTS[variant]:
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
                p = json.loads(j)
            if p.get("numInputRows"):
                durs.append(float(p["durationMs"]["triggerExecution"]))
    durs = sorted(durs[5:])

    def pct(f: float):
        return durs[min(len(durs) - 1, int(round(f * (len(durs) - 1))))] if durs else None

    return {"variant": variant, "batches": len(durs), "p50_ms": pct(0.5), "p95_ms": pct(0.95)}


if __name__ == "__main__":
    v = sys.argv[1]
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 25.0
    print(json.dumps(run(v, secs)))
