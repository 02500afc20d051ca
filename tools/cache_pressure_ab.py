#!/usr/bin/env python
"""Cache-pressure A/B over the headline loop (r13, feeds the r14
decision): dedup/similarity queries persist intermediate frames that
accumulate across the 36-query loop (the bench clears them only after
the loop). Hypothesis: that storage+GC pressure is a driver of the
intra-loop drift the per-segment anchor instrument measures
(`anchor_seg_spread` read 1.19 inside one loop on the r13 smoke run).

Runs ONLY the headline query loop (best-of-2 per query, same posture
as bench.py) with a warm q3 segment read every 9 queries, in one of
two modes:

  keep   — bench.py's current posture: caches accumulate until the
           loop ends;
  clear  — spark.catalog.clearCache() after each query's best-of-2
           (the second run of a query still legitimately reuses its
           own cache; only CROSS-query accumulation is removed).

One mode per process; interleave fresh processes per the standing A/B
protocol. Prints one JSON line: total, per-segment q3 reads, spread.

Usage: python tools/cache_pressure_ab.py <keep|clear> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1]
    assert mode in ("keep", "clear"), mode
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    import bench
    from bench import HEADLINE, _materialize
    from xxt_cdc_spark.queries import QUERIES
    from xxt_cdc_spark.session import get_spark

    bench.SF_DIR = sf_dir
    spark = get_spark(
        "cache-pressure-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    def best_of_2(name: str) -> float:
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            _materialize(QUERIES[name](spark, sf_dir))
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best

    # same warm-up the bench's start trio provides for the seg query
    best_of_2("q3_top_orders")

    segs: list[float] = []
    total = 0.0
    for idx, name in enumerate(HEADLINE, 1):
        total += best_of_2(name)
        if mode == "clear":
            spark.catalog.clearCache()
        if idx % 9 == 0:
            t0 = time.monotonic()
            _materialize(QUERIES["q3_top_orders"](spark, sf_dir))
            segs.append(round(time.monotonic() - t0, 3))
    spread = round(max(segs) / min(segs), 3) if segs and min(segs) > 0 else None
    print(json.dumps({
        "mode": mode, "total_sec": round(total, 3),
        "seg_q3": segs, "seg_spread": spread, "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
