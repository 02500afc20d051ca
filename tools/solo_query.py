#!/usr/bin/env python
"""Solo fresh-process query timing — the A/B protocol for bench
regressions (r6 root-caused dedup_clusters with it; r8 re-measures the
three anchor-adjusted regressions the r7 bench showed on UNTOUCHED
code). One process per invocation, same session/materialize posture as
bench.py, best-of-N inside the process, one JSON line out.

Usage: python tools/solo_query.py <query_name> [runs=2] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bench import _materialize  # same row-consumption posture as the bench

    from xxt_cdc_spark.queries import QUERIES
    from xxt_cdc_spark.session import get_spark

    spark = get_spark("xxt-cdc-solo", extra_conf={"spark.ui.showConsoleProgress": "false"})
    # same JVM/codegen warmup as bench.py's headline loop
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        _materialize(QUERIES[name](spark, sf_dir))
        times.append(round(time.monotonic() - t0, 3))
    spark.stop()
    print(json.dumps({"name": name, "best": min(times), "times": times, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
