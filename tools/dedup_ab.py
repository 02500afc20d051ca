#!/usr/bin/env python
"""Fresh-process per-query timing for the dedup headliners (r3 verdict
"What's wrong #2": dedup_ngram_jaccard / dedup_minhash_lsh /
dedup_simhash rose 60-80% in BENCH_r03 on unchanged code). One query
per process, best-of-N inside the process — isolates the number from
the 25-query bench session's GC/cache residue (±20-40% within-session
variance, see SCALING.md).

Usage: python tools/dedup_ab.py <query_name> [runs]
Prints one JSON line {"query": ..., "best_sec": ..., "runs": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# runnable as `python tools/dedup_ab.py` from anywhere — the repo root
# is one level up from this file (same as tools/sweep.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from xxt_cdc_spark.queries import QUERIES
    from xxt_cdc_spark.session import get_spark

    spark = get_spark(f"dedup-ab-{name}", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()  # JVM warmup

    runs = []
    for _ in range(n_runs):
        t0 = time.monotonic()
        QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        runs.append(round(time.monotonic() - t0, 3))
    print(json.dumps({"query": name, "best_sec": min(runs), "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
