#!/usr/bin/env python
"""Local replica of the driver's full correctness sweep with per-query
timing — used to root-cause round-1's truncation at query 50/62 and to
keep the sweep's wall-clock budget visible.

Runs every registered query in registry order at sf0.01 (the driver's
gate scale), comparing against the DuckDB oracle, and prints one JSON
line per query as it completes (so a crash shows exactly where).
"""

from __future__ import annotations

import json
import os
import sys
import time

# runnable as `python tools/sweep.py` from anywhere — the repo root is
# one level up from this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def main() -> None:
    from xxt_cdc_spark.oracle import compare, duckdb_con
    from xxt_cdc_spark.queries import ORACLE, QUERIES
    from xxt_cdc_spark.session import get_spark

    spark = get_spark("xxt-cdc-sweep", extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb_con(SF)
    t_all = time.monotonic()
    n_ok = n_bad = 0
    for i, name in enumerate(QUERIES):
        t0 = time.monotonic()
        try:
            df = QUERIES[name](spark, SF)
            if name in ORACLE:
                res = compare(name, df, con, ORACLE[name])
                ok = res.ok
                out = {
                    "i": i, "name": name, "ok": ok, "spark_rows": res.spark_rows,
                    "oracle_rows": res.oracle_rows, "detail": res.detail[:200],
                }
            else:
                n = df.count()
                ok = True
                out = {"i": i, "name": name, "ok": True, "spark_rows": n, "oracle": "rows_only"}
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            ok = False
            out = {"i": i, "name": name, "ok": False, "error": f"{type(e).__name__}: {e}"[:300]}
        out["sec"] = round(time.monotonic() - t0, 2)
        n_ok += ok
        n_bad += not ok
        print(json.dumps(out), flush=True)
    print(json.dumps({"total_sec": round(time.monotonic() - t_all, 1), "ok": n_ok, "bad": n_bad}),
          flush=True)
    spark.stop()
    sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
