#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries to plans/<tag>/.

The optimization-round deliverable: one <query>_<suffix>.txt per
headline query (before/after a round's changes), so plan claims in
OPTIMIZATION_r*.md are checkable without running Spark.

Usage: python tools/dump_plans.py <out_dir> [suffix=before] [query ...]
       (no query args = the full bench HEADLINE list)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(2)
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE

    from xxt_cdc_spark.queries import QUERIES
    from xxt_cdc_spark.session import get_spark

    names = sys.argv[3:] or HEADLINE
    spark = get_spark("xxt-cdc-plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
