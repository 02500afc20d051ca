#!/usr/bin/env python
"""IncrementalSemDedup scale-slope measurement (r8 verdict item 3 —
the one r8-new operator without a measured multi-scale decade).

Protocol (the house one every other incremental store followed): one
fresh process per (sf, n_centroids) point, the corpus fed as
`n_chunks` id-ordered chunks cut at exact percentiles, per-chunk
update wall clocks reported separately so TWO claims are checkable:

1. decade slope — total build wall at sf1 (10× vectors) vs sf0.1 with
   `n_centroids` scaled ∝ N (the operator's documented contract: the
   Σ_clusters sz² candidate economics stay linear only if average
   bucket size is held constant);
2. bucket pruning — the LAST chunk's update cost against a store at
   ~90% of final size vs the FIRST chunk's against a near-empty store:
   flat-ish per-chunk costs mean updates read only the touched
   buckets, not the whole store.

Usage: python tools/semdedup_slope.py <sf_dir> <n_centroids> [n_chunks=10] [max_chunks]
Prints one progress JSON line per chunk (flushed — a long run killed
mid-way still yields its per-chunk data) and a final summary line.
``max_chunks`` stops early for runs whose per-chunk profile already
answers the question (the summary line then says it was partial).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = sys.argv[1]
    n_centroids = int(sys.argv[2])
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    max_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else n_chunks

    from pyspark.sql import functions as F

    from xxt_cdc_spark.functions.similarity import IncrementalSemDedup
    from xxt_cdc_spark.session import get_spark

    spark = get_spark("semdedup-slope", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    # exact-percentile chunk cuts over the ordered id distribution
    # (same rule as dedup_semantic_family, generalized to n_chunks)
    qs = [i / n_chunks for i in range(1, n_chunks)]
    b = emb.agg(
        F.min("vec_id").alias("lo"),
        F.expr(
            "percentile(vec_id, array(" + ",".join(f"{q}D" for q in qs) + "))"
        ).alias("p"),
        F.max("vec_id").alias("hi"),
    ).first()
    cuts = [b["lo"], *[int(x) + 1 for x in b["p"]], b["hi"] + 1]

    state = tempfile.mkdtemp(prefix="semdd_slope_")
    try:
        idx = IncrementalSemDedup(spark, state, threshold=0.38, n_centroids=n_centroids)
        t0 = time.monotonic()
        idx.init(emb.filter(F.col("vec_id") < cuts[1]))
        init_s = round(time.monotonic() - t0, 3)
        chunk_s = []
        for k in range(min(n_chunks, max_chunks)):
            lo, hi = cuts[k], cuts[k + 1]
            chunk = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            t0 = time.monotonic()
            idx.update(chunk, chunk_id=k)
            chunk_s.append(round(time.monotonic() - t0, 3))
            print(json.dumps({"chunk": k, "sec": chunk_s[-1]}), flush=True)
        kept = idx.state().filter("kept = 1").count()
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "vectors": n,
                    "n_centroids": n_centroids,
                    "n_chunks": n_chunks,
                    "chunks_run": len(chunk_s),
                    "partial": len(chunk_s) < n_chunks,
                    "init_sec": init_s,
                    "chunk_sec": chunk_s,
                    "total_sec": round(sum(chunk_s), 3),
                    "first_chunk_sec": chunk_s[0],
                    "last_chunk_sec": chunk_s[-1],
                    "kept": kept,
                }
            )
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
