#!/usr/bin/env python
"""r15 lever-A adjudication: three shapes of lsh_multitable_topk.

  r13  — dedup via groupBy(first(qv), first(cv)) then score (SortAgg,
         exchange carries both vectors per candidate row)
  r14  — map-side cosine then groupBy(min(cosine)) (HashAgg, 24-byte
         exchange, but re-scores every multi-table duplicate)
  r15  — first-match-wins filter (both sides carry their bucket
         arrays; zero dedup aggregation, one cosine per distinct pair)

Checks row identity (exceptAll both ways) of all three at the given
SF, then interleaved in-process timing (noop sink) of the isolated
member and of the ann_flat_family-equivalent union.

Usage: python tools/lshmulti_ab.py [sf_dir] [iters]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import sys
import time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 6


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from xxt_cdc_spark.functions.similarity import (
        LSH_TABLES_DEFAULT,
        cosine,
        sign_lsh_bucket,
        lsh_multitable_topk,
    )
    from xxt_cdc_spark.session import get_spark

    spark = get_spark("lshmulti-ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qdf = e.filter(F.col("vec_id") < 5)
    k, id_col, vec_col, tables = 10, "vec_id", "embedding", LSH_TABLES_DEFAULT

    def topk(cand):
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("item_id")
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "item_id", "cosine")
        )

    def exploded(df, out_id, out_vec):
        t_arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("t"), sign_lsh_bucket(vec_col, dims).alias("bucket")
                )
                for i, dims in enumerate(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.explode(t_arr).alias("tb"),
        ).select(out_id, out_vec, "tb.t", "tb.bucket")

    def shape_r13():
        q = exploded(qdf, "query_id", "qv")
        c = exploded(e, "item_id", "cv")
        cand = (
            c.join(F.broadcast(q), ["t", "bucket"])
            .filter(F.col("item_id") != F.col("query_id"))
            .groupBy("query_id", "item_id")
            .agg(F.first("qv").alias("qv"), F.first("cv").alias("cv"))
            .withColumn("cosine", cosine("qv", "cv"))
        )
        return topk(cand)

    def shape_r14():
        q = exploded(qdf, "query_id", "qv")
        c = exploded(e, "item_id", "cv")
        cand = (
            c.join(F.broadcast(q), ["t", "bucket"])
            .filter(F.col("item_id") != F.col("query_id"))
            .withColumn("cosine", cosine("qv", "cv"))
            .groupBy("query_id", "item_id")
            .agg(F.min("cosine").alias("cosine"))
        )
        return topk(cand)

    def shape_r15():
        return lsh_multitable_topk(e, qdf, k)

    shapes = {"r13": shape_r13, "r14": shape_r14, "r15": shape_r15}

    # --- row identity -----------------------------------------------------
    base = shapes["r13"]().select("query_id", "rank", "item_id", "cosine")
    for name in ("r14", "r15"):
        other = shapes[name]().select("query_id", "rank", "item_id", "cosine")
        a = base.exceptAll(other).count()
        b = other.exceptAll(base).count()
        print(f"identity r13 vs {name}: exceptAll {a}/{b}")
        assert a == 0 and b == 0, (name, a, b)

    # --- family-equivalent union (the benched shape) ------------------------
    from xxt_cdc_spark.functions import similarity as S

    def family(shape_fn):
        parts = [
            ("brute", S.brute_force_topk(e, qdf, k), "cosine"),
            ("lsh", S.lsh_bucketed_topk(e, qdf, k, dims=(1, 9, 17, 25, 33, 41)), "cosine"),
            ("lsh_multi", shape_fn(), "cosine"),
            ("ivf", S.ivf_topk(e, qdf, k, n_centroids=8, n_probe=2, centroids="fixed"), "cosine"),
            ("pq", S.pq_topk(e, qdf, k, n_subspaces=4, n_centroids=8, codebooks="fixed"), "approx_cosine"),
        ]
        out = None
        for fam, df, sc in parts:
            d = df.select(
                F.lit(fam).alias("family"), "query_id", "rank", "item_id",
                F.col(sc).alias("score"),
            )
            out = d if out is None else out.unionByName(d)
        return out

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # warm every plan once
    for name, fn in shapes.items():
        noop(fn())
        noop(family(fn))

    member: dict[str, list[float]] = {n: [] for n in shapes}
    fam: dict[str, list[float]] = {n: [] for n in shapes}
    for _ in range(ITERS):
        for name, fn in shapes.items():
            t0 = time.monotonic()
            noop(fn())
            member[name].append(time.monotonic() - t0)
        for name, fn in shapes.items():
            t0 = time.monotonic()
            noop(family(fn))
            fam[name].append(time.monotonic() - t0)

    for tag, d in (("member", member), ("family", fam)):
        for name, xs in d.items():
            print(
                f"{tag} {name}: median {statistics.median(xs):.3f} "
                f"min {min(xs):.3f} all {[round(x, 3) for x in xs]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
