#!/usr/bin/env python
"""Scale the driver-generated sf0.1 testdata up by an integer factor
(default 10 → "sf1") into a writable directory, preserving the schema,
key relationships, and distribution shape:

- fact/dim keys shift by `i * (max_key + 1)` per replica, so FK joins
  (orders→customer, lineitem→orders/part/supplier) stay consistent and
  key cardinality scales with the data;
- region/nation copy as-is (fixed dimensions, like TPC-H);
- documents: every 7th token of replica i>0 gets an `_i` suffix, which
  keeps intra-replica dup/near-dup structure identical (pair counts
  scale linearly) while pushing cross-replica shingle Jaccard below
  the 0.5 dedup threshold — without this, every dup group would grow
  10× and PAIRS would grow 100×, turning a linear-scaling measurement
  into a quadratic artifact of the replication itself;
- embeddings: vec_id shifts; vectors are perturbed per replica with a
  deterministic per-dimension scale so replicas are not exact dups.

Usage: python tools/make_sf.py [out_dir] [factor] [src_dir]
"""

from __future__ import annotations

# runnable as `python tools/<name>.py` from anywhere — the repo
# root is one level up from this file (same as tools/sweep.py)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from xxt_cdc_spark.session import get_spark, normalize_timestamps

    spark = get_spark("make-sf", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def load(name: str):
        return normalize_timestamps(spark.read.parquet(f"{src}/{name}.parquet"))

    def replicate(df, shift_cols: dict[str, int]):
        """Union `factor` copies, shifting each key column by
        i * (its max + 1) in replica i."""
        parts = []
        for i in range(factor):
            d = df
            for col, mx in shift_cols.items():
                d = d.withColumn(col, (F.col(col) + F.lit(i * (mx + 1))).cast("long"))
            parts.append(d)
        r = parts[0]
        for p in parts[1:]:
            r = r.unionByName(p)
        return r

    def mx(df, col: str) -> int:
        return df.agg(F.max(col)).first()[0]

    for name in ("region", "nation"):
        load(name).write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    cust = load("customer")
    orders = load("orders")
    li = load("lineitem")
    part = load("part")
    supp = load("supplier")
    max_cust, max_ord = mx(cust, "c_custkey"), mx(orders, "o_orderkey")
    max_part, max_supp = mx(part, "p_partkey"), mx(supp, "s_suppkey")

    replicate(cust, {"c_custkey": max_cust}).write.mode("overwrite").parquet(
        f"{out}/customer.parquet"
    )
    replicate(part, {"p_partkey": max_part}).write.mode("overwrite").parquet(
        f"{out}/part.parquet"
    )
    replicate(supp, {"s_suppkey": max_supp}).write.mode("overwrite").parquet(
        f"{out}/supplier.parquet"
    )
    replicate(orders, {"o_orderkey": max_ord, "o_custkey": max_cust}).write.mode(
        "overwrite"
    ).parquet(f"{out}/orders.parquet")
    replicate(
        li,
        {
            "l_orderkey": max_ord,
            "l_partkey": max_part,
            "l_suppkey": max_supp,
        },
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    ev = load("events")
    replicate(ev, {"event_id": mx(ev, "event_id"), "user_id": mx(ev, "user_id")}).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")

    docs = load("documents")
    max_doc = mx(docs, "doc_id")
    parts = []
    for i in range(factor):
        d = docs.withColumn("doc_id", (F.col("doc_id") + F.lit(i * (max_doc + 1))).cast("long"))
        if i > 0:
            # suffix every 7th token: cross-replica 3-shingle Jaccard
            # drops to ~0.4 (< the 0.5 threshold) while intra-replica
            # structure is untouched
            d = d.withColumn(
                "text",
                F.array_join(
                    F.expr(
                        "transform(split(trim(text), '\\\\s+'), "
                        f"(t, j) -> IF(j % 7 = 0, concat(t, '_{i}'), t))"
                    ),
                    " ",
                ),
            )
        parts.append(d)
    r = parts[0]
    for p in parts[1:]:
        r = r.unionByName(p)
    r.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = load("embeddings")
    max_vec = mx(emb, "vec_id")
    parts = []
    for i in range(factor):
        d = emb.withColumn("vec_id", (F.col("vec_id") + F.lit(i * (max_vec + 1))).cast("long"))
        if i > 0:
            d = d.withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, j) -> cast(x * (1.0 + 0.01 * {i} * "
                    "IF(j % 2 = 0, 1, -1)) as float))"
                ),
            )
        parts.append(d)
    r = parts[0]
    for p in parts[1:]:
        r = r.unionByName(p)
    r.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(name, n)
    spark.stop()


if __name__ == "__main__":
    main()
