"""Stage decomposition of fuzzy_join_part_names at sf0.1 (r11 VERDICT
item 4): which stage of edit_distance_join dominates — probe
generation, the candidate equi-join + inline verify, the distinct, or
the short branch? One warm process, min-of-N per member, same method
as the r11 ts_gap_fill/ann profiles."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xxt_cdc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROFILE_N", "3"))


def timed(name, build):
    best = None
    for _ in range(N):
        t0 = time.monotonic()
        df = build()
        df.write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:42s} {best:7.3f} s", flush=True)
    return best


def main():
    spark = get_spark("profile-fuzzy")
    spark.sparkContext.setLogLevel("ERROR")

    from xxt_cdc_spark.operators.fuzzy_join import (
        _left_probes,
        _probe_spec,
        _right_probes,
        _short_branch,
        _verify_long,
        edit_distance_join,
    )
    from xxt_cdc_spark.queries.text import FUZZY_MAX_DIST, fuzzy_join_part_names

    # full query, warm
    timed("FULL fuzzy_join_part_names", lambda: fuzzy_join_part_names(spark, SF_DIR))

    # stage decomposition through the OPERATOR'S OWN builders — the
    # profiler imports _right_probes/_probe_spec/_left_probes/
    # _verify_long/_short_branch from operators/fuzzy_join.py, so a
    # shape change there changes the decomposition too (r12 ADVICE: the
    # hand-copied internals could silently measure a stale shape).
    # Only the INPUT framing (part/pert, same as queries/text.py's
    # fuzzy_join_part_names) is restated here.
    d = FUZZY_MAX_DIST
    rec = "concat(p_name, '|', p_brand, '|', p_type, '|', cast(p_size as string))"
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").withColumn("rec", F.expr(rec))
    pert = part.filter(F.col("p_partkey") % 5 == 0).select(
        F.col("p_partkey").alias("b_key"),
        F.when(
            F.col("p_partkey") % 10 == 0,
            F.expr("concat(substring(rec, 1, 2), substring(rec, 4))"),
        )
        .otherwise(F.expr("concat(substring(rec, 1, 4), '#', substring(rec, 6))"))
        .alias("b_rec"),
    )
    l_names = part.select(F.col("p_partkey").alias("l_key"), F.col("rec").alias("l_str"))
    r_names = pert.select(F.col("b_key").alias("r_key"), F.col("b_rec").alias("r_str"))

    def spec():
        return _probe_spec(l_names, d)

    def rg():
        return _right_probes(r_names, d)

    def lg():
        return _left_probes(l_names, d)

    def cand():  # equi-join only, no verify
        return lg().join(rg(), ["L", "k", "seg"]).select("l_key", "r_key")

    def ver_nodist():  # + inline levenshtein verify, no distinct
        return _verify_long(lg(), rg(), d, distinct=False)

    def ver_long():
        return _verify_long(lg(), rg(), d)

    def ver_short():
        return _short_branch(l_names, r_names, d)

    timed("spec (distinct lengths + explode)", spec)
    timed("rg (right probes)", rg)
    timed("lg (left probes: spec bcast join)", lg)
    timed("candidates (equi-join, no verify)", cand)
    timed("ver_long no distinct (join+leven)", ver_nodist)
    timed("ver_long (+distinct)", ver_long)
    timed("ver_short (short branch)", ver_short)

    # volume facts — plus the guard the ADVICE asked for: the sum of
    # the two branches measured here must equal the operator's own
    # output on the same inputs, or the decomposition is stale
    print("rows: part =", part.count(), " pert =", pert.count())
    print("probe rows: lg =", lg().count(), " rg =", rg().count())
    n_pairs = ver_long().count() + ver_short().count()
    n_op = edit_distance_join(
        part.select("p_partkey", "rec"), pert, "p_partkey", "b_key", "rec", "b_rec", d
    ).count()
    print("candidates =", cand().count(), " verified(no dist) =", ver_nodist().count(),
          " pairs =", n_pairs, " operator pairs =", n_op)
    if n_pairs != n_op:
        print(f"WARNING: decomposition ({n_pairs}) != operator output ({n_op}) — "
              "stage builders out of sync with edit_distance_join")
    spark.stop()


if __name__ == "__main__":
    main()
