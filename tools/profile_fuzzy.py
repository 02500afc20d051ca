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

    from xxt_cdc_spark.operators import fuzzy_join as fj
    from xxt_cdc_spark.queries.text import FUZZY_MAX_DIST, fuzzy_join_part_names

    # full query, warm
    timed("FULL fuzzy_join_part_names", lambda: fuzzy_join_part_names(spark, SF_DIR))

    # rebuild the internals exactly as edit_distance_join does
    d, parts = FUZZY_MAX_DIST, FUZZY_MAX_DIST + 1
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

    rlen = F.length("r_str")
    r_segs = []
    for k in range(parts):
        st, ln = fj._seg_bounds(rlen, k, parts)
        r_segs.append(
            F.struct(F.lit(k).alias("k"), F.substring(F.col("r_str"), st, ln).alias("seg"))
        )
    def rg():
        return (
            r_names.filter(rlen >= fj._MIN_SEG_LEN)
            .select("r_key", "r_str", rlen.alias("L"), F.explode(F.array(*r_segs)).alias("s"))
            .select("r_key", "r_str", "L", F.col("s.k").alias("k"), F.col("s.seg").alias("seg"))
        )

    n_p = 2 * d + 1
    tot = n_p * parts * n_p
    _dL = f"((i DIV {parts * n_p}) - {d})"
    _k = f"((i DIV {n_p}) % {parts})"
    _dp = f"((i % {n_p}) - {d})"
    _L = f"(n + {_dL})"
    _st = f"(CAST(FLOOR({_L} * {_k} / {parts}) AS INT) + 1)"
    _en = f"CAST(FLOOR({_L} * ({_k} + 1) / {parts}) AS INT)"
    _ln = f"({_en} - {_st} + 1)"
    _pp = f"({_st} + {_dp})"
    _pos_ok = (
        f"(abs({_dp}) + abs({_dL} + {_dp}) <= {d} "
        f"AND abs({_dL} + {_dp}) <= {d} - {_k})"
    )
    _valid = (
        f"({_L} >= {fj._MIN_SEG_LEN} AND {_pos_ok} "
        f"AND {_pp} >= 1 AND {_pp} + {_ln} - 1 <= n)"
    )
    spec_expr = (
        f"filter(transform(sequence(0, {tot - 1}), i -> "
        f"CASE WHEN {_valid} THEN named_struct("
        f"'L', CAST({_L} AS INT), 'k', CAST({_k} AS INT), "
        f"'pp', CAST({_pp} AS INT), 'ln', CAST({_ln} AS INT)) "
        f"ELSE NULL END), x -> x IS NOT NULL)"
    )
    def spec():
        return (
            l_names.select(F.length("l_str").alias("n"))
            .distinct()
            .select("n", F.explode(F.expr(spec_expr)).alias("s"))
            .select(
                "n", F.col("s.L").alias("L"), F.col("s.k").alias("k"),
                F.col("s.pp").alias("pp"), F.col("s.ln").alias("ln"),
            )
        )

    def lg():
        return (
            l_names.withColumn("n", F.length("l_str"))
            .join(F.broadcast(spec()), "n")
            .select(
                "l_key", "l_str", "L", "k",
                F.expr("substring(l_str, pp, ln)").alias("seg"),
            )
        )

    def cand():  # equi-join only, no verify
        return lg().join(rg(), ["L", "k", "seg"]).select("l_key", "r_key")

    def ver_nodist():  # + inline levenshtein verify, no distinct
        return (
            lg().join(rg(), ["L", "k", "seg"])
            .withColumn("dist", F.levenshtein("l_str", "r_str", d))
            .filter(F.col("dist") >= 0)
            .select("l_key", "r_key", "dist")
        )

    def ver_long():
        return ver_nodist().distinct()

    def ver_short():
        return (
            l_names.filter(F.length("l_str") <= fj._MIN_SEG_LEN - 1 + d)
            .crossJoin(r_names.filter(F.length("r_str") < fj._MIN_SEG_LEN))
            .filter(F.abs(F.length("l_str") - F.length("r_str")) <= d)
            .withColumn("dist", F.levenshtein("l_str", "r_str", d))
            .filter(F.col("dist") >= 0)
            .select("l_key", "r_key", "dist")
        )

    timed("spec (distinct lengths + explode)", spec)
    timed("rg (right probes)", rg)
    timed("lg (left probes: spec bcast join)", lg)
    timed("candidates (equi-join, no verify)", cand)
    timed("ver_long no distinct (join+leven)", ver_nodist)
    timed("ver_long (+distinct)", ver_long)
    timed("ver_short (short branch)", ver_short)

    # volume facts
    print("rows: part =", part.count(), " pert =", pert.count())
    print("probe rows: lg =", lg().count(), " rg =", rg().count())
    print("candidates =", cand().count(), " verified(no dist) =", ver_nodist().count(),
          " pairs =", ver_long().count())
    spark.stop()


if __name__ == "__main__":
    main()
