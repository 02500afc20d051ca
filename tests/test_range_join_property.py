"""Property test: binned_range_join ≡ the naive containment join on a
randomized interval/point workload (one seeded large history per the
suite's convention — JVM round-trips are too slow for per-example
hypothesis runs), including the edge cases the bin decomposition must
get right: intervals exactly on bin boundaries, intervals shorter and
longer than the bin width, empty intervals, and points at interval
ends (half-open: lo inclusive, hi exclusive)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.range_join import binned_range_join

BASE = datetime(2024, 1, 1)
BIN_S = 3600  # 1-hour bins


def _mk_workload(seed: int, n_points: int = 400, n_intervals: int = 60):
    rng = random.Random(seed)
    points = []
    for i in range(n_points):
        # cluster points around bin edges so boundary cases are dense
        t = rng.randrange(0, 7 * 24 * 3600)
        if rng.random() < 0.3:
            t = (t // BIN_S) * BIN_S + rng.choice([0, 1, BIN_S - 1])
        points.append((i, BASE + timedelta(seconds=t)))
    intervals = []
    for j in range(n_intervals):
        lo = rng.randrange(0, 7 * 24 * 3600)
        if rng.random() < 0.3:
            lo = (lo // BIN_S) * BIN_S  # exactly on a bin edge
        length = rng.choice([0, 1, 600, BIN_S, BIN_S + 1, 5 * BIN_S])
        intervals.append(
            (j, BASE + timedelta(seconds=lo), BASE + timedelta(seconds=lo + length))
        )
    return points, intervals


def test_binned_equals_naive_containment(spark):
    points, intervals = _mk_workload(seed=20240813)
    p = spark.createDataFrame(points, "pid long, t timestamp")
    iv = spark.createDataFrame(intervals, "iid long, lo timestamp, hi timestamp")

    binned = binned_range_join(p, iv, "t", "lo", "hi", BIN_S)
    got = {(r.pid, r.iid) for r in binned.select("pid", "iid").collect()}

    naive = p.join(iv, (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
    want = {(r.pid, r.iid) for r in naive.select("pid", "iid").collect()}

    assert got == want
    # sanity: the workload actually produced matches AND non-matches
    assert want and len(want) < len(points) * len(intervals)


def test_extra_equi_key_restricts_matches(spark):
    points, intervals = _mk_workload(seed=7)
    p = spark.createDataFrame(
        [(pid, t, pid % 3) for pid, t in points], "pid long, t timestamp, k int"
    )
    iv = spark.createDataFrame(
        [(iid, lo, hi, iid % 3) for iid, lo, hi in intervals],
        "iid long, lo timestamp, hi timestamp, k int",
    )
    binned = binned_range_join(p, iv, "t", "lo", "hi", BIN_S, extra_eq=["k"])
    got = {(r.pid, r.iid) for r in binned.select("pid", "iid").collect()}
    naive = p.join(
        iv.withColumnRenamed("k", "k2"),
        (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")) & (F.col("k") == F.col("k2")),
    )
    want = {(r.pid, r.iid) for r in naive.select("pid", "iid").collect()}
    assert got == want
