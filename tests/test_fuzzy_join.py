"""Fuzzy join: lossless q-gram blocking vs brute force, including the
short-string branch where the count bound is vacuous."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.fuzzy_join import edit_distance_join


def _rand_strings(seed, n, alphabet, min_len, max_len):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        ln = rng.randint(min_len, max_len)
        out.append((i, "".join(rng.choice(alphabet) for _ in range(ln))))
    return out


def _brute(spark, left, right, d):
    l = spark.createDataFrame(left, "l_key long, l_str string")
    r = spark.createDataFrame(right, "r_key long, r_str string")
    return sorted(
        (x.l_key, x.r_key, x.dist)
        for x in l.crossJoin(r)
        .withColumn("dist", F.levenshtein("l_str", "r_str"))
        .filter(F.col("dist") <= d)
        .collect()
    )


class TestEditDistanceJoin:
    def test_matches_brute_force_mixed_lengths(self, spark):
        # small alphabet forces plenty of true pairs; lengths 1..14
        # straddle the short-string threshold T = (q-1) + d*q = 8
        left = _rand_strings(1, 60, "abc", 1, 14)
        right = _rand_strings(2, 60, "abc", 1, 14)
        l = spark.createDataFrame(left, "id long, s string")
        r = spark.createDataFrame(right, "id long, s string")
        got = sorted(
            (x.l_key, x.r_key, x.dist)
            for x in edit_distance_join(l, r, "id", "id", "s", "s", 2).collect()
        )
        want = _brute(spark, left, right, 2)
        assert got == want and len(want) > 0

    def test_matches_brute_force_long_strings(self, spark):
        base = _rand_strings(3, 40, "abcdefgh", 20, 30)
        # perturb half the rows: one substitution + one deletion
        pert = []
        for i, s in base:
            if i % 2 == 0:
                s2 = s[:5] + "#" + s[6:]
                s2 = s2[:10] + s2[11:]
                pert.append((i + 1000, s2))
        l = spark.createDataFrame(base, "id long, s string")
        r = spark.createDataFrame(pert, "id long, s string")
        got = sorted(
            (x.l_key, x.r_key, x.dist)
            for x in edit_distance_join(l, r, "id", "id", "s", "s", 2).collect()
        )
        want = _brute(spark, base, pert, 2)
        assert got == want
        # every planted perturbation found at distance <= 2
        planted = {(i, i + 1000) for i, _ in base if i % 2 == 0}
        assert planted <= {(a, b) for a, b, _ in got}

    def test_matches_brute_force_d3(self, spark):
        """Position-aware probe selection must stay lossless at a
        distance bound other than the registered query's d=2 (the
        δ-range algebra is parameterized over d and k)."""
        left = _rand_strings(7, 50, "abcd", 6, 22)
        right = _rand_strings(8, 50, "abcd", 6, 22)
        l = spark.createDataFrame(left, "id long, s string")
        r = spark.createDataFrame(right, "id long, s string")
        got = sorted(
            (x.l_key, x.r_key, x.dist)
            for x in edit_distance_join(l, r, "id", "id", "s", "s", 3).collect()
        )
        want = _brute(spark, left, right, 3)
        assert got == want and len(want) > 0

    def test_zero_distance_and_empty_strings(self, spark):
        left = [(0, ""), (1, "ab"), (2, "abcdefghijkl")]
        right = [(0, ""), (1, "ab"), (2, "abcdefghijkl")]
        l = spark.createDataFrame(left, "id long, s string")
        r = spark.createDataFrame(right, "id long, s string")
        got = sorted(
            (x.l_key, x.r_key, x.dist)
            for x in edit_distance_join(l, r, "id", "id", "s", "s", 1).collect()
        )
        assert got == _brute(spark, left, right, 1)
        assert (0, 0, 0) in got and (2, 2, 0) in got
