"""Fuzzy (edit-distance) join: all pairs within Levenshtein distance
``max_dist``, via LOSSLESS positional q-gram blocking — the entity-
resolution / fuzzy-dedup primitive (Gravano et al.'s q-gram filters,
the blocking scheme behind PassJoin-class string joins).

Naive form is a cross join with a levenshtein() predicate —
O(n·m) string comparisons, the same 100 TB cliff the binned range join
removes for intervals. This operator replaces it with:

1. **candidate generation**: explode positional q-grams on both sides
   and equi-join on the gram — a hash join keyed by gram, the same
   shared-shingle shape as the n-gram dedup family — keeping only
   occurrence pairs whose positions differ by ≤ d (an edit script of
   cost d cannot shift a surviving gram further);
2. **count filter**: a true pair at distance ≤ d shares at least
   ``max(|a|,|b|) − (q−1) − d·q`` q-gram occurrences (each edit
   destroys at most q grams), so candidates below that bound are
   pruned BEFORE any string comparison. The join count can only
   overcount a repeated gram's matches, so the prune never drops a
   true pair;
3. **verification**: the exact ``levenshtein()`` built-in (JVM-side)
   on the surviving candidates only.

Short strings (``max(|a|,|b|) ≤ q−1+d·q``) make the count bound
vacuous, so those route through a separate length-banded all-pairs
branch — bounded by the short-string population, disjoint from the
gram branch (which takes only pairs above the bound), and unioned
before verification. Correctness therefore never depends on data
length; only the PRUNING quality does.

Scale: one data-sized shuffle keyed by q-gram; hot grams fan out like
hot shingles — at corpus scale, pair them with the dedup family's
stop-gram statistics if the gram-frequency skew bites. Verification is
candidate-sized, never pair-space-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positional_grams(df: DataFrame, key: str, s: str, q: int, side: str) -> DataFrame:
    n = F.length(F.col(s))
    # the IF guard matters: sequence(1, 0) DESCENDS ([1, 0]) rather
    # than yielding an empty array, so sub-q strings would emit bogus
    # gram rows into the shuffle (harmless to correctness — a short
    # gram can't equal a length-q gram — but pure waste)
    grams = F.expr(
        f"IF(length({s}) >= {q}, "
        f"transform(sequence(1, length({s}) - {q} + 1), "
        f"i -> struct(i AS pos, substring({s}, i, {q}) AS gram)), "
        f"array())"
    )
    return df.select(
        F.col(key).alias(f"{side}_key"),
        n.alias(f"{side}_len"),
        F.explode(grams).alias("g"),
    ).select(f"{side}_key", f"{side}_len", F.col("g.pos").alias(f"{side}_pos"), F.col("g.gram").alias("gram"))


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_str: str,
    right_str: str,
    max_dist: int,
    q: int = 3,
) -> DataFrame:
    """Pairs ``(left_key, right_key, dist)`` with
    ``levenshtein(left_str, right_str) = dist ≤ max_dist``.

    Exact: blocking is lossless (see module docstring), verification is
    the built-in levenshtein. Keys must be unique per side.
    """
    d, T = max_dist, (q - 1) + max_dist * q
    l_names = left.select(F.col(left_key).alias("l_key"), F.col(left_str).alias("l_str"))
    r_names = right.select(F.col(right_key).alias("r_key"), F.col(right_str).alias("r_str"))

    lg = _positional_grams(left, left_key, left_str, q, "l")
    rg = _positional_grams(right, right_key, right_str, q, "r")
    cand_long = (
        lg.join(rg, "gram")
        .filter(
            (F.abs(F.col("l_pos") - F.col("r_pos")) <= d)
            & (F.abs(F.col("l_len") - F.col("r_len")) <= d)
            & (F.greatest("l_len", "r_len") > T)  # short pairs go to the other branch
        )
        .groupBy("l_key", "r_key")
        .agg(
            F.count(F.lit(1)).alias("n_match"),
            F.first("l_len").alias("l_len"),
            F.first("r_len").alias("r_len"),
        )
        .filter(F.col("n_match") >= F.greatest("l_len", "r_len") - F.lit(T))
        .select("l_key", "r_key")
    )
    cand_short = (
        l_names.filter(F.length("l_str") <= T)
        .crossJoin(r_names.filter(F.length("r_str") <= T))
        .filter(F.abs(F.length("l_str") - F.length("r_str")) <= d)
        .select("l_key", "r_key")
    )
    cand = cand_long.unionByName(cand_short)
    verified = (
        cand.join(l_names, "l_key")
        .join(r_names, "r_key")
        .withColumn("dist", F.levenshtein("l_str", "r_str"))
        .filter(F.col("dist") <= d)
    )
    return verified.select("l_key", "r_key", "dist")
