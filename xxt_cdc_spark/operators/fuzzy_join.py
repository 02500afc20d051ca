"""Fuzzy (edit-distance) join: all pairs within Levenshtein distance
``max_dist``, via LOSSLESS segment blocking (the PassJoin scheme: Li,
Deng & Feng's partition-based string join) — the entity-resolution /
fuzzy-dedup primitive.

Naive form is a cross join with a levenshtein() predicate — O(n·m)
string comparisons, the same 100 TB cliff the binned range join
removes for intervals. Blocking argument (pigeonhole): split the right
string into ``d+1`` contiguous segments; an edit script of cost ≤ d
cannot touch all of them, so some segment survives VERBATIM in the
left string, shifted by at most d positions (the net length drift of
the edits before it). Therefore:

1. **right probes**: each right string emits its d+1 (segment-id,
   substring) keys — one row per segment;
2. **left probes**: each left string emits, for every admissible right
   LENGTH L in [len−d, len+d] and every segment id, the substrings at
   the 2d+1 admissible positions — O((2d+1)²·(d+1)) ≈ 75 short probes
   for d = 2, computed as one generated array + explode, no shuffle
   amplification beyond the constant;
3. **candidates**: an exact equi-join on (L, segment-id, substring) —
   segment keys are ~len/(d+1) characters, long enough to be
   near-unique even on LOW-ENTROPY composite records (brand/type/size
   fields shared by thousands of rows), which is precisely where
   q-gram count filters collapse: measured on 20k composite part
   records (sf0.1), gram-count blocking left 16M candidates (245 s
   end-to-end); segment blocking runs the same exact join in 10 s;
4. **verification**: the exact ``levenshtein()`` built-in (JVM-side)
   on distinct candidate pairs only.

Right strings shorter than ``d+1`` can't yield non-empty segments, so
pairs whose right side is shorter than ``_MIN_SEG_LEN`` route through
a separate length-banded all-pairs branch — bounded by the
short-string population and disjoint from the segment branch (split on
the right length alone). Correctness therefore never depends on data
length; only the PRUNING quality does.

Scale: probe generation is a scan-shaped projection (constant fan-out
per row); the candidate join shuffles on near-unique segment keys; the
verify stage is candidate-sized, never pair-space-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# right strings at least this long go through segment blocking; below
# it (where segments degenerate toward single characters and prune
# nothing) the all-pairs short branch is both exact and cheap
_MIN_SEG_LEN = 8


def _seg_bounds(L: Column, k: int, parts: int) -> tuple[Column, Column]:
    """1-based (start, length) of segment ``k`` of ``parts`` for a
    string of length ``L`` — the even partition floor(k·L/parts)."""
    start = F.floor(L * k / parts).cast("int") + 1
    end = F.floor(L * (k + 1) / parts).cast("int")
    return start, (end - start + 1)


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_str: str,
    right_str: str,
    max_dist: int,
) -> DataFrame:
    """Pairs ``(l_key, r_key, dist)`` with
    ``levenshtein(left_str, right_str) = dist ≤ max_dist``.

    Exact: blocking is lossless (see module docstring), verification is
    the built-in levenshtein. Keys must be unique per side.
    """
    d, parts = max_dist, max_dist + 1
    l_names = left.select(F.col(left_key).alias("l_key"), F.col(left_str).alias("l_str"))
    r_names = right.select(F.col(right_key).alias("r_key"), F.col(right_str).alias("r_str"))

    # --- right probes: the d+1 segments of each (long-enough) string
    rlen = F.length("r_str")
    r_segs = []
    for k in range(parts):
        st, ln = _seg_bounds(rlen, k, parts)
        r_segs.append(
            F.struct(F.lit(k).alias("k"), F.substring(F.col("r_str"), st, ln).alias("seg"))
        )
    rg = (
        r_names.filter(rlen >= _MIN_SEG_LEN)
        .select("r_key", rlen.alias("L"), F.explode(F.array(*r_segs)).alias("s"))
        .select("r_key", "L", F.col("s.k").alias("k"), F.col("s.seg").alias("seg"))
    )

    # --- left probes: for each admissible right length and segment,
    # the substrings at the 2d+1 admissible start positions. ONE
    # generated transform-over-sequence expression, not (2d+1)²(d+1)
    # inline structs — the inline form overflows janino's 64 KB method
    # limit and drops the whole projection out of codegen
    n_p = 2 * d + 1
    tot = n_p * parts * n_p
    _dL = f"((i DIV {parts * n_p}) - {d})"
    _k = f"((i DIV {n_p}) % {parts})"
    _dp = f"((i % {n_p}) - {d})"
    _L = f"(length(l_str) + {_dL})"
    _st = f"(CAST(FLOOR({_L} * {_k} / {parts}) AS INT) + 1)"
    _en = f"CAST(FLOOR({_L} * ({_k} + 1) / {parts}) AS INT)"
    _ln = f"({_en} - {_st} + 1)"
    _pp = f"({_st} + {_dp})"
    _valid = f"({_L} >= {_MIN_SEG_LEN} AND {_pp} >= 1 AND {_pp} + {_ln} - 1 <= length(l_str))"
    probes = (
        f"filter(transform(sequence(0, {tot - 1}), i -> "
        f"CASE WHEN {_valid} THEN named_struct("
        f"'L', CAST({_L} AS INT), 'k', {_k}, 'seg', substring(l_str, {_pp}, {_ln})) "
        f"ELSE NULL END), x -> x IS NOT NULL)"
    )
    lg = (
        l_names.select("l_key", F.explode(F.expr(probes)).alias("s"))
        .select("l_key", F.col("s.L").alias("L"), F.col("s.k").alias("k"), F.col("s.seg").alias("seg"))
    )

    cand_long = lg.join(rg, ["L", "k", "seg"]).select("l_key", "r_key").distinct()

    # --- short branch: right strings below the segment threshold
    cand_short = (
        l_names.filter(F.length("l_str") <= _MIN_SEG_LEN - 1 + d)
        .crossJoin(
            r_names.filter(F.length("r_str") < _MIN_SEG_LEN).select(
                "r_key", F.length("r_str").alias("_rl")
            )
        )
        # length band: one comparison here beats a levenshtein call in
        # the verify stage for every impossible short-short pair
        .filter(F.abs(F.length("l_str") - F.col("_rl")) <= d)
        .select("l_key", "r_key")
    )
    cand = cand_long.unionByName(cand_short)
    # threshold-bounded levenshtein: O(d·n) banded DP with early exit
    # (returns -1 above the bound) instead of the full O(n²) matrix —
    # the verify stage is candidate-sized, and candidates can be ~100×
    # the true pairs when records share low-entropy segments
    verified = (
        cand.join(l_names, "l_key")
        .join(r_names, "r_key")
        .withColumn("dist", F.levenshtein("l_str", "r_str", d))
        .filter(F.col("dist") >= 0)
    )
    return verified.select("l_key", "r_key", "dist")
