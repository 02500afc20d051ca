"""Distributed Bloom filter: a broadcastable set-membership bitmap for
semi-join prefiltering when the lookup set is too large to broadcast
as a join hash table.

Regime this exists for: decontamination / blocklist / id-lookup joins
where the small side holds tens of millions of keys. A broadcast hash
join materializes ~60 bytes/key (join hash table) — 10M grams ≈
600 MB per executor, past any broadcast threshold, so Spark falls back
to shuffling the 100 TB side. The Bloom bitmap carries the same
membership question in ~1.2 bytes/key at 1% FPP (10M keys ≈ 12 MB) —
broadcastable again, and the big side is prefiltered AT THE SCAN with
zero shuffle. False positives are removed by an exact semi-join over
the ~s + 1% survivors, so the COMPOSITION is exact while the heavy
shuffle shrinks by ~the selectivity.

Build is fully distributed: each key contributes k (word, bit-mask)
pairs, one ``bit_or`` aggregation assembles the words, and only the
O(m/64) bitmap reaches the driver. Membership is an Arrow-batched
pandas UDF over a numpy bitmap (one broadcast, vectorized shifts —
the per-batch cost is k gather-and-mask passes). Spark's own runtime
bloom pruning (spark.sql.optimizer.runtime.bloomFilter.enabled) does
this transparently inside one query; this module makes the filter a
PERSISTENT, REUSABLE artifact — built once from the benchmark/blocklist
set, saved, and applied across many queries/batches without rebuilding
(the eval set changes rarely; the corpus streams forever).

Hashing: k independent probes via ``xxhash64(seed=i)`` on the key
column — the same double-hash-free construction the reference
literature allows for k ≤ a few dozen.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for the target false-positive rate;
    m rounded up to a whole 64-bit word."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _probe_positions(col: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a key — k independent xxhash64
    probes (seeded by position), each reduced mod m."""
    return F.array(
        *[F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits)) for i in range(k)]
    )


def build_bloom(
    df: DataFrame,
    col: str,
    expected_items: int,
    fpp: float = 0.01,
) -> dict:
    """Build the filter over ``df[col]`` (any type xxhash64 accepts).

    One explode of k positions per key, one (word → bit_or) shuffle of
    O(distinct words) ≤ m/64 rows, one O(m/64) collect. Returns
    ``{"m": m_bits, "k": k, "words": np.ndarray[uint64]}`` — ~m/8
    bytes, the unit that gets broadcast / persisted.
    """
    m, k = bloom_params(expected_items, fpp)
    words_df = (
        df.select(F.explode(_probe_positions(F.col(col), m, k)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            # F.shiftleft takes a python-int bit count; a per-row shift
            # needs the SQL form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
    )
    words = np.zeros(m // 64, dtype=np.uint64)
    for r in words_df.collect():
        words[int(r["w"])] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return {"m": m, "k": k, "words": words}


def might_contain(
    spark: SparkSession, bloom: dict, col: Column
) -> Column:
    """Membership test column: true ⟺ the key MAY be in the built set
    (never false for an inserted key). The bitmap rides one Spark
    broadcast; the pandas UDF tests all k probes with vectorized numpy
    over each Arrow batch.

    The k probe hashes must be computed JVM-side (`xxhash64` is not
    reimplemented in Python) — the UDF receives the positions array.
    """
    m, k = bloom["m"], bloom["k"]
    bc = spark.sparkContext.broadcast(bloom["words"])

    @pandas_udf("boolean")
    def _test(pos: pd.Series) -> pd.Series:
        words = bc.value
        if len(pos) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        arr = np.vstack(pos.to_numpy()).astype(np.int64)  # rows × k
        out = np.ones(len(pos), dtype=bool)
        for j in range(arr.shape[1]):
            p = arr[:, j]
            hit = (words[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1)
            out &= hit.astype(bool)
        return pd.Series(out)

    return _test(_probe_positions(col, m, k))
