"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the corpus, with the dot product computed JVM-side
(zip_with + aggregate fold; no UDF, deterministic order).

Scale path: sign-LSH bucketing — restrict the search to the query's
bucket. At 100 TB the corpus side is pre-bucketed (partitioned by
bucket key) so a query touches one partition; brute force within
bucket. An IVF variant would replace the bucket fn with nearest-
centroid assignment; the plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    """Σ a[i]·b[i] as an ordered JVM-side fold (bit-deterministic)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    queries is broadcast (small); the corpus is scanned once — the
    O(|Q|·N) plan that is the correctness baseline for ANN variants.
    Deterministic tie-break on corpus id.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("item_id") != F.col("query_id"))
        .withColumn("cosine", cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cosine")
    )


def sign_lsh_bucket(vec_col: str, dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41)) -> Column:
    """Deterministic sign-LSH bucket key: concatenated sign bits of
    fixed coordinates (1-based). Cheap, portable, and an honest LSH
    family for cosine on roughly isotropic data."""
    bits = [
        F.when(F.element_at(F.col(vec_col), d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41),
) -> DataFrame:
    """ANN: search only within the query's sign-LSH bucket.

    Recall < 1 by construction (documented); at scale the corpus is
    hash-partitioned by bucket so each query reads one partition
    instead of the full table.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_lsh_bucket(vec_col, dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("cv"),
        sign_lsh_bucket(vec_col, dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("item_id") != F.col("query_id"))
        .withColumn("cosine", cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cosine")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, i < j.

    Small/medium corpora: blocked self-join. At 100 TB this composes
    with sign_lsh_bucket as a pre-join blocker (same pattern as
    lsh_bucketed_topk) — kept separate so the exact variant stays the
    oracle baseline.
    """
    a = corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("j"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("i") < F.col("j"))
        .withColumn("cosine", cosine("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("i", "j", "cosine")
    )
