"""√N default centroid sizing for the incremental vector stores (r9
VERDICT item 5): ``n_centroids=None`` (now the default) sizes ⌈√N⌉
from the seed frame at init — the measured wall-clock optimum
(SCALING.md round-9 addendum) — recovers the pinned count from the
centroid sidecar on reopen, and produces results identical to the same
value passed explicitly. Explicit values stay honored, so the gated
registry queries (fixed n_centroids) are unaffected.
"""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions import similarity as S
from xxt_cdc_spark.functions.similarity import _auto_n_centroids


class TestAutoSizingRule:
    @pytest.mark.parametrize(
        "n,expected",
        [
            (0, 1),
            (1, 1),          # clamped to N
            (2, 2),
            (3, 3),
            (9, 4),          # ceil(sqrt)=3 but floor is 4
            (16, 4),
            (17, 5),
            (100, 10),
            (101, 11),
            (200_000, 448),
            (10**9, 4096),   # cap
        ],
    )
    def test_clamped_ceil_sqrt(self, n, expected):
        assert _auto_n_centroids(n) == expected
        if 16 <= n <= 4096**2:
            assert _auto_n_centroids(n) == min(4096, math.ceil(math.sqrt(n)))


class TestSemDedupAuto:
    def test_auto_equals_explicit_sqrt(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        seeds = emb.filter(F.col("vec_id") < 100)
        n_seed = seeds.count()
        expected = _auto_n_centroids(n_seed)
        state_a = tempfile.mkdtemp(prefix="autosd_a_")
        state_b = tempfile.mkdtemp(prefix="autosd_b_")
        try:
            auto = S.IncrementalSemDedup(spark, state_a, threshold=0.38)
            assert auto.n_centroids is None and auto.store is None
            auto.init(seeds)
            assert auto.n_centroids == expected
            explicit = S.IncrementalSemDedup(
                spark, state_b, threshold=0.38, n_centroids=expected
            )
            explicit.init(seeds)
            chunk = emb.filter(F.col("vec_id") < 200)
            auto.update(chunk, chunk_id=0)
            explicit.update(chunk, chunk_id=0)
            flags_a = {(r.vec_id, r.kept) for r in auto.state().collect()}
            flags_b = {(r.vec_id, r.kept) for r in explicit.state().collect()}
            assert flags_a == flags_b
        finally:
            shutil.rmtree(state_a, ignore_errors=True)
            shutil.rmtree(state_b, ignore_errors=True)

    def test_reopen_recovers_count_from_sidecar(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        seeds = emb.filter(F.col("vec_id") < 50)
        state = tempfile.mkdtemp(prefix="autosd_r_")
        try:
            first = S.IncrementalSemDedup(spark, state, threshold=0.38)
            first.init(seeds)
            pinned = first.n_centroids
            first.update(seeds, chunk_id=0)
            reopened = S.IncrementalSemDedup(spark, state, threshold=0.38)
            assert reopened.n_centroids == pinned
            assert reopened.store is not None
            # the reopened store reads the same rows (same bucketing)
            assert reopened.state().count() == first.state().count()
        finally:
            shutil.rmtree(state, ignore_errors=True)


class TestIVFAuto:
    def test_auto_equals_explicit_sqrt_topk(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        seeds = emb.filter(F.col("vec_id") < 64)
        expected = _auto_n_centroids(seeds.count())
        state_a = tempfile.mkdtemp(prefix="autoivf_a_")
        state_b = tempfile.mkdtemp(prefix="autoivf_b_")
        try:
            auto = S.IncrementalIVF(spark, state_a)
            assert auto.n_centroids is None and auto.store is None
            auto.init(seeds)
            assert auto.n_centroids == expected
            explicit = S.IncrementalIVF(spark, state_b, n_centroids=expected)
            explicit.init(seeds)
            auto.update(seeds, chunk_id=0)
            explicit.update(seeds, chunk_id=0)
            q = emb.filter(F.col("vec_id") < 3)
            ka = {
                (r.query_id, r.rank, r.item_id)
                for r in auto.topk(q, k=5, n_probe=expected).collect()
            }
            kb = {
                (r.query_id, r.rank, r.item_id)
                for r in explicit.topk(q, k=5, n_probe=expected).collect()
            }
            assert ka == kb and ka
        finally:
            shutil.rmtree(state_a, ignore_errors=True)
            shutil.rmtree(state_b, ignore_errors=True)

    def test_update_before_init_fails_loudly(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        state = tempfile.mkdtemp(prefix="autoivf_u_")
        try:
            idx = S.IncrementalIVF(spark, state)
            with pytest.raises(RuntimeError, match="not initialized"):
                idx.update(emb.limit(5), chunk_id=0)
        finally:
            shutil.rmtree(state, ignore_errors=True)


class TestUninitializedStateGuard:
    def test_state_before_init_raises_cleanly(self, spark, tmp_path):
        idx = S.IncrementalSemDedup(spark, str(tmp_path / "fresh"))
        with pytest.raises(RuntimeError, match="not initialized"):
            idx.state()
