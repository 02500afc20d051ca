"""Tests for the gap-fill operator and whole-document bin packing."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from xxt_cdc_spark.functions.curation import SEQ_LEN, pack_bins_whole
from xxt_cdc_spark.operators.gap_fill import bucketize, dense_grid, gap_fill


class TestGapFill:
    def _observed(self, spark):
        # user 1: buckets 10, 13 (gap 11, 12); user 2: single bucket
        rows = [
            (1, 10, 2, 4.0),
            (1, 13, 1, 10.0),
            (2, 7, 3, 5.0),
        ]
        return spark.createDataFrame(rows, "user_id int, b long, n int, v double")

    def test_grid_spans_min_max_per_key(self, spark):
        g = dense_grid(self._observed(spark), ["user_id"], "b")
        got = {(r.user_id, r.b) for r in g.collect()}
        assert got == {(1, 10), (1, 11), (1, 12), (1, 13), (2, 7)}

    def test_locf_and_linear_interp(self, spark):
        out = gap_fill(
            self._observed(spark), ["user_id"], "b", value_cols=["v"], count_cols=["n"]
        ).collect()
        by = {(r.user_id, r.b): r for r in out}
        # observed rows keep exact values and flag=1
        assert by[(1, 10)].observed == 1 and by[(1, 10)].v_interp == 4.0
        assert by[(1, 13)].v_locf == 10.0
        # gap rows: locf carries 4.0; interp walks 4 -> 10 linearly
        assert by[(1, 11)].observed == 0 and by[(1, 11)].n == 0
        assert by[(1, 11)].v_locf == 4.0 and by[(1, 12)].v_locf == 4.0
        assert abs(by[(1, 11)].v_interp - 6.0) < 1e-12
        assert abs(by[(1, 12)].v_interp - 8.0) < 1e-12
        # single-observation key: no gaps, values exact
        assert by[(2, 7)].v_locf == 5.0 and by[(2, 7)].v_interp == 5.0

    def test_observed_but_null_bucket_is_bridged_not_misreported(self, spark):
        """A bucket PRESENT with a null value must read observed=1 yet
        have both fills bridge it — the r12 segment-explode rewrite
        must preserve this (the null row contributes no fill anchor)."""
        rows = [
            (1, 10, 2, 4.0),
            (1, 11, 1, None),  # present, value null
            (1, 13, 1, 10.0),
        ]
        obs = spark.createDataFrame(rows, "user_id int, b long, n int, v double")
        by = {
            (r.user_id, r.b): r
            for r in gap_fill(obs, ["user_id"], "b", value_cols=["v"], count_cols=["n"]).collect()
        }
        assert set(by) == {(1, b) for b in (10, 11, 12, 13)}
        # presence flag reports the ROW, not value nullness
        assert by[(1, 11)].observed == 1 and by[(1, 11)].n == 1
        assert by[(1, 12)].observed == 0 and by[(1, 12)].n == 0
        # fills skip the null anchor: locf carries 4.0 across both
        assert by[(1, 11)].v_locf == 4.0 and by[(1, 12)].v_locf == 4.0
        # interp walks 4 -> 10 over buckets 10..13
        assert abs(by[(1, 11)].v_interp - 6.0) < 1e-12
        assert abs(by[(1, 12)].v_interp - 8.0) < 1e-12
        assert by[(1, 13)].v_interp == 10.0

    def test_plan_is_join_free_and_windows_pre_explode(self, spark):
        """The r12 shape guard: fills are windowed over the OBSERVED
        rows and the grid is exploded from gap segments — the plan must
        contain no join (the old shape joined the exploded grid back to
        the observations and sorted the grid twice)."""
        plan = gap_fill(
            self._observed(spark), ["user_id"], "b", value_cols=["v"], count_cols=["n"]
        )._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "Generate explode" in plan  # the grid still fans out distributed
        # the explode (Generate) must sit ABOVE the window evaluation in
        # the operator tree (children print below parents)
        assert plan.index("Generate") < plan.index("Window")

    def test_bucketize_micros_exact(self, spark):
        df = spark.createDataFrame(
            [(datetime(2024, 1, 1, 0, 59, 59),), (datetime(2024, 1, 1, 1, 0, 0),)],
            "ts timestamp",
        )
        b = [r[0] for r in df.select(bucketize("ts", 3600)).collect()]
        assert b[1] == b[0] + 1


class TestWholeDocPacking:
    def _docs(self, spark, sizes):
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _fills(self, packed):
        agg = (
            packed.groupBy("shard", "bin")
            .agg(F.sum("n_tok").alias("fill"), F.count("*").alias("n"))
            .collect()
        )
        return agg

    def test_capacity_respected_and_all_docs_packed(self, spark):
        sizes = [100, 200, 50, 256, 300, 1, 255, 128, 64, 32] * 5
        docs = self._docs(spark, sizes)
        packed = pack_bins_whole(docs, "doc_id", "text", seq_len=SEQ_LEN)
        assert packed.count() == len(sizes)  # every doc assigned exactly once
        for r in self._fills(packed):
            # a bin over capacity must be a single oversized document
            assert r.fill <= SEQ_LEN or r.n == 1

    def test_ffd_never_more_bins_than_nfd(self, spark):
        sizes = list(range(1, 120)) + [200, 210, 220, 256, 40, 40, 40]
        docs = self._docs(spark, sizes)
        def n_bins(strategy):
            return (
                pack_bins_whole(docs, "doc_id", "text", strategy=strategy)
                .select("shard", "bin")
                .distinct()
                .count()
            )
        assert n_bins("ffd") <= n_bins("nfd")

    def test_deterministic_across_partitionings(self, spark):
        sizes = [37 * (i % 11) + 3 for i in range(200)]
        docs = self._docs(spark, sizes)
        a = pack_bins_whole(docs.repartition(1), "doc_id", "text").collect()
        b = pack_bins_whole(docs.repartition(13), "doc_id", "text").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
