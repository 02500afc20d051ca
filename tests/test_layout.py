"""Z-order layout: interleave correctness, content preservation, and
the pruning economics the layout exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions.layout import (
    file_overlap_fraction,
    interleave_bits,
    zorder_write,
)

SF = "/root/testdata/sf0.001"


def _morton(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


class TestInterleave:
    def test_matches_python_reference(self, spark):
        rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 128, 65535)]
        df = spark.createDataFrame(rows, "a long, b long").withColumn(
            "z", interleave_bits([F.col("a"), F.col("b")], bits=16)
        )
        for r in df.collect():
            assert r.z == _morton([r.a, r.b], 16), (r.a, r.b)

    def test_three_columns(self, spark):
        df = spark.createDataFrame([(5, 3, 7)], "a long, b long, c long").withColumn(
            "z", interleave_bits([F.col("a"), F.col("b"), F.col("c")], bits=8)
        )
        assert df.collect()[0].z == _morton([5, 3, 7], 8)

    def test_guards(self, spark):
        df = spark.range(1)
        with pytest.raises(ValueError, match=">= 2"):
            interleave_bits([F.col("id")])
        with pytest.raises(ValueError, match="overflows"):
            interleave_bits([F.col("id"), F.col("id")], bits=32)


class TestZorderWrite:
    def test_content_preserved(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            "event_id", "user_id", "value"
        )
        zorder_write(ev, ["user_id", "value"], str(tmp_path / "z"), num_files=8)
        back = spark.read.parquet(str(tmp_path / "z"))
        assert back.count() == ev.count()
        a = ev.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
        b = back.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
        assert tuple(a) == tuple(b)

    def test_prunes_on_both_dimensions(self, spark, tmp_path):
        """The point of the layout: under a LINEAR sort on user_id, a
        selective value filter overlaps ~every file; z-ordered, BOTH
        dimensions' selective filters overlap a minority of files."""
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            "event_id", "user_id", "value"
        )
        n_files = 16
        zorder_write(ev, ["user_id", "value"], str(tmp_path / "z"), num_files=n_files)
        # linear baseline: range-sorted by user_id only
        (
            ev.repartitionByRange(n_files, "user_id")
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(str(tmp_path / "lin"))
        )

        # predicates chosen by ROW MASS, not value range (the value
        # column is heavy-tailed; a range-based span would be a
        # selectivity test of the data, not of the layout):
        # ~20% of rows (users 0-2 of 15) / ~10% of rows (value q45-q55)
        q = ev.approxQuantile("value", [0.45, 0.55], 0.001)
        u_sel = (0, 2)
        v_sel = (q[0], q[1])

        z_u = file_overlap_fraction(str(tmp_path / "z"), "user_id", *u_sel)
        z_v = file_overlap_fraction(str(tmp_path / "z"), "value", *v_sel)
        lin_u = file_overlap_fraction(str(tmp_path / "lin"), "user_id", *u_sel)
        lin_v = file_overlap_fraction(str(tmp_path / "lin"), "value", *v_sel)

        # linear prunes its sort dim hard but reads EVERYTHING for the
        # other; z-order pays a little on dim 1 to buy pruning on dim 2
        # (measured 0.44 / 0.56 vs 0.14 / 1.0; margins absorb the range
        # partitioner's sampling variance)
        assert lin_u <= 0.3
        assert lin_v == 1.0
        assert z_u <= 0.7, f"z-order user_id overlap {z_u}"
        assert z_v <= 0.7, f"z-order value overlap {z_v}"
        assert max(z_u, z_v) < lin_v

    def test_filter_pushed_to_scan(self, spark, tmp_path):
        ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id", "value")
        zorder_write(ev, ["user_id", "value"], str(tmp_path / "z"), num_files=4)
        plan = (
            spark.read.parquet(str(tmp_path / "z"))
            .filter(F.col("user_id").between(10, 20) & F.col("value").between(1.0, 2.0))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1][:200]
