"""Temporal (point-in-time) join against an SCD2 history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.operators.scd2 import scd2_history
from xxt_cdc_spark.operators.temporal_join import temporal_join

CHANGES = "op string, pos_file string, pos_offset long, k long, v string"
FACTS = "k long, pos_file string, pos_offset long, label string"


def _hist(spark):
    # key 1: insert@10 (v=a), update@20 (v=b), delete@30
    # key 2: insert@15 (v=x), still open
    rows = [
        ("I", "f1", 10, 1, "a"),
        ("U", "f1", 20, 1, "b"),
        ("D", "f1", 30, 1, None),
        ("I", "f1", 15, 2, "x"),
    ]
    return scd2_history(
        spark.createDataFrame(rows, CHANGES), ["k"], ["pos_file", "pos_offset"]
    )


class TestTemporalJoin:
    def test_version_selection(self, spark):
        facts = spark.createDataFrame(
            [
                (1, "f1", 5, "before_birth"),   # no version yet
                (1, "f1", 10, "at_insert"),     # valid_from inclusive -> a
                (1, "f1", 19, "mid_v1"),        # -> a
                (1, "f1", 20, "at_update"),     # -> b
                (1, "f1", 29, "mid_v2"),        # -> b
                (1, "f1", 30, "at_delete"),     # gap -> nothing
                (1, "f1", 99, "after_delete"),  # gap -> nothing
                (2, "f1", 50, "open_version"),  # -> x (open valid_to)
            ],
            FACTS,
        )
        got = {
            r.label: r.v
            for r in temporal_join(
                facts, _hist(spark), ["k"], ["pos_file", "pos_offset"]
            ).collect()
        }
        assert got == {
            "at_insert": "a",
            "mid_v1": "a",
            "at_update": "b",
            "mid_v2": "b",
            "open_version": "x",
        }

    def test_left_keeps_unmatched_with_nulls(self, spark):
        facts = spark.createDataFrame(
            [(1, "f1", 5, "early"), (1, "f1", 25, "mid")], FACTS
        )
        rows = temporal_join(
            facts, _hist(spark), ["k"], ["pos_file", "pos_offset"], how="left"
        ).collect()
        by_label = {r.label: r for r in rows}
        assert by_label["early"].v is None and by_label["mid"].v == "b"

    def test_how_guard(self, spark):
        facts = spark.createDataFrame([(1, "f1", 5, "x")], FACTS)
        with pytest.raises(ValueError, match="inner"):
            temporal_join(facts, _hist(spark), ["k"], ["pos_file", "pos_offset"], how="outer")

    def test_plan_is_one_sort_no_join(self, spark):
        """The scale contract: the physical plan is a window over a
        union — no join operator at all, hence no per-key pair blowup."""
        facts = spark.createDataFrame([(1, "f1", 25, "m")], FACTS)
        plan = temporal_join(
            facts, _hist(spark), ["k"], ["pos_file", "pos_offset"]
        )._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in plan, f"unexpected {bad} in plan"
