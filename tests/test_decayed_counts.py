"""Exponentially-decayed counts: exactness and semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions.sketches import decayed_counts


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )


class TestDecayedCounts:
    def test_known_values(self, spark):
        # hl = 1 hour; newest bucket = 02:xx. k=a: ages 0,1,2 → 1 + 0.5
        # + 0.25 = 1.75; k=b: two at age 0 → 2.0
        rows = [
            ("a", "2024-01-01 02:10:00"),
            ("a", "2024-01-01 01:10:00"),
            ("a", "2024-01-01 00:10:00"),
            ("b", "2024-01-01 02:20:00"),
            ("b", "2024-01-01 02:40:00"),
        ]
        got = {
            r.k: r.decayed_count
            for r in decayed_counts(_df(spark, rows), "k", "ts", 3600).collect()
        }
        assert got == {"a": 1.75, "b": 2.0}

    def test_cap_cuts_ancient_events(self, spark):
        rows = [("a", "2024-01-01 00:00:00"), ("a", "2020-01-01 00:00:00")]
        got = decayed_counts(_df(spark, rows), "k", "ts", 3600, cap=8).collect()
        assert got[0].decayed_count == 1.0  # the 2020 event is past the cap

    def test_weights_are_exact_integers(self, spark):
        """The determinism claim: at cap=50, scores remain exact
        (integer weights summed in decimal — no float accumulation)."""
        rows = [("a", "2024-01-01 00:00:00")] * 1000 + [("a", "2024-01-03 00:00:00")]
        got = decayed_counts(_df(spark, rows), "k", "ts", 3600, cap=50).collect()
        assert got[0].decayed_count == 1.0 + 1000 * 2.0**-48

    def test_cap_guard(self, spark):
        with pytest.raises(ValueError, match="cap"):
            decayed_counts(_df(spark, [("a", "2024-01-01 00:00:00")]), "k", "ts", 60, cap=70)
