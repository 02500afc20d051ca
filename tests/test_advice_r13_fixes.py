"""r13 ADVICE closures (landed r14).

1. scd2.py — the lag-equality redelivery dedup's malformed-feed delta
   vs dropDuplicates is now documented AND behavior-pinned here (the
   delta only exists on feeds with no well-defined history).
2. dedup.py persist accumulation — documented no-change (the
   cache-pressure A/B refuted accumulation drift; comment at the
   persist site). No test: nothing changed.
3. collapse.order_exprs_materialized — the (length, value) pos_file
   convention now has ONE source of truth shared by last_write_wins
   (expression form) and scd2_history (materialized-attribute form);
   the scd2 1-exchange + 1-sort plan shape is pinned below so the
   refactor can never silently reintroduce the 3-sort regression.
4. tools/trigger_curve._rate_span — span_start clamped to one trigger
   interval before the first measured start so a slow warm-up batch
   cannot stretch the rate denominator (4348 vs true 5000 ev/s).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.collapse import order_exprs, order_exprs_materialized
from xxt_cdc_spark.operators.scd2 import scd2_history

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from trigger_curve import _rate_span  # noqa: E402

SCHEMA = "id long, v string, op string, pos_file string, pos_offset long"


class TestRateSpanClamp:
    # (start_ts, duration_ms, rows); first 3 are warm-up
    def test_normal_warmup_unchanged(self):
        """When the warm-up batch starts exactly one trigger interval
        before the first measured batch, the clamp is a no-op — the
        r12-ADVICE anchor arithmetic (and its r11 test values) hold."""
        batches = [
            (100.0, 400.0, 5000),
            (100.5, 400.0, 5000),
            (101.0, 400.0, 5000),
            (101.25, 150.0, 1250),
            (101.50, 150.0, 1250),
            (101.75, 150.0, 1250),
            (102.00, 150.0, 1250),
        ]
        span = _rate_span(batches, batches[3:], 250, 25.0)
        assert abs(span - 1.15) < 1e-9

    def test_slow_warmup_clamped(self):
        """A 2-second warm-up batch before a 250 ms trigger: the old
        prev-start anchor stretched the denominator by 1.75 s beyond
        the measured rows' arrival window and understated the rate;
        the clamp restores ~the true feed rate."""
        batches = [
            (98.0, 900.0, 5000),
            (99.0, 900.0, 5000),
            (99.5, 2000.0, 5000),  # slow warm-up batch
            (101.5, 150.0, 1250),
            (101.75, 150.0, 1250),
            (102.0, 150.0, 1250),
            (102.25, 150.0, 1250),
        ]
        measured = batches[3:]
        rows = sum(b[2] for b in measured)
        span = _rate_span(batches, measured, 250, 25.0)
        # clamped start = 101.5 - 0.25 = 101.25 (not 99.5)
        assert abs(span - 1.15) < 1e-9
        assert round(rows / span) == 4348  # vs 1724 under the old anchor
        unclamped = (measured[-1][0] - batches[2][0]) + measured[-1][1] / 1000.0
        assert round(rows / unclamped) == 1724

    def test_no_prev_timestamp_fallback(self):
        batches = [
            (None, 400.0, 5000),
            (None, 400.0, 5000),
            (None, 400.0, 5000),
            (101.25, 150.0, 1250),
            (102.00, 150.0, 1250),
        ]
        span = _rate_span(batches, batches[3:], 250, 25.0)
        assert abs(span - (102.0 - 101.0 + 0.15)) < 1e-9

    def test_no_timestamps_nominal_fallback(self):
        batches = [(None, 400.0, 100)] * 5
        assert _rate_span(batches, batches[3:], 250, 25.0) == 25.0


class TestOrderExprsMaterialized:
    def test_shared_convention_with_order_exprs(self, spark):
        """Both forms produce the same (length, value) pos_file order;
        other columns pass through as themselves."""
        tmp_cols, order_by = order_exprs_materialized(["pos_file", "pos_offset"])
        assert list(tmp_cols) == ["__ord_len_pos_file"]
        # attribute-only ordering: length tmp, pos_file, pos_offset
        assert [str(c) for c in order_by] == [
            str(F.col("__ord_len_pos_file")),
            str(F.col("pos_file")),
            str(F.col("pos_offset")),
        ]
        exprs = order_exprs(["pos_file", "pos_offset"])
        assert len(exprs) == 3  # length term + value + offset

    def test_rotation_suffix_widening_orders_numerically(self, spark):
        """'binlog.1000000' must sort AFTER 'binlog.999999' (numeric
        file order) under the materialized form, same as order_exprs."""
        df = spark.createDataFrame(
            [("binlog.1000000", 1), ("binlog.999999", 2)], "pos_file string, x int"
        )
        tmp_cols, order_by = order_exprs_materialized(["pos_file"])
        for t, e in tmp_cols.items():
            df = df.withColumn(t, e)
        got = [r.pos_file for r in df.orderBy(*order_by).collect()]
        assert got == ["binlog.999999", "binlog.1000000"]


class TestScd2AdviceClosure:
    def test_exact_redelivery_collapses(self, spark):
        rows = [
            (3, "c1", "I", "bin.000001", 12),
            (3, "c1", "I", "bin.000001", 12),
            (3, "c1", "I", "bin.000001", 12),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        hist = scd2_history(df, ["id"], ["pos_file", "pos_offset"]).collect()
        assert len(hist) == 1 and hist[0].is_current == 1

    def test_malformed_interleaved_tie_documented_delta(self, spark):
        """The documented delta vs dropDuplicates: a DIFFERENT row
        tying on (key, position) that sorts between two exact copies
        leaves the second copy alive. Such a feed has no well-defined
        history (lead() is engine-dependent on the tie either way) —
        this pins the documented behavior, not a correctness claim."""
        rows = [
            (1, "a", "I", "bin.000001", 10),
            (1, "b", "U", "bin.000001", 10),  # tie on position: broken feed
            (1, "a", "U", "bin.000001", 10),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        hist = scd2_history(df, ["id"], ["pos_file", "pos_offset"]).collect()
        # at most one pair collapses; 2 or 3 versions depending on the
        # engine's tie order — never fewer than the 2 distinct rows
        assert len(hist) >= 2

    def test_plan_stays_one_exchange_one_sort(self, spark):
        """The r13 win the shared-helper refactor must preserve: the
        dedup + lead() windows all ride ONE shuffle + ONE sort."""
        df = spark.createDataFrame(
            [(i % 7, f"v{i}", "U", "bin.000001", i) for i in range(100)], SCHEMA
        )
        hist = scd2_history(df, ["id"], ["pos_file", "pos_offset"])
        plan = hist._jdf.queryExecution().executedPlan().toString()
        # count operator headers, not substrings of other names
        n_exchange = sum(
            1 for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
        )
        n_sort = sum(1 for ln in plan.splitlines() if "+- Sort [" in ln or ln.strip().startswith("Sort ["))
        assert n_exchange == 1, plan
        assert n_sort == 1, plan
