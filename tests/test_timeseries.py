"""OHLC / time-weighted-average downsampling operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.timeseries import IncrementalOHLC, ohlc, time_weighted_avg


def _ts(s):
    return datetime.fromisoformat(s)


class TestOhlc:
    def test_known_values_and_tie_determinism(self, spark):
        rows = [
            # key 1, bucket 0: open 5 (earliest), close 2 (latest)
            (1, 0, _ts("2024-01-01 00:00:00"), 1, 5.0),
            (1, 0, _ts("2024-01-01 00:10:00"), 2, 9.0),
            (1, 0, _ts("2024-01-01 00:20:00"), 3, 2.0),
            # key 2, bucket 0: duplicate timestamps — tiebreak on id then value
            (2, 0, _ts("2024-01-01 00:00:00"), 10, 7.0),
            (2, 0, _ts("2024-01-01 00:00:00"), 11, 3.0),
        ]
        df = spark.createDataFrame(rows, "k int, b long, ts timestamp, id long, v double")
        got = {
            (r.k, r.b): (r.open, r.high, r.low, r.close, r.n_samples)
            for r in ohlc(df, ["k"], "b", "ts", "v", tiebreak_col="id").collect()
        }
        assert got[(1, 0)] == (5.0, 9.0, 2.0, 2.0, 3)
        # same instant: id 10 is the open, id 11 the close — deterministic
        assert got[(2, 0)] == (7.0, 7.0, 3.0, 3.0, 2)


class TestOhlcPackedOrder:
    """r14: unique_order=True swaps the struct min/max (SortAggregate —
    struct agg buffers are not UnsafeRow-mutable) for min_by/max_by on
    (ts, tiebreak) packed into one DECIMAL(38,0) (HashAggregate).
    Row-identical whenever (ts, tiebreak) is unique per group."""

    def _frame(self, spark):
        import random

        rnd = random.Random(1405)
        rows = []
        for i in range(400):
            # pre- and post-epoch timestamps, duplicate instants with
            # distinct ids, clustered into few (key, bucket) groups
            ts = datetime.fromtimestamp(rnd.randrange(-10**9, 10**9))
            rows.append((rnd.randrange(3), rnd.randrange(4), ts, i, rnd.random() * 100))
        return spark.createDataFrame(rows, "k int, b long, ts timestamp, id long, v double")

    def test_packed_equals_struct_order(self, spark):
        df = self._frame(spark)
        ref = {
            (r.k, r.b): (r.open, r.high, r.low, r.close, r.n_samples)
            for r in ohlc(df, ["k"], "b", "ts", "v", tiebreak_col="id").collect()
        }
        got = {
            (r.k, r.b): (r.open, r.high, r.low, r.close, r.n_samples)
            for r in ohlc(
                df, ["k"], "b", "ts", "v", tiebreak_col="id", unique_order=True
            ).collect()
        }
        assert got == ref

    def test_packed_no_tiebreak_equals_struct_order(self, spark):
        df = self._frame(spark).dropDuplicates(["k", "b", "ts"])
        ref = {
            (r.k, r.b): (r.open, r.high, r.low, r.close, r.n_samples)
            for r in ohlc(df, ["k"], "b", "ts", "v").collect()
        }
        got = {
            (r.k, r.b): (r.open, r.high, r.low, r.close, r.n_samples)
            for r in ohlc(df, ["k"], "b", "ts", "v", unique_order=True).collect()
        }
        assert got == ref

    def test_packed_plans_hash_aggregate(self, spark):
        df = self._frame(spark)
        packed = ohlc(df, ["k"], "b", "ts", "v", tiebreak_col="id", unique_order=True)
        plan = packed._jdf.queryExecution().executedPlan().toString()
        assert "SortAggregate" not in plan, plan
        assert "HashAggregate" in plan, plan
        # ...while the struct order is the documented SortAggregate shape
        struct_plan = (
            ohlc(df, ["k"], "b", "ts", "v", tiebreak_col="id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortAggregate" in struct_plan, struct_plan


class TestTimeWeightedAvg:
    def test_known_weighting(self, spark):
        # v=10 for 30 min, then v=20 for 10 min, last sample unweighted
        rows = [
            (1, 0, _ts("2024-01-01 00:00:00"), 1, 10.0),
            (1, 0, _ts("2024-01-01 00:30:00"), 2, 20.0),
            (1, 0, _ts("2024-01-01 00:40:00"), 3, 99.0),
        ]
        df = spark.createDataFrame(rows, "k int, b long, ts timestamp, id long, v double")
        r = time_weighted_avg(df, ["k"], "b", "ts", "v", tiebreak_col="id").collect()[0]
        # (10*30 + 20*10) / 40 = 12.5
        assert abs(r.twa - 12.5) < 1e-9
        assert r.span_us == 40 * 60 * 1_000_000 and r.n_samples == 3

    def test_single_sample_and_zero_span_are_null(self, spark):
        rows = [
            (1, 0, _ts("2024-01-01 00:00:00"), 1, 10.0),
            (2, 0, _ts("2024-01-01 00:00:00"), 2, 5.0),
            (2, 0, _ts("2024-01-01 00:00:00"), 3, 7.0),
        ]
        df = spark.createDataFrame(rows, "k int, b long, ts timestamp, id long, v double")
        got = {r.k: r.twa for r in time_weighted_avg(df, ["k"], "b", "ts", "v", "id").collect()}
        assert got[1] is None  # single sample: no span
        assert got[2] is None  # zero span: pinned to null, not NaN/inf


class TestIncrementalOHLC:
    def _samples(self, spark, sf="/root/testdata/sf0.001"):
        from xxt_cdc_spark.queries.streaming import _events
        from xxt_cdc_spark.operators.gap_fill import bucketize

        return _events(spark, sf).select(
            "user_id", "event_id", "ts",
            bucketize("ts", 86_400).alias("b"), "value",
        )

    def test_chunked_equals_one_shot(self, spark, tmp_path):
        ev = self._samples(spark)
        inc = IncrementalOHLC(spark, str(tmp_path / "c"), ["user_id"], n_buckets=4)
        for i in range(3):
            inc.update(ev.filter(F.col("event_id") % 3 == i), "b", "ts", "value", "event_id")
        got = {
            (r.user_id, r.b): (r.open, r.high, r.low, r.close)
            for r in inc.read().collect()
        }
        want = {
            (r.user_id, r.b): (r.open, r.high, r.low, r.close)
            for r in ohlc(ev, ["user_id"], "b", "ts", "value", "event_id").collect()
        }
        assert got == want and len(want) > 10

    def test_replay_is_idempotent(self, spark, tmp_path):
        ev = self._samples(spark)
        inc = IncrementalOHLC(spark, str(tmp_path / "r"), ["user_id"], n_buckets=4)
        b0 = ev.filter(F.col("event_id") % 2 == 0)
        inc.update(b0, "b", "ts", "value", "event_id")
        before = sorted(map(tuple, inc.read().collect()))
        inc.update(b0, "b", "ts", "value", "event_id")  # replay: must not move
        assert sorted(map(tuple, inc.read().collect())) == before
