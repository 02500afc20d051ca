"""IncrementalCM: exactly-once sum-merged count-min store."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions.sketches import IncrementalCM, cm_counters, cm_estimate


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


class TestIncrementalCM:
    def test_chunked_equals_oneshot_and_replay_noop(self, spark, tmp_path):
        keys = [i % 37 for i in range(3000)]
        inc = IncrementalCM(spark, str(tmp_path / "cm"), "k")
        for b in range(3):
            inc.update(_df(spark, keys[b::3]), b)
        inc.update(_df(spark, keys[1::3]), 1)  # replay: must not double-count
        got = sorted(tuple(r) for r in inc.counters().collect())
        want = sorted(tuple(r) for r in cm_counters(_df(spark, keys), "k").collect())
        assert got == want
        # estimates over the committed table are the one-shot estimates
        probes = _df(spark, list(range(37))).withColumnRenamed("k", "p")
        est = {r.p: r.cm_est for r in cm_estimate(inc.counters(), probes, "p").collect()}
        truth = {k: keys.count(k) for k in range(37)}
        assert all(est[k] >= truth[k] for k in truth)  # overestimate-only

    def test_crash_before_commit_then_replay(self, spark, tmp_path):
        inc = IncrementalCM(spark, str(tmp_path / "cm"), "k")
        inc.update(_df(spark, [1, 2, 3]), 0)

        broken = IncrementalCM(spark, str(tmp_path / "cm"), "k")
        real_replace = os.replace

        def boom(*a):
            raise RuntimeError("crash")

        os.replace = boom
        try:
            with pytest.raises(RuntimeError, match="crash"):
                broken.update(_df(spark, [1, 1]), 1)
        finally:
            os.replace = real_replace
        assert inc._last() == 0  # marker still batch 0

        inc.update(_df(spark, [1, 1]), 1)  # replay commits identical content
        total = inc.counters().agg(F.sum("cnt")).collect()[0][0]
        assert total == 5 * 4  # 5 key-occurrences × d rows
