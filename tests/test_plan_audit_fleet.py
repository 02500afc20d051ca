"""Fleet-wide physical-plan audit: EVERY registered query, one gate.

The hand-written plan-shape tests pin specific load-bearing markers;
this sweep generalizes the two anti-patterns that must hold across the
whole registry, so a future query can't reintroduce them unnoticed:

- no ``CartesianProduct`` anywhere (measured empty across all 100
  registry entries at r8 — exact baselines broadcast their tiny side,
  which plans as BroadcastNestedLoopJoin, never a shuffled cartesian);
- no ``BatchEvalPython`` (row-at-a-time Python UDF) — every Python
  stage in the engine is Arrow-vectorized (ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas are the allowed markers).

Runs at sf0.001; incremental queries materialize their stores while
building plans, so this is minutes-scale — one test, kept separate
from the per-marker fast tests.
"""

from __future__ import annotations

from xxt_cdc_spark.queries import QUERIES


class TestFleetPlanAudit:
    def test_no_cartesian_no_row_at_a_time_python(self, spark, sf_dir):
        offenders: dict[str, list[str]] = {}
        for name, fn in QUERIES.items():
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            marks = [
                m
                for m in ("CartesianProduct", "BatchEvalPython")
                if m in plan
            ]
            if marks:
                offenders[name] = marks
        assert not offenders, offenders
