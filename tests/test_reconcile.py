"""Table reconciliation: chunk checksums + row drill-down."""

from __future__ import annotations

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.reconcile import (
    mismatched_chunks,
    reconcile,
    table_checksums,
)

SCHEMA = "id long, a string, b string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


BASE = [(i, f"a{i}", f"b{i}") for i in range(200)]


class TestReconcile:
    def test_converged_is_empty(self, spark):
        src, dst = _df(spark, BASE), _df(spark, BASE)
        assert mismatched_chunks(src, dst, ["id"], 64).count() == 0
        assert reconcile(src, dst, ["id"], 64).count() == 0

    def test_single_cell_change_flags_one_chunk(self, spark):
        src = _df(spark, BASE)
        changed = [(i, a, ("XX" if i == 17 else b)) for (i, a, b) in BASE]
        dst = _df(spark, changed)
        bad = mismatched_chunks(src, dst, ["id"], 64)
        assert bad.count() == 1  # checksum localizes the diff to its chunk
        report = reconcile(src, dst, ["id"], 64).collect()
        assert [(r.id, r.status) for r in report] == [(17, "differs")]

    def test_missing_both_sides(self, spark):
        src = _df(spark, BASE)
        dst = _df(spark, [r for r in BASE if r[0] != 5] + [(999, "new", "row")])
        got = sorted((r.id, r.status) for r in reconcile(src, dst, ["id"], 64).collect())
        assert got == [(5, "missing_in_target"), (999, "missing_in_source")]

    def test_null_shift_not_a_collision(self, spark):
        """Spark hash functions skip NULL inputs, so (NULL, 'x') and
        ('x', NULL) would hash equal without positional salting — the
        exact row drift a converged-looking replica could hide."""
        src = _df(spark, [(1, None, "x")])
        dst = _df(spark, [(1, "x", None)])
        got = [(r.id, r.status) for r in reconcile(src, dst, ["id"], 8).collect()]
        assert got == [(1, "differs")]

    def test_salt_value_realignment_not_a_collision(self, spark):
        """r5 review finding: with FLAT positional salting, int columns
        whose value equals the adjacent salt index re-align the hash
        stream after a NULL skip — (7, 2, NULL) vs (7, NULL, 2) hashed
        equal and reconcile reported converged. The two-level row hash
        must see the drift."""
        schema = "id long, a int, b int"
        src = spark.createDataFrame([(7, 2, None)], schema)
        dst = spark.createDataFrame([(7, None, 2)], schema)
        got = [(r.id, r.status) for r in reconcile(src, dst, ["id"], 8).collect()]
        assert got == [(7, "differs")]

    def test_checksum_shape(self, spark):
        """The wire format of the protocol: O(chunks) rows regardless
        of table size, counts partition across chunks."""
        cs = table_checksums(_df(spark, BASE), ["id"], 32).collect()
        assert len(cs) <= 32
        assert sum(r.n_rows for r in cs) == len(BASE)

    def test_drilldown_reads_only_bad_chunks(self, spark):
        """The phase-2 join must be over the mismatched chunks' rows
        only — a converged table's drill-down plan scans nothing."""
        src = _df(spark, BASE)
        changed = [(i, a, ("XX" if i == 17 else b)) for (i, a, b) in BASE]
        dst = _df(spark, changed)
        # the semi-join on the 1-chunk mismatch set keeps ~1/64th of rows
        from xxt_cdc_spark.operators.reconcile import with_chunks

        bad = mismatched_chunks(src, dst, ["id"], 64)
        kept = with_chunks(src, ["id"], 64).join(bad, "_chunk", "left_semi").count()
        assert kept < len(BASE) / 8
