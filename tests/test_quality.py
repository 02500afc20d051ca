"""Data-quality operators: profiling + declarative integrity checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from xxt_cdc_spark.functions.quality import (
    accepted_values_violations,
    fk_orphans,
    pk_violations,
    profile,
)


class TestQuality:
    def test_profile(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, s string"
        )
        rows = {r.column: r for r in profile(df).collect()}
        assert rows["id"].n_rows == 4 and rows["id"].n_null == 0
        assert rows["id"].n_distinct == 4 and rows["id"].min_str == "1"
        assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
        assert rows["s"].max_str == "b"

    def test_pk_violations(self, spark):
        df = spark.createDataFrame([(1,), (1,), (2,), (None,)], "id long")
        got = sorted(
            ((r.id, r.violation) for r in pk_violations(df, ["id"]).collect()),
            key=lambda t: (t[0] is not None, t[0] or 0),
        )
        assert got == [(None, "null_key"), (1, "duplicate")]

    def test_fk_orphans_null_not_orphan(self, spark):
        child = spark.createDataFrame([(1,), (5,), (None,)], "fk long")
        parent = spark.createDataFrame([(1,), (2,)], "pk long")
        got = [r.fk for r in fk_orphans(child, "fk", parent, "pk").collect()]
        assert got == [5]

    def test_accepted_values(self, spark):
        df = spark.createDataFrame([("O",), ("X",), (None,)], "s string")
        got = [r.s for r in accepted_values_violations(df, "s", ["O", "F"]).collect()]
        assert got == ["X"]

    def test_clean_table_ships_nothing(self, spark):
        """A trusted table's checks are empty frames — the scan is the
        whole cost."""
        df = spark.createDataFrame([(i, "O") for i in range(100)], "id long, s string")
        assert pk_violations(df, ["id"]).count() == 0
        assert accepted_values_violations(df, "s", ["O"]).count() == 0
