"""Regression pins for the round-5 ADVICE findings (beyond the gate
tests in test_txn_gate.py): z-order NULL binning, reconcile column-set
validation, pool eviction on commit failure."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.functions.layout import _quantile_bin_expr
from xxt_cdc_spark.operators.reconcile import reconcile
from xxt_cdc_spark.sinks.upsert import (
    _CONN_POOL,
    _POOL_LOCK,
    close_pooled_connections,
    commit_pooled,
)


class TestZorderNullBin:
    def test_nulls_bin_to_zero_not_max(self, spark):
        """A NULL value must land in bin 0 (NULLS FIRST), not fall
        through the comparison tree to the deepest (max-value) leaf
        (r5 ADVICE item 4)."""
        df = spark.createDataFrame(
            [(None,), (0.0,), (5.0,), (50.0,), (500.0,)], "v double"
        )
        bins = df.select(
            F.col("v"), _quantile_bin_expr(F.col("v"), [1.0, 10.0, 100.0]).alias("b")
        ).collect()
        by_val = {r["v"]: r["b"] for r in bins}
        assert by_val[None] == 0
        assert by_val[0.0] == 0
        assert by_val[500.0] == 3  # max leaf is reachable by real values
        assert by_val[None] != by_val[500.0]


class TestReconcileValidation:
    def test_column_set_mismatch_raises_up_front(self, spark):
        src = spark.createDataFrame([(1, "a", 1.0)], "id long, x string, extra double")
        dst = spark.createDataFrame([(1, "a", True)], "id long, x string, other boolean")
        with pytest.raises(ValueError, match="only in src.*extra.*only in dst.*other"):
            reconcile(src, dst, ["id"])

    def test_reordered_columns_still_reconcile(self, spark):
        """Same column SET in a different order is normalized, not a
        false drift report."""
        src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, x string")
        dst = spark.createDataFrame([("a", 1), ("b", 2)], "x string, id long")
        assert reconcile(src, dst, ["id"]).count() == 0


class TestPoolEviction:
    def test_commit_failure_evicts_every_alias_of_the_connection(self, tmp_path):
        """Several pool_keys sharing one connection: a failed commit
        must evict them ALL, or later writers get a dead handle
        (r5 ADVICE item 5)."""

        class FailingConn:
            def __init__(self):
                self.closed = False

            def commit(self):
                raise RuntimeError("commit torn")

            def close(self):
                self.closed = True

        conn = FailingConn()
        good = sqlite3.connect(str(tmp_path / "ok.db"))
        try:
            with _POOL_LOCK:
                _CONN_POOL["a"] = conn
                _CONN_POOL["b"] = conn
                _CONN_POOL["c"] = conn  # alias OUTSIDE the commit set
                _CONN_POOL["other"] = good
            with pytest.raises(RuntimeError, match="commit torn"):
                commit_pooled(["a", "b"])
            with _POOL_LOCK:
                assert "a" not in _CONN_POOL
                assert "b" not in _CONN_POOL
                assert "c" not in _CONN_POOL
                assert _CONN_POOL.get("other") is good
            assert conn.closed
        finally:
            close_pooled_connections()
