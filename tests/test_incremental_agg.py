"""Incremental aggregate maintenance (operators/incremental_agg.py):
delta algebra edge cases, and the bucket-pruned storage integration
with ParquetStateTable (only touched buckets are read for old images).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.incremental_agg import cdc_agg_delta, merge_agg


def _batch(spark, rows):
    return spark.createDataFrame(rows, "op string, k long, grp string, v double")


def _old(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, v double")


def _agg0(spark):
    return spark.createDataFrame([], "grp string, n long, v_sum decimal(25,6)")


def _apply(spark, agg, batch, old):
    delta = cdc_agg_delta(batch, old, ["grp"], ["v"])
    return merge_agg(agg, delta, ["grp"], ["v"])


def _as_dict(agg):
    return {r.grp: (r.n, float(r.v_sum)) for r in agg.collect()}


class TestDeltaAlgebra:
    def test_insert_update_delete(self, spark):
        agg = _apply(
            spark,
            _agg0(spark),
            _batch(spark, [("I", 1, "a", 10.0), ("I", 2, "a", 5.0), ("I", 3, "b", 1.0)]),
            _old(spark, []),
        )
        assert _as_dict(agg) == {"a": (2, 15.0), "b": (1, 1.0)}
        # update k=1 within group; delete k=2
        agg = _apply(
            spark,
            agg,
            _batch(spark, [("U", 1, "a", 12.0), ("D", 2, "a", None)]),
            _old(spark, [(1, "a", 10.0), (2, "a", 5.0)]),
        )
        assert _as_dict(agg) == {"a": (1, 12.0), "b": (1, 1.0)}

    def test_group_migration_moves_count_and_sum(self, spark):
        agg = _apply(
            spark,
            _agg0(spark),
            _batch(spark, [("I", 1, "a", 10.0), ("I", 2, "b", 3.0)]),
            _old(spark, []),
        )
        agg = _apply(
            spark,
            agg,
            _batch(spark, [("U", 1, "b", 10.0)]),  # a → b, value unchanged
            _old(spark, [(1, "a", 10.0)]),
        )
        assert _as_dict(agg) == {"b": (2, 13.0)}  # group 'a' vanished (n=0)

    def test_update_of_unknown_key_counts_as_insert(self, spark):
        agg = _apply(
            spark,
            _agg0(spark),
            _batch(spark, [("U", 9, "a", 7.0)]),
            _old(spark, []),  # key not in state → no subtraction
        )
        assert _as_dict(agg) == {"a": (1, 7.0)}

    def test_exact_decimal_no_drift(self, spark):
        """1000 increments of 0.1 must sum to exactly 100.0 — float
        accumulation would drift; the maintained decimal cannot."""
        agg = _agg0(spark)
        rows = [("I", k, "a", 0.1) for k in range(1000)]
        agg = _apply(spark, agg, _batch(spark, rows), _old(spark, []))
        n, s = _as_dict(agg)["a"]
        assert n == 1000 and s == 100.0


class TestStateTableIntegration:
    def test_bucket_pruned_old_image_lookup(self, spark, tmp_path):
        """Old images come from only the buckets the batch touches —
        proven by file mtimes: untouched bucket files are not read
        (read manifests aren't observable, so assert the cheaper
        invariant: the join result is correct while read_buckets is
        given only the touched bucket list) and not rewritten."""
        from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable

        t = ParquetStateTable(spark, str(tmp_path / "st"), ["k"], n_buckets=8)
        base = spark.createDataFrame(
            [(k, "a" if k % 2 else "b", float(k)) for k in range(64)],
            "k long, grp string, v double",
        )
        t.init(base)
        agg = merge_agg(
            _agg0(spark),
            cdc_agg_delta(
                base.withColumn("op", F.lit("I")),
                _old(spark, []),
                ["grp"],
                ["v"],
            ),
            ["grp"],
            ["v"],
        ).localCheckpoint(eager=True)

        batch = _batch(spark, [("U", 3, "a", 999.0), ("D", 4, None, None)])
        keys = batch.select("k")
        touched = sorted(
            r[0]
            for r in keys.select(t.bucket_of(F.col("k")).alias("b")).distinct().collect()
        )
        assert len(touched) <= 2  # 2 keys → ≤2 of 8 buckets
        before_mtimes = {
            p: os.path.getmtime(os.path.join(str(tmp_path / "st"), p))
            for p in os.listdir(tmp_path / "st")
            if p.startswith("bucket=")
        }
        old = t.read_buckets(touched).join(keys, "k", "inner")
        agg = merge_agg(agg, cdc_agg_delta(batch, old, ["grp"], ["v"]), ["grp"], ["v"])
        got = _as_dict(agg)
        # base: grp a = odd keys 1..63 (32 keys), b = even (32 keys)
        # U 3: a stays 32 keys, sum −3+999; D 4: b loses key 4
        assert got["a"] == (32, sum(float(k) for k in range(1, 64, 2)) - 3.0 + 999.0)
        assert got["b"] == (31, sum(float(k) for k in range(0, 64, 2)) - 4.0)
        # the state merge rewrites only the touched buckets
        t.apply(batch.select("k", "grp", "v", "op", F.col("k").alias("pos")), ["pos"])
        after_mtimes = {
            p: os.path.getmtime(os.path.join(str(tmp_path / "st"), p))
            for p in os.listdir(tmp_path / "st")
            if p.startswith("bucket=")
        }
        untouched = [
            p
            for p in before_mtimes
            if int(p.split("=")[1]) not in touched and p in after_mtimes
        ]
        assert untouched and all(
            before_mtimes[p] == after_mtimes[p] for p in untouched
        )


class TestContinuousAggregate:
    """Streaming continuous aggregate over the binlog transport:
    exactly-once under restart and under foreachBatch replay."""

    def _typed(self, env_df):
        return env_df.select(
            "op",
            "pos_file",
            "pos_offset",
            F.from_json("key", "id long").getField("id").alias("id"),
            F.from_json(F.coalesce("after", "before"), "id long, grp string, v double")
            .getField("grp")
            .alias("grp"),
            F.from_json("after", "id long, grp string, v double")
            .getField("v")
            .alias("v"),
        )

    def _rec(self, op, k, grp, v):
        import json as _json

        img = _json.dumps({"id": k, "grp": grp, "v": v})
        return {
            "db": "d", "table": "t", "op": op, "ts": None, "gtid": None,
            "key": _json.dumps({"id": k}),
            "before": img if op == "D" else None,
            "after": None if op == "D" else img,
        }

    def test_stream_restart_exactly_once(self, spark, tmp_path):
        from xxt_cdc_spark.operators.incremental_agg import ContinuousAggregate
        from xxt_cdc_spark.streaming.binlog_source import (
            BinlogLogWriter,
            read_binlog_stream,
        )

        log, ck = str(tmp_path / "log"), str(tmp_path / "ck")
        w = BinlogLogWriter(log)
        ca = ContinuousAggregate(
            spark, str(tmp_path / "ca"), ["id"], ["grp"], ["v"],
            ["pos_file", "pos_offset"], n_buckets=4,
        )

        def run():
            q = (
                read_binlog_stream(spark, log)
                .writeStream.foreachBatch(
                    lambda df, bid: ca.apply_batch(self._typed(df), bid)
                )
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        w.append([self._rec("I", k, "a" if k % 2 else "b", float(k)) for k in range(20)])
        run()
        # restart with updates, a delete, and a group migration
        w.append([
            self._rec("U", 1, "a", 100.0),
            self._rec("D", 2, "b", 2.0),
            self._rec("U", 3, "b", 3.0),  # a → b
        ])
        run()
        got = {r.grp: (r.n, float(r.v_sum)) for r in ca.read().collect()}
        # a: odds minus key3 (migrated), key1 now 100
        a_sum = sum(float(k) for k in range(1, 20, 2)) - 1.0 + 100.0 - 3.0
        b_sum = sum(float(k) for k in range(0, 20, 2)) - 2.0 + 3.0
        assert got["a"] == (9, a_sum)
        assert got["b"] == (10, b_sum)

    def test_replay_after_partial_crash_is_idempotent(self, spark, tmp_path):
        """Worst ordering point: version dir written AND state merged,
        but the marker commit 'crashed'. The replay must not recompute
        the delta against the already-advanced state."""
        from xxt_cdc_spark.operators.incremental_agg import ContinuousAggregate

        ca = ContinuousAggregate(
            spark, str(tmp_path / "ca"), ["id"], ["grp"], ["v"],
            ["pos_file", "pos_offset"], n_buckets=4,
        )
        batch0 = spark.createDataFrame(
            [("I", "f", 1, 1, "a", 10.0), ("I", "f", 2, 2, "a", 5.0)],
            "op string, pos_file string, pos_offset long, id long, grp string, v double",
        )
        ca.apply_batch(batch0, 0)
        batch1 = spark.createDataFrame(
            [("U", "f", 3, 1, "a", 99.0)],
            "op string, pos_file string, pos_offset long, id long, grp string, v double",
        )
        # crash injection: run the batch fully, then roll the marker back
        ca.apply_batch(batch1, 1)
        ca._commit(0)
        # replay (Spark re-delivers batch 1 after the crash)
        ca.apply_batch(batch1, 1)
        got = {r.grp: (r.n, float(r.v_sum)) for r in ca.read().collect()}
        assert got == {"a": (2, 104.0)}  # 99 + 5, NOT double-applied
