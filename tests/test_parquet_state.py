"""Parquet state table: bucket-pruned merge semantics + idempotency."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from xxt_cdc_spark.changefeed import orders_changefeed
from xxt_cdc_spark.operators.apply import apply_changes
from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable


def _mk(spark, sf_dir, tmp_path, n_buckets=16):
    table = ParquetStateTable(spark, str(tmp_path / "state"), ["o_orderkey"], n_buckets)
    table.init(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    return table


class TestParquetState:
    def test_apply_converges_to_oracle(self, spark, sf_dir, tmp_path):
        table = _mk(spark, sf_dir, tmp_path)
        cf = orders_changefeed(spark, sf_dir)
        stats = table.apply(cf, ["pos_offset"])
        assert stats["upserts"] > 0 and stats["deletes"] > 0

        expected = apply_changes(
            spark.read.parquet(f"{sf_dir}/orders.parquet"), cf, ["o_orderkey"], ["pos_offset"]
        )
        got = table.read()
        assert got.count() == expected.count()
        assert got.select("o_orderkey", "o_orderstatus").exceptAll(
            expected.select("o_orderkey", "o_orderstatus")
        ).count() == 0

    def test_replay_idempotent(self, spark, sf_dir, tmp_path):
        table = _mk(spark, sf_dir, tmp_path)
        cf = orders_changefeed(spark, sf_dir)
        table.apply(cf, ["pos_offset"])
        first = sorted(
            (r.o_orderkey, r.o_orderstatus) for r in table.read().select("o_orderkey", "o_orderstatus").collect()
        )
        table.apply(cf, ["pos_offset"])  # duplicate delivery of whole feed
        second = sorted(
            (r.o_orderkey, r.o_orderstatus) for r in table.read().select("o_orderkey", "o_orderstatus").collect()
        )
        assert first == second

    def test_untouched_buckets_not_rewritten(self, spark, sf_dir, tmp_path):
        table = _mk(spark, sf_dir, tmp_path)
        root = table.root

        def bucket_mtimes():
            out = {}
            for d in os.listdir(root):
                if d.startswith("bucket="):
                    full = os.path.join(root, d)
                    out[d] = max(os.path.getmtime(os.path.join(full, f)) for f in os.listdir(full))
            return out

        before = bucket_mtimes()
        time.sleep(1.1)
        # touch exactly one key → at most one bucket rewritten
        one = orders_changefeed(spark, sf_dir).filter(F.col("o_orderkey") == 1)
        stats = table.apply(one, ["pos_offset"])
        assert len(stats["touched_buckets"]) == 1
        after = bucket_mtimes()
        changed = [d for d in after if after[d] != before.get(d)]
        assert changed == [f"bucket={stats['touched_buckets'][0]}"]

    def test_additive_rollup_matches_batch_agg(self, spark, sf_dir, tmp_path):
        """Continuous aggregate: hourly event counts maintained
        incrementally across chunked deliveries == one-shot batch agg."""
        from xxt_cdc_spark.queries.streaming import _events

        ev = _events(spark, sf_dir).withColumn(
            "hour", F.date_trunc("hour", F.col("ts"))
        )
        table = ParquetStateTable(spark, str(tmp_path / "rollup"), ["hour", "event_type"], 8)
        empty = (
            ev.groupBy("hour", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.lit(False))
        )
        table.init(empty)

        # deliver in 3 chunks (micro-batches)
        for i in range(3):
            chunk = ev.filter(F.col("event_id") % 3 == i)
            delta = chunk.groupBy("hour", "event_type").agg(F.count(F.lit(1)).alias("n"))
            stats = table.apply_additive(delta, ["n"])
            assert stats["merged_keys"] > 0

        got = {
            (r.hour, r.event_type): r.n
            for r in table.read().collect()
        }
        expected = {
            (r.hour, r.event_type): r.n
            for r in ev.groupBy("hour", "event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == expected

    def test_apply_before_init_raises(self, spark, sf_dir, tmp_path):
        import pytest

        table = ParquetStateTable(spark, str(tmp_path / "nope"), ["o_orderkey"])
        with pytest.raises(RuntimeError, match="not initialized"):
            table.apply(orders_changefeed(spark, sf_dir), ["pos_offset"])

    def test_empty_batch_noop(self, spark, sf_dir, tmp_path):
        table = _mk(spark, sf_dir, tmp_path)
        empty = orders_changefeed(spark, sf_dir).filter(F.lit(False))
        stats = table.apply(empty, ["pos_offset"])
        assert stats == {"touched_buckets": [], "upserts": 0, "deletes": 0}


class TestMergeValidation:
    def test_merge_rejects_unknown_value_col(self, spark, tmp_path):
        """A value_col absent from the state schema must raise — the
        old projection silently dropped its accumulator data every
        batch while returning success stats."""
        import pytest
        from pyspark.sql import functions as F

        from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable

        t = ParquetStateTable(spark, str(tmp_path / "st"), ["k"], n_buckets=4)
        t.init(spark.createDataFrame([(1, 10)], "k long, a long"))
        delta = spark.createDataFrame([(1, 5, 7)], "k long, a long, m long")
        with pytest.raises(ValueError, match="value_cols \\['m'\\] absent"):
            t.apply_merge(delta, ["a", "m"], how="sum")
        with pytest.raises(ValueError, match="key columns"):
            t.apply_merge(delta.select("k", F.col("a").alias("k2"), "m").withColumnRenamed("k2", "a"), ["k"], how="sum")
        # the valid subset still merges
        t.apply_merge(delta.select("k", "a"), ["a"], how="sum")
        assert t.read().collect()[0]["a"] == 15

    def test_torn_init_fails_loudly(self, spark, tmp_path):
        """Data present but sidecar missing (crash between init()'s two
        writes) must refuse to apply, not silently skip the schema
        guards."""
        import os

        import pytest

        from xxt_cdc_spark.sinks.parquet_state import ParquetStateTable

        t = ParquetStateTable(spark, str(tmp_path / "st"), ["k"], n_buckets=4)
        t.init(spark.createDataFrame([(1, 10)], "k long, a long"))
        os.remove(os.path.join(str(tmp_path / "st"), "_xxt_schema.json"))
        with pytest.raises(RuntimeError, match="no schema sidecar"):
            t.apply_merge(spark.createDataFrame([(1, 5)], "k long, a long"), ["a"], "sum")
        with pytest.raises(RuntimeError, match="no schema sidecar"):
            t.apply(
                spark.createDataFrame([("I", 1, 5, 0)], "op string, k long, a long, pos long"),
                ["pos"],
            )


class TestOneFileRewrites:
    def test_rewrite_leaves_one_data_file_per_bucket(self, spark, sf_dir, tmp_path):
        """r9 regression pin: the merged frame reaches the dynamic
        overwrite KEY-hash partitioned, and without the bucket-column
        exchange each rewrite sprayed a bucket across up to
        shuffle-partitions sliver files (~50k file commits/update at
        1600 buckets — SCALING.md round-9). Every rewritten bucket dir
        must hold exactly ONE data file afterward."""
        table = _mk(spark, sf_dir, tmp_path)
        table.apply(orders_changefeed(spark, sf_dir), ["pos_offset"])
        for d in os.listdir(table.root):
            if not d.startswith("bucket="):
                continue
            data = [
                f
                for f in os.listdir(os.path.join(table.root, d))
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]
            assert len(data) == 1, (d, data)
