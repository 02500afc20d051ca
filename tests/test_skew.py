"""Skew stress: a hot key receiving most of the traffic must neither
break correctness (LWW picks the true last write among thousands of
updates to one key) nor the salted aggregation equivalence."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from xxt_cdc_spark.operators.collapse import last_write_wins
from xxt_cdc_spark.operators.skew import salted_agg
from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch


def _skewed_changefeed(spark, n_hot=20_000, n_cold=2_000):
    """90%+ of events update key 0; cold keys get one insert each."""
    hot = spark.range(n_hot).select(
        F.lit("U").alias("op"),
        (F.col("id") + 1000).alias("pos_offset"),
        F.lit(0).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    first = spark.createDataFrame([("I", 1, 0, "v-init")], "op string, pos_offset long, k long, v string")
    cold = spark.range(1, n_cold + 1).select(
        F.lit("I").alias("op"),
        (F.col("id") + 500_000).alias("pos_offset"),
        F.col("id").alias("k"),
        F.lit("cold").alias("v"),
    )
    return first.unionByName(hot).unionByName(cold)


class TestHotKey:
    def test_lww_picks_true_last_write_on_hot_key(self, spark):
        cf = _skewed_changefeed(spark)
        latest = last_write_wins(cf, ["k"], ["pos_offset"])
        assert latest.count() == 2001  # key 0 + 2000 cold keys
        hot_row = latest.filter(F.col("k") == 0).first()
        assert hot_row.v == "v19999" and hot_row.pos_offset == 20999

    def test_apply_under_skew_converges(self, spark, tmp_path):
        db = str(tmp_path / "skew.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
        con.commit()
        con.close()
        cf = _skewed_changefeed(spark, n_hot=5_000, n_cold=500)
        apply_batch(
            cf,
            lambda: JdbcUpsertWriter(
                connect_fn=lambda: sqlite3.connect(db, timeout=30),
                table="t",
                columns=["k", "v"],
                key_cols=["k"],
                dialect="sqlite",
            ),
            ["k"],
            ["pos_offset"],
            num_partitions=8,  # hot key lands in ONE partition; must still be correct
        )
        con = sqlite3.connect(db)
        assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 501
        assert con.execute("SELECT v FROM t WHERE k = 0").fetchone()[0] == "v4999"
        con.close()

    def test_salted_agg_equals_direct_under_skew(self, spark):
        cf = _skewed_changefeed(spark)
        direct = {
            r.k: r.n
            for r in cf.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        salted = {
            r.k: r.n
            for r in salted_agg(
                cf,
                ["k"],
                [(F.count(F.lit(1)), F.sum("partial_0"), "n")],
                salt_buckets=16,
                salt_source="pos_offset",
            ).collect()
        }
        assert salted == direct
        assert direct[0] == 20_001  # the hot key saw everything
