"""Bucketed co-location: the storage-level shuffle elimination that
SCALING.md's join posture relies on, proven at the plan level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xxt_cdc_spark.operators.bucketing import co_located_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # managed tables land in the session's spark-warehouse dir; DROP
    # TABLE at teardown removes their files
    prev_ae = spark.conf.get("spark.sql.adaptive.enabled")
    # AQE would happily broadcast these tiny test tables, hiding the
    # property under test; production-size sides can't be broadcast
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "b_orders", ["o_custkey"], n_buckets=8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", ["o_custkey"], n_buckets=8,
    )
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prev_ae)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


class TestBucketedCoLocation:
    def test_join_has_no_exchange(self, bucketed_tables, sf_dir):
        spark = bucketed_tables
        joined = co_located_join(spark, "b_orders", "b_customer", ["o_custkey"])
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        # the whole point: same bucket spec on both sides → SMJ with no
        # shuffle anywhere in the plan
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result is the plain join's result
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        expected = orders.join(
            cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        ).count()
        assert joined.count() == expected

    def test_bucketed_aggregation_skips_shuffle(self, bucketed_tables):
        spark = bucketed_tables
        agg = spark.table("b_orders").groupBy("o_custkey").agg(
            F.count("*").alias("n")
        )
        plan = agg._sc._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "formatted"
        )
        # hash-aggregate on the bucket key reuses the bucketing — no
        # Exchange between partial and final aggregation
        assert "Exchange" not in plan, plan

    def test_mismatched_buckets_fall_back_to_shuffle(self, bucketed_tables, sf_dir):
        """Honesty check: the property DEPENDS on matching specs — a
        plain (unbucketed) side must reintroduce the Exchange."""
        spark = bucketed_tables
        plain = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        joined = spark.table("b_orders").join(plain, "o_custkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" in plan
