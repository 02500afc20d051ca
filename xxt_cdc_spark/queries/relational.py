"""Relational operator coverage — the SQL surface the reference lacks.

SURVEY.md §2.7: the reference has no joins, windows, grouping sets,
sorts/limits, or set operations; in this engine they exist via Spark
SQL. Each query is registered with its DuckDB-oracle twin so coverage
is machine-checked, and each is written for scale:

- filters/projections expressed declaratively → parquet pushdown;
- small dimensions joined with explicit ``broadcast`` hints;
- deterministic tie-breaks on every top-k (no ambiguous hashes);
- exact-decimal aggregation (see _util) for cross-engine equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xxt_cdc_spark.queries._util import davg, dsum, sql_davg, sql_dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from xxt_cdc_spark.session import normalize_timestamps

    return normalize_timestamps(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


# --- q1_pricing_summary: TPC-H Q1 analog (flagship) ---------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANCHOR QUERY — code path frozen since r2 (bench._ANCHOR_OFFICIAL).

    The r11 fleet de-sort deliberately SKIPS this query: its trailing
    orderBy is part of the pinned plan the box-drift anchor ratios are
    calibrated against, and making an anchor faster would read as
    "box running fast" and bias every adjusted cross-round delta. The
    4-row sort costs ~0.2 s; calibration integrity is worth more."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q3_top_orders: join + agg + deterministic top-k --------------------
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- q5_region_revenue: multi-way join through broadcast dims -----------
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


Q5_SQL = f"""
SELECT r_name, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# --- window_running_total: window frame operator ------------------------
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.filter(F.col("o_custkey") % 100 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("order_seq"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_spend"),
        )
        .orderBy("o_custkey", "order_seq")
    )


WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS order_seq,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey % 100 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_seq
"""


# --- topk_per_group: window top-k (deterministic ties) -------------------
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rk")
    )


TOPK_SQL = """
SELECT c_mktsegment, rk, o_orderkey, o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 5
ORDER BY c_mktsegment, rk
"""


# --- set ops + semi/anti joins (folded family, r4) -------------------------
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every customer-set algebra op in one result, keyed by bucket:
    EXCEPT ALL / INTERSECT over the big-spender vs BUILDING-segment
    sets, plus left-semi / left-anti against the orders fact. Folds the
    former set_ops_customers / semi_anti_customers entries — each op
    contributes a distinct bucket, so the value hash still gates all
    four independently."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big_spenders = (
        orders.groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("spend"))
        .filter(F.col("spend") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    only_big = big_spenders.exceptAll(building)
    both = big_spenders.intersect(building)
    okeys = orders.select(F.col("o_custkey").alias("c_custkey"))
    with_orders = cust.join(okeys, "c_custkey", "left_semi").select("c_custkey")
    without = cust.join(okeys, "c_custkey", "left_anti").select("c_custkey")
    return (
        only_big.withColumn("bucket", F.lit("big_only"))
        .unionByName(both.withColumn("bucket", F.lit("big_building")))
        .unionByName(with_orders.withColumn("bucket", F.lit("active")))
        .unionByName(without.withColumn("bucket", F.lit("inactive")))
        .orderBy("bucket", "c_custkey")
    )


CUSTOMER_SET_OPS_SQL = f"""
WITH big AS (
  SELECT o_custkey AS c_custkey
  FROM orders GROUP BY o_custkey
  HAVING {sql_dsum('o_totalprice')} > 300000
), building AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT c_custkey, 'big_only' AS bucket FROM (SELECT * FROM big EXCEPT ALL SELECT * FROM building)
UNION ALL
SELECT c_custkey, 'big_building' AS bucket FROM (SELECT * FROM big INTERSECT SELECT * FROM building)
UNION ALL
SELECT c_custkey, 'active' AS bucket FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'inactive' AS bucket FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY bucket, c_custkey
"""


QUERIES = {
    "customer_set_ops": customer_set_ops,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_revenue": q5_region_revenue,
    "window_running_total": window_running_total,
    "topk_orders_per_segment": topk_orders_per_segment,
}

ORACLE = {
    "customer_set_ops": CUSTOMER_SET_OPS_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "window_running_total": WINDOW_SQL,
    "topk_orders_per_segment": TOPK_SQL,
}
