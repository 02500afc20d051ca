"""Relational coverage, part 2 — the spark.sql surface.

These run through ``spark.sql`` over registered temp views (same
Catalyst plans as the DataFrame API) and cover: outer joins,
correlated scalar subqueries, IN/EXISTS subqueries, CUBE grouping
sets, string/date scalar function families, distinct aggregation, and
an exact rank-based median (interpolating percentiles differ subtly
across engines; the rank construction is bit-identical by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xxt_cdc_spark.queries._util import dsum, sql_dsum
from xxt_cdc_spark.session import load_tables


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(sql)


# --- outer joins -----------------------------------------------------------
OUTER_JOIN_SPARK = """
SELECT c.c_custkey, c.c_mktsegment,
       COUNT(o.o_orderkey) AS n_orders,
       COALESCE({dsum}, CAST(0.0 AS DOUBLE)) AS total_spend
FROM customer c LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
ORDER BY c.c_custkey
""".format(dsum=sql_dsum("o.o_totalprice"))


def outer_join_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, OUTER_JOIN_SPARK)


# identical SQL runs on DuckDB (ANSI subset)
OUTER_JOIN_ORACLE = OUTER_JOIN_SPARK


# --- correlated scalar subquery ---------------------------------------------
# strictly above the brand average, no multiplier: the synthetic price
# spread is so tight (max price/brand-avg ratio ≈ 1.06 at sf0.01) that
# any multiplier made BOTH engines return 0 rows — a 0=0 hash match
# that verified nothing (round-1 verdict). ~half the parts qualify now,
# so the oracle row actually checks the correlated-subquery plan.
CORR_SUBQ = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice > (
  SELECT {avg} FROM part p2 WHERE p2.p_brand = p.p_brand
)
ORDER BY p_partkey
""".format(avg="CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)")


def correlated_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, CORR_SUBQ)


# --- IN / NOT EXISTS subqueries ----------------------------------------------
SUBQ_MIX = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey AND o.o_orderstatus = 'F')
ORDER BY c_custkey
"""


def urgent_but_never_failed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, SUBQ_MIX)


# --- grouping analytics: ROLLUP + CUBE + GROUPING SETS (folded family, r4) ---
# cube + explicit grouping sets with grouping markers, SQL side; the
# GROUPING() casts keep Spark (INT) and DuckDB (BIGINT) comparable
_CUBE_GSETS_SPARK = """
SELECT 'cube' AS mode, l_returnflag, l_linestatus,
       CAST(NULL AS INT) AS g_flag, CAST(NULL AS INT) AS g_status,
       COUNT(*) AS n_rows, {qty} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'gsets' AS mode, l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       COUNT(*) AS n_rows, {qty} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""".format(qty=sql_dsum("l_quantity"))


def grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole grouping-analytics family keyed by ``mode``: ROLLUP
    through the DataFrame API (``df.rollup`` — kept deliberately so the
    non-SQL surface stays covered), CUBE and explicit GROUPING SETS
    with GROUPING() markers through spark.sql. Folds the former
    rollup_returns / cube_returns / grouping_sets_returns entries; each
    mode's rows hash independently via the discriminator."""
    load_tables(spark, sf_dir)
    li = spark.table("lineitem")
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.lit("rollup").alias("mode"),
            "l_returnflag",
            "l_linestatus",
            F.lit(None).cast("int").alias("g_flag"),
            F.lit(None).cast("int").alias("g_status"),
            "n_rows",
            "sum_qty",
        )
    )
    return (
        spark.sql(_CUBE_GSETS_SPARK)
        .unionByName(rollup)
        .orderBy(
            "mode",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


GROUPING_ANALYTICS_ORACLE = """
SELECT mode, l_returnflag, l_linestatus, g_flag, g_status, n_rows, sum_qty FROM (
  SELECT 'rollup' AS mode, l_returnflag, l_linestatus,
         CAST(NULL AS INT) AS g_flag, CAST(NULL AS INT) AS g_status,
         COUNT(*) AS n_rows, {qty} AS sum_qty
  FROM lineitem
  GROUP BY ROLLUP (l_returnflag, l_linestatus)
  UNION ALL
  SELECT 'cube' AS mode, l_returnflag, l_linestatus,
         CAST(NULL AS INT), CAST(NULL AS INT), COUNT(*), {qty}
  FROM lineitem
  GROUP BY CUBE (l_returnflag, l_linestatus)
  UNION ALL
  SELECT 'gsets' AS mode, l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) AS INT), CAST(GROUPING(l_linestatus) AS INT),
         COUNT(*), {qty}
  FROM lineitem
  GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
)
ORDER BY mode, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
""".format(qty=sql_dsum("l_quantity"))


# --- string function family ------------------------------------------------------
STRING_FUNCS = """
SELECT p_partkey,
       upper(p_brand) AS brand_u,
       lower(p_type) AS type_l,
       substr(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       replace(p_type, ' ', '_') AS type_snake,
       concat(p_brand, '#', CAST(p_size AS STRING)) AS brand_size,
       trim(p_name) AS name_trim,
       lpad(CAST(p_size AS STRING), 4, '0') AS size_pad,
       split_part(p_type, ' ', 1) AS type_head,
       reverse(p_brand) AS brand_rev,
       md5(p_name) AS name_md5
FROM part ORDER BY p_partkey
"""


def string_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, STRING_FUNCS)


# DuckDB: CAST(x AS STRING) → VARCHAR spelling, concat identical
STRING_FUNCS_ORACLE = STRING_FUNCS.replace("AS STRING", "AS VARCHAR")


# --- date/time function family ------------------------------------------------------
# date outputs go through an explicit yyyy-MM-dd string format: DATE-
# typed columns canonicalize differently across engine→pandas paths
# min/max on the NATIVE date/timestamp type, formatted AFTER the
# aggregate (r15): min(date_format(...)) aggregates a STRING, whose
# agg buffer is not UnsafeRow-mutable, so the whole aggregation
# planned as SortAggregate (per-task sort on partial and final
# passes). yyyy-MM-dd is monotone with the underlying date for all
# four-digit years, so MIN/MAX commute with the formatting and the
# values are identical (the oracle keeps the string-typed spelling).
DATE_FUNCS = """
SELECT y, m, q, n_orders,
       date_format(month_start_t, 'yyyy-MM-dd') AS month_start,
       max_dom,
       date_format(latest_d, 'yyyy-MM-dd') AS latest
FROM (
  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, quarter(o_orderdate) AS q,
         COUNT(*) AS n_orders,
         MIN(date_trunc('MONTH', o_orderdate)) AS month_start_t,
         MAX(day(o_orderdate)) AS max_dom,
         MAX(o_orderdate) AS latest_d
  FROM orders
  GROUP BY 1, 2, 3
)
ORDER BY y, m
"""

DATE_FUNCS_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
       CAST(quarter(o_orderdate) AS INT) AS q,
       COUNT(*) AS n_orders,
       MIN(strftime(date_trunc('MONTH', o_orderdate), '%Y-%m-%d')) AS month_start,
       CAST(MAX(day(o_orderdate)) AS INT) AS max_dom,
       MAX(strftime(o_orderdate, '%Y-%m-%d')) AS latest
FROM orders
GROUP BY 1, 2, 3
ORDER BY y, m
"""


def date_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, DATE_FUNCS)


# --- exact rank-based median ----------------------------------------------------------
MEDIAN_SQL = """
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus, o_totalprice AS median_price
FROM ranked WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
ORDER BY o_orderstatus
"""


def median_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, MEDIAN_SQL)


# --- per-priority profile: pivot + distinct aggregation (folded family, r4) --
DISTINCT_AGG = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderstatus) AS n_statuses,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def orders_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority profile joining the DataFrame-API pivot (status
    counts as columns, the conditional-aggregation surface) with the
    distinct-aggregation family. Folds the former pivot_order_status /
    distinct_agg_by_priority entries — one row per priority carries
    both operators' outputs, each still value-hashed."""
    load_tables(spark, sf_dir)
    orders = spark.table("orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["O", "F", "P"])
    )
    dist = spark.sql(DISTINCT_AGG)
    return piv.join(dist, "o_orderpriority").orderBy("o_orderpriority")


ORDERS_PRIORITY_PROFILE_SQL = """
SELECT o_orderpriority,
       COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS "O",
       COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS "F",
       COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS "P",
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderstatus) AS n_statuses,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- conditional expressions --------------------------------------------------------------
COND_EXPR = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       IF(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent,
       GREATEST(o_totalprice, 100000.0) AS floored,
       LEAST(o_totalprice, 400000.0) AS capped
FROM orders
WHERE o_orderkey % 10 = 0
ORDER BY o_orderkey
"""

COND_EXPR_ORACLE = COND_EXPR.replace(
    "IF(o_orderpriority = '1-URGENT', 1, 0)",
    "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END",
)


def conditional_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, COND_EXPR)


# --- lead/lag: inter-event gaps per user ------------------------------------
LEAD_LAG = """
WITH gaps AS (
  SELECT user_id, event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(prev_ts) AS n_gaps,
       CAST(SUM(unix_micros(ts) - unix_micros(prev_ts)) AS BIGINT) AS total_gap_us,
       MAX(unix_micros(ts) - unix_micros(prev_ts)) AS max_gap_us
FROM gaps
GROUP BY user_id
ORDER BY user_id
"""
# ^ ANCHOR QUERY — the trailing ORDER BY stays despite the r11 fleet
# de-sort: lead_lag_user_gaps is one of the three pinned box-drift
# anchors (bench._ANCHOR_OFFICIAL), and changing an anchor's plan
# would bias every adjusted cross-round delta (see q1_pricing_summary).

# microsecond-exact integers on both engines (second-granularity
# epoch() is a truncating double in DuckDB — not comparable)
LEAD_LAG_ORACLE = LEAD_LAG.replace("unix_micros(", "epoch_us(")


def lead_lag_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, LEAD_LAG)


# --- interval-range join: events within 3 days of the user's order ----------
# equi-key (user = custkey) + range predicate — Catalyst plans a hash
# join with the range as a post-join filter; the pure-range variant
# (no equi key) is the asof_join query's territory.
# The order date is anchored into the events month (synthetic orders
# live in 1995-2001, events in 2024-01): round 1's direct o_orderdate
# range produced 0 rows on BOTH engines, a vacuous 0=0 oracle match.
RANGE_JOIN = """
WITH o2 AS (
  SELECT o_orderkey, o_custkey,
         make_timestamp(2024, 1, least(day(o_orderdate), 28), 0, 0, 0) AS anchor
  FROM orders
)
SELECT o.o_orderkey,
       COUNT(e.event_id) AS n_events,
       {val} AS total_value
FROM o2 o
JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.anchor
 AND e.ts < o.anchor + INTERVAL 3 DAY
GROUP BY o.o_orderkey
""".format(val=sql_dsum("e.value"))

RANGE_JOIN_ORACLE = RANGE_JOIN.replace("INTERVAL 3 DAY", "INTERVAL 3 DAYS")


def range_join_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, RANGE_JOIN)


# --- KEYLESS range join, binned execution -----------------------------------
# Without an equi-key Catalyst can only nested-loop a containment join;
# operators/range_join.py re-expresses it as a hash join on quantized
# time bins. The oracle is the naive containment join (DuckDB plans it
# as IEJoin), so a hash-match proves the bin+filter decomposition is
# exact — including interval edges astride bin boundaries.
def range_join_binned_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from xxt_cdc_spark.operators.range_join import binned_range_join
    from xxt_cdc_spark.queries._util import dsum
    from xxt_cdc_spark.queries.streaming import _events

    t = load_tables(spark, sf_dir)
    ev = _events(spark, sf_dir)
    # every 1000th order: ~150 intervals at sf0.1. Denser interval sets
    # work too but the match volume is quadratic-ish in overlap (every
    # event matches every interval covering its instant), which stresses
    # the join without saying anything new about the plan shape.
    intervals = (
        t["orders"]
        .filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            "o_orderkey",
            F.expr(
                "make_timestamp(2024, 1, least(day(o_orderdate), 28), 0, 0, 0)"
            ).alias("lo"),
        )
        .withColumn("hi", F.col("lo") + F.expr("INTERVAL 3 DAY"))
    )
    # spread the single-file events scan across cores BEFORE the join:
    # the matched volume is ~15× the input (every event joins every
    # covering interval) and the decimal partial-agg above it runs on
    # the points-side partitions — one parquet file = near-serial
    # otherwise (same posture as functions/dedup.shingles; r12: 2.27 →
    # 0.73 s together with the broadcast pin below)
    pts = ev.select("event_id", "ts", "value").repartition(
        spark.sparkContext.defaultParallelism
    )
    joined = binned_range_join(
        pts,
        intervals,
        point_ts="ts",
        lo_col="lo",
        hi_col="hi",
        bin_width_s=3 * 24 * 3600,
        # ~150 intervals by construction: pin the broadcast side so the
        # 1.5M matched rows are produced across the events partitions
        # (Catalyst was building the hash table from the POINTS side
        # and streaming 450 interval rows through one task — r12)
        broadcast_intervals=True,
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
    )


RANGE_JOIN_BINNED_ORACLE = f"""
WITH iv AS (
  SELECT o_orderkey,
         make_timestamp(2024, 1, least(day(o_orderdate), 28), 0, 0, 0) AS lo
  FROM orders WHERE o_orderkey % 1000 = 0
)
SELECT iv.o_orderkey, COUNT(*) AS n_events, {sql_dsum('e.value')} AS total_value
FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts < iv.lo + INTERVAL 3 DAYS
GROUP BY iv.o_orderkey
HAVING COUNT(*) > 0
ORDER BY iv.o_orderkey
"""


# --- ntile quartiles over order value ---------------------------------------
NTILE_SQL = """
WITH tiled AS (
  SELECT o_totalprice,
         NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
  FROM orders
)
SELECT quartile, COUNT(*) AS n,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM tiled GROUP BY quartile ORDER BY quartile
"""


def ntile_order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, NTILE_SQL)


# folded/new entries lead so the driver's 50-entry sweep certifies them
# in their first round on the registry
# --- recursive CTE: hierarchical rollup (Spark 4 WITH RECURSIVE) -------------
def hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy traversal — the relational capability
    class (org charts, BOM explosions, graph reachability) that only
    became expressible in Spark SQL with 4.0's WITH RECURSIVE. The
    hierarchy is synthetic but total: each customer's parent is its
    key with the last digit stripped (k DIV 10), roots are keys < 10,
    so every key terminates at a root in O(digits) iterations — each
    recursion step is one distributed join, no driver loops. Rolls up
    subtree size, exact-decimal balance, and max depth per root."""
    load_tables(spark, sf_dir, ["customer"])
    # the recursion accumulates one row per customer; the default
    # guard (spark.sql.cteRecursionRowLimit = 1,000,000) trips at
    # sf10's 1.5M customers — size it to the input (found by the sf10
    # slope run, not by reasoning; the level limit of 100 is ample for
    # the O(digits) depth)
    n = spark.table("customer").count()
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(max(1_000_000, 2 * n)))
    return spark.sql("""
WITH RECURSIVE chain AS (
  SELECT c_custkey AS k, c_custkey AS root, 0 AS depth, c_acctbal
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, chain.root, chain.depth + 1, c.c_acctbal
  FROM customer c JOIN chain ON c.c_custkey DIV 10 = chain.k
  WHERE c.c_custkey >= 10
)
SELECT root, COUNT(*) AS n_members,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal,
       MAX(depth) AS max_depth
FROM chain GROUP BY root
""")


HIERARCHY_SQL = """
WITH RECURSIVE chain AS (
  SELECT c_custkey AS k, c_custkey AS root, 0 AS depth, c_acctbal
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, chain.root, chain.depth + 1, c.c_acctbal
  FROM customer c JOIN chain ON c.c_custkey // 10 = chain.k
  WHERE c.c_custkey >= 10
)
SELECT root, COUNT(*) AS n_members,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal,
       CAST(MAX(depth) AS INT) AS max_depth
FROM chain GROUP BY root ORDER BY root
"""


QUERIES = {
    "hierarchy_rollup": hierarchy_rollup,
    "grouping_analytics": grouping_analytics,
    "orders_priority_profile": orders_priority_profile,
    "lead_lag_user_gaps": lead_lag_user_gaps,
    "range_join_order_events": range_join_order_events,
    "range_join_binned_global": range_join_binned_global,
    "ntile_order_quartiles": ntile_order_quartiles,
    "outer_join_spend": outer_join_spend,
    "correlated_above_brand_avg": correlated_above_brand_avg,
    "urgent_but_never_failed": urgent_but_never_failed,
    "string_function_family": string_function_family,
    "date_function_family": date_function_family,
    "median_price_by_status": median_price_by_status,
    "conditional_exprs": conditional_exprs,
}

ORACLE = {
    "hierarchy_rollup": HIERARCHY_SQL,
    "grouping_analytics": GROUPING_ANALYTICS_ORACLE,
    "orders_priority_profile": ORDERS_PRIORITY_PROFILE_SQL,
    "lead_lag_user_gaps": LEAD_LAG_ORACLE,
    "range_join_order_events": RANGE_JOIN_ORACLE,
    "range_join_binned_global": RANGE_JOIN_BINNED_ORACLE,
    "ntile_order_quartiles": NTILE_SQL,
    "outer_join_spend": OUTER_JOIN_ORACLE,
    "correlated_above_brand_avg": CORR_SUBQ,
    "urgent_but_never_failed": SUBQ_MIX,
    "string_function_family": STRING_FUNCS_ORACLE,
    "date_function_family": DATE_FUNCS_ORACLE,
    "median_price_by_status": MEDIAN_SQL,
    "conditional_exprs": COND_EXPR_ORACLE,
}
