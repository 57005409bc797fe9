"""Relational query suite over the TPC-H-ish tables.

Joins, group-bys, windows, set ops — capability uplift beyond the
reference (which has no joins/group-by, SURVEY §2.6-2.7); required by the
benchmark. All plain DataFrame ops: Catalyst handles pushdown, join
strategy selection (broadcast for the small dims), and AQE handles
skew/coalescing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def cents(expr, scale: int = 100):
    """Exact-money aggregation primitive: per-row scale-to-integer then
    round; the resulting BIGINT sum is exact and order-independent, so it
    hash-matches DuckDB regardless of partitioning (see queries/__init__
    float-determinism notes)."""
    return F.round(expr * scale).cast("bigint")


# --- q1: pricing summary (TPC-H Q1 shape: scan + filter + hash agg) ---

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("base_price_c"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("disc_price_e4"),
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 1000000)
            ).alias("charge_e6"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(cents(F.col("l_extendedprice"))) / F.count(F.lit(1))).alias("avg_price_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS base_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS disc_price_e4,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS charge_e6,
       sum(l_quantity) / count(*) AS avg_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / count(*) AS avg_price_c,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- q6: forecast revenue (scan + tight filter + global agg) ---

def q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(cents(F.col("l_extendedprice") * F.col("l_discount"), 10000)).alias("revenue_e4"))
    )


Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# --- q3: top unshipped orders (3-way join + agg + deterministic top-k) ---

def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.col("o_orderdate").cast("string").alias("o_orderdate"), "revenue_e4")
    )


Q3_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
"""


# --- q5: local supplier volume (6-way join; dims broadcast) ---

def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_e4"))
    )


Q5_SQL = """
SELECT n_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- joins: semi / anti / outer coverage ---

def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one open order (left-semi)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


Q_SEMI_SQL = """
SELECT c_mktsegment, count(*) AS n_cust
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_mktsegment
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (left-anti)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_no_order"),
            # coalesce: an all-customers-have-orders dataset makes the group
            # empty, and an empty sum must be a deterministic 0 (not NULL,
            # which the oracle's pandas path renders as NaN)
            F.coalesce(F.sum(cents(F.col("c_acctbal"))), F.lit(0)).alias("bal_c"),
        )
    )


Q_ANTI_SQL = """
SELECT count(*) AS n_no_order,
       CAST(coalesce(sum(CAST(round(c_acctbal * 100) AS BIGINT)), 0) AS BIGINT) AS bal_c
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- window functions: top-k per group ---

def q_topk_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


Q_TOPK_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rk
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part
) WHERE rk <= 3
"""


def q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative order value per customer over time (window running sum)."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents(F.col("o_totalprice"))).over(w).alias("running_c"),
    )


Q_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
FROM orders WHERE o_custkey < 100
"""


# --- grouping sets / rollup ---

def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


Q_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- distinct / set ops ---

def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


Q_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


Q_COUNT_DISTINCT_SQL = """
SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
FROM lineitem
"""


# --- date/math scalar functions (uplift; SURVEY §2.8 note) ---

def q_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            (F.col("o_totalprice") * 2).alias("tp"),
        )
        .groupBy("yr", "mo")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents(F.col("tp"))).alias("total2x_c"))
    )


Q_DATE_MATH_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
       count(*) AS n, CAST(sum(CAST(round(o_totalprice * 2 * 100) AS BIGINT)) AS BIGINT) AS total2x_c
FROM orders GROUP BY 1, 2
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_supplier_volume": q5_supplier_volume,
    "q6_revenue": q6_revenue,
    "q_semi_join": q_semi_join,
    "q_anti_join": q_anti_join,
    "q_topk_per_brand": q_topk_per_brand,
    "q_running_totals": q_running_totals,
    "q_rollup": q_rollup,
    "q_distinct": q_distinct,
    "q_count_distinct": q_count_distinct,
    "q_date_math": q_date_math,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_supplier_volume": Q5_SQL,
    "q6_revenue": Q6_SQL,
    "q_semi_join": Q_SEMI_SQL,
    "q_anti_join": Q_ANTI_SQL,
    "q_topk_per_brand": Q_TOPK_SQL,
    "q_running_totals": Q_RUNNING_SQL,
    "q_rollup": Q_ROLLUP_SQL,
    "q_distinct": Q_DISTINCT_SQL,
    "q_count_distinct": Q_COUNT_DISTINCT_SQL,
    "q_date_math": Q_DATE_MATH_SQL,
}
