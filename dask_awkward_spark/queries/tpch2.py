"""Relational suite, part 2: deeper TPC-H-shaped coverage — correlated
EXISTS, scalar subqueries, disjunctive filters, min-by per group, pivots,
cube, set operations, having filters. All Catalyst-native; dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

from .tpch import cents


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# q4: order-priority checking (correlated EXISTS → left-semi)

def q4_order_priority(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("1999-06-01").cast("timestamp"))
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > TIMESTAMP '1999-06-01')
GROUP BY o_orderpriority
"""


# q7: volume shipping between different nations

def q7_nation_volume(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_e4"))
        .select("supp_nation", "cust_nation", F.col("l_year").cast("int").alias("l_year"), "revenue_e4")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name != n2.n_name
GROUP BY 1, 2, 3
"""


# q10: returned-item reporting, top 20 customers by lost revenue

def q10_returned_items(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2 ORDER BY revenue_e4 DESC, c_custkey LIMIT 20
"""


# q14: promo revenue share (conditional aggregation + exact-component ratio)

def q14_promo_share(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(cents(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)), 10000))
            / F.sum(cents(rev, 10000))
        ).alias("promo_share")
    )


Q14_SQL = """
SELECT 100.0 * sum(CAST(round(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END * 10000) AS BIGINT))
       / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# q15: top supplier(s) by revenue (view + max scalar subquery)

def q15_top_supplier(spark, sf_dir):
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("total_rev_e4"))
    )
    top = rev.agg(F.max("total_rev_e4").alias("m"))
    return (
        rev.join(F.broadcast(top), rev.total_rev_e4 == F.col("m"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_e4")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_rev_e4
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_e4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
"""


# q18: large-volume customers (HAVING over join)

def q18_large_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


Q18_SQL = """
SELECT c_custkey, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, sum_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# q19: disjunctive brand/size/quantity predicates

def q19_disjunctive(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return j.filter(cond).agg(
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_e4"),
        F.count(F.lit(1)).alias("n"),
    )


Q19_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4, count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 40)
"""


# q22: customers above-average balance with no orders (scalar subquery + anti)

def q22_idle_balance(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum(cents(F.col("c_acctbal"))).alias("total_bal_c"))
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS n_cust, CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_c
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# min-by per group (argmin uplift at the relational level)

def q_min_by_nation(spark, sf_dir):
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    cheapest = (
        supp.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return cheapest.join(F.broadcast(nation), cheapest.s_nationkey == nation.n_nationkey).select(
        "n_name", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal")
    )


Q_MIN_BY_SQL = """
SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM (
  SELECT *, row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS rk
  FROM supplier
) s JOIN nation ON s_nationkey = n_nationkey
WHERE rk = 1
"""


# pivot (conditional aggregation in the oracle)

def q_pivot_status(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


Q_PIVOT_SQL = """
SELECT l_returnflag,
       sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
       sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


# cube

def q_cube(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n",
        )
    )


Q_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority, count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# set operations: intersect / except

def q_set_ops(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nk"))
    both = cust.intersect(supp).withColumn("which", F.lit("both"))
    only_c = cust.distinct().subtract(supp.distinct()).withColumn("which", F.lit("cust_only"))
    return both.unionByName(only_c)


Q_SET_OPS_SQL = """
SELECT nk, 'both' AS which FROM (
  SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nk, 'cust_only' AS which FROM (
  SELECT DISTINCT c_nationkey AS nk FROM customer
  EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
"""


# global sort + limit (sort0/head uplift surface)

def q_global_sort_head(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    return (
        part.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(15)
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("p_retailprice"))
    )


Q_GLOBAL_SORT_SQL = """
SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 15
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q7_nation_volume": q7_nation_volume,
    "q10_returned_items": q10_returned_items,
    "q14_promo_share": q14_promo_share,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "q22_idle_balance": q22_idle_balance,
    "q_min_by_nation": q_min_by_nation,
    "q_pivot_status": q_pivot_status,
    "q_cube": q_cube,
    "q_set_ops": q_set_ops,
    "q_global_sort_head": q_global_sort_head,
}

ORACLES = {
    "q4_order_priority": Q4_SQL,
    "q7_nation_volume": Q7_SQL,
    "q10_returned_items": Q10_SQL,
    "q14_promo_share": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive": Q19_SQL,
    "q22_idle_balance": Q22_SQL,
    "q_min_by_nation": Q_MIN_BY_SQL,
    "q_pivot_status": Q_PIVOT_SQL,
    "q_cube": Q_CUBE_SQL,
    "q_set_ops": Q_SET_OPS_SQL,
    "q_global_sort_head": Q_GLOBAL_SORT_SQL,
}


# q8: market-share shape (conditional share of a join over years)

def q8_market_share(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    vol = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("n_name") == "NATION_0", vol).otherwise(F.lit(0))).alias("nation0_e4"),
            F.sum(vol).alias("total_e4"),
        )
        .select(
            F.col("o_year").cast("int").alias("o_year"),
            (F.col("nation0_e4") / F.col("total_e4")).alias("mkt_share"),
        )
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CASE WHEN n_name = 'NATION_0'
                THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) ELSE 0 END) AS DOUBLE)
       / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


# q11: important stock shape (share above a scaled global threshold)

def q11_important_balances(spark, sf_dir):
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    bal = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    per_nation = bal.groupBy("n_name").agg(F.sum(cents(F.col("s_acctbal"))).alias("bal_c"))
    total = per_nation.agg(F.sum("bal_c").alias("t"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("bal_c") * 20 > F.col("t"))
        .select("n_name", "bal_c")
    )


Q11_SQL = """
WITH per_nation AS (
  SELECT n_name, CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, bal_c FROM per_nation
WHERE bal_c * 20 > (SELECT sum(bal_c) FROM per_nation)
"""


# q16: parts supplied, excluding a brand family (NOT LIKE + count distinct)

def q16_brand_counts(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    p = part.filter(~F.col("p_brand").like("Brand#1%"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand NOT LIKE 'Brand#1%'
GROUP BY p_brand, p_type
"""


# q20: suppliers whose revenue exceeds their nation's average (semi over agg)

def q20_strong_suppliers(spark, sf_dir):
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("rev_e4")
    )
    j = supp.join(rev, supp.s_suppkey == rev.l_suppkey)
    nat_avg = j.groupBy("s_nationkey").agg((F.sum("rev_e4") / F.count(F.lit(1))).alias("avg_rev"))
    return (
        j.join(F.broadcast(nat_avg), "s_nationkey")
        .filter(F.col("rev_e4") > F.col("avg_rev"))
        .select("s_suppkey", "s_name", "rev_e4")
    )


Q20_SQL = """
WITH rev AS (
  SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY l_suppkey
), j AS (
  SELECT s_suppkey, s_name, s_nationkey, rev_e4
  FROM supplier JOIN rev ON s_suppkey = l_suppkey
), nat AS (
  SELECT s_nationkey, CAST(sum(rev_e4) AS DOUBLE) / count(*) AS avg_rev FROM j GROUP BY s_nationkey
)
SELECT j.s_suppkey, s_name, rev_e4
FROM j JOIN nat ON j.s_nationkey = nat.s_nationkey
WHERE rev_e4 > avg_rev
"""


QUERIES.update(
    {
        "q8_market_share": q8_market_share,
        "q11_important_balances": q11_important_balances,
        "q16_brand_counts": q16_brand_counts,
        "q20_strong_suppliers": q20_strong_suppliers,
    }
)
ORACLES.update(
    {
        "q8_market_share": Q8_SQL,
        "q11_important_balances": Q11_SQL,
        "q16_brand_counts": Q16_SQL,
        "q20_strong_suppliers": Q20_SQL,
    }
)


# q9 shape: product-type profit by nation and year (adapted — the
# testdata omits partsupp, so supplycost drops out of the profit term)

def q9_profit_by_nation_year(spark, sf_dir):
    """4-way join (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders) with a
    substring part filter, grouped by supplier nation and order year.
    Dims broadcast; the lineitem fact shuffles once on the group keys."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("a"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("profit_e4")
        )
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS profit_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2
"""


# q12 shape: shipping lateness vs order priority (adapted — no
# l_shipmode/commitdate; lateness = shipdate > orderdate + 90 days)

def q12_priority_lateness(spark, sf_dir):
    """Join + conditional two-way count aggregation (the q12 CASE-sum
    shape): per lateness bucket, how many high- vs low-priority orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "late", (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 90 days"))
    )
    return joined.groupBy("late").agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
    )


Q12_SQL = """
SELECT l_shipdate > o_orderdate + INTERVAL 90 DAY AS late,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# q13: customer order-count distribution (outer join + two-level agg)

def q13_order_count_distribution(spark, sf_dir):
    """customer LEFT JOIN filtered orders → per-customer count → count of
    customers per order-count (the classic q13 double aggregation;
    customers with no qualifying orders land in the 0 bucket)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count
"""


# q17: small-quantity-order revenue (correlated scalar subquery on avg)

def q17_small_qty_revenue(spark, sf_dir):
    """Lineitems whose quantity is below 20% of their part's average
    quantity; the per-part average is a broadcastable aggregate joined
    back to the fact (Catalyst turns the correlated subquery into
    exactly this plan)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            # floor-div, not cast: Spark's double->bigint cast truncates
            # while DuckDB's rounds — floor agrees in both engines
            F.floor(F.sum(cents(F.col("l_extendedprice"))) / 7).cast("bigint").alias(
                "avg_yearly_c"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
WITH avg_q AS (
  SELECT l_partkey AS ap_key, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY 1
)
SELECT CAST(floor(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 7) AS BIGINT) AS avg_yearly_c,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
JOIN avg_q ON l_partkey = ap_key
WHERE l_quantity < 0.2 * avg_qty
"""


# q21 shape: suppliers whose shipment was the latest in a multi-supplier
# order (EXISTS another supplier + NOT EXISTS a later one)

def q21_late_suppliers(spark, sf_dir):
    """Per order: the max-shipdate supplier among orders touched by >1
    supplier — the q21 exists/not-exists pair expressed as one window
    aggregation over the order partition (no self-joins; one shuffle on
    l_orderkey), then a per-supplier count, top 10 by (count, name)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    flagged = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .withColumn("n_sup", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("max_ship", F.max("l_shipdate").over(w))
    )
    # distinct (order, supplier) pairs where this supplier shipped last
    # and others exist; ties on max_ship count every tied supplier (same
    # as the NOT EXISTS l2.ship > l1.ship semantics)
    culprits = (
        flagged.filter((F.col("n_sup") > 1) & (F.col("l_shipdate") == F.col("max_ship")))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        culprits.join(F.broadcast(sup), culprits.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


Q21_SQL = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_sup,
         max(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship
  FROM lineitem
), culprits AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM flagged WHERE n_sup > 1 AND l_shipdate = max_ship
)
SELECT s_name, count(*) AS numwait
FROM culprits JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


QUERIES.update(
    {
        "q9_profit_by_nation_year": q9_profit_by_nation_year,
        "q12_priority_lateness": q12_priority_lateness,
        "q13_order_count_distribution": q13_order_count_distribution,
        "q17_small_qty_revenue": q17_small_qty_revenue,
        "q21_late_suppliers": q21_late_suppliers,
    }
)
ORACLES.update(
    {
        "q9_profit_by_nation_year": Q9_SQL,
        "q12_priority_lateness": Q12_SQL,
        "q13_order_count_distribution": Q13_SQL,
        "q17_small_qty_revenue": Q17_SQL,
        "q21_late_suppliers": Q21_SQL,
    }
)


# q2 shape: best supplier per part (adapted — the testdata has no
# partsupp, so the part-supplier bridge is DISTINCT lineitem pairs and
# "best" is max account balance instead of min supply cost)

def q2_best_supplier(spark, sf_dir):
    """Correlated best-per-group subquery + 4-way dim join (the q2
    shape): for each small part, the highest-acctbal supplier that
    shipped it, restricted to one region. The bridge dedups to distinct
    (part, supplier) pairs first — one hash shuffle — and the per-part
    winner is a struct-min aggregation (no window buffers); dims
    broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    joined = (
        bridge.join(F.broadcast(part), bridge.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), bridge.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    # winner = (max acctbal, tie -> min suppkey): min of (-acctbal, key)
    best = joined.groupBy("p_partkey", "p_brand").agg(
        F.min(F.struct((-F.col("s_acctbal")).alias("nb"), F.col("s_suppkey").alias("k"))).alias("w")
    )
    return (
        best.join(F.broadcast(sup), best["w.k"] == sup.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            cents(F.col("s_acctbal")).alias("s_acctbal_c"),
        )
    )


Q2_SQL = """
WITH bridge AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), joined AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal
  FROM bridge
  JOIN part ON l_partkey = p_partkey AND p_size < 15
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM joined
)
SELECT p_partkey, p_brand, s_name,
       CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c
FROM ranked WHERE rn = 1
"""


QUERIES.update({"q2_best_supplier": q2_best_supplier})
ORACLES.update({"q2_best_supplier": Q2_SQL})
