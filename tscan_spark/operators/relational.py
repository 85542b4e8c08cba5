"""Classic relational operators over the TPC-H-ish tables.

The reference has no SQL surface, but the engine is a general Spark
query layer; these queries pin the relational fundamentals (§2.9 sorts/
top-k/set ops + broadcast join selection) on the star schema the
harness ships: pricing-summary aggregation, broadcast dimension joins,
per-group top-k windows, and anti-join set difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscan_spark import corpus
from tscan_spark.functions.scalars import fp_sum


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (fixed-point exact sums)."""
    li = corpus.load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(fp_sum("l_extendedprice") / 1e6, 6).alias("sum_base_price"),
            F.round(fp_sum(disc_price) / 1e6, 6).alias("sum_disc_price"),
            F.round(fp_sum(charge) / 1e6, 6).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 1000000, 0) AS BIGINT)) / 1e6, 6)
           AS sum_base_price,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000, 0)
                 AS BIGINT)) / 1e6, 6) AS sum_disc_price,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                 * 1000000, 0) AS BIGINT)) / 1e6, 6) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x broadcast-dimension star join (orders->customer->nation)."""
    orders = corpus.load(spark, sf_dir, "orders")
    customer = corpus.load(spark, sf_dir, "customer")
    nation = corpus.load(spark, sf_dir, "nation")
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders["o_custkey"] == customer["c_custkey"],
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer["c_nationkey"] == nation["n_nationkey"],
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.round(fp_sum("o_totalprice") / 1e6, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("n_name")
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       ROUND(SUM(CAST(ROUND(o_totalprice * 1000000, 0) AS BIGINT)) / 1e6, 6)
           AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (row_number window), deterministic tie-break."""
    orders = corpus.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey",
            F.col("rk").cast("int").alias("rk"),
            "o_orderkey",
            F.round("o_totalprice", 6).alias("o_totalprice"),
        )
    )


SQL_TOP_ORDERS = """
SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey,
       ROUND(o_totalprice, 6) AS o_totalprice
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
    FROM orders
)
WHERE rk <= 3"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join set difference (left_anti — the `except` shape)."""
    customer = corpus.load(spark, sf_dir, "customer")
    orders = corpus.load(spark, sf_dir, "orders")
    return (
        customer.join(
            orders.select("o_custkey").distinct(),
            customer["c_custkey"] == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey"""


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"
Q3_TOP = 10


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: the canonical 3-table
    selective join (customer filter -> orders date filter -> lineitem
    date filter), revenue per order, top-N.

    Scale notes: both date predicates push to the parquet scans
    (PushedFilters); customer is the broadcast side; revenue
    accumulates in 1e6 fixed-point BIGINT so the top-N ordering is
    EXACT-INTEGER deterministic (a float revenue sort would tie rank
    assignment to summation order), with l_orderkey as tie-break.
    """
    cust = corpus.load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = corpus.load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < Q3_DATE
    )
    li = corpus.load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > Q3_DATE)
    j = li.join(
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    rev_fp = F.sum(
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 1e6, 0
        ).cast("long")
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_fp.alias("rev_fp"))
        .orderBy(F.desc("rev_fp"), F.asc("l_orderkey"))
        .limit(Q3_TOP)
        .select(
            "l_orderkey",
            F.round(F.col("rev_fp") / 1e6, 6).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 1e6, 0)
                 AS BIGINT)) / 1e6, 6) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 1e6, 0)
             AS BIGINT)) DESC, l_orderkey ASC
LIMIT {Q3_TOP}"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local supplier volume: the 5-table star
    (customer, orders, lineitem, supplier, nation) with the
    same-nation residual (c_nationkey = s_nationkey), revenue per
    nation.  Dimensions broadcast; the two facts join on l_orderkey;
    fixed-point exact sums.
    """
    cust = corpus.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = corpus.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = corpus.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = corpus.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = corpus.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
    )
    rev_fp = F.sum(
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 1e6, 0
        ).cast("long")
    )
    return (
        j.groupBy("n_name")
        .agg(
            rev_fp.alias("rev_fp"), F.count(F.lit(1)).cast("long").alias("n_items")
        )
        .select(
            "n_name", F.round(F.col("rev_fp") / 1e6, 6).alias("revenue"), "n_items"
        )
        .orderBy("n_name")
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 1e6, 0)
                 AS BIGINT)) / 1e6, 6) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY n_name"""
