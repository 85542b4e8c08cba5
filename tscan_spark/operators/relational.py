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
