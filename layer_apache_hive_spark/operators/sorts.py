"""Sort / limit / top-k / distribution operators (SURVEY.md §2.6).

Hive loci: ReduceSinkOperator.java (ORDER BY = single reducer — the
classic Hive bottleneck; SORT BY/DISTRIBUTE BY/CLUSTER BY are the
per-reducer workarounds), LimitOperator.java, and the top-n pushdown
(LimitPushdownOptimizer.java).

Spark is strictly better here: ORDER BY range-partitions (samples key
distribution, then sorts partitions in parallel — no single-reducer
collapse), and ORDER BY+LIMIT becomes TakeOrderedAndProject (per-
partition top-k, then k-way merge on the driver — O(k) memory at any
scale). SORT BY ≙ sortWithinPartitions, DISTRIBUTE BY ≙ repartition,
CLUSTER BY ≙ repartition + sortWithinPartitions.

The distribution queries are multiset-preserving, so they still get a
full value oracle (the driver's compare is order-insensitive); their
partitioning effect is asserted in tests/test_plans.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register


@register(
    "sort_order_by",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE l_extendedprice > 90000
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
""",
)
def sort_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total order — parallel range-partitioned sort in Spark."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_extendedprice") > 90000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
    )


@register(
    "sort_sort_by",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem WHERE l_quantity > 45
""",
)
def sort_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SORT BY: per-partition order only; multiset equals the plain scan.

    Per-partition monotonicity is asserted in tests/test_plans.py
    (not SQL-expressible — SURVEY §2.6).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .sortWithinPartitions("l_shipdate")
    )


@register(
    "sort_distribute_by",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
""",
)
def sort_distribute_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY: hash-partition rows by key (Exchange, no sort)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").repartition("o_custkey")


@register(
    "sort_cluster_by",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate FROM orders
""",
)
def sort_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY = DISTRIBUTE BY k + SORT BY k."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_orderdate")
        .repartition("o_custkey")
        .sortWithinPartitions("o_custkey")
    )


@register(
    "limit_basic",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100
""",
)
def limit_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT under a deterministic total order (oracle-stable)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(100)


@register(
    "topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: ORDER BY + LIMIT → TakeOrderedAndProject (per-partition
    top-k + driver merge; never a global sort — Hive needed
    hive.limit.pushdown for this)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )
