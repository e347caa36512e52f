"""Set operations (SURVEY.md §2.7).

Hive surface: UNION ALL (the only set op in old Hive; 2.2 added
INTERSECT/EXCEPT [ALL|DISTINCT]). Spark: union / unionByName /
intersect / intersectAll / exceptAll / subtract.

Scale: UNION ALL is a zero-shuffle concatenation of partition lists;
the DISTINCT/INTERSECT/EXCEPT variants shuffle on the full row (they
compile to aggregates/joins over all columns) — at 100 TB prefer
key-based dedup (extensions.dedup) over whole-row DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register


@register(
    "set_union_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — duplicates preserved, no shuffle."""
    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    return a.union(b)


@register(
    "set_union_distinct",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — bag union then whole-row dedup."""
    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT DISTINCT (compiles to a left-semi join + dedup)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT (left-anti join + dedup)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    return a.subtract(b)


@register(
    "set_intersect_all",
    oracle="""
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'O'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiplicity-preserving (min of the two bags)."""
    li = read_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_linestatus") == "O").select("l_suppkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT ALL
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (multiplicities subtract).

    Operands are the R vs A returnflag bags: both are ~25% samples of
    the same suppkey population, so per-key multiplicities genuinely
    differ in both directions and the difference is non-empty at
    every tested scale (764 rows at sf0.01, 7810 at sf0.1). The
    previous operand pair (R vs linestatus O) was a strict per-key
    subset — 0 rows everywhere, a vacuous oracle match (round-5
    verdict #2).
    """
    li = read_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return a.exceptAll(b)
