"""Composite analytics queries (TPC-H-shaped).

SURVEY §2 is deliberately one-operator-per-row; these rows prove the
operators COMPOSE — multi-way join trees with selective dimension
filters, grouped revenue math, and ordered top-k, the plans where
Catalyst's join reordering / broadcast selection / AQE actually earn
their keep (Hive analog: Calcite CBO over the same shapes,
ql/optimizer/calcite/*).

Scale notes (100 TB): dimension sides (customer-filtered, nation,
region, supplier) broadcast; the lineitem⋈orders spine sort-merges on
the shuffled key; revenue sums use decimal accumulation so map-side
partials stay exact (functions/numeric.py). Top-k never global-sorts
(TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.functions.numeric import dsum, sql_dsum
from layer_apache_hive_spark.registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "composite_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       ROUND({sql_dsum(_REV)}, 4) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, date windows, grouped revenue,
    top-10. (o_shippriority isn't in the fixture schema; the
    scale-invariant o_orderpriority stands in.)"""
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(dsum(F.expr(_REV)), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "composite_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       ROUND({sql_dsum(_REV)}, 4) AS revenue,
       COUNT(*) AS n_lines
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1994-01-01'
GROUP BY n_name
""",
)
def composite_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (fact spine + 4 broadcast dims with
    the customer-nation = supplier-nation co-location predicate),
    revenue per nation."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1994-01-01"
    )
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(dsum(F.expr(_REV)), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
