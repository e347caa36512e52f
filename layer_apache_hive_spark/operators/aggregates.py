"""Aggregation operators (SURVEY.md §2.4).

Hive locus: GroupByOperator.java + generic UDAFs (map-side partial
aggregation with ``hive.map.aggr=true``, final in the reducer). Spark's
HashAggregateExec has the identical two-phase shape (partial → shuffle
on group keys → final), chosen automatically by the planner — nothing
to hand-schedule.

Scale notes (100 TB): group-by shuffles on the grouping key; partial
aggregation collapses each map partition to |groups| rows before the
shuffle, so low-cardinality keys (returnflag×linestatus = 6 groups)
move only |partitions|×|groups| rows regardless of input size. High
cardinality + skew is handled by AQE partition splitting (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from layer_apache_hive_spark.registry import register


# --- agg_hash_groupby: flagship (TPC-H Q1 shape) -----------------------------

_Q1_CUTOFF = "1998-09-02"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_hash_groupby", oracle=_Q1_ORACLE)
def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with map-side partial (Hive GroupByOperator.java).

    TPC-H Q1-shaped pricing summary: scan→filter→project→agg. The
    filter and the 7-column projection both push into the parquet scan
    (PushedFilters / ReadSchema in .explain).
    """
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
