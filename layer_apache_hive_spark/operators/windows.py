"""Window functions (SURVEY.md §2.5).

Hive locus: the PTF framework (PTFOperator.java +
WindowingTableFunction.java). Spark: pyspark.sql.Window — a 1:1
surface with the same default frame (RANGE UNBOUNDED PRECEDING →
CURRENT ROW when ORDER BY is present).

Scale notes (100 TB): a window = one shuffle on partitionBy keys +
per-partition sort. All queries here partition on bounded-cardinality
keys with bounded partition sizes (per-user event streams, per-flag
lineitems). Skewed partition keys are the risk at scale — for the
hot-user case AQE can't split a window partition, so upstream salting
(or a two-level aggregation) is the pattern; documented per-query.

Determinism: every ORDER BY is made total by appending unique key
columns, so rank/lead/lag/frames are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register


@register(
    "win_ranking",
    oracle="""
SELECT
  o_orderkey,
  o_custkey,
  o_totalprice,
  ROW_NUMBER() OVER w AS rn,
  RANK() OVER w AS rnk,
  DENSE_RANK() OVER w AS drnk,
  ROUND(PERCENT_RANK() OVER w, 8) AS prnk,
  NTILE(4) OVER w AS quartile,
  ROUND(CUME_DIST() OVER w, 8) AS cdist
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER/RANK/DENSE_RANK/PERCENT_RANK/NTILE/CUME_DIST."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 8).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 8).alias("cdist"),
    )


@register(
    "win_lead_lag",
    oracle="""
SELECT
  event_id,
  user_id,
  value,
  LAG(value, 1) OVER w AS prev_value,
  LEAD(value, 1) OVER w AS next_value,
  LAG(value, 2, -1.0) OVER w AS prev2_or_default,
  value - LAG(value, 1) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD/LAG with offsets and defaults over per-user event streams."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta"),
    )


@register(
    "win_first_last",
    oracle="""
SELECT
  event_id,
  user_id,
  event_type,
  FIRST_VALUE(event_type) OVER w AS first_type,
  LAST_VALUE(event_type) OVER w AS last_type,
  NTH_VALUE(event_type, 2) OVER w AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE/NTH_VALUE over the full-partition frame
    (the default frame would make LAST_VALUE trivially = current row)."""
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@register(
    "win_agg_frame",
    oracle="""
SELECT
  event_id,
  user_id,
  value,
  CAST(SUM(CAST(value AS DECIMAL(38,4))) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_last4,
  COUNT(*) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS cnt_last4,
  MAX(value) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max
FROM events
""",
)
def win_agg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over explicit ROWS frames (sliding + cumulative)."""
    e = read_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    sliding = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-3, 0)
    cumulative = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast("decimal(38,4)"))
        .over(sliding)
        .cast("double")
        .alias("sum_last4"),
        F.count(F.lit(1)).over(sliding).alias("cnt_last4"),
        F.max("value").over(cumulative).alias("running_max"),
    )


@register(
    "win_running_total",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  o_totalprice,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
    AS running_spend
FROM orders
""",
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer (the canonical running total).

    Uses the default frame (RANGE UNBOUNDED PRECEDING → CURRENT ROW);
    the ORDER BY is made total with o_orderkey so RANGE == ROWS here.
    Decimal accumulation keeps prefix sums bit-identical cross-engine.
    """
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "win_distribution",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cum_dist
FROM lineitem
WHERE l_orderkey < 2000
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
""",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: NTILE / PERCENT_RANK / CUME_DIST
    (Hive windowing spec §ranking). The ORDER BY is made total
    (price, orderkey, linenumber) so peer groups are single rows —
    engine-exact ranks, and (rank-1)/(n-1) divisions of small ints are
    IEEE-identical. One shuffle on the partition key; at 100 TB
    per-flag partitions are the skew risk (4 distinct flags), so real
    use ranges over a finer key or pre-buckets."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@register(
    "win_ignore_nulls",
    oracle="""
WITH t AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 7 < 3 THEN o_totalprice END AS sparse_price
  FROM orders WHERE o_custkey < 200
)
SELECT o_orderkey, o_orderpriority, sparse_price,
       FIRST_VALUE(sparse_price IGNORE NULLS) OVER w AS first_price,
       LAST_VALUE(sparse_price IGNORE NULLS) OVER w AS running_last_price,
       NTH_VALUE(sparse_price, 2 IGNORE NULLS) OVER w AS second_price
FROM t
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation (Hive's boolean skip-nulls arg
    on first_value/last_value, SQL:2011 IGNORE NULLS): first / running
    last / second non-null value over a sparse column. The running
    last_value IS the LOCF primitive (cf. evt_gap_fill) expressed as
    pure window surface.

    Scale: one window shuffle keyed on the partition column; the
    ignore-nulls variants cost the same as their plain forms — the
    frame walk just skips null slots.
    """
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    sparse = F.when(
        F.col("o_orderkey") % 7 < 3, F.col("o_totalprice")
    ).alias("sparse_price")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = o.select("o_orderkey", "o_orderpriority", sparse)
    return t.select(
        "o_orderkey",
        "o_orderpriority",
        "sparse_price",
        F.first("sparse_price", ignorenulls=True).over(w).alias("first_price"),
        F.last("sparse_price", ignorenulls=True)
        .over(w)
        .alias("running_last_price"),
        F.nth_value("sparse_price", 2, ignoreNulls=True)
        .over(w)
        .alias("second_price"),
    )


@register(
    "win_range_frame",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
         PARTITION BY o_orderpriority ORDER BY o_orderkey
         RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_sum,
       COUNT(*) OVER (
         PARTITION BY o_orderpriority ORDER BY o_orderkey
         RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS trailing_n
FROM orders
WHERE o_custkey < 300
""",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE window frame (RANGE BETWEEN 1000 PRECEDING AND
    CURRENT ROW on the order key) — the frame follows the ORDER BY
    VALUE, not row positions: gaps in the key shrink the frame and
    peer rows (equal keys) always share one frame. This is the
    moving-window-over-a-measure surface ROWS frames cannot express
    (win_agg_frame covers those).

    Sums accumulate as decimal(38,4) inside the frame (dsum
    convention — exact, order-independent) and cast to double once.
    Scale: one window shuffle keyed on the partition column, same as
    every frame variant; RANGE only changes the frame-boundary scan
    within each sorted partition.
    """
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rangeBetween(-1000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_n"),
    )
