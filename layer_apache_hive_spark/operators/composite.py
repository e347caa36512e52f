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
from layer_apache_hive_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
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


@register(
    "composite_order_priority",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
GROUP BY o_orderpriority
""",
)
def composite_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — a correlated EXISTS
    (at least one line item shipped >60 days after the order date)
    counted per priority bucket.

    (The fixture has no l_commitdate/l_receiptdate, so the lateness
    predicate is shipdate vs orderdate + 60 days — same correlated
    shape, different columns.)

    Scale: the EXISTS lowers to a LEFT SEMI join on l_orderkey, so
    lineitem is deduplicated by the join itself — no DISTINCT pass.
    The correlated date predicate rides the join condition (evaluated
    pre-shuffle on the build of the semi join); the selective quarter
    filter on orders is pushed to the scan, and AQE will broadcast
    the filtered orders side when the quarter is small enough."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "composite_returned_items",
    oracle=f"""
SELECT c_custkey,
       c_name,
       ROUND({sql_dsum(_REV)}, 4) AS revenue,
       c_acctbal,
       n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def composite_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue report — customers who returned
    items in a quarter, ranked by revenue, top 20.

    Scale: the orders date window is the selective predicate, pushed
    to the scan; lineitem joins the filtered orders (broadcast at SF
    where the quarter fits, SMJ otherwise — AQE decides from runtime
    stats), nation always broadcasts. Top-20 is
    TakeOrderedAndProject: no global sort ever materializes."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = read_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(dsum(F.expr(_REV)), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "composite_large_orders",
    oracle=f"""
SELECT c_name,
       c_custkey,
       o.o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice,
       {sql_dsum('l_quantity')} AS total_qty
FROM customer, orders o, lineitem
WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 200
      )
  AND c_custkey = o_custkey
  AND o.o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o.o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o.o_orderkey
LIMIT 100
""",
)
def composite_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — IN-subquery over a
    grouped HAVING, re-joined to customer/orders, top 100.

    Scale: the subquery and the outer aggregate group lineitem on the
    SAME key (l_orderkey), so Catalyst plans one exchange that both
    consume (ReusedExchange); the semi-join against the qualifying
    keys is an AQE-eligible shuffled join that collapses to broadcast
    when few orders qualify — exactly the runtime re-plan this query
    exists to exercise."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "composite_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01'
  AND l_shipdate < DATE '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def composite_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue-change forecast — a pure scan-filter-
    aggregate with no join and no group key.

    Scale: the canary for pushdown — every predicate must reach the
    parquet scan (PushedFilters on l_shipdate/l_discount/l_quantity),
    column pruning must cut the read to 4 columns, and the aggregate
    is a map-side partial + single-row final. At 100 TB this query is
    I/O-bound or the plan is wrong."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.expr("l_extendedprice * l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "composite_priority_lines",
    oracle="""
SELECT o_orderpriority,
       SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS returned_lines,
       SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)::BIGINT AS kept_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1995-06-01'
  AND l_shipdate < DATE '1995-09-01'
GROUP BY o_orderpriority
""",
)
def composite_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + two-way conditional aggregation
    (Hive expresses the split metric as SUM(CASE WHEN ...)).
    (l_shipmode isn't in the fixture schema; l_returnflag carries the
    same conditional-aggregate plan shape.)

    Scale: the date filter is pushed to the lineitem scan; the join
    shuffles on orderkey; both CASE sums fold into ONE aggregate pass
    (a single HashAggregate computes both columns — no double scan)."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-06-01")
        & (F.col("l_shipdate") < "1995-09-01")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "returned_lines"
            ),
            F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias(
                "kept_lines"
            ),
        )
    )


@register(
    "composite_promo_revenue",
    oracle=f"""
SELECT FLOOR(100.0 * {sql_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {sql_dsum('l_extendedprice * (1 - l_discount)')} * 10000) / 10000
         AS promo_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1995-09-01'
  AND l_shipdate < DATE '1995-10-01'
""",
)
def composite_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion-revenue share — fact⋈dim join where
    the metric is a ratio of conditional revenue sums.

    The percentage is FLOOR-scaled to 4 decimals (not ROUND: Spark
    rounds HALF_UP, DuckDB half-even, and ratios can land on ties).

    Scale: part broadcasts (it's the dimension); the month filter is
    pushed to the lineitem scan; both sums ride one aggregate pass."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01")
        & (F.col("l_shipdate") < "1995-10-01")
    )
    p = read_table(spark, sf_dir, "part")
    rev = F.expr("l_extendedprice * (1 - l_discount)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.floor(F.lit(100.0) * dsum(promo) / dsum(rev) * 1e4) / 1e4).alias(
                "promo_pct"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "composite_brand_quantity",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def composite_brand_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted-revenue over an OR-of-ANDs
    predicate spanning BOTH join sides — the classic CBO test of
    disjunction handling. (p_container/l_shipmode aren't in the
    fixture schema; p_size/l_quantity carry the same disjunctive
    shape.)

    Scale: Catalyst extracts the common single-side conjuncts from
    the disjunction (p_brand IN (...), p_size >= 1, l_quantity
    bounds) and pushes them below the join as scan filters; the
    residual cross-side OR evaluates post-join. Part broadcasts."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
