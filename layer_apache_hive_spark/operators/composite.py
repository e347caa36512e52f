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


@register(
    "composite_nation_trade",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS yr,
       ROUND({sql_dsum(_REV)}, 4) AS revenue,
       COUNT(*) AS n_lines
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey
  AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= DATE '1995-01-01'
  AND l_shipdate < DATE '1997-01-01'
GROUP BY supp_nation, cust_nation, yr
""",
)
def composite_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipping between two nations — the
    double-nation-role join (nation appears twice, once for the
    supplier side and once for the customer side) with a disjunctive
    pair predicate and per-year revenue.

    Scale: both nation copies broadcast (25 rows); the pair
    disjunction can't push below either scan alone, but the two
    single-side nation filters it implies (n_name IN (N1, N2)) DO
    prune supplier and customer before the fact join; the
    lineitem⋈orders spine is the only shuffle."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    o = read_table(spark, sf_dir, "orders")
    nat = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    c = read_table(spark, sf_dir, "customer").join(
        F.broadcast(nat.select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.round(dsum(F.expr(_REV)), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "composite_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       FLOOR({sql_dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {sql_dsum(_REV)} * 10000) / 10000 AS mkt_share,
       COUNT(*) AS n_lines
FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
WHERE p_partkey = l_partkey
  AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_suppkey = l_suppkey
  AND c_nationkey = n1.n_nationkey
  AND n1.n_regionkey = r_regionkey
  AND r_name = 'AMERICA'
  AND s_nationkey = n2.n_nationkey
  AND p_type = 'ECONOMY'
  AND o_orderdate >= DATE '1995-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY yr
""",
)
def composite_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — the widest join tree in
    the suite (8 relations, nation in both roles), with a
    ratio-of-conditional-sums metric per year.

    The share is FLOOR-scaled to 4 decimals (Spark rounds HALF_UP,
    DuckDB half-even; ratios hit ties).

    Scale: part (type-filtered), supplier, customer, both nations and
    region all broadcast; lineitem⋈orders is the lone shuffle, and
    both conditional sums ride one aggregate pass."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_rkey"),
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    rev = F.expr(_REV)
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            (F.floor(dsum(nation_rev) / dsum(rev) * 1e4) / 1e4).alias(
                "mkt_share"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "composite_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def composite_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    join with an extra join-condition filter (the filter must ride
    the join, NOT the orders scan, or zero-order customers vanish),
    then a histogram of the per-customer counts.

    Scale: the outer join shuffles both sides on custkey; COUNT(col)
    (not COUNT(*)) makes unmatched customers count 0. The second
    aggregate re-shuffles a customer-cardinality frame on a
    low-cardinality key — cheap, and AQE coalesces it."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                   "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "composite_top_supplier",
    oracle=f"""
WITH revenue AS MATERIALIZED (
    SELECT l_suppkey AS supplier_no,
           ROUND({sql_dsum(_REV)}, 4) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def composite_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier — a derived revenue view consumed
    twice (once for the scalar MAX, once re-joined to supplier), the
    classic view + scalar-aggregate-subquery pattern.

    dsum makes total_revenue bit-identical across engines, so the
    equality against MAX is exact — no epsilon needed.

    Scale: revenue is one shuffle on suppkey; localCheckpoint-free
    reuse works because Spark plans the MAX over the same exchange
    (ReusedExchange); the 1-row MAX broadcasts; supplier broadcasts."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(dsum(F.expr(_REV)), 4).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "composite_small_qty_revenue",
    oracle=f"""
SELECT ROUND({sql_dsum('l_extendedprice')}, 4) AS total_price,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
        SELECT {sql_davg('l2.l_quantity')} / 5
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
""",
)
def composite_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — a correlated
    scalar AVG subquery per part (lines below 1/5 of the part's mean
    quantity), the decorrelation-into-aggregate-join pattern.

    davg accumulates in decimal then divides by 5 (exact in decimal:
    x/5 = 2x/10), so the threshold double is bit-identical across
    engines and the strict < cannot straddle.

    Scale: the brand filter prunes part first and semi-joins lineitem
    BEFORE the per-part aggregate, so the avg is computed only for
    surviving parts; the threshold frame is part-cardinality and
    broadcasts back onto the same filtered lineitem."""
    pb = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(pb), F.col("l_partkey") == F.col("p_partkey")
    )
    thr = li.groupBy("p_partkey").agg(
        (davg("l_quantity") / 5).alias("qty_thr")
    )
    return (
        li.drop("p_partkey")
        .join(F.broadcast(thr), F.col("l_partkey") == thr.p_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(dsum("l_extendedprice"), 4).alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "composite_waiting_suppliers",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_5'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def composite_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting — the
    EXISTS + NOT EXISTS double-correlation over the same fact table
    (three lineitem roles in one query).

    (The fixture has no l_commitdate/l_receiptdate; l_returnflag='R'
    stands in for "late" — the sole blamed supplier on a finished
    multi-supplier order. Same correlated shape, different column.)

    Scale: both correlations are equi-joins on l_orderkey with a
    suppkey-inequality residual — a LEFT SEMI then a LEFT ANTI over
    the SAME shuffle key, so Catalyst reuses one exchange of lineitem
    for l2 and l3; supplier and nation broadcast; top-k is
    TakeOrderedAndProject."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l1.l_suppkey == F.col("s_suppkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "composite_idle_customers",
    oracle=f"""
SELECT c_mktsegment AS segment,
       COUNT(*) AS numcust,
       ROUND({sql_dsum('c_acctbal')}, 4) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT {sql_davg('c2.c_acctbal')}
        FROM customer c2 WHERE c2.c_acctbal > 0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderpriority = '1-URGENT'
      )
GROUP BY c_mktsegment
""",
)
def composite_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global sales opportunity — an uncorrelated
    scalar AVG subquery (above-average balance) plus a NOT EXISTS
    anti-join (customers with no urgent order), grouped per segment.

    (No c_phone in the fixture; c_mktsegment carries the grouping and
    'no urgent order' stands in for 'no order at all', which the
    fixture's dense FK coverage makes near-empty.)

    Scale: the scalar avg is a 1-row broadcast crossJoin (no eager
    action at plan build); the anti-join shuffles on custkey with the
    priority filter pushed to the orders scan."""
    c = read_table(spark, sf_dir, "customer")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("bal_thr")
    )
    urgent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("bal_thr"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(dsum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


# --- derived supply relation (Q2/Q9/Q11/Q16/Q20 shapes) ----------------------
# The fixture set has no partsupp table (TESTDATA.md); the remaining
# TPC-H shapes derive the part⋈supplier relation from lineitem: every
# (l_partkey, l_suppkey) pair that ever shipped, with unit cost
# MIN(l_extendedprice / l_quantity) and "available quantity" the total
# quantity shipped. Each query's join tree / subquery SHAPE — the
# graded thing — is unchanged; only the relation feeding it moves.
# Scale: the derivation is one map-side-combined groupBy over the
# fact table, output |parts|x|suppliers| at most — dimension-sized,
# broadcastable thereafter.

_SQL_PS = f"""
ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         {sql_dsum('l_quantity')} AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        dsum("l_quantity").alias("ps_availqty"),
    )


@register(
    "composite_min_cost_supplier",
    oracle=f"""
WITH {_SQL_PS},
eur AS (
  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, s_acctbal, n_name
  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ROUND(ps_supplycost, 4) AS min_cost
FROM eur JOIN part ON p_partkey = ps_partkey
WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
  AND ps_supplycost = (
        SELECT MIN(e2.ps_supplycost) FROM eur e2
        WHERE e2.ps_partkey = eur.ps_partkey
      )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def composite_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier — a correlated MIN
    subquery over the (derived) supply relation restricted to one
    region, re-joined on equality with the per-part minimum.

    Scale: supplier/nation/region and the per-part minimum (|part|
    rows) broadcast; the supply relation itself is the only shuffle
    (its groupBy) — and the part filter's key set is semi-joined
    below that groupBy (legal: l_partkey is a group key and only
    filtered parts survive either consumer — both the min and the
    probe side restrict to them), so the fact shuffle carries ~4% of
    lineitem instead of all of it. The min-equality join is a
    broadcast probe. IEEE double division and MIN are
    bit-deterministic in both engines, so the equality join is
    exact."""
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "ps_partkey", "ps_suppkey", "ps_supplycost",
            "s_name", "s_acctbal", "n_name",
        )
    )
    minc = eur.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("mc_cost")
    )
    return (
        eur.join(F.broadcast(p), eur.ps_partkey == p.p_partkey)
        .join(
            F.broadcast(minc),
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("mc_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("ps_supplycost", 4).alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "composite_product_profit",
    oracle=f"""
SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND({sql_dsum('l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity')}, 4) AS profit
FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
""",
)
def composite_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year.
    (No ps_supplycost in the fixtures; p_retailprice * 0.1 * quantity
    stands in as the cost term — same expression shape, same join
    tree: fact spine ⋈ name-filtered part ⋈ supplier ⋈ nation ⋈
    orders.)

    Scale: part/supplier/nation broadcast; lineitem⋈orders
    sort-merges on the shuffled orderkey; the profit expression is a
    single map-side decimal partial."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    profit = F.expr(
        "l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(dsum(profit), 4).alias("profit"))
    )


@register(
    "composite_important_stock",
    oracle=f"""
WITH {_SQL_PS},
natstock AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
),
agg AS (
  SELECT ps_partkey, {sql_dsum('v', scale=7)} AS val
  FROM natstock GROUP BY ps_partkey
)
SELECT ps_partkey, val AS part_value
FROM agg
WHERE val > (SELECT 2 * ({sql_dsum('val', scale=7)} / COUNT(*)) FROM agg)
""",
)
def composite_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock — per-part inventory value in
    one nation, kept only where it exceeds a multiple of the nation's
    mean per-part value (a HAVING against an uncorrelated scalar
    subquery; TPC-H's FRACTION*total is scale-variant by design —
    0 rows past the authored SF — so the 2x-mean form keeps the shape
    with scale-stable selectivity).

    Scale: the scalar total is a 1-row broadcast crossJoin (no eager
    action at plan build — the ext_text_langid pattern); the one
    nation's supplier key set (1/|nation| of suppliers) is
    semi-joined below the supply groupBy (l_suppkey is a group key;
    only that nation's groups survive), so the fact shuffle carries
    ~4% of lineitem; supplier and nation broadcast onto the
    dimension-sized supply relation."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    )
    nat_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(nat_supp), "l_suppkey", "left_semi"
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        dsum("l_quantity").alias("ps_availqty"),
    )
    stock = ps.select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
    )
    # scale=7, not the default 4: ps_supplycost = MIN(price/qty) is an
    # exact dyadic with up to 7 decimal digits (2 from price + 5 from
    # qty≤50 ⇒ /32), and v = cost*availqty keeps them — at scale 4
    # exact x.xxxx5 values land on the HALF_UP-vs-half-even cross-engine
    # rounding tie (the join_skew_salted hazard).
    agg = stock.groupBy("ps_partkey").agg(dsum("v", scale=7).alias("val"))
    thr = agg.agg(
        (F.lit(2.0) * (dsum("val", scale=7) / F.count("val"))).alias("thr")
    )
    return (
        agg.crossJoin(F.broadcast(thr))
        .filter(F.col("val") > F.col("thr"))
        # no final ROUND: val is already a deterministic scale-7
        # decimal sum, and a trailing round(...,4) re-introduces the
        # exact-.xxxx5 HALF_UP-vs-half-even cross-engine tie this
        # query's dsum scale was raised to avoid (observed at sf0.1:
        # one part at x.61125 rounding to .6113 vs .6112)
        .select("ps_partkey", F.col("val").alias("part_value"))
    )


@register(
    "composite_parts_supplier_cnt",
    oracle="""
WITH ps AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
  FROM lineitem
)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
GROUP BY p_brand, p_type, p_size
""",
)
def composite_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: parts/supplier relationship — distinct
    supplier count per (brand, type, size) bucket, excluding an
    anti-joined supplier blacklist (negative balance stands in for
    the customer-complaints comment scan).

    Scale: the blacklist broadcast anti-join and the part-attribute
    filter's key set BOTH push below the pair distinct (its keys are
    exactly the distinct's grouping columns, so pre-filtering rows
    equals post-filtering pairs), leaving the one shuffle carrying
    only countable pairs (~16% of lineitem); COUNT(DISTINCT) expands
    in the same aggregate."""
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    li = (
        read_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(
            F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
            "left_semi",
        )
    )
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    return (
        ps.join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "composite_excess_stock",
    oracle=f"""
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         {sql_dsum('l_quantity')} AS ps_availqty,
         {sql_dsum("CASE WHEN l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01' THEN l_quantity ELSE 0 END")} AS qty_1997
  FROM lineitem GROUP BY 1, 2
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (
        SELECT ps_suppkey FROM ps
        WHERE ps_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
              )
          AND ps_availqty > 2 * qty_1997
      )
ORDER BY s_name
""",
)
def composite_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: potential part promotion — suppliers holding
    excess stock of name-matched parts, via nested IN subqueries with
    a correlated quantity comparison (availqty > 2x the 1997-window
    shipments, the derived-relation reading of availqty > half a
    year's flow).

    Scale: the part-name semi-join is pushed BELOW the aggregation
    (legal because ps_partkey is a group key and only bolt-part
    groups survive downstream — a rewrite Catalyst does not do
    through aggregates itself), so the one fact shuffle carries only
    the ~12% of lineitem rows that can matter; both sums ride that
    single pass; the final supplier IN is a broadcast semi-join."""
    li = read_table(spark, sf_dir, "lineitem")
    in_97 = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    bolts = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select(F.col("p_partkey").alias("l_partkey"))
    ps = (
        li.join(F.broadcast(bolts), "l_partkey", "left_semi")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            dsum("l_quantity").alias("ps_availqty"),
            dsum(F.when(in_97, F.col("l_quantity")).otherwise(0.0)).alias(
                "qty_1997"
            ),
        )
    )
    excess = (
        ps.filter(F.col("ps_availqty") > 2 * F.col("qty_1997"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
        .distinct()
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(excess, "s_suppkey", "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
