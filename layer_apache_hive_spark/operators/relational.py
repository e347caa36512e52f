"""Projection / filter / predicate / expression operators (SURVEY.md §2.2).

Hive loci: SelectOperator.java, FilterOperator.java, and the generic
UDFs behind IN/BETWEEN/LIKE/CASE/COALESCE/cast. In Spark every one of
these is a Catalyst expression inside whole-stage codegen; filters and
projections push into the parquet scan (PushedFilters/ReadSchema), so
at 100 TB these queries read only the referenced columns and skip
row-groups via min/max stats — no shuffle at all (embarrassingly
parallel over file splits).

Cast parity note: Spark runs with ANSI off (session.py) so invalid
casts yield NULL like Hive; the DuckDB twin spells that TRY_CAST.
double→int differs (Spark truncates, DuckDB rounds), so cross-engine
queries spell the truncation explicitly with FLOOR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register


@register(
    "project_select",
    oracle="""
SELECT
  p_partkey,
  p_name AS part_name,
  p_retailprice * 1.1 AS boosted_price,
  p_size + 1 AS size_plus,
  upper(p_brand) AS brand_uc
FROM part
""",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with aliases + row-level expressions (SelectOperator)."""
    part = read_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey"),
        F.col("p_name").alias("part_name"),
        (F.col("p_retailprice") * 1.1).alias("boosted_price"),
        (F.col("p_size") + 1).alias("size_plus"),
        F.upper("p_brand").alias("brand_uc"),
    )


@register(
    "project_distinct",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def project_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — rewritten to an aggregate in both engines."""
    return read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "filter_basic",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE (l_quantity > 30 AND l_discount < 0.05) OR NOT (l_returnflag = 'N')
""",
)
def filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter with AND/OR/NOT comparisons (FilterOperator)."""
    li = read_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)) | (
        ~(F.col("l_returnflag") == "N")
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "filter_in_between_like",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderstatus
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 50000 AND 200000
  AND o_orderpriority LIKE '%H%'
  AND regexp_matches(o_orderstatus, '^[OF]$')
  AND o_orderkey IS NOT NULL
""",
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / RLIKE / IS [NOT] NULL predicates."""
    o = read_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").like("%H%")
        & F.col("o_orderstatus").rlike("^[OF]$")
        & F.col("o_orderkey").isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus")


@register(
    "expr_case_when",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CASE WHEN l_returnflag = 'R' THEN 'returned'
       WHEN l_returnflag = 'A' THEN 'acked'
       ELSE 'none' END AS flag_desc,
  CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class,
  coalesce(nullif(l_linestatus, 'F'), 'FILLED') AS status_or_filled,
  CASE WHEN l_discount > 0.05 THEN l_discount ELSE 0.0 END AS big_discount
FROM lineitem
""",
)
def expr_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / IF / COALESCE / NULLIF conditional expressions."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_returnflag") == "A", "acked")
        .otherwise("none")
        .alias("flag_desc"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_class"),
        F.coalesce(F.nullif("l_linestatus", F.lit("F")), F.lit("FILLED")).alias(
            "status_or_filled"
        ),
        F.when(F.col("l_discount") > 0.05, F.col("l_discount"))
        .otherwise(F.lit(0.0))
        .alias("big_discount"),
    )


@register(
    "expr_cast",
    oracle="""
SELECT
  o_orderkey,
  CAST(o_orderkey AS VARCHAR) AS key_str,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
  CAST(o_orderdate AS DATE) AS order_date,
  TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast_null,
  TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS roundtrip_key
FROM orders
""",
)
def expr_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across the type lattice, incl. Hive null-on-error behavior.

    Hive's CAST('O' AS INT) → NULL is spelled ``try_cast`` on both
    sides so the semantic survives ANY session config — PySpark 4
    defaults ANSI on, where a plain cast would throw (read_table also
    forces ansi.enabled=false at runtime as belt-and-suspenders).
    double→int truncation is spelled FLOOR on both sides because
    DuckDB's plain cast rounds.

    Performance: try_cast's failure path raises and catches a JVM
    exception PER ROW — measured 11× the success path at sf0.1
    (1.58 s vs 0.14 s for this all-failing column). The digit guard
    pre-nulls strings that cannot possibly parse (the guard accepts a
    SUPERSET of every int-parseable string: at least one digit, only
    sign/dot/digit characters and bytes ≤ 0x20 — Spark's string→int
    parse trims ALL leading/trailing control/space bytes ≤ 0x20, a
    wider class than regex \\s, so the class is spelled [\\x00-\\x20]
    to never reject a row try_cast would accept; round-10 advisor
    item, equivalence pinned on edge cases incl. control-char
    padding in tests/test_properties.py), keeping the exception path
    for rare near-numeric strings only. At 100 TB a mostly-failing
    try_cast is a real hot-spot; this is the production rewrite.
    """
    o = read_table(spark, sf_dir, "orders")
    digitish = F.col("o_orderstatus").rlike(
        r"^[\x00-\x20+\-.0-9]*[0-9][\x00-\x20+\-.0-9]*$"
    )
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        # the decimal cast is the thing under test; the emitted cell is
        # re-lowered to DOUBLE because engines' client bridges disagree
        # on DECIMAL representation (Spark: Decimal objects; DuckDB
        # pandas: float64) — same portability rule as the BIGINT casts
        # in the HUGEINT-hazard oracles (tests/test_oracle_types.py)
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.when(digitish, F.col("o_orderstatus")).try_cast("int").alias("bad_cast_null"),
        F.col("o_orderkey").cast("string").try_cast("bigint").alias("roundtrip_key"),
    )


@register(
    "filter_subqueries",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
  AND c_acctbal > (SELECT MAX(c_acctbal) FROM customer) * 0.1
""",
)
def filter_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery predicates — IN, correlated EXISTS / NOT EXISTS, and a
    scalar subquery — the HiveQL surface beyond bare joins.

    Catalyst rewrites these to left-semi / left-anti joins and a
    broadcast scalar (visible in .explain), so at 100 TB each
    predicate is one bounded-key join, not a per-row probe. The
    scalar threshold uses MAX (exact in any engine); an AVG here
    would be float-accumulation-order dependent across engines.
    """
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("subq_customer")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("subq_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM subq_customer c
        WHERE c_custkey IN (SELECT o_custkey FROM subq_orders
                            WHERE o_totalprice > 150000)
          AND EXISTS (SELECT 1 FROM subq_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM subq_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
          AND c_acctbal > (SELECT MAX(c_acctbal) FROM subq_customer) * 0.1
        """
    )


@register(
    "query_recursive_cte",
    oracle="""
WITH RECURSIVE powers(k) AS (
  SELECT CAST(1 AS BIGINT)
  UNION ALL
  SELECT k * 2 FROM powers WHERE k * 2 <= 1048576
)
SELECT p.k AS bucket_lo,
       COUNT(o.o_orderkey) AS n_orders,
       MIN(o.o_orderkey) AS min_key,
       MAX(o.o_orderkey) AS max_key
FROM powers p LEFT JOIN orders o
  ON o.o_orderkey >= p.k AND o.o_orderkey < p.k * 2
GROUP BY p.k
""",
)
def query_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 / Hive-on-Tez surface): generate
    power-of-two bucket bounds recursively, then histogram orders into
    them with a range join.

    The recursion is O(log maxkey) rows on the driver-side plan; the
    range join broadcasts the tiny recursive side, so the scan side
    never shuffles — the right shape for bucketing 100 TB by key
    magnitude. Integer-only aggregates keep it engine-exact.
    """
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("rcte_orders")
    return spark.sql(
        """
        WITH RECURSIVE powers(k) AS (
          SELECT CAST(1 AS BIGINT)
          UNION ALL
          SELECT k * 2 FROM powers WHERE k * 2 <= 1048576
        )
        SELECT p.k AS bucket_lo,
               COUNT(o.o_orderkey) AS n_orders,
               MIN(o.o_orderkey) AS min_key,
               MAX(o.o_orderkey) AS max_key
        FROM powers p LEFT JOIN rcte_orders o
          ON o.o_orderkey >= p.k AND o.o_orderkey < p.k * 2
        GROUP BY p.k
        """
    )


@register(
    "expr_try_arithmetic",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL
            ELSE o_totalprice / (o_orderkey % 5) END AS safe_div,
       CASE WHEN o_orderkey = 0 THEN 0
            WHEN o_orderkey = 1 THEN 9223372036854775807
            WHEN o_orderkey > 1 THEN NULL END AS safe_mul,
       NULL AS oob_elem,
       o_totalprice AS elem_1
FROM orders
WHERE o_orderkey <= 100
""",
)
def expr_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe try_* arithmetic (the companion of expr_cast's
    try_cast): try_divide → NULL on zero denominator, try_multiply →
    NULL on bigint overflow, try_element_at → NULL out of bounds —
    all instead of a runtime error under the driver's default
    ANSI-ON session (the exact trap expr_cast hit in round 1).

    The DuckDB twin spells each NULL case out as CASE expressions,
    pinning the try_* semantics to explicit values rather than to
    another engine's error policy. Map-only; pushdown-friendly.
    """
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.expr("try_divide(o_totalprice, o_orderkey % 5)").alias("safe_div"),
        F.expr("try_multiply(o_orderkey, 9223372036854775807L)").alias(
            "safe_mul"
        ),
        F.expr(
            "CAST(try_element_at(array(o_totalprice), 5) AS DOUBLE)"
        ).alias("oob_elem"),
        F.expr("try_element_at(array(o_totalprice), 1)").alias("elem_1"),
    )


@register(
    "query_lateral",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
""",
)
def query_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery in FROM (SQL:1999 LATERAL; Hive
    users reach it via LATERAL VIEW + windows, Spark 3.2+ runs the
    literal form): the canonical top-N-per-group join — each
    nation's two richest customers — expressed as a per-row derived
    table.

    Scale: Catalyst decorrelates the LATERAL into a window-rank over
    the inner relation joined back on the correlation key — one
    customer-side shuffle on c_nationkey, never a per-outer-row
    re-execution. The same query in the DataFrame API is
    win_ranking's rank-filter shape; this entry pins the SQL surface.
    """
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lat_customer"
    )
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM lat_nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        """
    )
