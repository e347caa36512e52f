"""Join operators (SURVEY.md §2.3).

Hive loci: CommonJoinOperator.java (shuffle join), MapJoinOperator.java
(broadcast), SMBMapJoinOperator.java (bucketed), SkewJoinResolver.
In Spark these physical strategies are planner choices behind one
``df.join`` surface: SortMergeJoin for large=large, BroadcastHashJoin
when a side fits ``autoBroadcastJoinThreshold`` (or AQE converts at
runtime), BroadcastNestedLoop for non-equi.

Scale notes (100 TB):
- fact⋈fact (lineitem⋈orders) shuffles both sides on the key — the
  dominant network cost; bucketing both tables on the key
  (join_bucket_smb) removes the Exchange entirely.
- fact⋈dim always broadcasts (region/nation/supplier are
  scale-invariant); spelled explicitly with F.broadcast where the
  statistics might not prove it.
- events⋈customer is the skewed case (user_id covers only the lowest
  ~10% of customer keys, FIXTURES.md) — AQE skew-join splitting is on
  in session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.functions.numeric import dsum
from layer_apache_hive_spark.registry import register


@register(
    "join_inner_equi",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_orderstatus, o.o_totalprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 150000
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, both sides shuffled on the key (common join)."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_orderstatus", "o_totalprice"
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, e.event_id, e.event_type
FROM customer c LEFT OUTER JOIN events e ON c.c_custkey = e.user_id
WHERE c.c_custkey < 300
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join onto the skewed events table (nulls preserved)."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    e = read_table(spark, sf_dir, "events")
    return c.join(e, c.c_custkey == e.user_id, "left").select(
        "c_custkey", "c_name", "event_id", "event_type"
    )


@register(
    "join_right_outer",
    oracle="""
SELECT c.c_custkey, c.c_name, e.event_id, e.event_type
FROM events e RIGHT OUTER JOIN customer c ON c.c_custkey = e.user_id
WHERE c.c_custkey < 300
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (mirror of join_left_outer)."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    e = read_table(spark, sf_dir, "events")
    return e.join(c, c.c_custkey == e.user_id, "right").select(
        "c_custkey", "c_name", "event_id", "event_type"
    )


@register(
    "join_full_outer",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, l.l_orderkey AS li_orderkey, l.l_linenumber
FROM (SELECT * FROM orders WHERE o_orderkey < 100) o
FULL OUTER JOIN (SELECT * FROM lineitem WHERE l_orderkey BETWEEN 50 AND 150) l
  ON o.o_orderkey = l.l_orderkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").between(50, 150))
        .withColumnRenamed("l_orderkey", "li_orderkey")
    )
    return o.join(li, o.o_orderkey == li.li_orderkey, "full").select(
        "o_orderkey", "o_totalprice", "li_orderkey", "l_linenumber"
    )


@register(
    "join_left_semi",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI JOIN — Hive's EXISTS/IN rewrite, explicit in Spark."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "join_left_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI JOIN — NOT EXISTS (customers with no URGENT order).

    The right side carries a pushed-down filter on purpose: in this
    corpus every customer has at least one order, so the unfiltered
    anti join returned 0 rows at the sf0.01 gate — a vacuous oracle
    match (round-5 verdict #2). "No urgent order" is non-empty at
    every scale (203 rows at sf0.01, 1986 at sf0.1) and keeps the
    anti-join shape honest: the filter prunes BEFORE the join, the
    null-rejecting key match after.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two scale-invariant dimension tables."""
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_theta",
    oracle="""
SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b, a.s_nationkey,
       a.s_acctbal AS bal_a, b.s_acctbal AS bal_b
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_acctbal < b.s_acctbal
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + non-equi residual predicate (theta join).

    Same-nation supplier pairs ordered by account balance — the equi
    part still hashes/shuffles on nationkey; only the residual runs
    per-pair, so this stays scalable (never a full cross product).
    """
    s = read_table(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_acctbal") < F.col("b.s_acctbal")),
    ).select(
        F.col("a.s_suppkey").alias("supp_a"),
        F.col("b.s_suppkey").alias("supp_b"),
        F.col("a.s_nationkey").alias("s_nationkey"),
        F.col("a.s_acctbal").alias("bal_a"),
        F.col("b.s_acctbal").alias("bal_b"),
    )


@register(
    "join_broadcast",
    oracle="""
SELECT n.n_name, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map join (Hive MapJoinOperator): dimension side broadcast.

    F.broadcast pins BroadcastHashJoin — no shuffle of the customer
    side at any scale; nation is 25 rows forever.
    """
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def ensure_bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    tbl: str,
    key: str,
    n_buckets: int = 8,
) -> str:
    """Write-once bucketed+sorted copy of a base table (Hive
    ``CLUSTERED BY ... SORTED BY ... INTO n BUCKETS``), shared by the
    SMB join and bucket-pruned scans: pay the clustering shuffle ONCE
    at write time, then every equi-join on the key is Exchange-free
    and every point lookup prunes to one bucket file.

    Bucketed files survive across sessions (only the catalog entry is
    per-session): a later session re-registers the existing files via
    CREATE TABLE ... CLUSTERED BY instead of re-shuffling."""
    import os

    from layer_apache_hive_spark.sources.sinks import TMP_ROOT

    label = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    name = f"bkt_{tbl}_{label}"
    if spark.catalog.tableExists(name):
        return name
    path = f"{TMP_ROOT}/bucketed/{label}/{tbl}"
    if os.path.exists(f"{path}/_SUCCESS"):
        src = read_table(spark, sf_dir, tbl)
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
        )
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
    else:
        (
            read_table(spark, sf_dir, tbl)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        )
    return name


@register(
    "join_bucket_smb",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_lines
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey < 5000
GROUP BY o.o_orderkey, o.o_totalprice
""",
)
def join_bucket_smb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket map join / SMB join (Hive SMBMapJoinOperator.java,
    BucketMapJoinOptimizer.java; surface: CLUSTERED BY ... SORTED BY
    ... INTO n BUCKETS):

    both fact tables are written bucketed+sorted on the join key, so
    the sort-merge join needs NO Exchange and NO Sort — the 100 TB
    answer for repeated fact⋈fact joins (pay the shuffle once at
    write time, join co-located forever after).
    tests/test_oracle_parity.py asserts the Exchange-free plan.
    """
    o = spark.table(
        ensure_bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    ).filter(F.col("o_orderkey") < 5000)
    li = spark.table(
        ensure_bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    )
    # merge hint pins SortMergeJoin (AQE would broadcast at this toy
    # scale, hiding the point): bucketed+sorted inputs ⇒ zero Exchange
    # and zero Sort in the executed plan, and the downstream groupBy
    # on the bucket key reuses the partitioning too.
    return (
        o.join(li.hint("merge"), o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "join_mapjoin_hint",
    oracle="""
SELECT n_name, COUNT(*) AS n_customers,
       SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)::BIGINT AS n_positive
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def join_mapjoin_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's /*+ MAPJOIN(t) */ hint, verbatim: Spark accepts MAPJOIN
    as an alias of BROADCAST, so the exact HiveQL text a user carries
    over keeps its semantics — dimension side replicated to every
    task, no shuffle of the fact side (Hive MapJoinOperator ≙ Spark
    BroadcastHashJoin)."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("mj_customer")
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("mj_nation")
    return spark.sql(
        """
        SELECT /*+ MAPJOIN(n) */
               n.n_name,
               COUNT(*) AS n_customers,
               SUM(CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END) AS n_positive
        FROM mj_customer c JOIN mj_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


# Salt fan-out for the manual skew-join demo. At 100 TB pick
# S ≈ hot-key rows / target-partition rows; 16 splits the hot key
# across 16 tasks at a 16x replication of the (tiny) dim side.
_SALT = 16


@register(
    "join_skew_salted",
    oracle=f"""
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0 ELSE l_orderkey % 50 END AS skew_key,
         l_extendedprice, l_discount
  FROM lineitem
),
dim AS (
  SELECT range AS skew_key, 1.0 + range / 100.0 AS rate
  FROM range(50)
)
SELECT f.skew_key,
       COUNT(*) AS n_lines,
       {{dsum}} AS adj_revenue
FROM fact f JOIN dim d ON f.skew_key = d.skew_key
GROUP BY f.skew_key
""".format(dsum="CAST(SUM(CAST((f.l_extendedprice * (1 - f.l_discount) * d.rate) AS DECIMAL(38,6))) AS DOUBLE)"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual salt-based skew join — the technique for when AQE can't
    help (e.g. the dim side must shuffle anyway, or a stateful op
    pins partitioning). ~80% of fact rows share skew_key 0; a plain
    shuffle join lands them in ONE task. Salting splits the hot key:
    fact gets salt = pmod(l_orderkey, S), the dim side is exploded
    xS, and the join key becomes (skew_key, salt) — the hot key's
    rows spread across S tasks, at the cost of replicating the (tiny)
    dim side S times.

    The oracle is the UNSALTED join: salting must be a pure physical
    rewrite, invisible in the result. (AQE skew-split stays on in
    session.py for the plans Spark can fix alone; this query proves
    the manual rewrite gives identical values.)
    """
    from layer_apache_hive_spark.functions.numeric import dsum

    li = read_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.pmod("l_orderkey", F.lit(10)) < 8, 0)
        .otherwise(F.pmod("l_orderkey", F.lit(50)))
        .cast("long")
        .alias("skew_key"),
        F.pmod("l_orderkey", F.lit(_SALT)).cast("int").alias("salt"),
        "l_extendedprice",
        "l_discount",
    )
    dim = (
        spark.range(50)
        .select(
            F.col("id").alias("skew_key"),
            (F.lit(1.0) + F.col("id") / 100.0).alias("rate"),
        )
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1))))
        .withColumn("salt", F.col("salt").cast("int"))
    )
    adj = F.expr("l_extendedprice * (1 - l_discount)") * F.col("rate")
    # pin a SHUFFLE join: broadcasting the dim would bypass the
    # shuffle entirely (no skew to fix) — the demo models the case
    # where the dim side is too big to broadcast
    return (
        fact.join(dim.hint("shuffle_hash"), ["skew_key", "salt"])
        .groupBy("skew_key")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            # scale 6: price(2dp) x (1-discount)(2dp) x rate(2dp) is
            # exactly 6 decimals, so the decimal cast never lands on a
            # rounding tie (Spark HALF_UP vs DuckDB half-even diverge
            # at scale 4, where .xxxx50 ties are common)
            dsum(adj, scale=6).alias("adj_revenue"),
        )
    )


_BLOOM_APP = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
# join_bloom's tuned session clone, one per live SparkContext
_BLOOM_SESSION_CACHE: dict[str, "SparkSession"] = {}
_BLOOM_CREATE = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
_AUTO_BC = "spark.sql.autoBroadcastJoinThreshold"


@register(
    "join_bloom",
    oracle="""
SELECT p.p_brand,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(38,4))) AS DOUBLE)
         AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand IN ('Brand#12', 'Brand#23')
GROUP BY p.p_brand
""",
)
def join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter semi-join reduction (Hive's
    ``hive.tez.dynamic.semijoin.reduction`` / bloom-filter runtime
    filtering on Tez), Spark-first: ``InjectRuntimeFilter`` builds a
    Bloom from the selective dim side (``bloom_filter_agg``) and
    plants ``might_contain`` on the fact scan, so fact rows that can
    never match are dropped BEFORE the join shuffle.

    100 TB: this is the difference between shuffling the whole fact
    table and shuffling ~selectivity of it. Spark injects the filter
    automatically when the application side is big enough; the
    default gate (10 GB scanned) is tuned for exactly that scale, so
    at test SF the thresholds are pinned low around PLAN TIME only —
    the plan is frozen via queryExecution before the confs are
    restored (the physical plan, once materialized, is cached on the
    DataFrame; AQE re-optimization does not re-run the injection
    rule). Broadcast is disabled for this query because a broadcast
    hash join performs the same reduction implicitly — the Bloom path
    exists for dims too big to broadcast but still selective.

    The oracle is the plain join: the runtime filter must be a pure
    physical optimization, invisible in the result.

    The low plan-time thresholds are set on a CLONED session
    (``spark.newSession()`` — own SQLConf, shared SparkContext), so
    a query planned concurrently on the caller's session can never
    observe disabled broadcast joins; nothing is mutated on the
    shared session, and nothing needs restoring. The clone is cached
    per SparkContext (keyed on applicationId) so repeated bench /
    verify sweeps reuse ONE session state instead of accumulating
    listeners and temp catalogs on the shared context for the life
    of the JVM.
    """
    from layer_apache_hive_spark.functions.numeric import dsum

    app_id = spark.sparkContext.applicationId
    s2 = _BLOOM_SESSION_CACHE.get(app_id)
    if s2 is None:
        s2 = spark.newSession()
        s2.conf.set(_BLOOM_APP, "0")
        s2.conf.set(_BLOOM_CREATE, "100MB")
        s2.conf.set(_AUTO_BC, "-1")
        _BLOOM_SESSION_CACHE.clear()  # one live context at a time
        _BLOOM_SESSION_CACHE[app_id] = s2
    li = read_table(s2, sf_dir, "lineitem")
    p = read_table(s2, sf_dir, "part")
    dim = p.filter(F.col("p_brand").isin("Brand#12", "Brand#23")).select(
        "p_partkey", "p_brand"
    )
    return (
        li.join(dim, li.l_partkey == dim.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            # price(2dp) x (1-discount)(2dp) is exactly 4 decimals:
            # the decimal(38,4) cast is lossless, no rounding tie
            dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias("revenue"),
        )
    )


@register(
    "join_null_safe",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_totalprice,
         NULLIF(o_orderpriority, '3-MEDIUM') AS prio
  FROM orders
),
cls AS (
  SELECT prio, COUNT(*) AS class_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
           AS class_total
  FROM o GROUP BY prio
)
SELECT COALESCE(o.prio, 'NULL') AS priority,
       COUNT(*) AS n_matched,
       MAX(cls.class_orders) AS class_orders,
       MAX(cls.class_total) AS class_total
FROM o JOIN cls ON o.prio IS NOT DISTINCT FROM cls.prio
GROUP BY 1
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join — Hive/Spark ``<=>`` (IS NOT DISTINCT
    FROM) `[upstream: Hive GenericUDFOPEqualNS; the join planner
    treats it as an equi-key]`: one priority class is NULLed out on
    BOTH sides and must still match itself, which a plain ``=`` join
    silently drops (NULL = NULL is NULL). The query joins each order
    to its priority-class aggregate through the null-safe key and
    counts matches per class — if the NULL row vanishes or fans out
    wrong, both the row count and the totals break.

    Spark-first: EqualNullSafe is an equi-condition, so this plans as
    a hash/broadcast join on the key (NOT a nested loop — the audit
    would flag that); the class aggregate is tiny and broadcasts. At
    100 TB null-keyed rows all hash to ONE partition under <=>, the
    classic null-skew — the production pattern is exactly this
    pre-aggregate-then-join shape (or AQE skew-split) rather than
    joining raw null-heavy tables.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.expr("nullif(o_orderpriority, '3-MEDIUM')").alias("prio"),
    )
    cls = o.groupBy("prio").agg(
        F.count(F.lit(1)).alias("class_orders"),
        dsum("o_totalprice").alias("class_total"),
    )
    j = o.join(
        cls.select(
            F.col("prio").alias("c_prio"), "class_orders", "class_total"
        ),
        F.col("prio").eqNullSafe(F.col("c_prio")),
    )
    return (
        j.groupBy(F.coalesce("prio", F.lit("NULL")).alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.max("class_orders").alias("class_orders"),
            F.max("class_total").alias("class_total"),
        )
    )
