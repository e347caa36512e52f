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

from pyspark.sql import DataFrame, SparkSession, Window
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


# --- basic stats ------------------------------------------------------------


@register(
    "agg_basic_stats",
    oracle=f"""
SELECT
  l_returnflag,
  COUNT(*) AS n_rows,
  COUNT(l_quantity) AS n_qty,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_davg('l_quantity')} AS avg_qty,
  MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty,
  MIN(l_shipdate) AS min_shipdate,
  MAX(l_shipdate) AS max_shipdate
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM/AVG/MIN/MAX — the built-in UDAF set."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT
  l_returnflag,
  COUNT(DISTINCT l_suppkey) AS distinct_supps,
  COUNT(DISTINCT l_partkey) AS distinct_parts,
  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_distinct_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-DISTINCT aggregate in one query (Catalyst expands to a
    multi-phase plan, same as Hive's GroupByOperator distinct path)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(38,4)"))
        .cast("double")
        .alias("sum_distinct_qty"),
    )


@register(
    "agg_stddev_corr",
    oracle="""
SELECT
  l_returnflag,
  ROUND(var_samp(l_quantity), 4) AS var_qty,
  ROUND(var_pop(l_quantity), 4) AS varp_qty,
  ROUND(stddev_samp(l_quantity), 4) AS std_qty,
  ROUND(stddev_pop(l_quantity), 4) AS stdp_qty,
  ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
  ROUND(covar_pop(l_quantity, l_discount), 6) AS covp_qd,
  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stddev_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (GenericUDAFVariance/Covariance/Correlation).

    Computed over small-magnitude columns and rounded: the float
    accumulation error (~1e-12 relative) sits far below the rounding
    step, so cross-engine hashes agree (SURVEY §5.2 determinism note).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.var_pop("l_quantity"), 4).alias("varp_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("stdp_qty"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qd"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("covp_qd"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
    )


@register(
    "agg_percentile",
    oracle="""
SELECT
  l_returnflag,
  quantile_cont(l_quantity, 0.25) AS q25,
  quantile_cont(l_quantity, 0.5) AS median_qty,
  quantile_cont(l_quantity, 0.75) AS q75
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Hive UDAFPercentile ↔ Spark percentile ↔
    DuckDB quantile_cont; all linear interpolation).

    percentile_approx (GenericUDAFPercentileApprox) exists in Spark
    under the same name but its t-digest buckets are engine-specific —
    exercised in agg_percentile_approx (rows-only)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.75).alias("q75"),
    )


@register(
    "agg_percentile_approx",
    oracle="""
SELECT
  l_returnflag,
  quantile_disc(l_extendedprice, 0.5)  AS approx_median_price,
  quantile_disc(l_extendedprice, 0.25) AS approx_q25_price,
  quantile_disc(l_extendedprice, 0.75) AS approx_q75_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Hive GenericUDAFPercentileApprox ↔ Spark
    ApproximatePercentile): Greenwald-Khanna sketch, the right 100 TB
    default (bounded memory per group vs exact percentile's full sort).

    Run here in the sketch's EXACT regime: with ``accuracy`` ≥ the
    group cardinality GK never compresses away rank information, so
    the result is the true discrete quantile — verified identical to
    DuckDB ``quantile_disc`` at sf0.001/0.01/0.1 and invariant to
    input partitioning (1 vs 32 partitions probed). At 100 TB you
    lower ``accuracy`` and accept rank error ≤ n/accuracy — same
    operator, tunable knob; the sketch's merge stays one shuffle of
    |groups|×O(accuracy) summaries either way."""
    li = read_table(spark, sf_dir, "lineitem")
    acc = 1_000_000  # > per-group row count at every test sf ⇒ exact
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.25, acc).alias("approx_q25_price"),
        F.percentile_approx("l_extendedprice", 0.75, acc).alias("approx_q75_price"),
    )


@register(
    "agg_collect",
    oracle="""
SELECT
  l_linenumber,
  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags,
  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
  COUNT(*) AS n
FROM lineitem
WHERE l_orderkey < 50
GROUP BY l_linenumber
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/collect_list (GenericUDAFCollectSet/List) — arrays
    sorted before emission per the §5.2 determinism rule, then joined
    to CSV strings (the harness canonicalizer can't sort list cells)."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return li.groupBy("l_linenumber").agg(
        F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias("flags"),
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_histogram",
    oracle="""
SELECT
  CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS bucket,
  COUNT(*) AS n,
  CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
  CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
FROM lineitem
GROUP BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram (histogram_numeric's heuristic
    buckets are engine-specific; fixed-width is the deterministic,
    scale-safe equivalent — single shuffle on ~O(buckets) keys)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 10000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").cast("double").alias("lo"),
            F.max("l_extendedprice").cast("double").alias("hi"),
        )
    )


# --- multi-group aggregates (rollup / cube / grouping sets) -----------------

_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus, 0 AS gid, COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
UNION ALL
SELECT l_returnflag, NULL, 1, COUNT(*), {sql_dsum('l_quantity')}
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT NULL, NULL, 3, COUNT(*), {sql_dsum('l_quantity')}
FROM lineitem
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH ROLLUP + GROUPING__ID.

    The oracle spells the rollup as UNION ALL of its grouping sets with
    Spark's grouping_id() bit convention (leftmost column = MSB), so no
    DuckDB GROUPING_ID convention risk enters the hash.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


_CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus, 0 AS gid, COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
UNION ALL
SELECT l_returnflag, NULL, 1, COUNT(*), {sql_dsum('l_quantity')}
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT NULL, l_linestatus, 2, COUNT(*), {sql_dsum('l_quantity')}
FROM lineitem GROUP BY l_linestatus
UNION ALL
SELECT NULL, NULL, 3, COUNT(*), {sql_dsum('l_quantity')}
FROM lineitem
"""


@register("agg_cube", oracle=_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... WITH CUBE (all 2^k grouping sets)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


_GSETS_ORACLE = f"""
SELECT l_returnflag, NULL AS l_linestatus, 1 AS gid, COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT NULL, l_linestatus, 2, COUNT(*), {sql_dsum('l_quantity')}
FROM lineitem GROUP BY l_linestatus
"""


@register("agg_grouping_sets", oracle=_GSETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))."""
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gsets_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, grouping_id() AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        FROM gsets_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_having",
    oracle=f"""
SELECT l_suppkey, {sql_dsum('l_quantity')} AS total_qty, COUNT(*) AS n_items
FROM lineitem
GROUP BY l_suppkey
HAVING {sql_dsum('l_quantity')} > 14000
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation filter (Filter above GroupBy)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            dsum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("total_qty") > 14000)
    )


@register(
    "agg_approx_ndv",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orderkey,
       COUNT(DISTINCT l_partkey) AS exact_partkey,
       TRUE AS ndv_orderkey_in_bound,
       TRUE AS ndv_partkey_in_bound
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_approx_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counts via HyperLogLog++
    (approx_count_distinct) — Hive's ndv / compute_stats sketch
    analog, and the cardinality-estimation primitive a 100 TB pipeline
    uses where exact COUNT(DISTINCT)'s shuffle is unaffordable.

    Derived oracle: raw HLL estimates are engine-specific, so the
    query emits the exact counts plus in-error-bound booleans for the
    estimates (documented 2% rsd, 4x headroom for small groups); the
    oracle checks the counts and expects every bound flag TRUE. The
    estimate magnitudes themselves are additionally bounded by
    tests/test_oracle_parity.py::test_approx_ndv_error. The approx and
    exact aggregations run as separate groupBys joined at the end —
    mixing approx and exact distinct in ONE agg forces an Expand
    multi-phase plan, measured 30x slower.
    """
    li = read_table(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("ndv_orderkey"),
        F.approx_count_distinct("l_partkey", 0.02).alias("ndv_partkey"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orderkey"),
        F.countDistinct("l_partkey").alias("exact_partkey"),
    )

    def in_bound(est, ex):
        return F.abs(F.col(est) - F.col(ex)) <= F.greatest(
            F.lit(0.08) * F.col(ex), F.lit(2.0)
        )

    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_orderkey",
        "exact_partkey",
        in_bound("ndv_orderkey", "exact_orderkey").alias(
            "ndv_orderkey_in_bound"
        ),
        in_bound("ndv_partkey", "exact_partkey").alias("ndv_partkey_in_bound"),
    )


@register(
    "agg_bitwise",
    oracle="""
SELECT l_returnflag,
       bit_and(l_linenumber) AS all_bits,
       bit_or(l_linenumber) AS any_bits,
       bit_xor(l_orderkey % 1024) AS xor_keys,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_deep_discount
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise / boolean aggregates (Hive 2.x GenericUDAFs bit_and /
    bit_or / bit_xor, bool_and aka every, bool_or aka any|some).
    Commutative+associative → perfect partial aggregation: map-side
    combine collapses each partition to one value per group before
    the shuffle, so bytes shuffled are O(groups), not O(rows)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("all_bits"),
        F.bit_or("l_linenumber").alias("any_bits"),
        F.bit_xor(F.col("l_orderkey") % 1024).alias("xor_keys"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
    )


@register(
    "agg_ngrams",
    oracle="""
WITH toks AS (
  SELECT string_split(lower(text), ' ') AS l
  FROM documents
), idx AS (
  SELECT l, unnest(generate_series(1, len(l) - 1)) AS i
  FROM toks
)
SELECT l[i] || ' ' || l[i + 1] AS bigram,
       COUNT(*) AS freq
FROM idx
GROUP BY bigram
ORDER BY freq DESC, bigram
LIMIT 20
""",
)
def agg_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k frequent n-grams over the corpus (Hive's ngrams() UDAF,
    GenericUDAFnGrams — estimates the k most frequent n-grams; this
    is the exact form, k=20, n=2).

    Shape: bigrams come from zip_with over the token array and its
    own 1-shifted slice — all map-side, ZERO shuffle before the count
    (the previous form paid a full window shuffle+sort on (doc, pos)
    just to pair adjacent tokens). The split() calls stay OUTSIDE the
    lambda on purpose: referencing the split inside it would let
    CollapseProject re-inline the tokenizer per element, O(tokens²)
    (the pathology documented at dedup._shingled).

    Scale: the only shuffle is the count, partitioned by bigram
    (zipf-skewed — AQE skew split handles the head; partial
    aggregation collapses the map side first), and top-20 is
    TakeOrderedAndProject, never a global sort."""
    d = read_table(spark, sf_dir, "documents")
    sp = "split(lower(text), ' ')"
    bigrams = F.expr(
        f"zip_with(slice({sp}, 1, size({sp}) - 1),"
        f" slice({sp}, 2, size({sp}) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "bigram")
        .limit(20)
    )


@register(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(38,4)) END), 0)::DOUBLE AS qty_F,
       COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(38,4)) END), 0)::DOUBLE AS qty_O,
       COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_F,
       COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_O
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — rows→columns rotation (Hive expresses this as the
    conditional-aggregate rewrite the oracle uses; Spark has it
    first-class via groupBy().pivot(col, values)).

    Passing the pivot values explicitly matters at scale: without
    them Spark runs an eager distinct-values job at plan time —
    an extra full scan. With them, the pivot is a single two-phase
    conditional aggregate, exactly as cheap as the CASE WHEN form."""
    li = read_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.coalesce(dsum("l_quantity"), F.lit(0.0)).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_F"),
        F.col("O_qty").alias("qty_O"),
        F.col("F_n").alias("n_F"),
        F.col("O_n").alias("n_O"),
    )


_CMS_D = 4  # sketch depth (hash rows)
_CMS_W = 64  # sketch width (buckets per row)
_CMS_KEYS = 20  # query keys: user_id < _CMS_KEYS


@register(
    "agg_count_min",
    oracle=f"""
WITH j AS (SELECT range AS j FROM range({_CMS_D})),
h AS (SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
sk AS (
  SELECT j.j,
         CAST('0x' || substr(h.h, CAST(1 + 8 * j.j AS INT), 8) AS BIGINT)
           % {_CMS_W} AS bucket,
         COUNT(*) AS c
  FROM h, j GROUP BY 1, 2
),
keys AS (
  SELECT DISTINCT user_id, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE user_id < {_CMS_KEYS}
),
est AS (
  SELECT k.user_id, MIN(s.c) AS cms_est
  FROM keys k CROSS JOIN j
  JOIN sk s ON s.j = j.j
   AND s.bucket = CAST('0x' || substr(k.h, CAST(1 + 8 * j.j AS INT), 8)
                       AS BIGINT) % {_CMS_W}
  GROUP BY 1
),
exact AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events
  WHERE user_id < {_CMS_KEYS} GROUP BY 1
)
SELECT e.user_id, e.exact_cnt, s.cms_est,
       s.cms_est >= e.exact_cnt AS overestimate_ok
FROM exact e JOIN est s USING (user_id)
""",
)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as a PORTABLE dataframe composition — the
    heavy-hitter frequency sketch (Hive ships one inside its stats
    collectors; Spark exposes count_min_sketch as an opaque binary).
    Building it from md5 bucket hashes instead makes every cell —
    and therefore every estimate — bit-identical across engines, so
    the oracle checks exact VALUES, not error-bound booleans: the
    d×w cell counts, the min-over-rows estimates, and the CMS
    guarantee est ≥ exact (emitted as overestimate_ok).

    Hash cost is ONE md5 per input row (not one per row), sliced
    into d=4 independent 32-bit bucket hashes from the 128-bit
    digest — the round-3 shape hashed after the d-way explode, so
    the dominant per-row cost grew 4x with d; slicing makes the
    scan-side work d-independent (STRESS round-4 note).

    Scale: the sketch IS the point — the build is one groupBy whose
    map-side partials collapse to ≤ d·w = 4·64 = 256 cells per task
    before the shuffle, regardless of input size; estimates join
    query keys against the ≤256-row sketch (broadcast). This is the
    frequency-stats pass a 100 TB pipeline runs where exact per-key
    counts would shuffle the world.
    """
    slice_bucket = F.expr(
        f"CAST(conv(substring(h, CAST(1 + 8 * j AS INT), 8), 16, 10)"
        f" AS BIGINT) % {_CMS_W}"
    )
    e = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .withColumn("h", F.md5(F.col("user_id").cast("string")))
    )
    js = F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("j")
    sketch = (
        e.select("h", js)
        .withColumn("bucket", slice_bucket)
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = e.filter(F.col("user_id") < _CMS_KEYS).distinct()
    est = (
        keys.select("user_id", "h", js)
        .withColumn("bucket", slice_bucket)
        .join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cms_est"))
    )
    exact = (
        e.filter(F.col("user_id") < _CMS_KEYS)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return exact.join(est, "user_id").select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_cnt")).alias("overestimate_ok"),
    )


_HLL_M = 64  # buckets (b = 6 bits)
_HLL_RANK_CAP = 40  # rank cap keeps 2^(cap-rank) sums exact in BIGINT
# alpha_64 * m^2 * 2^rank_cap, precomputed so both engines divide the
# identical double constant by the identical exact integer
_HLL_NUM = repr(0.709 * _HLL_M * _HLL_M * float(1 << _HLL_RANK_CAP))

_HLL_RANK_CASE = """CASE substr(TRIM(LEADING '0' FROM {h2}), 1, 1)
    WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
    WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
    ELSE 0 END"""


@register(
    "agg_hll_portable",
    oracle=f"""
WITH parts AS (
  SELECT l_returnflag,
         CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) AS BIGINT)
           % {_HLL_M} AS bucket,
         substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15) AS h2
  FROM lineitem
),
ranked AS (
  SELECT l_returnflag, bucket,
         LEAST(4 * (15 - length(TRIM(LEADING '0' FROM h2)))
               + {_HLL_RANK_CASE.format(h2='h2')} + 1, {_HLL_RANK_CAP}) AS rank
  FROM parts
),
mx AS (SELECT l_returnflag, bucket, MAX(rank) AS m FROM ranked GROUP BY 1, 2),
s AS (
  SELECT l_returnflag,
         SUM(1::BIGINT << ({_HLL_RANK_CAP} - m))
           + ({_HLL_M} - COUNT(*)) * (1::BIGINT << {_HLL_RANK_CAP}) AS s_int
  FROM mx GROUP BY 1
),
exact AS (
  SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_ndv
  FROM lineitem GROUP BY 1
)
SELECT e.l_returnflag, e.exact_ndv,
       {_HLL_NUM} / CAST(s.s_int AS DOUBLE) AS hll_est,
       ABS({_HLL_NUM} / CAST(s.s_int AS DOUBLE) - e.exact_ndv)
         <= 0.3 * e.exact_ndv AS in_bound
FROM exact e JOIN s ON e.l_returnflag = s.l_returnflag
""",
)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built as a PORTABLE dataframe composition (md5
    bucket + leading-zero rank), companion to agg_count_min: unlike
    approx_count_distinct's engine-private HLL++ registers
    (agg_approx_ndv, where only error bounds can be checked), every
    register value AND the final estimate here are bit-identical
    across engines, so the oracle pins exact values.

    Determinism of the harmonic mean — the delicate part: summing
    2^-M floats is order-dependent once exponents spread past the
    mantissa. Instead registers accumulate Σ 2^(cap−M) as EXACT
    BIGINTs (rank capped at 40 keeps 64 terms under 2^46), empty
    buckets contribute 2^cap, and the one double division
    alpha·m²·2^cap / S happens once, on identical operands, in both
    engines. Leading-zero rank is integer string math (nibble count +
    a 16-way CASE), no log2 float anywhere.

    Scale: map-side partials collapse to ≤ m = 64 registers per task
    before the shuffle — the mergeable-sketch property that lets a
    1000-executor NDV pass move kilobytes. The exact COUNT(DISTINCT)
    alongside is the oracle anchor; a 100 TB run would drop it and
    keep only the sketch side of the plan.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    hx = F.md5(F.col("l_orderkey").cast("string"))
    h2 = F.substring(hx, 3, 15)
    trimmed = F.expr("TRIM(LEADING '0' FROM h2)")
    rank = F.least(
        F.lit(4) * (F.lit(15) - F.length(trimmed))
        + F.expr(_HLL_RANK_CASE.format(h2="h2"))
        + F.lit(1),
        F.lit(_HLL_RANK_CAP),
    )
    parts = li.select(
        "l_returnflag",
        (F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint") % _HLL_M).alias(
            "bucket"
        ),
        h2.alias("h2"),
    ).select("l_returnflag", "bucket", rank.alias("rank"))
    mx = parts.groupBy("l_returnflag", "bucket").agg(F.max("rank").alias("m"))
    s = mx.groupBy("l_returnflag").agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RANK_CAP} - m)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << _HLL_RANK_CAP).cast("bigint")
        ).alias("s_int")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_ndv")
    )
    est = F.lit(float(_HLL_NUM)) / F.col("s_int").cast("double")
    return exact.join(s, "l_returnflag").select(
        "l_returnflag",
        "exact_ndv",
        est.alias("hll_est"),
        (F.abs(est - F.col("exact_ndv")) <= 0.3 * F.col("exact_ndv")).alias(
            "in_bound"
        ),
    )


@register(
    "agg_grouping_id",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() / GROUPING__ID over CUBE (Hive's virtual column
    that disambiguates "NULL because rolled up" from "NULL in the
    data" — the only reliable way to consume cube/rollup output).
    Spark's grouping_id() packs the flags big-endian in GROUP BY
    order, the same convention as standard SQL GROUPING(a, b); both
    are emitted so the oracle pins the bit order, not just the
    flags.

    Scale: same two-phase Expand + hash-agg plan as agg_cube — the
    virtual columns are free metadata on rows the cube already
    produces.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_mode",
    oracle="""
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS n
  FROM lineitem
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                               ORDER BY n DESC, l_quantity) AS rk
  FROM counts
)
SELECT l_returnflag, l_quantity AS mode_qty, n AS n_mode
FROM ranked WHERE rk = 1
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group — the most frequent l_quantity for
    each return flag `[upstream: Hive exposes no mode() UDAF; the
    standard rewrite is count-then-rank, which is also how Spark
    should run it at scale]`. Ties break to the smallest value so
    the answer is unique and engine-independent.

    Spark-first: the value-frequency aggregate shuffles once on
    (group, value) with map-side combine — the heavy reduction —
    then the rank window runs over the ALREADY-AGGREGATED frequency
    table (O(distinct values) rows, not O(rows)), partitioned by the
    group key. No collect, no per-group sort of raw data; the same
    two-stage shape DuckDB's mode() implements internally.
    """
    li = read_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("n_mode"),
        )
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS ndv_parts,
       COUNT(DISTINCT l_suppkey) AS ndv_supps
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation — Spark's
    bitmap_construct_agg / bitmap_count family `[upstream: the
    roaring-bitmap exact-distinct pattern Hive users reach for via
    UDFs; Spark 3.5+ ships it built in]`. COUNT(DISTINCT) expands
    every value through the shuffle; the bitmap form reduces each
    (group, 32k-bucket) to ONE fixed-size bitmap on the map side, so
    the shuffle moves O(groups × value-range/32768) bitmaps instead
    of O(rows) values — the difference between a 100 TB distinct
    count that fits and one that spills. Buckets partition the value
    space, so per-bucket cardinalities ADD; exactness (this is exact,
    not a sketch) is pinned by the plain COUNT(DISTINCT) oracle and
    by the pandas nunique property test.
    """
    li = read_table(spark, sf_dir, "lineitem")

    # one bitmap aggregation PER counted column: a joint
    # (part-bucket, supp-bucket) grouping would replicate each
    # part bit across every supp bucket it co-occurs with.
    # Built over DataFrame expressions — no session temp view, so
    # interleaved queries on the shared session cannot race on a
    # view name and nothing leaks into the catalog after return.
    def ndv(key: str, alias: str) -> DataFrame:
        buckets = li.groupBy(
            "l_returnflag",
            F.expr(f"bitmap_bucket_number({key})").alias("bkt"),
        ).agg(
            F.expr(f"bitmap_construct_agg(bitmap_bit_position({key}))").alias(
                "bm"
            )
        )
        return buckets.groupBy("l_returnflag").agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias(alias)
        )

    # exactness is pinned by the value oracle (plain COUNT(DISTINCT)
    # in DuckDB) and by the pandas nunique property test — no second
    # expanded-distinct pass here: at 100 TB running both would
    # defeat the point of the bitmap form
    return ndv("l_partkey", "ndv_parts").join(
        ndv("l_suppkey", "ndv_supps"), "l_returnflag"
    )


@register(
    "agg_string_agg",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, ', ' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation
GROUP BY n_regionkey
""",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / GROUP_CONCAT) — the
    Hive idiom is collect_list + sort + concat_ws, which is also the
    ONLY deterministic form on a distributed engine: collect order is
    partition-arrival order, so the sort inside the aggregate is what
    makes the result reproducible (and hashable cross-engine —
    DuckDB's string_agg ... ORDER BY is the same contract).

    Scale: a string aggregate's cost is the value payload, not the
    rows — per-group output grows with group size, so at 100 TB this
    belongs on bounded-cardinality dims (here: nations per region) or
    behind a top-k cut; the plan itself is one partial-agg groupBy.
    """
    n = read_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(
            F.array_sort(F.collect_list("n_name")), ", "
        ).alias("nations"),
        F.count(F.lit(1)).alias("n_nations"),
    )
