"""UDF / UDAF / UDTF / TRANSFORM surface (SURVEY.md §2.9).

Hive extension points → Spark-native replacements:
- UDF (GenericUDF, Java jar)        → pandas_udf (Arrow-vectorized)
- UDAF (GenericUDAFResolver2)       → pandas_udf GROUPED_AGG
- UDTF + LATERAL VIEW (explode etc) → F.explode/posexplode/stack
  (Spark also accepts Hive's LATERAL VIEW syntax verbatim)
- TRANSFORM ... USING 'script'      → mapInPandas
- per-group table function          → groupBy().applyInPandas

UDFs are the slow path (JVM→Arrow→Python round trip): everything
here is Arrow-batched (pandas_udf / mapInPandas), never row-at-a-time
Python UDFs — the ~10-100× difference at 100 TB. Where the logic is
SQL-expressible the oracle twin recomputes it in SQL, so the UDF
machinery itself is value-checked, not just run.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register


# --- scalar UDF -------------------------------------------------------------


@F.pandas_udf(DoubleType())
def _discounted_charge(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: charge = price * (1-discount) * (1+tax)."""
    return price * (1.0 - discount) * (1.0 + tax)


@register(
    "udf_scalar",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
WHERE l_orderkey < 1000
""",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-batched) — the CREATE FUNCTION path.

    The same arithmetic is recomputed in plain SQL by the oracle, so
    the Arrow round trip is value-checked: per-element IEEE double ops
    are deterministic, no rounding needed.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _discounted_charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "fn_registered",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
  l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_orderkey < 500
""",
)
def fn_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-function registration: Hive ``CREATE [TEMPORARY] FUNCTION
    f AS 'com.example.UDF'`` ≙ ``spark.udf.register`` — the function
    becomes callable BY NAME from SQL text, which is the part
    udf_scalar's DataFrame path doesn't exercise.

    (Spark's literal ``CREATE TEMPORARY FUNCTION ... AS 'class'``
    statement loads JVM classes only; for Python the registration API
    is the native equivalent, and the registered name is usable in any
    ``spark.sql`` — including a second function reusing the first's
    result, as Hive users chain UDFs.)
    """
    spark.udf.register("discounted_charge", _discounted_charge)
    spark.udf.register("net_price", _net_price)
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("fnreg_lineitem")
    return spark.sql(
        """
        SELECT l_orderkey,
               l_linenumber,
               discounted_charge(l_extendedprice, l_discount, l_tax) AS charge,
               net_price(l_extendedprice, l_discount) AS net_price
        FROM fnreg_lineitem
        WHERE l_orderkey < 500
        """
    )


@F.pandas_udf(DoubleType())
def _net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Second registered UDF so the SQL text exercises >1 name."""
    return price * (1.0 - discount)


@register(
    "fn_macro",
    oracle="""
SELECT o_orderkey,
       o_orderkey % 10 AS bucket,
       CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS prio_rank,
       (CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        * (100 - ((o_orderkey % 10) % 7))) // 100 AS discounted_cents
FROM orders
WHERE o_orderkey < 2000
""",
)
def fn_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ``CREATE TEMPORARY MACRO name(args) expr`` [upstream:
    Hive ql macro support (CreateMacroDesc); public-knowledge
    reconstruction, SURVEY.md §0] — a named SQL expression expanded
    at plan time, the lightweight sibling of a JVM UDF.

    Spark-first mapping: SQL UDFs (``CREATE TEMPORARY FUNCTION f(x T)
    RETURNS T RETURN expr``, Spark 3.5+). Same contract as a Hive
    macro: session-scoped, pure SQL body, callable by name from any
    query — and because the body is a Catalyst expression it inlines
    into whole-stage codegen (zero UDF call overhead; a plan-time
    rewrite, exactly what Hive's macro expansion does).

    Three macros, chained (the third calls arithmetic on another's
    output domain); the oracle replays the expanded expressions
    inline, proving expansion is semantically invisible. All outputs
    integer-exact (FLOOR-scaled cents, integer div).
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_bucket(k BIGINT) "
        "RETURNS BIGINT RETURN k % 10"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION prio_rank(p STRING) "
        "RETURNS INT RETURN CAST(substring(p, 1, 1) AS INT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION discounted_cents"
        "(price DOUBLE, pct BIGINT) RETURNS BIGINT "
        "RETURN CAST(FLOOR(price * 100) AS BIGINT) * (100 - pct) div 100"
    )
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("macro_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               order_bucket(o_orderkey) AS bucket,
               prio_rank(o_orderpriority) AS prio_rank,
               discounted_cents(o_totalprice, order_bucket(o_orderkey) % 7)
                 AS discounted_cents
        FROM macro_orders
        WHERE o_orderkey < 2000
        """
    )


# --- grouped-agg UDAF -------------------------------------------------------


@F.pandas_udf(DoubleType())
def _decimal_mean(v: pd.Series) -> float:
    """Order-stable mean: sum in extended precision then one divide.

    pandas' float64 sum over a partition could differ from DuckDB's;
    summing via Python ints of scaled values keeps it exact (the UDAF
    analog of functions.numeric.davg).
    """
    scaled = (v * 10_000).round().astype("int64")
    return float(int(scaled.sum()) / 10_000) / len(v)


@register(
    "udaf_grouped",
    oracle="""
SELECT
  user_id,
  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / COUNT(value) AS mean_value
FROM events
GROUP BY user_id
""",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf — the GenericUDAFResolver2 path."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(_decimal_mean("value").alias("mean_value"))


# --- UDTF / LATERAL VIEW ----------------------------------------------------


@register(
    "udtf_explode",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 100
""",
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode() — one output row per array element.

    Runs through Spark SQL's Hive-compatible LATERAL VIEW syntax to
    exercise the literal HiveQL surface.
    """
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, token
        FROM udtf_docs
        LATERAL VIEW explode(split(text, ' ')) t AS token
        """
    )


@register(
    "udtf_posexplode",
    oracle="""
SELECT doc_id,
       CAST(unnest(range(0, len(toks))) AS INTEGER) AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 100)
""",
)
def udtf_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — element + 0-based position (oracle: WITH ORDINALITY)."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))


@register(
    "udtf_stack",
    oracle="""
SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS metric_value FROM supplier
UNION ALL
SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier
""",
)
def udtf_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, ...) — rows from columns (unpivot); oracle = UNION ALL."""
    s = read_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.expr(
            "stack(2, 'acctbal', s_acctbal, 'nationkey', CAST(s_nationkey AS DOUBLE)) "
            "AS (metric, metric_value)"
        ),
    )


@register(
    "udtf_inline",
    oracle="""
SELECT r_regionkey, 'lo' AS bound_kind, r_regionkey * 10 AS bound FROM region
UNION ALL
SELECT r_regionkey, 'hi', r_regionkey * 10 + 9 FROM region
""",
)
def udtf_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array(struct(...))) — explode an array of structs."""
    r = read_table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.inline(
            F.array(
                F.struct(
                    F.lit("lo").alias("bound_kind"),
                    (F.col("r_regionkey") * 10).alias("bound"),
                ),
                F.struct(
                    F.lit("hi").alias("bound_kind"),
                    (F.col("r_regionkey") * 10 + 9).alias("bound"),
                ),
            )
        ),
    )


# --- grouped-map / TRANSFORM ------------------------------------------------


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group z-score via exact integer accumulation (deterministic).

    Hot path: this runs once PER GROUP (one Arrow batch each), so
    per-call constant cost is the whole game. Sums run in int64 numpy
    (exact, ~100x faster than python-object bignums) whenever the
    worst-case accumulation provably fits; the object-dtype fallback
    keeps correctness for adversarial value ranges.
    """
    import numpy as np

    sv = (pdf["value"].to_numpy() * 10_000).round().astype("int64")
    n = sv.size
    mx = int(np.abs(sv).max()) if n else 0
    if n and mx * mx <= (2**63 - 1) // max(n, 1):
        tot = int(sv.sum())
        sum_sq = int((sv * sv).sum())
    else:  # exact fallback for huge magnitudes: python ints
        scaled = pd.Series(sv, copy=False).astype(object)
        tot = int(scaled.sum())
        sum_sq = int((scaled**2).sum())
    mean = tot / 10_000 / n
    var = sum_sq / 10_000**2 / n - mean * mean
    std = var**0.5
    out = pdf[["event_id", "user_id", "value"]].copy()
    out["zscore"] = 0.0 if std == 0 else (pdf["value"] - mean) / std
    out["zscore"] = out["zscore"].round(6)
    return out


@register(
    "udtf_grouped_map",
    oracle="""
WITH scaled AS (
  SELECT event_id, user_id, value,
         CAST(round(value * 10000) AS BIGINT) AS sv
  FROM events
), stats AS (
  SELECT user_id,
         COUNT(*) AS n,
         (CAST(SUM(sv) AS DOUBLE) / 10000) / COUNT(*) AS mean,
         (CAST(SUM(sv * sv) AS DOUBLE) / 100000000) / COUNT(*) AS msq
  FROM scaled GROUP BY user_id
)
SELECT s.event_id, s.user_id, s.value,
       CASE WHEN sqrt(msq - mean * mean) = 0 THEN 0.0
            ELSE round((s.value - mean) / sqrt(msq - mean * mean), 6)
       END AS zscore
FROM scaled s JOIN stats USING (user_id)
""",
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map (per-group table function).

    Oracle-able because _zscore_group accumulates on exact scaled
    integers (sums stay < 2^53, so int→double is exact in both
    engines and the division order is replicated literally in the
    SQL twin). Scale note: one Arrow batch per group — groups are
    per-user event slices (bounded); never applyInPandas over an
    unbounded group.

    Parallelism: the dominant cost is per-group Python invocation, so
    wall time scales with groups-per-core. An EXPLICIT hash
    repartition on the group key pins the fan-out (AQE otherwise
    coalesces the small shuffle to ~3 partitions and serializes tens
    of thousands of group calls onto 3 cores); it satisfies the
    grouped-map's required distribution, so no second shuffle is
    inserted. Same fix a 1000-executor cluster needs, where the
    partition count comes from spark.sql.shuffle.partitions.
    """
    e = read_table(spark, sf_dir, "events")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        e.repartition(nparts, "user_id")
        .groupBy("user_id")
        .applyInPandas(
            _zscore_group,
            schema="event_id long, user_id long, value double, zscore double",
        )
    )


def _tokenize_batches(it):
    """mapInPandas worker: tokenize documents, emit (doc_id, token, token_len)."""
    for pdf in it:
        toks = pdf["text"].str.split(" ")
        out = pdf[["doc_id"]].copy()
        out["tokens"] = toks
        out = out.explode("tokens", ignore_index=True)
        out = out.rename(columns={"tokens": "token"})
        out["token_len"] = out["token"].str.len().astype("int64")
        yield out


@register(
    "transform_script",
    oracle="""
SELECT doc_id, token, length(token) AS token_len
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id < 100
)
""",
)
def transform_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM ... USING 'script' stand-in: mapInPandas streaming the
    table through Python in Arrow batches (row-count-changing allowed),
    value-checked against the SQL tokenization."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", "text").mapInPandas(
        _tokenize_batches, schema="doc_id long, token string, token_len long"
    )


@register(
    "transform_script_using",
    oracle="""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source
FROM documents WHERE doc_id < 200
""",
)
def transform_script_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's literal script-streaming surface (ScriptOperator.java):
    ``SELECT TRANSFORM(cols) USING '<cmd>' AS (...)`` — Spark SQL
    supports the syntax verbatim (ROW FORMAT DELIMITED, tab-separated
    pipe through the child process). Identity transform via ``cat`` so
    the result is oracle-checkable; TRANSFORM output columns are
    STRING by contract, mirrored with CAST in the twin.

    Scale note: one child process per task streaming stdin/stdout —
    prefer mapInPandas (transform_script) for anything hot; this row
    exists for surface parity.
    """
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT TRANSFORM(doc_id, lang, source) USING 'cat' "
        "AS (doc_id STRING, lang STRING, source STRING) "
        "FROM documents WHERE doc_id < 200"
    )


@register(
    "udtf_json_tuple",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_val,
       json_extract_string(props, '$.missing') AS missing_val
FROM events
WHERE event_id < 1500
""",
)
def udtf_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple — Hive's multi-key JSON UDTF via its literal
    LATERAL VIEW syntax (one parse per row for N keys, vs N parses
    with repeated get_json_object — the same reason it exists in
    Hive)."""
    e = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 1500)
    e.createOrReplaceTempView("jt_events")
    return spark.sql(
        """
        SELECT event_id, k_val, missing_val
        FROM jt_events
        LATERAL VIEW json_tuple(props, 'k', 'missing') jt AS k_val, missing_val
        """
    )


@register(
    "udtf_explode_outer",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) >= 9) AS longtoks
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
       unnest(CASE WHEN len(longtoks) = 0 THEN [NULL] ELSE longtoks END) AS token
FROM t
""",
)
def udtf_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER explode — rows with empty arrays survive
    with a NULL element (Hive's OUTER modifier). The filtered token
    array is empty for many docs, so the OUTER semantic is load-
    bearing, not vacuous; the oracle emulates it by substituting
    [NULL] for empty lists."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    d.createOrReplaceTempView("eo_docs")
    return spark.sql(
        """
        SELECT doc_id, token
        FROM eo_docs
        LATERAL VIEW OUTER explode(
          filter(split(text, ' '), x -> length(x) >= 9)
        ) t AS token
        """
    )


@register(
    "udtf_explode_map",
    oracle="""
SELECT o_orderkey, 'priority' AS k, o_orderpriority AS v
FROM orders WHERE o_orderkey < 1000
UNION ALL
SELECT o_orderkey, 'status' AS k, o_orderstatus AS v
FROM orders WHERE o_orderkey < 1000
""",
)
def udtf_explode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode over a MAP column (GenericUDTFExplode's
    map branch emits key+value per row — the Hive form for
    attribute-bag tables). The map is built in-row with map();
    explode yields one (k, v) row per entry, keys in map order."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    m = F.create_map(
        F.lit("priority"), F.col("o_orderpriority"),
        F.lit("status"), F.col("o_orderstatus"),
    )
    return o.select("o_orderkey", F.explode(m).alias("k", "v"))
