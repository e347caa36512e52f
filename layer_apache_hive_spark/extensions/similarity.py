"""Similarity search over embeddings (SURVEY.md §2.11).

embeddings.embedding is array<float>[64] (FIXTURES.md). Cosine math
is made bit-identical across engines by the decimal-dot trick:
per-element float→double widening (exact) and double products (IEEE-
deterministic), FLOOR-scaled to 1e-12 and accumulated as BIGINT
(order-independent
exact sum), one final cast to double. sqrt/mult/div on the results
are IEEE-exact, so no rounding is needed anywhere.

Tiers:
- ext_sim_topk:  brute-force top-k — the small-scale baseline and the
  correctness gate (oracle hash-match).
- ext_sim_ivf:   IVF-style bucketed top-k (coarse quantizer = the
  provided cluster label, nprobe=1) — the 100 TB shape: candidates
  per query scale with bucket size, not corpus size. Oracle-able
  because the bucket restriction is replayed in SQL.
- ext_sim_join:  threshold self-join (pairs with cosine ≥ θ).
- ext_sim_lsh:   random-hyperplane LSH bucketing + exact verify
  (rows-only: probabilistic recall), the scale path for sim_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register

# exact decimal dot product of two float arrays (see module docstring)
_DOT = """
(CAST(aggregate(
  zip_with({a}, {b},
           (x, y) -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12)
                     AS BIGINT)),
  CAST(0 AS BIGINT),
  (acc, v) -> acc + v
) AS DOUBLE) / 1e12)
"""
# Why FLOOR-scaled BIGINT: per-element double products are IEEE-
# deterministic in every engine, but casting them to DECIMAL rounds,
# and Spark (HALF_UP) vs DuckDB (half-even) disagree on exact ties —
# dyadic products DO land on 0.5e-12 ties (observed in testing).
# FLOOR has no tie, the bigint sum is exact and order-independent,
# and |term| ≤ 0.1·1e12 × 64 elements stays far inside int64.

_NORM = (
    "sqrt(" + _DOT.format(a="{v}", b="{v}") + ")"
)

_SQL_NORMS = """
norms AS (
  SELECT vec_id,
         sqrt(CAST(SUM(CAST(FLOOR(x * x * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
           AS nrm
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
  GROUP BY vec_id
)
"""


def _with_norm(df: DataFrame) -> DataFrame:
    """Attach the vector L2 norm as a row-level (no-shuffle) column."""
    return df.withColumn("nrm", F.expr(_NORM.format(v="embedding")))


def _pair_cosine() -> F.Column:
    dot = F.expr(_DOT.format(a="q_emb", b="c_emb"))
    return dot / (F.col("q_nrm") * F.col("c_nrm"))


@register(
    "ext_sim_topk",
    oracle=f"""
WITH {_SQL_NORMS},
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS qe, c.embedding AS ce
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 5 AND c.vec_id <> q.vec_id
),
dots AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(CAST(FLOOR(x * y * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM (SELECT query_id, neighbor_id,
               unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
        FROM pairs)
  GROUP BY query_id, neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         dot / (nq.nrm * nc.nrm) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id)
           AS rank
  FROM dots
  JOIN norms nq ON dots.query_id = nq.vec_id
  JOIN norms nc ON dots.neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
""",
)
def ext_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (k=10) for 5 query vectors.

    The query side is broadcast (tiny); candidates stream through
    without a shuffle until the per-query top-k (window over
    query_id). This is the exact baseline; ext_sim_ivf is the path
    that survives 100 TB.
    """
    emb = _with_norm(read_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id", "neighbor_id", _pair_cosine().alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10
    )


@register(
    "ext_sim_ivf",
    oracle=f"""
WITH {_SQL_NORMS},
pairs AS (
  SELECT q.vec_id AS query_id, q.label AS probe_label,
         c.vec_id AS neighbor_id, q.embedding AS qe, c.embedding AS ce
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 20 AND c.vec_id <> q.vec_id AND c.label = q.label
),
dots AS (
  SELECT query_id, probe_label, neighbor_id,
         CAST(SUM(CAST(FLOOR(x * y * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM (SELECT query_id, probe_label, neighbor_id,
               unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
        FROM pairs)
  GROUP BY query_id, probe_label, neighbor_id
),
ranked AS (
  SELECT query_id, probe_label, neighbor_id,
         dot / (nq.nrm * nc.nrm) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id)
           AS rank
  FROM dots
  JOIN norms nq ON dots.query_id = nq.vec_id
  JOIN norms nc ON dots.neighbor_id = nc.vec_id
)
SELECT query_id, probe_label, neighbor_id, cosine, rank
FROM ranked WHERE rank <= 5
""",
)
def ext_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-k: coarse quantizer = cluster label
    (nprobe=1), equi-join on the bucket key instead of a cross join.

    The 100 TB shape: per-query work = bucket size (corpus/k_clusters),
    the join shuffles on the bucket key, and recall is the IVF
    trade-off. Here the bucket assignment is given (embeddings.label),
    making the whole plan deterministic and oracle-checkable.
    """
    emb = _with_norm(read_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    pairs = F.broadcast(q).join(
        c,
        (F.col("probe_label") == F.col("c_label"))
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    scored = pairs.select(
        "query_id", "probe_label", "neighbor_id", _pair_cosine().alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 5
    )


_SIM_JOIN_THETA = 0.3

# Block count for the distributed all-pairs kernel. Each vector is
# replicated to B tasks (task (i,j), i<=j, over blocks by vec_id % B),
# so shuffle volume is n*B rows while compute parallelism is
# B(B+1)/2 tasks. At cluster scale pick B ≈ sqrt(total cores) — the
# classic replication/parallelism trade-off for distributed all-pairs.
_N_BLOCKS = 8


def _allpairs_cosine(emb: DataFrame, theta: float) -> DataFrame:
    """All pairs (vec_a < vec_b, cosine >= theta) via block-matrix
    applyInPandas: numpy does the pairwise dot products per block-pair
    task instead of an interpreted zip_with per pair (~100x faster),
    with the identical FLOOR-scaled-BIGINT math as the SQL oracle so
    values stay bit-identical across engines.

    Never materializes n^2 rows in the shuffle: only n*B replicated
    vectors move; pairs above theta are born inside the kernel.
    """
    import numpy as np
    import pandas as pd

    B = _N_BLOCKS

    base = emb.select(
        "vec_id",
        "embedding",
        F.pmod(F.col("vec_id"), F.lit(B)).cast("int").alias("blk"),
    )
    # a-side of tasks (blk, j>=blk); b-side of tasks (i<blk, blk).
    tagged = base.select(
        "vec_id",
        "embedding",
        F.explode(
            F.concat(
                F.expr(
                    f"transform(sequence(blk, {B - 1}),"
                    f" j -> struct(blk * {B} + j AS task, 'a' AS side))"
                ),
                F.expr(
                    "CASE WHEN blk = 0 THEN array() ELSE "
                    f"transform(sequence(0, blk - 1),"
                    f" i -> struct(i * {B} + blk AS task, 'b' AS side)) END"
                ),
            )
        ).alias("ts"),
    ).select("vec_id", "embedding", F.col("ts.task").alias("task"), F.col("ts.side").alias("side"))

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        task = int(pdf["task"].iloc[0])
        i, j = divmod(task, B)
        a_rows = pdf[pdf["side"] == "a"]
        b_rows = a_rows if i == j else pdf[pdf["side"] == "b"]
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
            {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
        )
        if len(a_rows) == 0 or len(b_rows) == 0:
            return empty

        ids_a = a_rows["vec_id"].to_numpy()
        ids_b = b_rows["vec_id"].to_numpy()
        ea = np.stack(a_rows["embedding"].to_numpy()).astype(np.float64)
        eb = np.stack(b_rows["embedding"].to_numpy()).astype(np.float64)
        # norm via the same FLOOR-scaled exact-int path as _SQL_NORMS
        na = np.sqrt(np.floor(ea * ea * 1e12).astype(np.int64).sum(1) / 1e12)
        nb = np.sqrt(np.floor(eb * eb * 1e12).astype(np.int64).sum(1) / 1e12)

        out_a, out_b, out_c = [], [], []
        chunk = max(1, (1 << 22) // max(1, eb.shape[0] * eb.shape[1]))
        for s in range(0, ea.shape[0], chunk):
            e = min(s + chunk, ea.shape[0])
            prod = ea[s:e, None, :] * eb[None, :, :]
            dots = np.floor(prod * 1e12).astype(np.int64).sum(2) / 1e12
            cos = dots / (na[s:e, None] * nb[None, :])
            if i == j:
                mask = (ids_a[s:e, None] < ids_b[None, :]) & (cos >= theta)
            else:
                mask = cos >= theta
            ra, rb = np.nonzero(mask)
            if len(ra) == 0:
                continue
            pa, pb = ids_a[s + ra], ids_b[rb]
            out_a.append(np.minimum(pa, pb))
            out_b.append(np.maximum(pa, pb))
            out_c.append(cos[ra, rb])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return tagged.groupBy("task").applyInPandas(
        score, schema="vec_a long, vec_b long, cosine double"
    )


@register(
    "ext_sim_join",
    oracle=f"""
WITH {_SQL_NORMS},
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS ae, b.embedding AS be
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
dots AS (
  SELECT vec_a, vec_b,
         CAST(SUM(CAST(FLOOR(x * y * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM (SELECT vec_a, vec_b, unnest(ae)::DOUBLE AS x, unnest(be)::DOUBLE AS y
        FROM pairs)
  GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
FROM dots
JOIN norms na ON dots.vec_a = na.vec_id
JOIN norms nb ON dots.vec_b = nb.vec_id
WHERE dot / (na.nrm * nb.nrm) >= {_SIM_JOIN_THETA}
""",
)
def ext_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity self-join: all pairs with cosine ≥ θ.

    Exact all-pairs via the block-matrix numpy kernel (see
    _allpairs_cosine): oracle-able at test scale; at 100 TB the
    identical verify step runs over LSH candidates instead
    (ext_sim_lsh) — the scoring/threshold code is shared shape.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    return _allpairs_cosine(emb, _SIM_JOIN_THETA)


@register("ext_sim_lsh", oracle=None)
def ext_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH similarity join: 8 fixed hyperplanes →
    8-bit bucket signature → bucket-equi-join → exact cosine verify.

    Rows-only: bucketing recall < 1 by construction. The hyperplanes
    are seed-fixed numpy vectors baked in as literals, so the Spark
    side is fully deterministic run-to-run. This is the sim-join shape
    that scales: candidates per bucket ≈ n/2^bits, never n².
    """
    import numpy as np

    planes = np.random.RandomState(42).standard_normal((8, 64))
    emb = _with_norm(read_table(spark, sf_dir, "embeddings"))

    sig_df = emb
    sig_expr = F.lit(0)
    for bi, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        sig_df = sig_df.withColumn(f"_plane_{bi}", arr)
        dot = F.expr(
            f"aggregate(zip_with(embedding, _plane_{bi}, (x, y) -> CAST(x AS DOUBLE) * y),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        sig_expr = sig_expr + F.when(dot > 0, F.lit(2**bi)).otherwise(0)
    sig_df = sig_df.select(
        "vec_id", "embedding", "nrm", sig_expr.alias("bucket")
    )

    a = sig_df.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "bucket",
    )
    b = sig_df.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select("vec_a", "vec_b", _pair_cosine().alias("cosine"))
    return scored.filter(F.col("cosine") >= 0.2)


@register(
    "ext_dedup_embedding",
    oracle=f"""
WITH {_SQL_NORMS},
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS ae, b.embedding AS be
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
dots AS (
  SELECT vec_a, vec_b,
         CAST(SUM(CAST(FLOOR(x * y * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM (SELECT vec_a, vec_b, unnest(ae)::DOUBLE AS x, unnest(be)::DOUBLE AS y
        FROM pairs)
  GROUP BY vec_a, vec_b
),
sims AS (
  SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
  FROM dots
  JOIN norms na ON dots.vec_a = na.vec_id
  JOIN norms nb ON dots.vec_b = nb.vec_id
  WHERE dot / (na.nrm * nb.nrm) >= 0.35
)
SELECT vec_b AS dup_vec_id, COUNT(*) AS n_near, MAX(cosine) AS max_cosine
FROM sims GROUP BY vec_b
""",
)
def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: vectors whose similarity to an
    earlier vector ≥ θ are flagged as duplicates (keep-lowest-id
    policy, the standard semantic-dedup sweep). Pair generation +
    scoring via the block-matrix numpy kernel (_allpairs_cosine)."""
    emb = read_table(spark, sf_dir, "embeddings")
    sims = _allpairs_cosine(emb, 0.35)
    return sims.groupBy(F.col("vec_b").alias("dup_vec_id")).agg(
        F.count(F.lit(1)).alias("n_near"),
        F.max("cosine").alias("max_cosine"),
    )
