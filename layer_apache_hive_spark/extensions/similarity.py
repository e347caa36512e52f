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
- ext_sim_lsh:   random-hyperplane LSH bucketing + exact verify,
  the scale path for sim_join — recall < 1 by design, yet fully
  value-oracled (round 3): md5-derived integer hyperplanes, integer
  dot signs, FLOOR-scaled verify.
- ext_sim_ivfpq: PQ codes + ADC + exact rerank — integer-exact code
  assignment and tables, value-oracled end to end (round 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register

_EMB_DIM = 64  # fixture embedding dim (FIXTURES.md)


def _stack_f64(col, dim: int = _EMB_DIM):
    """np.stack of a pandas embedding column as float64, totalized
    for the empty case (np.stack raises on zero arrays; an empty
    corpus must yield a (0, dim) matrix so the downstream BLAS /
    einsum shapes stay consistent). Used on the driver-side
    toPandas() fast paths — executor funcs guard len(pdf) instead."""
    import numpy as np

    arrs = col.to_numpy()
    if len(arrs) == 0:
        return np.zeros((0, dim), dtype=np.float64)
    return np.stack(arrs).astype(np.float64)

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


#: production IVF probe width — the knob the round-7 verdict asked to
#: promote from a stress-harness aside into a tested, oracled query.
_IVF_NPROBE = 2

# Shared label-centroid CTEs (exact decimal math, module docstring):
# per-dim FLOOR-scaled mean per label + centroid norms. Used by the
# nprobe-IVF and SemDeDup oracles.
_SQL_CENTROIDS = """
dims AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         CAST(SUM(CAST(FLOOR(x * 1e12) AS BIGINT)) AS DOUBLE) / 1e12
           / CAST(COUNT(*) AS DOUBLE) AS cval
  FROM dims GROUP BY label, pos
),
cnorm AS (
  SELECT label,
         sqrt(CAST(SUM(CAST(FLOOR(cval * cval * 1e12) AS BIGINT)) AS DOUBLE)
              / 1e12) AS cnrm
  FROM cent GROUP BY label
)
"""


def _centroid_frames(emb: DataFrame):
    """(dims, cent, cnorm) — the Spark twins of _SQL_CENTROIDS.
    dims is the exploded (vec_id, label, pos, x) relation; cent the
    per-(label, pos) FLOOR-scaled mean; cnorm the per-label centroid
    norm. One keyed shuffle over n·d rows (map-side sum-combined);
    cent/cnorm are K·d / K rows — broadcast-sized by construction."""
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "xf"),
    ).select(
        "vec_id", "label", "pos", F.col("xf").cast("double").alias("x")
    )
    cent = dims.groupBy("label", "pos").agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(x * 1e12) AS BIGINT)) AS DOUBLE) / 1e12"
            " / CAST(COUNT(*) AS DOUBLE)"
        ).alias("cval")
    )
    cnorm = cent.groupBy("label").agg(
        F.expr(
            "sqrt(CAST(SUM(CAST(FLOOR(cval * cval * 1e12) AS BIGINT))"
            " AS DOUBLE) / 1e12)"
        ).alias("cnrm")
    )
    return dims, cent, cnorm


@register(
    "ext_sim_ivf_nprobe",
    oracle=f"""
WITH {_SQL_NORMS},
{_SQL_CENTROIDS.strip().rstrip()},
qc AS (
  SELECT d.vec_id AS query_id, c.label,
         CAST(SUM(CAST(FLOOR(d.x * c.cval * 1e12) AS BIGINT)) AS DOUBLE)
           / 1e12 AS dot
  FROM dims d JOIN cent c ON d.pos = c.pos
  WHERE d.vec_id < 20
  GROUP BY d.vec_id, c.label
),
probes AS (
  SELECT query_id, label, pr AS probe_rank
  FROM (SELECT query_id, qc.label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY dot / cn.cnrm DESC, qc.label) AS pr
        FROM qc JOIN cnorm cn ON qc.label = cn.label)
  WHERE pr <= {_IVF_NPROBE}
),
pairs AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         q.embedding AS qe, c.embedding AS ce
  FROM probes p
  JOIN embeddings c ON c.label = p.label AND c.vec_id <> p.query_id
  JOIN embeddings q ON q.vec_id = p.query_id
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
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= 5
""",
)
def ext_sim_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k at nprobe={_IVF_NPROBE}: the PRODUCTION tier.

    Unlike ext_sim_ivf (nprobe=1, cell = the given label), this is
    the full IVF protocol: centroids are computed FROM the data (one
    keyed shuffle over exploded dims, map-side sum-combined), each
    query ranks the K centroids by cosine and probes its top-2 cells,
    and only vectors in probed cells are exactly scored. nprobe is
    the recall/cost dial — the clustered-fixture gate measures
    nprobe 1->2 isotropic recall 0.12->0.28 (STRESS.json), so the
    production knob is a tested query, not a harness aside.

    100 TB shape: the centroid pass is one groupBy over n*d exploded
    dims (partial aggregation makes it a map-side sum + K*d-row
    reduce); query->centroid scoring broadcasts the K*d centroid
    table (tiny by construction); the candidate join shuffles on the
    cell key, so per-query work is nprobe/K of the corpus, never a
    cross join. All arithmetic is the FLOOR-scaled BIGINT decimal-dot
    (module docstring), so centroid values, probe ranking, and final
    cosines are bit-identical to the DuckDB oracle.
    """
    emb = _with_norm(read_table(spark, sf_dir, "embeddings"))
    dims, cent, cnorm = _centroid_frames(emb)
    qd = dims.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("x").alias("qx")
    )
    qc = (
        qd.join(F.broadcast(cent), "pos")
        .groupBy("query_id", "label")
        .agg(
            F.expr(
                "CAST(SUM(CAST(FLOOR(qx * cval * 1e12) AS BIGINT))"
                " AS DOUBLE) / 1e12"
            ).alias("dot")
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        (F.col("dot") / F.col("cnrm")).desc(), F.col("label").asc()
    )
    probes = (
        qc.join(F.broadcast(cnorm), "label")
        .withColumn("probe_rank", F.row_number().over(wq))
        .filter(F.col("probe_rank") <= _IVF_NPROBE)
        .select("query_id", "label")
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    pairs = F.broadcast(probes.join(q, "query_id")).join(
        c,
        (F.col("label") == F.col("c_label"))
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    scored = pairs.select(
        "query_id", "neighbor_id", _pair_cosine().alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 5
    )


#: SemDeDup within-cluster similarity threshold (the paper sweeps
#: this dial; 0.35 puts the fixture's within-cluster pair tail — max
#: cosine ≈ 0.47 — on both sides of the cut, so the keep-policy and
#: the threshold are BOTH exercised at every tested sf).
_SEMDEDUP_TAU = 0.35


def _semdedup_oracle(rel: str = "embeddings", extra_ctes: str = "") -> str:
    """The DuckDB SemDeDup twin, parameterized on the (vec_id, label,
    embedding) relation so the same oracle replays over the fixture
    label (rel=embeddings) or a learned-cell relabeling (r9)."""
    cents = _SQL_CENTROIDS.strip().replace(
        "FROM embeddings", f"FROM {rel}"
    )
    return f"""
WITH {extra_ctes}{_SQL_NORMS.strip()},
{cents},
c2c AS (
  SELECT d.vec_id,
         CAST(SUM(CAST(FLOOR(d.x * c.cval * 1e12) AS BIGINT)) AS DOUBLE)
           / 1e12 AS cdot
  FROM dims d JOIN cent c ON d.label = c.label AND d.pos = c.pos
  GROUP BY d.vec_id
),
cc AS (
  SELECT e.vec_id, e.label,
         c2c.cdot / (n.nrm * cn.cnrm) AS cent_cos
  FROM {rel} e
  JOIN c2c ON e.vec_id = c2c.vec_id
  JOIN norms n ON e.vec_id = n.vec_id
  JOIN cnorm cn ON e.label = cn.label
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         a.embedding AS qe, b.embedding AS ce
  FROM {rel} a JOIN {rel} b
    ON a.label = b.label AND a.vec_id < b.vec_id
),
pdots AS (
  SELECT ia, ib,
         CAST(SUM(CAST(FLOOR(x * y * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM (SELECT ia, ib,
               unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
        FROM pairs)
  GROUP BY ia, ib
),
psim AS (
  SELECT ia, ib
  FROM pdots
  JOIN norms na ON pdots.ia = na.vec_id
  JOIN norms nb ON pdots.ib = nb.vec_id
  WHERE dot / (na.nrm * nb.nrm) >= {_SEMDEDUP_TAU}
),
losers AS (
  SELECT DISTINCT CASE WHEN ca.cent_cos > cb.cent_cos THEN p.ia
                       WHEN cb.cent_cos > ca.cent_cos THEN p.ib
                       ELSE greatest(p.ia, p.ib) END AS vec_id
  FROM psim p
  JOIN cc ca ON p.ia = ca.vec_id
  JOIN cc cb ON p.ib = cb.vec_id
),
ndups AS (
  SELECT vec_id, COUNT(*) AS n
  FROM (SELECT ia AS vec_id FROM psim
        UNION ALL SELECT ib AS vec_id FROM psim)
  GROUP BY vec_id
)
SELECT cc.vec_id, cc.label, cc.cent_cos,
       COALESCE(ndups.n, 0) AS n_dups,
       losers.vec_id IS NULL AS kept
FROM cc
LEFT JOIN ndups ON cc.vec_id = ndups.vec_id
LEFT JOIN losers ON cc.vec_id = losers.vec_id
"""


@register("ext_dedup_semantic", oracle=_semdedup_oracle())
def ext_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication bounded by clustering — pairwise cosine is computed
    ONLY within a cluster (the coarse cells, here the label column),
    and within any pair above tau the member CLOSER to the cluster
    centroid is dropped (the paper's keep-policy: redundancy lives
    near the centroid; the survivor is the more marginal, more
    informative point). Emits the full per-vector audit relation:
    centroid cosine, duplicate-pair degree, and the kept verdict.

    vs ext_dedup_embedding (the all-pairs block kernel): this is the
    100 TB SHAPE — candidate generation is an equi-join on the
    cluster key, so per-task work is O(cluster²) with cluster size
    a k-means dial (the paper uses k ≈ √n · c), never O(corpus²).
    The centroid pass is the shared _centroid_frames kernel (one
    keyed shuffle over exploded dims); centroid-cosine ranking uses
    the same FLOOR-scaled decimal dot as every similarity oracle, so
    the drop decision — a strict comparison between two derived
    doubles — is bit-identical in both engines (ties: identical
    centroid cosines drop the higher vec_id).

    The production coarse quantizer is the LEARNED variant,
    ext_dedup_semantic_learned (r9): same kernel, cells from one
    Lloyd assignment at k ≈ √n instead of the fixture label.
    """
    emb = _with_norm(read_table(spark, sf_dir, "embeddings"))
    return _semdedup_frame(emb)


def _semdedup_frame(emb: DataFrame) -> DataFrame:
    """The SemDeDup kernel over an embedding frame carrying
    (vec_id, label, embedding, nrm) — ``label`` is the coarse cell
    (fixture label or learned cluster id).

    r13 optimization (guide §4.2): the centroid pass and the
    within-cell pairwise cosine run as ONE grouped-by-cell
    applyInPandas kernel — each task receives its cell's vectors once
    and computes the centroid, every member's centroid cosine, and
    the over-tau pair list with blocked numpy (the paper's own
    per-cluster-matmul shape). The previous form shuffled the
    exploded n·d dims relation for the centroid pass AND self-joined
    the corpus on the cell key (cluster²·d interpreted zip_with
    lambda evals); this moves each embedding across the Python
    boundary once and emits only model-sized outputs. Every float op
    replicates the JVM expressions bit-for-bit: FLOOR-scaled int64
    sums for dots/norms/centroids, the same left-associated multiply
    chains, the same IEEE divisions — the value oracle is unchanged."""
    tau = _SEMDEDUP_TAU
    label_dt = dict(emb.dtypes)["label"]

    def cell_kernel(key, pdf):
        import numpy as np
        import pandas as pd

        lab = key[0]
        n = len(pdf)
        if n == 0:  # defensive: applyInPandas never emits empty groups
            return pd.DataFrame(
                {"label": [], "ia": [], "ib": [], "val": []}
            ).astype({"ia": "int64", "ib": "int64", "val": "float64"})
        ids = pdf["vec_id"].to_numpy()
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        out = []
        with np.errstate(divide="ignore", invalid="ignore"):
            # centroid: cval = (Σ FLOOR(x·1e12)::int64 / 1e12) / n —
            # the _centroid_frames expression, exact int accumulation
            S = np.floor(E * 1e12).astype(np.int64).sum(axis=0)
            cval = (S.astype(np.float64) / 1e12) / float(n)
            cnrm = float(
                np.sqrt(
                    np.floor(cval * cval * 1e12)
                    .astype(np.int64)
                    .sum()
                    / 1e12
                )
            )
            cdot = (
                np.floor(E * cval[None, :] * 1e12)
                .astype(np.int64)
                .sum(axis=1)
                / 1e12
            )
            out.append(
                pd.DataFrame(
                    {
                        "label": lab,
                        "ia": ids.astype("int64"),
                        "ib": np.int64(-1),
                        "val": cdot / (nrm * cnrm),
                    }
                )
            )
            # pairwise: FLOOR((x·y)·1e12)::int64 summed — the _DOT
            # expression; row blocks bound the (B, n, d) intermediate
            blk_rows = max(1, 33_000_000 // (max(n, 1) * E.shape[1] * 8))
            for i0 in range(0, n, blk_rows):
                blk = E[i0 : i0 + blk_rows]
                P = (
                    np.floor(blk[:, None, :] * E[None, :, :] * 1e12)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                cos = (P / 1e12) / (
                    nrm[i0 : i0 + blk_rows, None] * nrm[None, :]
                )
                iu, ju = np.nonzero(cos >= tau)
                ga, gb = ids[iu + i0], ids[ju]
                keep = ga < gb
                if keep.any():
                    out.append(
                        pd.DataFrame(
                            {
                                "label": lab,
                                "ia": ga[keep].astype("int64"),
                                "ib": gb[keep].astype("int64"),
                                "val": 0.0,
                            }
                        )
                    )
        return pd.concat(out, ignore_index=True)

    kern = (
        emb.select("vec_id", "label", "embedding", "nrm")
        .groupBy("label")
        .applyInPandas(
            cell_kernel,
            f"label {label_dt}, ia long, ib long, val double",
        )
        .localCheckpoint(eager=False)  # feeds cc, psim, ndups, losers
    )
    cc = kern.filter(F.col("ib") == -1).select(
        F.col("ia").alias("vec_id"),
        "label",
        F.col("val").alias("cent_cos"),
    )
    psim = kern.filter(F.col("ib") >= 0).select("ia", "ib")
    ca = cc.select(
        F.col("vec_id").alias("ia"), F.col("cent_cos").alias("cc_a")
    )
    cb = cc.select(
        F.col("vec_id").alias("ib"), F.col("cent_cos").alias("cc_b")
    )
    losers = (
        psim.join(ca, "ia")
        .join(cb, "ib")
        .select(
            F.when(F.col("cc_a") > F.col("cc_b"), F.col("ia"))
            .when(F.col("cc_b") > F.col("cc_a"), F.col("ib"))
            .otherwise(F.greatest("ia", "ib"))
            .alias("vec_id")
        )
        .distinct()
    )
    ndups = (
        psim.select(F.col("ia").alias("vec_id"))
        .unionAll(psim.select(F.col("ib").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cc.join(ndups, "vec_id", "left")
        .join(
            losers.withColumn("is_loser", F.lit(True)), "vec_id", "left"
        )
        .select(
            "vec_id",
            "label",
            "cent_cos",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_dups"),
            F.coalesce(~F.col("is_loser"), F.lit(True)).alias("kept"),
        )
    )


#: FLOOR scale for the learned-quantizer Lloyd assignment — the
#: ext_emb_kmeans_step convention: pure-BIGINT distances, no ties
_SEM_KM_SCALE = 1_000_000

_LEARNED_CELL_CTES = f"""
ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * {_SEM_KM_SCALE}) AS BIGINT) AS xi
  FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)
),
kk AS (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) AS k FROM embeddings),
seeds AS (
  SELECT vec_id AS cluster_id, dim, xi AS ci FROM ex, kk WHERE vec_id < kk.k
),
dd AS (
  SELECT e.vec_id, s.cluster_id, SUM((e.xi - s.ci) * (e.xi - s.ci)) AS d2
  FROM ex e JOIN seeds s USING (dim) GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster_id) AS rn
    FROM dd) WHERE rn = 1
),
emb2 AS (
  SELECT e.vec_id, a.cluster_id AS label, e.embedding
  FROM embeddings e JOIN assign a USING (vec_id)
),
"""


def _lloyd_cells(emb: DataFrame, k: int) -> DataFrame:
    """(vec_id, cluster_id): one BIGINT-exact Lloyd assignment to the
    k deterministic seeds (vec_id < k) — the ext_emb_kmeans_step
    kernel reused as a coarse quantizer. Seeds broadcast (k rows);
    distances are a k-way map-side fan-out + one groupBy(vec_id)
    min(struct) — no window, partial-aggregated."""
    scale = f"CAST(FLOOR(CAST(x AS DOUBLE) * {_SEM_KM_SCALE}) AS BIGINT)"
    sv = emb.select(
        "vec_id", F.expr(f"transform(embedding, x -> {scale})").alias("sv")
    )
    seeds = sv.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster_id"), F.col("sv").alias("sc")
    )
    d2 = F.expr(
        "aggregate(zip_with(sv, sc, (x, c) -> x - c), 0L,"
        " (acc, dx) -> acc + dx * dx)"
    )
    return (
        sv.crossJoin(F.broadcast(seeds))
        .withColumn("d2", d2)
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cluster_id")).alias("b"))
        .select("vec_id", F.col("b.cluster_id").alias("cluster_id"))
    )


@register(
    "ext_dedup_semantic_learned",
    oracle=_semdedup_oracle("emb2", _LEARNED_CELL_CTES),
)
def ext_dedup_semantic_learned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup at production k (r8 verdict task 3): the SAME
    within-cell dedup kernel as ext_dedup_semantic, but the coarse
    cells come from one Lloyd assignment at k = ⌈√n⌉ (the paper's
    k ≈ √n·c dial, Abbas et al. 2023 §3) instead of the fixture's
    label column — the composition a real pipeline runs, since no
    100 TB corpus arrives pre-labeled.

    The quantizer is the ext_emb_kmeans_step assignment kernel
    (deterministic vec_id<k seeds, FLOOR-scaled pure-BIGINT
    distances, min(struct) argmin → engine-exact cells, which is
    what lets DuckDB replay the whole composition value-for-value).
    n is read once as a metadata scalar to size k; everything else
    is the proven SemDeDup plan keyed on the learned cell id:
    per-task pair work is O(cell²) with cell ≈ √n rows, so TOTAL
    pair work is O(n^1.5) — the paper's own scale shape.
    """
    import math

    emb = _with_norm(read_table(spark, sf_dir, "embeddings"))
    k = int(math.ceil(math.sqrt(emb.count())))
    cells = _lloyd_cells(emb, k)
    relabeled = emb.select("vec_id", "embedding", "nrm").join(
        cells, "vec_id"
    ).select(
        "vec_id", F.col("cluster_id").alias("label"), "embedding", "nrm"
    )
    return _semdedup_frame(relabeled)


_SIM_JOIN_THETA = 0.3

# Block count for the distributed all-pairs kernel. Each vector is
# replicated to B tasks (task (i,j), i<=j, over blocks by vec_id % B),
# so shuffle volume is n*B rows while compute parallelism is
# B(B+1)/2 tasks. At cluster scale pick B ≈ sqrt(total cores) — the
# classic replication/parallelism trade-off for distributed all-pairs.
_N_BLOCKS = 8


# Vector-count ceiling for the broadcast all-pairs fast path:
# 500k x 64-dim float64 ~ 256 MB per python worker — inside executor
# budget. Past it, the block-pair scheme bounds per-task memory.
_BROADCAST_MAX_VECS = 500_000

# Prefilter slack under the exact threshold. The exact FLOOR-scaled
# cosine can exceed the BLAS float cosine by at most ~1e-10 relative
# (floor shrinks the dot but also the norm product); 1e-6 is 4 orders
# of margin, far below any θ granularity we accept.
_PREFILTER_EPS = 1e-6


def _prefilter_rescore(ea, na, ids_a, mb, nb, ids_b, theta, same_block):
    """Tile kernel shared by both all-pairs strategies.

    BLAS matmul -> candidate pairs at theta - eps -> exact
    FLOOR-scaled rescore of candidates only. Returns (pair_a, pair_b,
    cosine) index-free arrays, pairs canonicalized (min, max)."""
    import numpy as np

    approx = (ea @ mb.T) / (na[:, None] * nb[None, :])
    mask = approx >= theta - _PREFILTER_EPS
    if same_block:
        mask &= ids_a[:, None] < ids_b[None, :]
    ra, rb = np.nonzero(mask)
    if len(ra) == 0:
        return None
    dots = np.floor(ea[ra] * mb[rb] * 1e12).astype(np.int64).sum(1) / 1e12
    cos = dots / (na[ra] * nb[rb])
    keep = cos >= theta
    if not keep.any():
        return None
    pa, pb = ids_a[ra[keep]], ids_b[rb[keep]]
    return np.minimum(pa, pb), np.maximum(pa, pb), cos[keep]


def _allpairs_cosine(emb: DataFrame, theta: float, force: str | None = None) -> DataFrame:
    """All pairs (vec_a < vec_b, cosine >= theta), exact — two
    physical strategies behind one semantic, chosen by the MEASURED
    vector count (the _verify_jaccard / ext_dedup_clusters pattern):

    - corpus fits _BROADCAST_MAX_VECS: python-broadcast the whole
      (ids, matrix) pair and stream the table once through
      mapInPandas — each batch scores its rows against the broadcast
      matrix, each pair is born exactly once on its lower-id row.
      Zero shuffles (the block scheme needs an n*B replication
      shuffle + a groupBy); parallelism = scan partitions, not
      B(B+1)/2 tasks.
    - larger: block-matrix applyInPandas — only n*B replicated rows
      move, per-task memory is two blocks, pairs are born inside the
      kernel. The 100 TB-safe shape (nothing is corpus-sized in one
      place).

    Both paths use the identical FLOOR-scaled-BIGINT math as the SQL
    oracle (bit-identical values), and the property suite pins
    broadcast == block == single-threaded brute force (`force=`).

    Kernel shape: a BLAS matmul computes true-float cosines for the
    whole tile, pairs at >= theta - 1e-6 become candidates, and only
    those are rescored with the exact FLOOR-scaled math that decides
    membership and supplies the output value. Sound because the
    floor-scaled dot never exceeds the true dot while floor-scaled
    norms deflate it by < 1e-10 relative — so every exact-qualifying
    pair sits above the slack line. Cuts per-tile work from
    O(rows*n*d) tensor ops to one matmul + O(candidates*d).
    """
    import numpy as np
    import pandas as pd

    strategy = force or (
        "broadcast" if emb.count() <= _BROADCAST_MAX_VECS else "block"
    )
    if strategy == "broadcast":
        return _allpairs_cosine_broadcast(emb, theta)

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
        # tile rows so the BLAS result matrix stays ~64 MB
        chunk = max(1, (1 << 23) // max(1, eb.shape[0]))
        for s in range(0, ea.shape[0], chunk):
            e = min(s + chunk, ea.shape[0])
            hit = _prefilter_rescore(
                ea[s:e], na[s:e], ids_a[s:e], eb, nb, ids_b, theta, i == j
            )
            if hit is None:
                continue
            out_a.append(hit[0])
            out_b.append(hit[1])
            out_c.append(hit[2])
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


def _allpairs_cosine_broadcast(emb: DataFrame, theta: float) -> DataFrame:
    """Broadcast fast path of _allpairs_cosine (see its docstring)."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    pdf_all = emb.select("vec_id", "embedding").toPandas()
    ids_all = pdf_all["vec_id"].to_numpy()
    m_all = _stack_f64(pdf_all["embedding"])
    n_all = np.sqrt(np.floor(m_all * m_all * 1e12).astype(np.int64).sum(1) / 1e12)
    bv = spark.sparkContext.broadcast((ids_all, m_all, n_all))

    ncores = spark.sparkContext.defaultParallelism

    def score(batches):
        ids_b, mb, nb = bv.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf["vec_id"].to_numpy()
            ea = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            na = np.sqrt(np.floor(ea * ea * 1e12).astype(np.int64).sum(1) / 1e12)
            out_a, out_b, out_c = [], [], []
            # tile rows so the BLAS result matrix stays ~64 MB.
            # '<' in the kernel births each pair exactly once, on its
            # lower-id row.
            chunk = max(1, (1 << 23) // max(1, mb.shape[0]))
            for s in range(0, ea.shape[0], chunk):
                e = min(s + chunk, ea.shape[0])
                hit = _prefilter_rescore(
                    ea[s:e], na[s:e], ids_a[s:e], mb, nb, ids_b, theta, True
                )
                if hit is None:
                    continue
                out_a.append(hit[0])
                out_b.append(hit[1])
                out_c.append(hit[2])
            if out_a:
                yield pd.DataFrame(
                    {
                        "vec_a": np.concatenate(out_a),
                        "vec_b": np.concatenate(out_b),
                        "cosine": np.concatenate(out_c),
                    }
                )

    # explicit repartition: AQE/scan layout may hand mapInPandas one
    # partition for a small table, serializing the kernel
    return emb.select("vec_id", "embedding").repartition(ncores).mapInPandas(
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


# Vector-count ceiling for the broadcast-matrix verify fast path:
# 500k x 64 float64 = ~256 MB per executor. Past it, the verify joins
# embedding arrays onto the pair table instead (shuffle form).
_LSH_BROADCAST_MAX_VECS = 500_000

# Corpus row count per sf_dir, for the broadcast-vs-distributed size
# gates. Cached so plan builders (ext_sim_lsh, ext_sim_ivfpq) don't
# each fire an extra count job over the corpus at DataFrame-build time
# — the repo convention is "no eager action at plan build", and the
# gate only needs an order-of-magnitude figure that cannot change
# within a run.
_CORPUS_SIZE_CACHE: dict[str, int] = {}


def _corpus_size(spark: SparkSession, sf_dir: str) -> int:
    n = _CORPUS_SIZE_CACHE.get(sf_dir)
    if n is None:
        n = read_table(spark, sf_dir, "embeddings").count()
        _CORPUS_SIZE_CACHE[sf_dir] = n
    return n


_EMB_BV_CACHE: dict = {}


def _emb_matrix_bv(spark: SparkSession, sf_dir: str):
    """Broadcast of the corpus embedding matrix — (idx dict, M,
    FLOOR-scaled norms) — cached per (session, corpus identity).

    The verify-side matrix is an ingest artifact of the corpus, not
    of any one query: rebuilding it (Arrow toPandas + stack + norm
    pass + broadcast ship) on EVERY verify call was the same
    per-call-rebuild pathology the round-4 stress sweep caught in
    the dedup family. Keyed on the parquet stat so a changed corpus
    invalidates; dead-session entries are evicted and unpersisted so
    executor memory stays bounded.
    """
    import os

    import numpy as np

    app = spark.sparkContext.applicationId
    for k in [k for k in _EMB_BV_CACHE if k[0] != app]:
        try:
            _EMB_BV_CACHE.pop(k).unpersist()
        except Exception:
            pass
    st = os.stat(f"{sf_dir}/embeddings.parquet")
    key = (app, sf_dir, f"{st.st_mtime_ns}:{st.st_size}")
    bv = _EMB_BV_CACHE.get(key)
    if bv is None:
        pdf_all = (
            read_table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .toPandas()
        )
        M = _stack_f64(pdf_all["embedding"])
        nrm = np.sqrt(np.floor(M * M * 1e12).astype(np.int64).sum(1) / 1e12)
        idx = {int(v): i for i, v in enumerate(pdf_all["vec_id"].to_numpy())}
        bv = spark.sparkContext.broadcast((idx, M, nrm))
        _EMB_BV_CACHE[key] = bv
    return bv


_LSH_DIM = 64
_LSH_PLANE_RANGE = 2001  # weights uniform in [-1000, 1000]

# --- n-adaptive banding (SCALE.md: bits ~ log n) -------------------
# Random near-orthogonal pairs agree on a sign bit with q ~= 0.5, so
# a 6-bit band collides them with ~0.5^6-ish probability and the
# candidate set carries an O(n^2 * p_rand) term; at a fixed 6 bits
# that term grows quadratically with the corpus. The knob below
# targets constant bucket occupancy instead: bits grows with
# ceil(log2 n) (one extra bit per corpus doubling beyond the demo
# size), cutting the random collision rate ~2x per doubling, and
# bands grows by 1/p_hi per extra bit with p_hi = 1 - acos(0.5)/pi
# = 2/3 — i.e. the collision probability (recall) of the cos >= 0.5
# pairs real semantic dedup targets is held CONSTANT. Holding recall
# at the theta = 0.3 boundary instead would need bands ~ 1.676^bits
# and reproduce the n^1.745 LSH-exponent candidate growth exactly —
# no scaling win; anchoring at the high-similarity tier lets the
# boundary recall decay slowly (~n^-0.16, 0.67 -> ~0.5 at 64x) while
# expected candidates fall from ~n^2*0.31 to ~linear-in-n. The
# precise envelope (r7, measured within a few percent at 1x/8x/32x by
# scripts/lsh_law_check.py) is
#   bands * C(n,2)/2^bits * (1 + C(bits,2)*(2*sigma/pi)^2)
# where sigma is the corpus's pairwise-cosine spread: the first
# factor is the uniform collision mass (2n..4n per band depending on
# where n falls between powers of two), the second the Jensen term
# from cosine variance — quadratic in bits, i.e. polylog in n, so it
# never threatens the scaling claim. Per-plane sign-bit bias was
# measured and is NOT a factor (<=1.01). Both engines derive
# (bits, bands) from COUNT(*) with the same integer law, so the
# oracle stays a full value twin at every scale factor.
_LSH_BITS_MIN, _LSH_BITS_MAX = 6, 14
_LSH_BANDS_BY_BITS = {
    6: 24, 7: 36, 8: 54, 9: 81, 10: 122,
    11: 182, 12: 273, 13: 410, 14: 615,
}
_LSH_BANDS_SQL_CASE = "CASE bits " + " ".join(
    f"WHEN {b} THEN {n}" for b, n in _LSH_BANDS_BY_BITS.items()
) + f" ELSE {_LSH_BANDS_BY_BITS[_LSH_BITS_MAX]} END"


def _lsh_params(n_vecs: int) -> tuple[int, int]:
    """(bands, bits) for a corpus of n vectors; bits = clamp(
    ceil(log2 n) - 3, 6, 14) — identical to the oracle's SQL law."""
    import math

    bits = min(
        max(math.ceil(math.log2(max(n_vecs, 2))) - 3, _LSH_BITS_MIN),
        _LSH_BITS_MAX,
    )
    return _LSH_BANDS_BY_BITS[bits], bits


def _lsh_plane_weight(j: int, d: int) -> int:
    """Portable pseudo-random hyperplane component: derived from
    md5(f"{j}-{d}") exactly as DuckDB's
    ``CAST('0x' || substr(md5(j || '-' || d), 1, 15) AS BIGINT)`` —
    the same construction as the dedup shingle hash, so the plane
    matrix is bit-identical across engines with no literal tables."""
    import hashlib

    h = int(hashlib.md5(f"{j}-{d}".encode()).hexdigest()[:15], 16)
    return (h % _LSH_PLANE_RANGE) - 1000


_LSH_PLANES_CACHE: dict = {}


def _lsh_planes(bands: int, bits: int):
    import numpy as np

    key = (bands, bits)
    planes = _LSH_PLANES_CACHE.get(key)
    if planes is None:
        planes = np.array(
            [
                [_lsh_plane_weight(j, d) for d in range(_LSH_DIM)]
                for j in range(bands * bits)
            ],
            dtype=np.int64,
        )
        _LSH_PLANES_CACHE[key] = planes
    return planes


def lsh_candidates(spark: SparkSession, sf_dir: str):
    """The banded-LSH candidate stage shared by ext_sim_lsh and the
    scale-law audit (scripts/lsh_law_check.py): portable md5-derived
    hyperplanes → per-band integer bucket keys (vectorized matmul in
    mapInPandas, no shuffle) → band-key equi-join → distinct pairs.

    Returns (candidates DataFrame[vec_a, vec_b], bands, bits, n) with
    (bands, bits) from the n-adaptive law, so a caller can check the
    MEASURED candidate count against the law's ~3n·bands prediction
    at any corpus size.
    """
    import numpy as np
    import pandas as pd

    n_vecs = _corpus_size(spark, sf_dir)
    bands, bits = _lsh_params(n_vecs)
    planes = _lsh_planes(bands, bits)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def signatures(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            S = np.floor(E * 1e6).astype(np.int64)
            B = (S @ planes.T) > 0
            ids, bnos, keys = [], [], []
            for b in range(bands):
                ids.append(pdf["vec_id"].to_numpy())
                bnos.append(np.full(len(pdf), b, dtype=np.int64))
                keys.append(B[:, b * bits : (b + 1) * bits].astype(np.int64) @ weights)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(ids),
                    "band_no": np.concatenate(bnos),
                    "band_key": np.concatenate(keys),
                }
            )

    sig = emb.mapInPandas(signatures, schema="vec_id long, band_no long, band_key long")
    # the signature relation feeds BOTH sides of the band self-join:
    # without a barrier each side re-runs the corpus scan + Python
    # matmul kernel (two boundary crossings of the whole corpus).
    # Slim (vec_id, band_no, band_key) longs (r13; guide §4/§5)
    sig = sig.localCheckpoint(eager=False)
    a = sig.select(F.col("vec_id").alias("vec_a"), "band_no", "band_key")
    b = sig.select(F.col("vec_id").alias("vec_b"), "band_no", "band_key")
    cand = (
        a.join(b, ["band_no", "band_key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    return cand, bands, bits, n_vecs


_LSH_ORACLE = f"""
WITH {{norms}},
p0 AS (
  SELECT LEAST(GREATEST(CAST(CEIL(LOG2(GREATEST(COUNT(*), 2)))
                             AS INT) - 3, {_LSH_BITS_MIN}),
               {_LSH_BITS_MAX}) AS bits
  FROM embeddings
), params AS (
  SELECT bits, {_LSH_BANDS_SQL_CASE} AS bands FROM p0
), se AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS sv
  FROM embeddings
), grid AS (
  SELECT jj.j, d.d,
         (CAST('0x' || substr(md5(jj.j::VARCHAR || '-' || d.d::VARCHAR), 1, 15)
               AS BIGINT) % {_LSH_PLANE_RANGE}) - 1000 AS w
  FROM (SELECT unnest(range(bands * bits)) AS j FROM params) jj
  CROSS JOIN (SELECT unnest(range({_LSH_DIM})) AS d) d
), planes AS (
  SELECT j, list(w ORDER BY d) AS pw FROM grid GROUP BY j
), dotsgn AS (
  SELECT se.vec_id, p.j,
         CASE WHEN list_sum(list_transform(range(1, {_LSH_DIM + 1}),
              i -> pw[CAST(i AS INT)] * sv[CAST(i AS INT)])) > 0
              THEN 1 ELSE 0 END AS bit
  FROM se CROSS JOIN planes p
), keyed AS (
  SELECT vec_id, j // pp.bits AS band_no, j % pp.bits AS band_pos, bit
  FROM dotsgn CROSS JOIN params pp
), keys AS (
  SELECT vec_id, band_no,
         CAST(SUM(bit * (1::BIGINT << band_pos)) AS BIGINT) AS band_key
  FROM keyed GROUP BY vec_id, band_no
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM keys a JOIN keys b ON a.band_no = b.band_no AND a.band_key = b.band_key
  WHERE a.vec_id < b.vec_id
), pairs AS (
  SELECT c.vec_a, c.vec_b, ea.embedding AS ae, eb.embedding AS be
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_a
  JOIN embeddings eb ON eb.vec_id = c.vec_b
), dots AS (
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
WHERE dot / (na.nrm * nb.nrm) >= {{theta}}
"""


@register(
    "ext_sim_lsh",
    oracle=_LSH_ORACLE.format(norms=_SQL_NORMS, theta=_SIM_JOIN_THETA),
)
def ext_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded random-hyperplane LSH similarity join with an
    n-ADAPTIVE banding knob: bits = clamp(ceil(log2 n) - 3, 6, 14),
    bands = 24 * 1.5^(bits-6) (1.5 = 1/p at cos 0.5, the similarity
    tier whose recall the law holds constant) -> per-band bucket keys
    -> band-key equi-join -> exact cosine verify (same FLOOR-scaled
    math as ext_sim_join, so its output is a strict subset of the
    exact join's).

    Banding is the AND-OR construction that makes sign-LSH usable at
    moderate similarity: a pair collides if ANY band's bits all
    agree. At the demo size (n<=512: 24 bands x 6 bits) expected
    recall at cos 0.3 is 1-(1-p^6)^24 ~ 0.67 and ~0.79 at cos 0.4
    (the recall property test pins >= 0.6), while random
    near-orthogonal pairs collide in ~31% of cases. THAT term is the
    scale hazard: at fixed bits it contributes O(n^2 * p_rand)
    candidates. The adaptive law adds one bit per corpus doubling
    (halving p_rand per band) and scales bands by 1/p_hi per bit so
    the collision probability of the cos >= 0.5 pairs is invariant —
    high-tier recall holds by construction, boundary (theta = 0.3)
    recall decays only ~n^-0.16, and expected random candidates fall
    from n^2 * 0.31 (static knob) to ~3n * bands. Holding boundary
    recall exactly would force bands ~ (1/0.5967)^bits and reproduce
    the n^1.745 LSH-exponent growth — the documented no-win; the
    anchor choice is the production trade. Signature cost grows as
    n * bands * bits (vectorized matmul, no shuffle). Verify stays
    linear in candidates. Both engines derive (bits, bands) from
    COUNT(*) with the same integer law, so the DuckDB twin
    value-matches at every scale factor, not just the demo one.

    Recall < 1 stays true by construction, but the pipeline itself is
    now EXACTLY portable: hyperplane components are md5-derived
    integers (_lsh_plane_weight), bucketing signs come from an
    all-integer dot product over FLOOR(emb·1e6) — no float summation
    order anywhere near a sign decision — and verify reuses the
    FLOOR-scaled cosine. The DuckDB twin recomputes the identical
    planes, signatures, candidates and cosines, so this is a full
    value oracle, not a rows-only check. Candidate volume per
    band-bucket scales with bucket occupancy, never n².
    """
    cand, bands, bits, n_vecs = lsh_candidates(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    import numpy as np
    import pandas as pd

    ncores = spark.sparkContext.defaultParallelism

    def _cos_batch(M, nrm, ia, ib):
        ea, eb = M[ia], M[ib]
        dots = np.floor(ea * eb * 1e12).astype(np.int64).sum(1) / 1e12
        return dots / (nrm[ia] * nrm[ib])

    if n_vecs <= _LSH_BROADCAST_MAX_VECS:
        # broadcast the (small) embedding matrix — cached per
        # (session, corpus); Arrow then carries only skinny pairs
        # into the verify stage
        bv = _emb_matrix_bv(spark, sf_dir)

        def verify_bc(batches):
            idx, M, nrm = bv.value
            for pdf in batches:
                n = len(pdf)
                if not n:
                    continue
                ia = np.fromiter((idx[v] for v in pdf["vec_a"]), np.int64, count=n)
                ib = np.fromiter((idx[v] for v in pdf["vec_b"]), np.int64, count=n)
                yield pd.DataFrame(
                    {
                        "vec_a": pdf["vec_a"].to_numpy(),
                        "vec_b": pdf["vec_b"].to_numpy(),
                        "cosine": _cos_batch(M, nrm, ia, ib),
                    }
                )

        scored = cand.repartition(ncores).mapInPandas(
            verify_bc, schema="vec_a long, vec_b long, cosine double"
        )
    else:
        # scale form: attach both embeddings by equi-join, verify per
        # joined row — two shuffles on vec_id, linear in candidates
        j = (
            cand.repartition(ncores)
            .join(
                emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")),
                "vec_a",
            )
            .join(
                emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")),
                "vec_b",
            )
        )

        def verify_join(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                Ma = np.stack(pdf["ea"].to_numpy()).astype(np.float64)
                Mb = np.stack(pdf["eb"].to_numpy()).astype(np.float64)
                dots = np.floor(Ma * Mb * 1e12).astype(np.int64).sum(1) / 1e12
                na = np.sqrt(np.floor(Ma * Ma * 1e12).astype(np.int64).sum(1) / 1e12)
                nb = np.sqrt(np.floor(Mb * Mb * 1e12).astype(np.int64).sum(1) / 1e12)
                yield pd.DataFrame(
                    {
                        "vec_a": pdf["vec_a"].to_numpy(),
                        "vec_b": pdf["vec_b"].to_numpy(),
                        "cosine": dots / (na * nb),
                    }
                )

        scored = j.mapInPandas(
            verify_join, schema="vec_a long, vec_b long, cosine double"
        )

    return scored.filter(F.col("cosine") >= _SIM_JOIN_THETA)


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


@register(
    "ext_emb_quantize",
    oracle="""
WITH scaled AS (
  SELECT vec_id,
         len(embedding) AS n_dims,
         greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0,
                  1e-30) AS scale
  FROM embeddings
), q AS (
  SELECT s.vec_id, s.n_dims, s.scale,
         list_transform(e.embedding, x -> floor(x::DOUBLE / s.scale)::BIGINT) AS qv
  FROM scaled s JOIN embeddings e ON s.vec_id = e.vec_id
)
SELECT vec_id,
       n_dims,
       FLOOR(scale * 1e9)::BIGINT AS scale_e9,
       list_sum(qv)::BIGINT AS q_sum,
       array_to_string(qv, ',') AS q_csv
FROM q
""",
)
def ext_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization — the storage/bandwidth pass of an
    embedding pipeline (4x smaller vectors before ANN indexing or
    training-shard export).

    Symmetric per-vector scheme: scale = max|x|/127, q_i =
    floor(x_i/scale) ∈ [-128, 127]. All math is float→double widening
    (exact) then IEEE double division and floor — bit-identical across
    engines, no rounding ties by construction (the fn_math policy).
    The quantized vector is emitted as CSV because the harness
    canonicalizer can't sort raw array cells.

    Scale: map-only (zero shuffles) — every row is independent, so
    the operator is scan-bound at any corpus size and pushes straight
    down onto the parquet scan (only vec_id + embedding are read).
    """
    e = read_table(spark, sf_dir, "embeddings")
    scale = F.greatest(
        F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
        / F.lit(127.0),
        F.lit(1e-30),
    )
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") / F.col("scale")).cast("bigint")
    )
    return (
        e.select("vec_id", F.size("embedding").alias("n_dims"), scale.alias("scale"),
                 "embedding")
        .select(
            "vec_id",
            "n_dims",
            F.floor(F.col("scale") * 1e9).cast("bigint").alias("scale_e9"),
            F.aggregate(qv, F.lit(0).cast("bigint"), lambda a, v: a + v).alias("q_sum"),
            F.array_join(qv, ",").alias("q_csv"),
        )
    )


# PQ geometry: 64 dims -> 8 subspaces x 8 dims, 16 codes each (4
# bits/subspace -> a vector compresses to one 32-bit word). RERANK is
# the ADC candidate pool re-scored exactly per query.
_PQ_M, _PQ_K, _PQ_RERANK = 8, 16, 40


# Full value oracle for the PQ pipeline: integer-exact code
# assignment (argmin ties -> lowest k == ORDER BY d2, k), integer ADC
# tables, identical float divisions, and the same deterministic
# (score DESC, neighbor_id) tiebreaks at both rank stages — so pool
# membership and final top-10 are engine-independent.
_IVFPQ_ORACLE = f"""
WITH norms AS (
  SELECT vec_id,
         sqrt(CAST(list_sum(list_transform(embedding,
              x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12)
                        AS BIGINT))) AS DOUBLE) / 1e12) AS nrm
  FROM embeddings
), sv AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS s
  FROM embeddings
), dims AS (
  SELECT unnest(range({_PQ_M * 8})) AS dd
), cbe AS (
  SELECT CAST(dd // 8 AS BIGINT) AS m, v.vec_id AS k,
         CAST(dd % 8 AS BIGINT) AS dl, v.s[CAST(dd + 1 AS INT)] AS w
  FROM sv v, dims WHERE v.vec_id < {_PQ_K}
), csq AS (
  SELECT m, k, CAST(SUM(w * w) AS BIGINT) AS c2 FROM cbe GROUP BY m, k
), xe AS (
  SELECT v.vec_id, CAST(dd // 8 AS BIGINT) AS m,
         CAST(dd % 8 AS BIGINT) AS dl, v.s[CAST(dd + 1 AS INT)] AS x
  FROM sv v, dims
), crossd AS (
  SELECT xe.vec_id, xe.m, cbe.k,
         CAST(SUM(xe.x * cbe.w) AS BIGINT) AS xc,
         CAST(SUM(xe.x * xe.x) AS BIGINT) AS xx
  FROM xe JOIN cbe ON cbe.m = xe.m AND cbe.dl = xe.dl
  GROUP BY xe.vec_id, xe.m, cbe.k
), codes AS (
  SELECT vec_id, m, k AS code
  FROM (SELECT c.vec_id, c.m, c.k, c.xx - 2 * c.xc + q.c2 AS d2
        FROM crossd c JOIN csq q ON q.m = c.m AND q.k = c.k)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, k) = 1
), adc AS (
  SELECT qe.vec_id AS query_id, cbe.m, cbe.k,
         CAST(SUM(qe.x * cbe.w) AS BIGINT) AS t
  FROM xe qe JOIN cbe ON cbe.m = qe.m AND cbe.dl = qe.dl
  WHERE qe.vec_id < 5
  GROUP BY 1, 2, 3
), approx AS (
  SELECT a.query_id, c.vec_id AS neighbor_id,
         CAST(SUM(a.t) AS DOUBLE) / 1e12 AS adot,
         CASE WHEN sqrt(CAST(SUM(q.c2) AS DOUBLE) / 1e12) = 0 THEN 1.0
              ELSE sqrt(CAST(SUM(q.c2) AS DOUBLE) / 1e12) END AS anrm
  FROM codes c
  JOIN adc a ON a.m = c.m AND a.k = c.code
  JOIN csq q ON q.m = c.m AND q.k = c.code
  WHERE c.vec_id != a.query_id
  GROUP BY 1, 2
), pool AS (
  SELECT query_id, neighbor_id
  FROM (SELECT ap.query_id, ap.neighbor_id,
               ap.adot / (qn.nrm * ap.anrm) AS score
        FROM approx ap JOIN norms qn ON qn.vec_id = ap.query_id)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY score DESC, neighbor_id) <= {_PQ_RERANK}
), pairs AS (
  SELECT p.query_id, p.neighbor_id, ea.embedding AS ae, eb.embedding AS be
  FROM pool p
  JOIN embeddings ea ON ea.vec_id = p.query_id
  JOIN embeddings eb ON eb.vec_id = p.neighbor_id
), dots AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(CAST(FLOOR(x * y * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM (SELECT query_id, neighbor_id,
               unnest(ae)::DOUBLE AS x, unnest(be)::DOUBLE AS y
        FROM pairs)
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id,
       dot / (na.nrm * nb.nrm) AS cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY dot / (na.nrm * nb.nrm) DESC, neighbor_id) AS INTEGER)
         AS rank
FROM dots
JOIN norms na ON dots.query_id = na.vec_id
JOIN norms nb ON dots.neighbor_id = nb.vec_id
QUALIFY rank <= 10
"""


@register("ext_sim_ivfpq", oracle=_IVFPQ_ORACLE)
def ext_sim_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (IVF-PQ's compression half): encode
    every vector as 8 x 4-bit subspace codes against a deterministic
    codebook (the subvectors of the 16 lowest-id vectors), score
    queries against codes via an ADC lookup table — O(K*d) per query
    plus O(1) per corpus code — then exactly re-score only the top
    RERANK candidates.

    Quantization loses rank fidelity by design (recall pinned >= 0.55
    against ext_sim_topk's exact top-k by the property suite), but
    the pipeline itself is now EXACTLY portable: FLOOR-scaled integer
    code assignment and ADC tables (no float summation near an
    argmin), identical IEEE divisions, deterministic tiebreaks at
    both rank stages — so the DuckDB twin reproduces codes, candidate
    pool and final top-10 value-for-value.

    Scale: the codebook is M*K*8 doubles (tiny, broadcast); the
    corpus after encoding is one LONG per vector — at 100 TB the
    32-bit codes are ~250x smaller than float32 vectors, and ADC
    scoring never touches raw embeddings. Candidates per query are
    RERANK rows; the exact re-score is linear in candidates (the
    ext_sim_lsh verify shape). A full IVF-PQ adds the coarse
    ext_sim_ivf bucketing in front — both halves exist here.
    """
    import numpy as np
    import pandas as pd

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d = 64
    sub = d // _PQ_M

    # One plan-build scan covers both driver-side inputs: the codebook
    # anchors (vec_id < _PQ_K) and the query vectors (vec_id < 5 ⊂
    # anchors) — previously two separate toPandas() jobs.
    head = emb.filter(F.col("vec_id") < _PQ_K).orderBy("vec_id").toPandas()

    # codebook: subvectors of the 16 lowest-id vectors (deterministic,
    # data-adaptive, tiny), FLOOR-scaled to integers at 1e6 so code
    # assignment and ADC scoring are exact integer arithmetic — no
    # float summation order anywhere near an argmin/rank decision,
    # which is what lets the whole pipeline carry a DuckDB value
    # oracle (the sign-LSH convention). (M, K, sub)
    A = _stack_f64(head["embedding"])
    codebook = np.stack(
        [
            np.floor(A[:, m * sub : (m + 1) * sub] * 1e6).astype(np.int64)
            for m in range(_PQ_M)
        ]
    )  # (M, K, sub) int64, scale 1e6
    # per-code squared norms (int, scale 1e12), for approximate
    # candidate norms and the d2 expansion
    code_sq = (codebook * codebook).sum(2)  # (M, K)

    # query side: the 5 query vectors, python-broadcast with their
    # exact FLOOR-scaled norms (the ext_sim_topk convention)
    qpdf = head[head["vec_id"] < 5]
    Q = _stack_f64(qpdf["embedding"])
    q_ids = qpdf["vec_id"].to_numpy()
    q_nrm = np.sqrt(np.floor(Q * Q * 1e12).astype(np.int64).sum(1) / 1e12)
    # ADC tables: integer dot of each scaled query subvector with each
    # code (scale 1e12). (nq, M, K)
    SQ = np.floor(Q * 1e6).astype(np.int64)
    adc = np.einsum(
        "qmd,mkd->qmk",
        SQ.reshape(len(Q), _PQ_M, sub),
        codebook,
    )
    bv = spark.sparkContext.broadcast(
        (codebook, code_sq, adc, q_ids, q_nrm)
    )

    def encode_and_score(batches):
        cb, csq, tbl, qids, qn = bv.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Xs = np.floor(X * 1e6).astype(np.int64).reshape(
                len(X), _PQ_M, sub
            )  # (n, M, sub) int64, scale 1e6
            # nearest code per subspace: argmin ||x_m - c_mk||^2 in
            # EXACT integer arithmetic; ties -> lowest k (np.argmin
            # contract == SQL ORDER BY d2, k LIMIT 1)
            d2 = (
                (Xs * Xs).sum(2)[:, :, None]
                - 2 * np.einsum("nmd,mkd->nmk", Xs, cb)
                + csq[None, :, :]
            )
            codes = d2.argmin(2)  # (n, M)
            # approx dot via integer table lookups -> one float divide
            approx_dot = np.zeros((len(X), len(qids)))
            m_idx = np.arange(codes.shape[1])[None, :]
            for qi in range(len(qids)):
                # tbl[qi][m, codes[n, m]] summed over m (int), /1e12
                approx_dot[:, qi] = tbl[qi][m_idx, codes].sum(1) / 1e12
            approx_nrm = np.sqrt(
                np.take_along_axis(csq[None, :, :], codes[:, :, None], axis=2)
                .reshape(len(X), _PQ_M)
                .sum(1)
                / 1e12
            )
            approx_nrm[approx_nrm == 0] = 1.0
            out = []
            ids = pdf["vec_id"].to_numpy()
            for qi, qid in enumerate(qids):
                score = approx_dot[:, qi] / (qn[qi] * approx_nrm)
                keep = ids != qid
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[keep],
                            "approx": score[keep],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    scored = emb.mapInPandas(
        encode_and_score, schema="query_id long, neighbor_id long, approx double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _PQ_RERANK)
        .select("query_id", "neighbor_id")
    )

    # exact FLOOR-scaled rescore of the candidate pool (linear).
    # Same size gate as ext_sim_lsh's verify: small corpus -> python-
    # broadcast matrix; larger -> attach embeddings by equi-join and
    # score per joined row (two shuffles on vec_id, nothing
    # corpus-sized on the driver).
    if _corpus_size(spark, sf_dir) <= _LSH_BROADCAST_MAX_VECS:
        bv2 = _emb_matrix_bv(spark, sf_dir)  # cached per (session, corpus)

        def rescore(batches):
            ix, Mm, nn = bv2.value
            for pdf in batches:
                if not len(pdf):
                    continue
                ia = np.fromiter(
                    (ix[v] for v in pdf["query_id"]), np.int64, len(pdf)
                )
                ib = np.fromiter(
                    (ix[v] for v in pdf["neighbor_id"]), np.int64, len(pdf)
                )
                dots = (
                    np.floor(Mm[ia] * Mm[ib] * 1e12).astype(np.int64).sum(1)
                    / 1e12
                )
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].to_numpy(),
                        "neighbor_id": pdf["neighbor_id"].to_numpy(),
                        "cosine": dots / (nn[ia] * nn[ib]),
                    }
                )

        exact = cand.mapInPandas(
            rescore, schema="query_id long, neighbor_id long, cosine double"
        )
    else:
        j = cand.join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("ea"),
            ),
            "query_id",
        ).join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("eb"),
            ),
            "neighbor_id",
        )

        def rescore_join(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                Ma = np.stack(pdf["ea"].to_numpy()).astype(np.float64)
                Mb = np.stack(pdf["eb"].to_numpy()).astype(np.float64)
                dots = (
                    np.floor(Ma * Mb * 1e12).astype(np.int64).sum(1) / 1e12
                )
                na = np.sqrt(
                    np.floor(Ma * Ma * 1e12).astype(np.int64).sum(1) / 1e12
                )
                nb = np.sqrt(
                    np.floor(Mb * Mb * 1e12).astype(np.int64).sum(1) / 1e12
                )
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].to_numpy(),
                        "neighbor_id": pdf["neighbor_id"].to_numpy(),
                        "cosine": dots / (na * nb),
                    }
                )

        exact = j.mapInPandas(
            rescore_join, schema="query_id long, neighbor_id long, cosine double"
        )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= 10
    )


# --- trained product quantization (r10 verdict next-round task 6) -----------

_PQT_ITERS = 3  # Lloyd iterations per subspace
_PQT_NQ = 5  # query vectors (vec_id < NQ, the ext_sim_topk convention)
_PQT_RERANK = 40  # ADC candidates per query fed to the exact rescore
_PQT_TOPK = 10
_PQT_SCALE = 1_000_000  # FLOOR grid: exact BIGINT arithmetic throughout
_PQT_K = 16  # codes per subspace
_PQT_M = 8  # subspaces over the 64-dim fixture
_PQT_SUB = 8  # dims per subspace

_PQT_D2 = (
    "aggregate(zip_with(subv, sc, (x, c) -> x - c), 0L,"
    " (acc, dx) -> acc + dx * dx)"
)

# Map-only PQ code assignment (r13; guide §2.4 "remove shuffles
# outright"): the M×K codebook folds into ONE broadcast row carrying
# map<m, array<struct<code_id, sc>>> and the per-(vector, subspace)
# argmin becomes array_min(transform(...)) — the same lexicographic
# (d2, code_id) struct-min as the old groupBy(vec_id, m)
# min(struct(d2, code_id)) aggregate, with the identical
# left-associated zip_with/aggregate BIGINT distance, so rows are
# bit-identical. vs the join+groupBy+join-back form this removes, per
# Lloyd iteration AND per corpus encode, the argmin Exchange of the
# n·M·K joined rows and the join back to the subvector relation; at
# 100 TB the E-step shuffles nothing — only the M-step's slim
# (m, code_id, sd, xi) reduction moves data. The map (not a
# positional array) keyed by m stays correct even if a subspace's
# code set is sparse.
_PQ_BEST = (
    "array_min(transform(element_at(cents, m), c -> struct("
    " aggregate(zip_with(subv, c.sc, (x, cc) -> x - cc), 0L,"
    "           (acc, dx) -> acc + dx * dx) AS d2,"
    " c.code_id AS code_id)))"
)


def _pq_cent_map(cent: DataFrame) -> DataFrame:
    """Fold the (m, code_id, sc) codebook relation into the single
    broadcast row _PQ_BEST consumes (array_sort for determinism —
    code_id leads the struct, so the sort is by code_id)."""
    return (
        cent.groupBy("m")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(code_id, sc)))"
            ).alias("codes")
        )
        .groupBy()
        .agg(
            F.expr(
                "map_from_entries(collect_list(struct(m, codes)))"
            ).alias("cents")
        )
    )


def _pq_trained_state(spark: SparkSession, sf_dir: str, iters: int):
    """Per-subspace Lloyd training of the PQ codebooks — the
    ext_sim_ivf_trained kernel (training.py) run over all M subspaces
    SIMULTANEOUSLY: one relation keyed by (vec_id, m) holds every
    vector's integer subvectors, the codebook is keyed by (m,
    code_id), and each iteration is one MAP-ONLY broadcast assignment
    (_PQ_BEST) + two keyed reductions for ALL subspaces at once
    (exchange count flat per iteration and independent of M, and the
    E-step itself shuffles nothing). Init = subvectors of the K
    lowest-id vectors, Hive/FAISS's deterministic-seed stand-in.
    Returns (vec, sx, cent): full integer vectors, subvector
    relation, trained codebook."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # CAST(x AS DOUBLE) BEFORE the multiply: the stored elements are
    # float32 and a float32 product would land on a different grid
    # cell than DuckDB's ::DOUBLE arithmetic (the _KM_SCALE lesson)
    scale = f"CAST(FLOOR(CAST(x AS DOUBLE) * {_PQT_SCALE}) AS BIGINT)"
    vec = emb.select(
        "vec_id", F.expr(f"transform(embedding, x -> {scale})").alias("sv")
    )
    subs = F.expr(
        f"transform(sequence(0, {_PQT_M - 1}), m -> struct(m AS m,"
        f" slice(sv, m * {_PQT_SUB} + 1, {_PQT_SUB}) AS subv))"
    )
    sx = vec.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", F.col("s.m").alias("m"), F.col("s.subv").alias("subv")
    )
    # the subvector relation feeds codebook init, every Lloyd
    # iteration's argmin AND join-back, and the final encode/ADC
    # scoring — without a barrier each consumer re-runs the corpus
    # scan + 8-way explode (10 parquet scans in the before-plan).
    # Materialize it once: slim (vec_id, m, subv) rows, the encode
    # input a PQ build materializes anyway (r13; guide §5)
    sx = sx.localCheckpoint(eager=False)
    cent = sx.filter(F.col("vec_id") < _PQT_K).select(
        "m", F.col("vec_id").alias("code_id"), F.col("subv").alias("sc")
    )
    for _ in range(iters):
        # map-only E-step (r13, see _PQ_BEST): no argmin shuffle, no
        # join back. The assignment has exactly ONE consumer (the
        # M-step), so lineage truncates on the MODEL instead: the
        # end-of-iteration checkpoint below persists the M×K codebook
        # rows, never the corpus-sized assignment — per iteration the
        # executors store K rows, not the corpus (r13 session 3;
        # guide §5 "cache what is reused", and it must also be small)
        asg = (
            sx.crossJoin(F.broadcast(_pq_cent_map(cent)))
            .withColumn("b", F.expr(_PQ_BEST))
            .select(
                "vec_id",
                "m",
                F.col("b.code_id").alias("code_id"),
                "subv",
            )
        )
        dimsums = (
            asg.select("m", "code_id", F.posexplode("subv").alias("sd", "xi"))
            .groupBy("m", "code_id", "sd")
            .agg(
                F.floor(F.sum("xi").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("ci")
            )
        )
        # per-iteration barrier on the M×K model row set: truncates
        # the Lloyd chain exactly like the old assignment checkpoint
        # (each iteration's broadcast job re-runs ONE corpus pass,
        # not i of them) and also serves the TWO downstream consumers
        # of the final codebook (corpus encode + query ADC tables)
        cent = (
            dimsums.groupBy("m", "code_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(sd, ci))),"
                    " s -> s.ci)"
                ).alias("sc")
            )
            .localCheckpoint(eager=False)
        )
    return vec, sx, cent


def _ivfpq_trained_oracle(iters: int = _PQT_ITERS) -> str:
    """DuckDB twin of the trained-PQ pipeline: the per-subspace Lloyd
    CTE chain (the _ivf_trained_oracle generator shape with (vec_id,
    m) grain), then code assignment, ADC-table scoring, candidate
    cut, and exact integer-L2 top-k — every stage BIGINT, so
    train→encode→ADC→rerank replays value-for-value."""
    parts = [
        f"""ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * {_PQT_SCALE}) AS BIGINT) AS xi
  FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)
),
sx AS MATERIALIZED (
  SELECT vec_id, dim // {_PQT_SUB} AS m, dim % {_PQT_SUB} AS sd, xi FROM ex
),
cent1 AS (SELECT m, vec_id AS code_id, sd, xi AS ci
          FROM sx WHERE vec_id < {_PQT_K})"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f""",
d{it} AS (
  SELECT s.vec_id, s.m, c.code_id,
         SUM((s.xi - c.ci) * (s.xi - c.ci)) AS d2
  FROM sx s JOIN cent{it} c ON c.m = s.m AND c.sd = s.sd
  GROUP BY 1, 2, 3
),
a{it} AS (
  SELECT vec_id, m, code_id FROM (
    SELECT vec_id, m, code_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2, code_id) AS rn
    FROM d{it}) WHERE rn = 1
),
cent{it + 1} AS (
  SELECT a.m, a.code_id, s.sd,
         CAST(FLOOR(CAST(SUM(s.xi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
  FROM a{it} a JOIN sx s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY 1, 2, 3
)"""
        )
    cf = f"cent{iters + 1}"
    parts.append(
        f""",
dcode AS (
  SELECT s.vec_id, s.m, c.code_id,
         SUM((s.xi - c.ci) * (s.xi - c.ci)) AS d2
  FROM sx s JOIN {cf} c ON c.m = s.m AND c.sd = s.sd
  GROUP BY 1, 2, 3
),
acode AS (
  SELECT vec_id, m, code_id FROM (
    SELECT vec_id, m, code_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2, code_id) AS rn
    FROM dcode) WHERE rn = 1
),
tblq AS (
  SELECT vec_id AS query_id, m, code_id, d2 AS td2
  FROM dcode WHERE vec_id < {_PQT_NQ}
),
approx AS (
  SELECT t.query_id, a.vec_id AS neighbor_id, SUM(t.td2) AS ad2
  FROM acode a JOIN tblq t ON t.m = a.m AND t.code_id = a.code_id
  WHERE a.vec_id <> t.query_id GROUP BY 1, 2
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ad2, neighbor_id) AS cr
    FROM approx) WHERE cr <= {_PQT_RERANK}
),
dots AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(SUM((q.xi - n.xi) * (q.xi - n.xi)) AS BIGINT) AS d2
  FROM cand c
  JOIN ex q ON q.vec_id = c.query_id
  JOIN ex n ON n.vec_id = c.neighbor_id AND n.dim = q.dim
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, d2, rank FROM (
  SELECT query_id, neighbor_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2, neighbor_id) AS rank
  FROM dots) WHERE rank <= {_PQT_TOPK}"""
    )
    return "WITH " + "".join(parts)


@register("ext_sim_ivfpq_trained", oracle=_ivfpq_trained_oracle())
def ext_sim_ivfpq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with TRAINED codebooks — the full FAISS-PQ
    build protocol (r10 verdict task 6): per-subspace k-means
    (Lloyd, _PQT_ITERS M-steps over each of the M=8 subspaces,
    trained simultaneously in one keyed relation), freeze the
    codebooks, encode every vector as M code ids, serve queries by
    ADC (sum of per-subspace query→code distances — a broadcast-join
    lookup, never touching raw corpus vectors), and exactly re-score
    only the top _PQT_RERANK candidates. ext_sim_ivfpq keeps the
    fixed deterministic codebook as the untrained baseline; training
    is what closes the quantization-error gap (recall gate:
    tests/test_round11_properties.py pins trained >= untrained).

    Exactness: distances live on the FLOOR(x*1e6) integer grid at
    every rank decision (the ivf_trained convention) — code
    assignment, ADC tables, candidate cut and final top-k are all
    BIGINT with (distance, id) tiebreaks, so the generated DuckDB CTE
    chain replays the entire train→encode→search composition
    value-for-value.

    100 TB shape: training cost is _PQT_ITERS × (one broadcast join +
    two keyed reductions) covering ALL subspaces per pass — exchange
    count flat per iteration; the frozen codebook is M×K×8 longs
    (broadcast); encoding is one map-side broadcast join; ADC scoring
    shuffles only (query, vec) partial sums; the exact rescore reads
    _PQT_RERANK×NQ full vectors. Codes are ~250× smaller than the
    float vectors they index — the memory story that makes PQ the
    100 TB tier.
    """
    return _pq_trained_frame(spark, sf_dir, _PQT_ITERS)


def _pq_trained_frame(
    spark: SparkSession, sf_dir: str, iters: int
) -> DataFrame:
    """The trained-PQ pipeline at an explicit iteration count —
    iters=0 IS the untrained tier (the init codebook with no Lloyd
    step), which the recall gate compares against."""
    vec, sx, cent = _pq_trained_state(spark, sf_dir, iters)
    # corpus encode: map-only argmin (r13, _PQ_BEST) — the old
    # groupBy(vec_id, m) over the n·M·K joined rows was the last
    # corpus-sized shuffle of the build
    codes = (
        sx.crossJoin(F.broadcast(_pq_cent_map(cent)))
        .withColumn("b", F.expr(_PQ_BEST))
        .select("vec_id", "m", F.col("b.code_id").alias("code_id"))
    )
    # query ADC tables need EVERY code's distance (not the argmin) —
    # keep the join shape, but only over the NQ query rows
    tbl = (
        sx.filter(F.col("vec_id") < _PQT_NQ)
        .join(F.broadcast(cent), "m")
        .withColumn("d2", F.expr(_PQT_D2))
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "code_id",
            F.col("d2").alias("td2"),
        )
    )
    approx = (
        codes.join(F.broadcast(tbl), ["m", "code_id"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("td2").alias("ad2"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("ad2").asc(), F.col("vec_id").asc()
    )
    cand = (
        approx.withColumn("cr", F.row_number().over(wc))
        .filter(F.col("cr") <= _PQT_RERANK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qv = vec.select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qv")
    ).filter(F.col("query_id") < _PQT_NQ)
    nv = vec.select(
        F.col("vec_id").alias("neighbor_id"), F.col("sv").alias("nv")
    )
    pair_d2 = F.expr(
        "aggregate(zip_with(qv, nv, (x, c) -> x - c), 0L,"
        " (acc, dx) -> acc + dx * dx)"
    )
    dots = (
        cand.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", pair_d2.alias("d2"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return dots.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= _PQT_TOPK
    )


# --- IVF × PQ on residuals (r12 — the FAISS IVFADC composition) -------------

_IVFR_NPROBE = 2  # coarse cells probed per query
_IVFR_ITERS = 2  # Lloyd iterations on the residual codebooks

_IVFR_D2 = (
    "aggregate(zip_with(subv, sc, (x, c) -> x - c), 0L,"
    " (acc, dx) -> acc + dx * dx)"
)


def _ivfpq_residual_state(spark: SparkSession, sf_dir: str, iters: int):
    """Shared state of the residual-PQ pipeline: integer vectors with
    their coarse cell, integer cell centroids, residual subvector
    relation, and the residual codebook after ``iters`` Lloyd steps.

    Coarse tier: cell = the corpus cluster key (embeddings.label, the
    ext_sim_ivf convention) with centroids as FLOOR-scaled integer
    cell means — the same centroid-update rule the PQ training uses,
    so every residual lands exactly on the BIGINT grid. Returns
    (vec, coarse, coarse_arr, rsx, cent)."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    scale = f"CAST(FLOOR(CAST(x AS DOUBLE) * {_PQT_SCALE}) AS BIGINT)"
    vec = emb.select(
        "vec_id",
        "label",
        F.expr(f"transform(embedding, x -> {scale})").alias("sv"),
    )
    dims = vec.select(
        "label", F.posexplode("sv").alias("dim", "xi")
    )
    # the coarse centroid table feeds the residual computation (via
    # coarse_arr), the query probe election AND the probe residuals —
    # checkpoint the tiny cells×dims relation so each consumer stops
    # re-running the full-corpus dims-explode aggregation (r13;
    # guide §5)
    coarse = dims.groupBy("label", "dim").agg(
        F.floor(F.sum("xi").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("cm")
    ).localCheckpoint(eager=False)
    coarse_arr = coarse.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, cm))),"
            " s -> s.cm)"
        ).alias("cv")
    )
    rvec = vec.join(F.broadcast(coarse_arr), "label").select(
        "vec_id",
        "label",
        F.expr("zip_with(sv, cv, (x, c) -> x - c)").alias("rv"),
    )
    subs = F.expr(
        f"transform(sequence(0, {_PQT_M - 1}), m -> struct(m AS m,"
        f" slice(rv, m * {_PQT_SUB} + 1, {_PQT_SUB}) AS subv))"
    )
    rsx = rvec.select(
        "vec_id", "label", F.explode(subs).alias("s")
    ).select(
        "vec_id",
        "label",
        F.col("s.m").alias("m"),
        F.col("s.subv").alias("subv"),
    )
    # residual subvectors feed codebook init, both Lloyd iterations
    # and the corpus encode — each consumer otherwise re-derives the
    # residuals (scan + coarse join + explode; 18 parquet scans in
    # the before-plan). One barrier, slim rows (r13; guide §5)
    rsx = rsx.localCheckpoint(eager=False)
    cent = rsx.filter(F.col("vec_id") < _PQT_K).select(
        "m", F.col("vec_id").alias("code_id"), F.col("subv").alias("sc")
    )
    for _ in range(iters):
        # map-only E-step (r13, see _PQ_BEST): no argmin shuffle, no
        # join back to the residual subvector relation. Single
        # consumer (the M-step), so lineage truncates on the MODEL —
        # the end-of-iteration checkpoint below persists M×K codebook
        # rows, never the corpus-sized assignment (r13 session 3;
        # guide §5)
        asg = (
            rsx.crossJoin(F.broadcast(_pq_cent_map(cent)))
            .withColumn("b", F.expr(_PQ_BEST))
            .select(
                "vec_id",
                "label",
                "m",
                F.col("b.code_id").alias("code_id"),
                "subv",
            )
        )
        dimsums = (
            asg.select(
                "m", "code_id", F.posexplode("subv").alias("sd", "xi")
            )
            .groupBy("m", "code_id", "sd")
            .agg(
                F.floor(F.sum("xi").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("ci")
            )
        )
        # per-iteration model barrier — truncates the Lloyd chain and
        # serves the final codebook's TWO downstream consumers (corpus
        # encode + per-probe query ADC tables)
        cent = (
            dimsums.groupBy("m", "code_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(sd, ci))),"
                    " s -> s.ci)"
                ).alias("sc")
            )
            .localCheckpoint(eager=False)
        )
    return vec, coarse, coarse_arr, rsx, cent


def _ivfpq_residual_frame(
    spark: SparkSession, sf_dir: str, iters: int
) -> DataFrame:
    vec, coarse, coarse_arr, rsx, cent = _ivfpq_residual_state(
        spark, sf_dir, iters
    )
    # corpus codes: nearest residual code per (vector, subspace),
    # label carried for the probed-cell join — map-only argmin (r13,
    # _PQ_BEST; the old groupBy over n·M·K joined rows shuffled the
    # whole corpus encode)
    codes = (
        rsx.crossJoin(F.broadcast(_pq_cent_map(cent)))
        .withColumn("b", F.expr(_PQ_BEST))
        .select(
            "vec_id", "label", "m", F.col("b.code_id").alias("code_id")
        )
    )
    # probe election: integer L2 of each query to each cell centroid —
    # exploded-dims equi-join on dim (the ext_sim_ivf_nprobe shape:
    # BroadcastHashJoin, never a nested loop), then the top-nprobe cut
    qv = vec.filter(F.col("vec_id") < _PQT_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qsv")
    )
    qd = qv.select(
        "query_id", F.posexplode("qsv").alias("dim", "xi")
    )
    qcell = (
        qd.join(
            F.broadcast(
                coarse.select(
                    F.col("label").alias("plabel"), "dim", "cm"
                )
            ),
            "dim",
        )
        .groupBy("query_id", "plabel")
        .agg(
            F.sum(
                (F.col("xi") - F.col("cm"))
                * (F.col("xi") - F.col("cm"))
            ).alias("cd2")
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("cd2").asc(), F.col("plabel").asc()
    )
    probes = (
        qcell.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= _IVFR_NPROBE)
        .join(
            F.broadcast(
                coarse_arr.select(
                    F.col("label").alias("plabel"),
                    F.col("cv").alias("pcv"),
                )
            ),
            "plabel",
        )
        .join(F.broadcast(qv), "query_id")
    )
    # per-probe query residual subvectors → ADC tables against the
    # residual codebook (one tiny relation: NQ × nprobe × M × K rows)
    qsubs = F.expr(
        f"transform(sequence(0, {_PQT_M - 1}), m -> struct(m AS m,"
        f" slice(zip_with(qsv, pcv, (x, c) -> x - c),"
        f" m * {_PQT_SUB} + 1, {_PQT_SUB}) AS subv))"
    )
    qrs = probes.select(
        "query_id", "plabel", F.explode(qsubs).alias("s")
    ).select(
        "query_id",
        "plabel",
        F.col("s.m").alias("m"),
        F.col("s.subv").alias("subv"),
    )
    tbl = (
        qrs.join(F.broadcast(cent), "m")
        .withColumn("td2", F.expr(_IVFR_D2))
        .select("query_id", "plabel", "m", "code_id", "td2")
    )
    # ADC scoring INSIDE probed cells only: the join key includes the
    # cell, so per-query work is bounded by its nprobe cell sizes
    approx = (
        codes.join(
            F.broadcast(tbl),
            (F.col("label") == F.col("plabel"))
            & (codes["m"] == tbl["m"])
            & (codes["code_id"] == tbl["code_id"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("td2").alias("ad2"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("ad2").asc(), F.col("vec_id").asc()
    )
    cand = (
        approx.withColumn("cr", F.row_number().over(wc))
        .filter(F.col("cr") <= _PQT_RERANK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qfull = vec.select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qv")
    ).filter(F.col("query_id") < _PQT_NQ)
    nfull = vec.select(
        F.col("vec_id").alias("neighbor_id"), F.col("sv").alias("nv")
    )
    pair_d2 = F.expr(
        "aggregate(zip_with(qv, nv, (x, c) -> x - c), 0L,"
        " (acc, dx) -> acc + dx * dx)"
    )
    dots = (
        cand.join(F.broadcast(qfull), "query_id")
        .join(nfull, "neighbor_id")
        .select("query_id", "neighbor_id", pair_d2.alias("d2"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return dots.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= _PQT_TOPK
    )


def _ivfpq_residual_oracle(iters: int = _IVFR_ITERS) -> str:
    """DuckDB twin of the residual-PQ pipeline: coarse integer cell
    means → residuals → the per-subspace Lloyd CTE chain over
    residual subvectors → codes → probe election → per-probe ADC
    tables → cell-bounded scoring → exact BIGINT rerank."""
    parts = [
        f"""ex AS MATERIALIZED (
  SELECT vec_id, label, i - 1 AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * {_PQT_SCALE}) AS BIGINT) AS xi
  FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)
),
coarse AS MATERIALIZED (
  SELECT label, dim,
         CAST(FLOOR(CAST(SUM(xi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
  FROM ex GROUP BY 1, 2
),
rsx AS MATERIALIZED (
  SELECT e.vec_id, e.label, e.dim // {_PQT_SUB} AS m,
         e.dim % {_PQT_SUB} AS sd, e.xi - c.cm AS ri
  FROM ex e JOIN coarse c ON c.label = e.label AND c.dim = e.dim
),
cent1 AS (SELECT m, vec_id AS code_id, sd, ri AS ci
          FROM rsx WHERE vec_id < {_PQT_K})"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f""",
d{it} AS (
  SELECT s.vec_id, s.m, c.code_id,
         SUM((s.ri - c.ci) * (s.ri - c.ci)) AS d2
  FROM rsx s JOIN cent{it} c ON c.m = s.m AND c.sd = s.sd
  GROUP BY 1, 2, 3
),
a{it} AS (
  SELECT vec_id, m, code_id FROM (
    SELECT vec_id, m, code_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2, code_id) AS rn
    FROM d{it}) WHERE rn = 1
),
cent{it + 1} AS (
  SELECT a.m, a.code_id, s.sd,
         CAST(FLOOR(CAST(SUM(s.ri) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
  FROM a{it} a JOIN rsx s ON s.vec_id = a.vec_id AND s.m = a.m
  GROUP BY 1, 2, 3
)"""
        )
    cf = f"cent{iters + 1}"
    parts.append(
        f""",
dcode AS (
  SELECT s.vec_id, s.label, s.m, c.code_id,
         SUM((s.ri - c.ci) * (s.ri - c.ci)) AS d2
  FROM rsx s JOIN {cf} c ON c.m = s.m AND c.sd = s.sd
  GROUP BY 1, 2, 3, 4
),
acode AS (
  SELECT vec_id, label, m, code_id FROM (
    SELECT vec_id, label, m, code_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m
                              ORDER BY d2, code_id) AS rn
    FROM dcode) WHERE rn = 1
),
qcell AS (
  SELECT e.vec_id AS query_id, c.label AS plabel,
         SUM((e.xi - c.cm) * (e.xi - c.cm)) AS cd2
  FROM ex e JOIN coarse c ON c.dim = e.dim
  WHERE e.vec_id < {_PQT_NQ}
  GROUP BY 1, 2
),
probes AS (
  SELECT query_id, plabel FROM (
    SELECT query_id, plabel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cd2, plabel) AS pr
    FROM qcell) WHERE pr <= {_IVFR_NPROBE}
),
qrs AS (
  SELECT p.query_id, p.plabel, e.dim // {_PQT_SUB} AS m,
         e.dim % {_PQT_SUB} AS sd, e.xi - c.cm AS ri
  FROM probes p
  JOIN ex e ON e.vec_id = p.query_id
  JOIN coarse c ON c.label = p.plabel AND c.dim = e.dim
),
tblq AS (
  SELECT q.query_id, q.plabel, c.m, c.code_id,
         SUM((q.ri - c.ci) * (q.ri - c.ci)) AS td2
  FROM qrs q JOIN {cf} c ON c.m = q.m AND c.sd = q.sd
  GROUP BY 1, 2, 3, 4
),
approx AS (
  SELECT t.query_id, a.vec_id AS neighbor_id, SUM(t.td2) AS ad2
  FROM acode a
  JOIN tblq t ON t.plabel = a.label AND t.m = a.m
             AND t.code_id = a.code_id
  WHERE a.vec_id <> t.query_id GROUP BY 1, 2
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ad2, neighbor_id) AS cr
    FROM approx) WHERE cr <= {_PQT_RERANK}
),
dots AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(SUM((q.xi - n.xi) * (q.xi - n.xi)) AS BIGINT) AS d2
  FROM cand c
  JOIN ex q ON q.vec_id = c.query_id
  JOIN ex n ON n.vec_id = c.neighbor_id AND n.dim = q.dim
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, d2, rank FROM (
  SELECT query_id, neighbor_id, d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY d2, neighbor_id) AS rank
  FROM dots) WHERE rank <= {_PQT_TOPK}"""
    )
    return "WITH " + "".join(parts)


@register("ext_sim_ivfpq_residual", oracle=_ivfpq_residual_oracle())
def ext_sim_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF × PQ composed the way FAISS ships it (IVFADC, Jégou et al.
    2011 §IV): PQ codes on the RESIDUAL of each vector to its coarse
    cell centroid, scored only inside each query's nprobe probed
    cells — the r11 verdict's next-round task 8. The two halves
    existed separately (`ext_sim_ivf_nprobe` coarse probing,
    `ext_sim_ivfpq_trained` trained PQ on raw vectors); residual
    coding is what makes them compose: after subtracting the cell
    centroid the residual distribution is near-centered, so ONE
    shared codebook spends its 16 codes per subspace on fine
    structure instead of cell offsets (recall gate: residual ≥ plain
    trained PQ on the clustered fixture,
    tests/test_round12_properties.py).

    Pipeline, BIGINT-exact at every rank decision (the ivf/pq
    convention — FLOOR(x·1e6) grid, integer cell means via the same
    FLOOR-mean update the Lloyd step uses): coarse = integer cell
    centroids of the corpus cluster key; residuals r = x − c(x);
    per-subspace Lloyd training of the residual codebook
    (_IVFR_ITERS iterations, all M=8 subspaces in ONE keyed
    relation); corpus encoded as (cell, M codes); queries rank cells
    by integer L2 and probe the top _IVFR_NPROBE; per-probe query
    residuals build the ADC tables (query residual depends on the
    PROBED cell — the IVFADC subtlety); candidates score via the
    cell-bounded broadcast join; exact integer-L2 rerank of the top
    _PQT_RERANK. The generated DuckDB CTE chain replays coarse →
    residual → train → encode → probe → ADC → rerank value-for-value.

    100 TB shape: the coarse table is |cells|×d longs and the
    codebook M×K×8 longs (both broadcast); corpus state after
    encoding is one cell id + M codes per vector (~250× smaller than
    float32); ADC scoring joins ONLY probed cells (per-query work =
    nprobe/|cells| of the corpus, the IVF economics) via table
    lookups that never touch raw vectors; the only full-vector reads
    are the training scan and the RERANK×NQ rescore."""
    return _ivfpq_residual_frame(spark, sf_dir, _IVFR_ITERS)
_RP_K = 4  # output dimensions of the sparse random projection
_RP_DIM = 64  # embedding dim (pinned by the fixture; see FIXTURES.md)
_RP_SCALE = 1_000_000  # FLOOR scale: no tie, exact bigint accumulation


def _rp_signs(j: int) -> list[int]:
    """Achlioptas sparse-projection column j: each entry +1 / -1 / 0
    with probability 1/6, 1/6, 2/3, drawn from the portable md5 hash
    of 'j_dim' — both engines regenerate the identical matrix from
    the seed strings, so the matrix is a compile-time literal, never
    data."""
    import hashlib

    out = []
    for d in range(_RP_DIM):
        h = int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:8], 16) % 6
        out.append(1 if h == 0 else (-1 if h == 1 else 0))
    return out


@register(
    "ext_emb_random_projection",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, label, i - 1 AS dim, embedding[i]::DOUBLE AS x
  FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)
),
p AS (
  SELECT d.range AS dim, j.range AS j,
         CASE (CAST('0x' || substr(md5(j.range || '_' || d.range), 1, 8) AS BIGINT) % 6)
           WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS sgn
  FROM range({_RP_DIM}) d, range({_RP_K}) j
),
s AS (
  SELECT ex.vec_id, ex.label, p.j,
         SUM(CAST(FLOOR(ex.x * {_RP_SCALE}) AS BIGINT) * p.sgn) AS acc
  FROM ex JOIN p ON ex.dim = p.dim
  GROUP BY 1, 2, 3
)
SELECT vec_id, label,
       CAST(SUM(acc) FILTER (j = 0) AS DOUBLE) / {_RP_SCALE} AS proj_0,
       CAST(SUM(acc) FILTER (j = 1) AS DOUBLE) / {_RP_SCALE} AS proj_1,
       CAST(SUM(acc) FILTER (j = 2) AS DOUBLE) / {_RP_SCALE} AS proj_2,
       CAST(SUM(acc) FILTER (j = 3) AS DOUBLE) / {_RP_SCALE} AS proj_3
FROM s GROUP BY vec_id, label
""",
)
def ext_emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse random projection (Achlioptas) — 64-dim embeddings down
    to 4 dims for cheap clustering / visualization / pre-filtering.

    Spark-first: the seeded ±1/0 projection matrix is a COMPILE-TIME
    ARRAY LITERAL (regenerated identically from md5 seeds by any
    engine), so each output dim is one zip_with + aggregate over the
    embedding array — map-only, zero shuffle, zero Python, runs
    inside whole-stage codegen. At 100 TB this is a pure scan-speed
    transform; contrast with the oracle's explode+join formulation,
    which shuffles |vectors|·dim rows (the point of the rewrite).

    Per-element products are FLOOR-scaled to exact BIGINTs before the
    sum (house convention, cf. the cosine kernel above): FLOOR has no
    rounding tie and integer addition is order-independent, so both
    engines hash identically.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    cols = [F.col("vec_id"), F.col("label")]
    for j in range(_RP_K):
        signs = ", ".join(str(s) for s in _rp_signs(j))
        cols.append(
            (
                F.expr(
                    f"aggregate(zip_with(embedding, array({signs}), "
                    f"(x, s) -> CAST(FLOOR(CAST(x AS DOUBLE) * {_RP_SCALE}) AS BIGINT) * s), "
                    f"0L, (acc, v) -> acc + v)"
                ).cast("double")
                / _RP_SCALE
            ).alias(f"proj_{j}")
        )
    return emb.select(*cols)


@register(
    "ext_sim_recall_eval",
    oracle=f"""
WITH {_SQL_NORMS},
exact_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS qe, c.embedding AS ce
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 20 AND c.vec_id <> q.vec_id
),
exact_dots AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(CAST(FLOOR(x * y * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM (SELECT query_id, neighbor_id,
               unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
        FROM exact_pairs)
  GROUP BY query_id, neighbor_id
),
exact_top AS (
  SELECT query_id, neighbor_id
  FROM (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS rank
        FROM exact_dots
        JOIN norms nq ON exact_dots.query_id = nq.vec_id
        JOIN norms nc ON exact_dots.neighbor_id = nc.vec_id)
  WHERE rank <= 5
),
ivf_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS qe, c.embedding AS ce
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 20 AND c.vec_id <> q.vec_id AND c.label = q.label
),
ivf_dots AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(CAST(FLOOR(x * y * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
  FROM (SELECT query_id, neighbor_id,
               unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
        FROM ivf_pairs)
  GROUP BY query_id, neighbor_id
),
ivf_top AS (
  SELECT query_id, neighbor_id
  FROM (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS rank
        FROM ivf_dots
        JOIN norms nq ON ivf_dots.query_id = nq.vec_id
        JOIN norms nc ON ivf_dots.neighbor_id = nc.vec_id)
  WHERE rank <= 5
),
hits AS (
  SELECT e.query_id, COUNT(i.neighbor_id) AS n_hits
  FROM exact_top e LEFT JOIN ivf_top i
    ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
  GROUP BY e.query_id
)
SELECT query_id, n_hits,
       CAST(n_hits AS DOUBLE) / 5 AS recall_at_5
FROM hits
""",
)
def ext_sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall evaluation as a first-class QUERY: recall@5 of the
    IVF tier (ext_sim_ivf's nprobe=1 bucket restriction) against the
    exact brute-force top-5, per query vector. A production vector
    pipeline runs exactly this as its nightly quality gate — recall
    is the dial that justifies the bucketed plan, so it has to be
    measurable inside the engine, not in a notebook.

    Composition: the IVF side IS the registered ext_sim_ivf plan
    (called directly); the exact side reuses the broadcast-query
    cross-score shape of ext_sim_topk with the same FLOOR-scaled
    cosine, so both rankings are deterministic and the recall
    fraction (n/5) is exact. Scale: the exact side is the oracle
    anchor — a 100 TB run samples queries (here: the 20 eval
    vectors) precisely so the exact baseline stays affordable while
    the IVF side is production-shaped.
    """
    approx = ext_sim_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    emb = _with_norm(read_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _pair_cosine().alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id")
    )
    hits = (
        exact.join(
            approx.withColumnRenamed("neighbor_id", "a_neighbor"),
            (exact.query_id == approx.query_id)
            & (exact.neighbor_id == F.col("a_neighbor")),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(F.count("a_neighbor").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        "n_hits",
        (F.col("n_hits").cast("double") / 5).alias("recall_at_5"),
    )


# ext_emb_pca_step: deterministic start vector for the power
# iteration — small exact-decimal rationals. _PCA_V0 is the single
# source of truth: both the oracle's VALUES CTE and the Spark array
# literals below are GENERATED from it (same `CAST(k AS DOUBLE) / 10`
# literal text in both dialects, so the parsed doubles are
# bit-identical and the three copies cannot drift).
_PCA_V0 = [((j * 37 + 11) % 13 - 6) / 10.0 for j in range(1, _EMB_DIM + 1)]
# k = 10·v is an exact integer in [-6, 6] for every entry.
_PCA_V0_LIT = [f"CAST({round(v * 10)} AS DOUBLE) / 10" for v in _PCA_V0]
_PCA_V0_ROWS = ", ".join(
    f"({j}, {lit})" for j, lit in enumerate(_PCA_V0_LIT, 1)
)


@register(
    "ext_emb_pca_step",
    oracle=f"""
WITH dims AS (SELECT unnest(range(1, {_EMB_DIM + 1})) AS j),
v0(j, v) AS (VALUES {_PCA_V0_ROWS}),
sc AS (
  SELECT e.vec_id,
         CAST(SUM(CAST(FLOOR(CAST(e.embedding[j] AS DOUBLE) * v0.v * 1e12)
                  AS BIGINT)) AS BIGINT) AS s_scaled
  FROM embeddings e, v0
  GROUP BY e.vec_id
),
terms AS (
  SELECT d.j AS dim,
         CAST(FLOOR((CAST(e.embedding[d.j] AS DOUBLE)
                     * (sc.s_scaled / 1e12)) * 1e10) AS BIGINT) AS t
  FROM embeddings e JOIN sc USING (vec_id), dims d
)
SELECT CAST(dim AS INT) AS dim,
       CAST(SUM(t) AS BIGINT) / 1e10 AS component
FROM terms GROUP BY dim
""",
)
def ext_emb_pca_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the corpus's top principal
    direction: w = Xᵀ(X v₀) over the embedding matrix, from a fixed
    deterministic start vector — the iterative kernel of PCA /
    spectral whitening at corpus scale (a driver loop normalizing and
    re-feeding w IS power iteration; one step is registered so the
    oracle pins the heavy reduction, the ext_emb_kmeans_step /
    ext_bpe_merge_step convention for iterative algorithms).

    Spark-first, two passes, both map-heavy: (1) per-row dot
    s = ⟨emb, v₀⟩ as an IN-ORDER fold of FLOOR-scaled BIGINT terms
    (per-element double products are IEEE-identical in both engines;
    the integer sum is exact and order-independent — the _DOT
    convention, no decimal-rounding tie); (2) posexplode to (dim,
    x·s) terms, again FLOOR-scaled, reduced by a 64-group aggregate —
    partial aggregation collapses every partition to 64 rows before
    the shuffle, so the exchange moves O(partitions × 64) rows at any
    corpus size. Term bounds: |x·v₀| ≤ 0.6 ⇒ |s| ≤ 40, per-term
    ≤ 4e11 at 1e10 scale ⇒ int64 holds past 10⁷ rows; the docstring
    contract at 100 TB is DECIMAL(38,0) accumulation for the outer
    sum (one-line swap), same plan shape.
    """
    e = read_table(spark, sf_dir, "embeddings")
    v0_lits = ", ".join(_PCA_V0_LIT)
    s_expr = (
        f"CAST(aggregate(zip_with(embedding, array({v0_lits}), "
        f"(x, y) -> CAST(FLOOR(CAST(x AS DOUBLE) * y * 1e12) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
    )
    sc = e.select("vec_id", "embedding", F.expr(s_expr).alias("s_scaled"))
    terms = sc.select(
        F.posexplode("embedding").alias("pos", "x"),
        (F.col("s_scaled") / F.lit(1e12)).alias("s"),
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.expr("CAST(FLOOR((CAST(x AS DOUBLE) * s) * 1e10) AS BIGINT)").alias(
            "t"
        ),
    )
    return terms.groupBy("dim").agg(
        (F.sum("t").cast("bigint") / F.lit(1e10)).alias("component")
    )
