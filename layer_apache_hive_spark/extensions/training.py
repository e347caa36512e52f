"""Training-data pipeline operators: decontamination, clustering
assignment, and temperature-based source remixing.

These close the loop a 100 TB pretraining pipeline runs AFTER dedup
and quality scoring (extensions/dedup.py, text_analysis.py):

- benchmark decontamination (n-gram overlap against a held-out eval
  set — the step that keeps test sets out of training data);
- k-means assignment against per-label centroids (the E-step of IVF
  training / cluster-balanced sampling);
- temperature-resampled source mixing (upweight small sources by
  n^(1/T), the standard multilingual/multi-source rebalance).

Determinism rules follow the repo convention: no rand() anywhere —
selection order comes from portable md5 (see ext_sample_holdout),
float reductions go through decimal accumulation or FLOOR-scaled
BIGINT sums (functions/numeric.py, extensions/similarity.py) so both
engines hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register

_GRAM_N = 5  # words per shingle for contamination checks


@register(
    "ext_text_contamination",
    oracle=f"""
WITH words AS MATERIALIZED (
    SELECT doc_id, string_split(lower(text), ' ') AS w
    FROM documents
),
grams AS MATERIALIZED (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {_GRAM_N - 2}),
                                 i -> array_to_string(w[i:i+{_GRAM_N - 1}], ' ')))
             AS gram
    FROM words
    WHERE len(w) >= {_GRAM_N}
),
eval_grams AS MATERIALIZED (
    SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0
),
hits AS (
    SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared
    FROM grams g JOIN eval_grams e USING (gram)
    WHERE g.doc_id % 50 <> 0
    GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shared, 0) AS n_shared,
       CASE WHEN COALESCE(h.n_shared, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 50 <> 0
""",
)
def ext_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    {5}-word n-gram with the eval set (docs with doc_id % 50 == 0
    stand in for the benchmark; a real pipeline joins an external
    eval corpus the same way).

    Scale: the eval side of the join is benchmark-sized (thousands of
    docs, millions of grams) while the train side is the corpus — so
    the distinct eval grams BROADCAST and the corpus-side explode
    never shuffles: flag assignment is map-side. COUNT(DISTINCT gram)
    per doc is the only shuffle, keyed on doc_id (uniform). At 100 TB
    the eval gram set stays ~constant, so this plan is scan-bound.
    """
    d = read_table(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    # persist() is a deliberate optimization barrier: CollapseProject
    # would otherwise inline split(lower(text)) into EVERY element of
    # the transform lambda below (O(tokens²) string splits per doc —
    # the same pathology documented at dedup._shingled), and the gram
    # relation feeds both the eval and train sides of the join, so
    # tokenizing once pays off twice.
    toks = (
        d.filter(F.size(w) >= _GRAM_N)
        .select("doc_id", w.alias("w"))
        .persist()
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {_GRAM_N - 1}),"
                f" i -> concat_ws(' ', slice(w, i, {_GRAM_N})))"
            )
        ).alias("gram"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared"))
    )
    return (
        d.filter(F.col("doc_id") % 50 != 0)
        .join(hits, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.when(F.coalesce("n_shared", F.lit(0)) > 0, 1)
            .otherwise(0)
            .alias("contaminated"),
        )
    )


@register(
    "ext_emb_centroid_assign",
    oracle="""
WITH pe AS MATERIALIZED (
    SELECT vec_id, label, i AS pos, CAST(embedding[i+1] AS DOUBLE) AS val
    FROM embeddings, (SELECT unnest(range(0, 64)) AS i) t
),
cent AS MATERIALIZED (
    SELECT label AS c_label, pos,
           (CAST(SUM(CAST(FLOOR(val * 1e9) AS BIGINT)) AS DOUBLE) / 1e9)
             / COUNT(val) AS cent
    FROM pe GROUP BY label, pos
),
dist AS (
    SELECT pe.vec_id, pe.label, c.c_label,
           CAST(SUM(CAST(FLOOR((val - cent) * (val - cent) * 1e12) AS BIGINT))
                AS DOUBLE) / 1e12 AS dist2
    FROM pe JOIN cent c ON pe.pos = c.pos
    GROUP BY pe.vec_id, pe.label, c.c_label
)
SELECT vec_id, label, c_label AS assigned, dist2
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist2, c_label) AS rn
    FROM dist
)
WHERE rn = 1
""",
)
def ext_emb_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means assignment step (the E-step of IVF coarse-quantizer
    training): centroid per label = per-dimension decimal-exact mean;
    every vector is assigned to its nearest centroid by squared L2.

    Distances use the FLOOR-scaled BIGINT sum (similarity.py:41-46)
    so the argmin ordering is identical in both engines; centroid
    means accumulate as FLOOR(val·1e9) BIGINTs (values are ~±0.2 so
    scale 9 keeps ~1e-9 granularity) then divide once in double.
    FLOOR, not a DECIMAL cast: Spark casts double→decimal HALF_UP
    while DuckDB rounds half-even, and exact dyadic ties DO occur
    (observed at sf0.1) — FLOOR has no tie.

    Scale: centroids are k×dim (tiny) and BROADCAST; the
    explode-join-agg computes n×k distances with one shuffle on
    (vec_id). At 100 TB you'd swap the exploded SQL form for a
    mapInPandas with the broadcast centroid matrix (one numpy matmul
    per batch — same shape as _allpairs_cosine_broadcast in
    similarity.py) but keep THIS form as the oracle gate."""
    e = read_table(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).withColumn("val", F.col("val").cast("double"))
    cent = pe.groupBy(F.col("label").alias("c_label"), "pos").agg(
        (
            (F.sum(F.floor(F.col("val") * 1e9).cast("bigint")).cast("double") / 1e9)
            / F.count("val")
        ).alias("cent")
    )
    diff = F.col("val") - F.col("cent")
    dist = (
        pe.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            (
                F.sum(F.floor(diff * diff * 1e12).cast("bigint")).cast("double")
                / 1e12
            ).alias("dist2")
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy("dist2", "c_label")
    )
    return (
        dist.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("c_label").alias("assigned"), "dist2")
    )


_KM_K = 8  # seed count for the Lloyd-step demo (vec_id < _KM_K)
_KM_SCALE = 1_000_000  # FLOOR scale → pure-BIGINT distances, no ties


@register(
    "ext_emb_kmeans_step",
    oracle=f"""
WITH ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * {_KM_SCALE}) AS BIGINT) AS xi
  FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)
),
seeds AS (SELECT vec_id AS cluster_id, dim, xi AS ci FROM ex WHERE vec_id < {_KM_K}),
d AS (
  SELECT e.vec_id, s.cluster_id, SUM((e.xi - s.ci) * (e.xi - s.ci)) AS d2
  FROM ex e JOIN seeds s USING (dim) GROUP BY 1, 2
),
best AS (
  SELECT vec_id, cluster_id, d2
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY d2, cluster_id) AS rn FROM d)
  WHERE rn = 1
),
vs AS (SELECT vec_id, CAST(SUM(xi) AS BIGINT) AS vsum FROM ex GROUP BY 1)
SELECT b.cluster_id, COUNT(*) AS n_members,
       CAST(SUM(v.vsum) AS BIGINT) AS centroid_checksum,
       CAST(SUM(b.d2) AS DOUBLE) / 1e12 AS wcss
FROM best b JOIN vs v USING (vec_id)
GROUP BY b.cluster_id
""",
)
def ext_emb_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration of distributed k-means over the
    embedding corpus: assignment to k seeded centroids (vec_id <
    {k} as the deterministic seed set) plus the M-step reduction —
    per-cluster membership count, component-sum checksum (the new
    centroid, pre-division), and within-cluster sum of squares.
    Iterative k-means = a driver loop over this step with the
    previous step's centroids broadcast back in.

    All distance math is PURE BIGINT: vectors are FLOOR-scaled to
    ints once (map-only), and d² = Σ(xi−ci)² stays integer end to
    end, so the argmin order and every output value are exact and
    engine-identical — no float accumulation anywhere until the one
    final wcss division.

    Spark-first plan, one scan + two keyed shuffles:
    - seeds are k rows → `F.broadcast` crossJoin, map-side k-way
      fan-out (NOT the oracle's explode-join, which shuffles n·dim
      rows);
    - argmin via `min(struct(d2, cluster_id))` groupBy — partial
      aggregation map-side, unlike a window row_number which sorts
      every partition;
    - M-step is a k-row groupBy on the winners.
    At 100 TB: fan-out is k× map work (no extra I/O), both shuffles
    carry one slim row per vector; k and dim only affect map CPU.
    A production loop would swap the zip_with kernel for one numpy
    matmul per Arrow batch (cf. _allpairs_cosine_broadcast,
    similarity.py) — plan shape unchanged.
    """
    scale = f"CAST(FLOOR(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT)"
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(f"transform(embedding, x -> {scale})").alias("sv"),
    )
    vec = emb.withColumn(
        "vsum", F.expr("aggregate(sv, 0L, (acc, v) -> acc + v)")
    )
    seeds = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("sv").alias("sc")
    )
    d2 = F.expr(
        "aggregate(zip_with(sv, sc, (x, c) -> x - c), 0L,"
        " (acc, dx) -> acc + dx * dx)"
    )
    best = (
        vec.crossJoin(F.broadcast(seeds))
        .withColumn("d2", d2)
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "cluster_id")).alias("b"),
            F.max("vsum").alias("vsum"),
        )
    )
    return best.groupBy(F.col("b.cluster_id").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("vsum").alias("centroid_checksum"),
        (F.sum("b.d2").cast("double") / 1e12).alias("wcss"),
    )


_KM_ITERS = 5  # bounded multi-iteration composition (r9 verdict task 8)


def _kmeans_train_oracle(iters: int = _KM_ITERS) -> str:
    """DuckDB twin of the bounded Lloyd loop: one CTE pair
    (distances → argmin assignment) per iteration plus the
    integer-grid M-step centroids feeding the next, generated
    programmatically so the SQL and the Spark loop share iteration
    structure by construction."""
    parts = [
        f"""ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * {_KM_SCALE}) AS BIGINT) AS xi
  FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)
),
vs AS (SELECT vec_id, CAST(SUM(xi) AS BIGINT) AS vsum FROM ex GROUP BY 1),
cent1 AS (SELECT vec_id AS cluster_id, dim, xi AS ci
          FROM ex WHERE vec_id < {_KM_K})"""
    ]
    selects = []
    for it in range(1, iters + 1):
        parts.append(
            f""",
d{it} AS (
  SELECT e.vec_id, c.cluster_id,
         SUM((e.xi - c.ci) * (e.xi - c.ci)) AS d2
  FROM ex e JOIN cent{it} c USING (dim) GROUP BY 1, 2
),
a{it} AS (
  SELECT vec_id, cluster_id, d2 FROM (
    SELECT vec_id, cluster_id, d2,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster_id) AS rn
    FROM d{it}) WHERE rn = 1
)"""
        )
        if it < iters:
            parts.append(
                f""",
cent{it + 1} AS (
  SELECT a.cluster_id, e.dim,
         CAST(FLOOR(CAST(SUM(e.xi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
  FROM a{it} a JOIN ex e USING (vec_id) GROUP BY 1, 2
)"""
            )
        selects.append(
            f"""SELECT {it} AS iteration, a.cluster_id,
       COUNT(*) AS n_members,
       CAST(SUM(v.vsum) AS BIGINT) AS centroid_checksum,
       CAST(SUM(a.d2) AS DOUBLE) / 1e12 AS wcss
FROM a{it} a JOIN vs v USING (vec_id) GROUP BY 1, 2"""
        )
    return "WITH " + "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def _kmeans_train_frame(
    spark: SparkSession, sf_dir: str, iters: int
) -> DataFrame:
    """The Spark Lloyd loop: iteration state (centroids) stays a k-row
    DataFrame broadcast back into the next assignment — no
    driver-side data movement, no collect; the Python loop only
    COMPOSES plans. Centroids re-quantize to the integer grid after
    every M-step (FLOOR of the exact integer sum / count, computed in
    double — sums stay far below 2^53, so the one division is
    correctly rounded and engine-identical), which is what keeps
    every iteration's assignment pure-BIGINT and the whole 5-deep
    composition value-replayable in DuckDB."""
    scale = f"CAST(FLOOR(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT)"
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(f"transform(embedding, x -> {scale})").alias("sv"),
    )
    vec = emb.withColumn(
        "vsum", F.expr("aggregate(sv, 0L, (acc, v) -> acc + v)")
    )
    # vec feeds every iteration's assignment crossJoin AND join-back
    # (2 consumers x iters): materialize the scaled-vector relation
    # once instead of re-running the scan + transform per consumer
    # (r13; guide §5 caching-when-reused)
    vec = vec.localCheckpoint(eager=False)
    cent = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("sv").alias("sc")
    )
    # per-row expression argmin over the k-centroid ARRAY: the k-row
    # centroid frame folds into ONE broadcast row carrying
    # array<struct<cluster_id, sc>>, and the assignment is
    # array_min(transform(...)) — struct-min is the same
    # lexicographic (d2, cluster_id) order as min(struct(d2, id)).
    # vs the r9 crossJoin+groupBy(vec_id)+join-back form this removes
    # the per-iteration argmin Exchange AND the join back to the
    # vector relation outright (r13; guide §2.4 "remove shuffles
    # outright"): measured 30 -> 25 Spark jobs / 4.4 -> 3.3 s warm at
    # sf0.1, rows bit-identical. The E-step is now map-only; at
    # 100 TB an iteration shuffles ONLY the M-step's slim
    # (cluster_id, pos, xi) rows.
    # (earlier r13 note, still true: carrying sv/vsum THROUGH a
    # groupBy argmin was 2-3x slower — wide arrays in agg buffers.)
    best = F.expr(
        "array_min(transform(cents, c -> struct("
        " aggregate(zip_with(sv, c.sc, (x, cc) -> x - cc), 0L,"
        "           (acc, dx) -> acc + dx * dx) AS d2,"
        " c.cluster_id AS cluster_id)))"
    )
    stats: list[DataFrame] = []
    for it in range(1, iters + 1):
        cent_arr = cent.groupBy().agg(
            F.expr(
                "array_sort(collect_list(struct(cluster_id, sc)))"
            ).alias("cents")
        )
        # lineage still truncates at the iteration boundary (the
        # assignment feeds the audit row, the M-step, and every later
        # iteration — the r9 flatness contract); the lazy
        # localCheckpoint stays executor-side.
        asg = (
            vec.crossJoin(F.broadcast(cent_arr))
            .withColumn("b", best)
            .select(
                "vec_id",
                F.col("b.cluster_id").alias("cluster_id"),
                F.col("b.d2").alias("d2"),
                "sv",
                "vsum",
            )
            .localCheckpoint(eager=False)
        )
        stats.append(
            asg.groupBy("cluster_id").agg(
                F.count(F.lit(1)).alias("n_members"),
                F.sum("vsum").alias("centroid_checksum"),
                (F.sum("d2").cast("double") / 1e12).alias("wcss"),
            ).select(
                F.lit(it).alias("iteration"),
                "cluster_id",
                "n_members",
                "centroid_checksum",
                "wcss",
            )
        )
        if it < iters:
            dimsums = (
                asg.select(
                    "cluster_id", F.posexplode("sv").alias("pos", "xi")
                )
                .groupBy("cluster_id", "pos")
                .agg(
                    F.floor(
                        F.sum("xi").cast("double") / F.count(F.lit(1))
                    )
                    .cast("long")
                    .alias("ci")
                )
            )
            cent = dimsums.groupBy("cluster_id").agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, ci))),"
                    " s -> s.ci)"
                ).alias("sc")
            )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


@register("ext_emb_kmeans_train", oracle=_kmeans_train_oracle())
def ext_emb_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded iterate-to-convergence k-means (r9 verdict task 8):
    FIVE full Lloyd iterations composed from the ext_emb_kmeans_step
    kernel — per-iteration audit relation (iteration, cluster_id,
    membership count, centroid checksum, wcss), every row
    value-oracled against a DuckDB replay of the same 5-deep CTE
    chain. Proves the step queries compose into a training loop with
    the model state (k×dim centroids) living entirely in broadcast
    DataFrames — the driver never touches a data row.

    Scale: per-iteration cost is the step query's (k-way map fan-out
    + one slim groupBy(vec_id) + the M-step's two keyed reductions);
    the exchange count per added iteration is CONSTANT
    (plan-audited in tests/test_round9_properties.py) because each
    iteration's assignment truncates lineage with a lazy
    executor-side localCheckpoint — the per-iteration persist a
    production loop does anyway; wcss is the monotone convergence
    metric a driver would watch.
    """
    return _kmeans_train_frame(spark, sf_dir, _KM_ITERS)


@register(
    "ext_sample_temperature",
    oracle="""
WITH per_src AS MATERIALIZED (
    SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (
    SELECT SUM(n_docs) AS total,
           CAST(SUM(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(38,9)))
                AS DOUBLE) AS z
    FROM per_src
),
plan AS (
    SELECT source, n_docs,
           LEAST(n_docs,
                 CAST(CEIL(0.5 * total * sqrt(CAST(n_docs AS DOUBLE)) / z)
                      AS BIGINT)) AS k_take
    FROM per_src, tot
),
ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('temp:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rk
    FROM documents
)
SELECT r.doc_id, r.source, r.rk
FROM ranked r JOIN plan p ON r.source = p.source
WHERE r.rk <= p.k_take
""",
)
def ext_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled source mixing (T=2): each source's target
    share is proportional to n^(1/T) of its document count — the
    standard rebalance that upweights small sources without letting
    any single source dominate. Budget = 50% of the corpus, capped at
    each source's actual size.

    Per-source selection is the top-k by md5('temp:'||doc_id) — a
    stable, engine-portable pseudo-random order (salted so it doesn't
    correlate with the holdout bucket, which hashes the bare doc_id).
    The sqrt-share normalizer accumulates in decimal so the plan's
    k_take is bit-identical across engines and partitionings.

    Scale: the mixing plan is sources×1 (tiny, broadcast); the only
    corpus-size work is one window per source — and a window by
    source is a single shuffle, skew-bounded by the largest source.
    At 100 TB, replace row_number with a bucketed rank (md5 mod B,
    take whole buckets + one boundary bucket) to avoid single-task
    tails on huge sources."""
    d = read_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_src.agg(
        F.sum("n_docs").alias("total"),
        F.sum(F.sqrt(F.col("n_docs").cast("double")).cast("decimal(38,9)"))
        .cast("double")
        .alias("z"),
    )
    plan = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.col("n_docs"),
            F.ceil(
                F.lit(0.5)
                * F.col("total")
                * F.sqrt(F.col("n_docs").cast("double"))
                / F.col("z")
            ).cast("bigint"),
        ).alias("k_take"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rk", rk)
        .join(F.broadcast(plan), "source")
        .filter(F.col("rk") <= F.col("k_take"))
        .select("doc_id", "source", "rk")
    )


# Knuth multiplicative hash for rate-threshold sampling: pure BIGINT
# arithmetic, so Spark and DuckDB produce identical buckets without a
# shared hash builtin. Low 20 bits after an odd-multiplier mix are
# uniform over sequential ids. At 100 TB swap in xxhash64 on the
# content key — the plan shape (broadcast rate join + filter) holds.
_MIX_MULT = 2654435761
_MIX_BUCKETS = 1 << 20


@register(
    "ext_sample_domain_mix",
    oracle=f"""
WITH per_lang AS MATERIALIZED (
    SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
),
w AS (
    SELECT lang, n_docs,
           CASE WHEN lang = 'en' THEN 0.30 ELSE 0.175 END AS w
    FROM per_lang
),
budget AS (
    SELECT MIN(CAST(FLOOR(n_docs / w) AS BIGINT)) AS n_out FROM w
),
plan AS (
    SELECT lang, w * n_out / n_docs * {_MIX_BUCKETS} AS thr
    FROM w, budget
)
SELECT d.doc_id, d.lang
FROM documents d JOIN plan p ON d.lang = p.lang
WHERE (d.doc_id * {_MIX_MULT}) % {_MIX_BUCKETS} < p.thr
""",
)
def ext_sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix sampling: hit a target language mix (en 30%, others
    17.5% each) with the largest corpus the mix allows — the binding
    (most undersupplied) language keeps ~100% and every other group is
    rate-sampled down to proportion.

    Unlike ext_sample_temperature's ranked top-k (a per-source window
    shuffle), selection here is a pure filter: doc survives iff its
    multiplicative-hash bucket falls under the group's keep rate. Zero
    shuffles on the corpus side — the mixing plan is |langs| rows,
    broadcast — so the op is scan-bound at any scale.

    All plan math (double division, FLOOR, MIN) is bit-deterministic
    in both engines, so the sampled id set is exactly reproducible —
    a requirement for training-data lineage."""
    d = read_table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = per_lang.select(
        "lang",
        "n_docs",
        F.when(F.col("lang") == "en", 0.30).otherwise(0.175).alias("w"),
    )
    budget = w.agg(
        F.min(F.floor(F.col("n_docs") / F.col("w")).cast("bigint")).alias(
            "n_out"
        )
    )
    plan = w.crossJoin(F.broadcast(budget)).select(
        "lang",
        (
            F.col("w") * F.col("n_out") / F.col("n_docs") * _MIX_BUCKETS
        ).alias("thr"),
    )
    return (
        d.join(F.broadcast(plan), "lang")
        .filter(
            F.pmod(F.col("doc_id") * _MIX_MULT, F.lit(_MIX_BUCKETS))
            < F.col("thr")
        )
        .select("doc_id", "lang")
    )


@register(
    "ext_pipeline_pretrain",
    oracle="""
WITH toks AS MATERIALIZED (
    SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_distinct
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY doc_id
),
quality AS (
    SELECT d.doc_id, d.text, d.lang, d.source, t.n_tokens
    FROM documents d JOIN toks t ON d.doc_id = t.doc_id
    WHERE d.n_chars BETWEEN 100 AND 500
      AND CAST(t.n_distinct AS DOUBLE) / t.n_tokens >= 0.2
),
dedup AS (
    SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang,
           MIN(source) AS source, MIN(n_tokens) AS n_tokens
    FROM quality GROUP BY text
)
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM dedup
GROUP BY source, lang
""",
)
def ext_pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining-corpus pipeline in ONE lazy DAG: quality
    gates (length + lexical diversity, the ext_text_quality
    thresholds) → exact content dedup keeping the lowest doc_id (the
    ext_dedup_exact shape) → per-(source, lang) document/token budget
    — the numbers a data-mixing stage consumes.

    Composition is the point: each stage is an operator this repo
    already proves in isolation, and Catalyst pipelines them into two
    shuffles total (token stats groupBy; dedup groupBy — the final
    small rollup rides AQE-coalesced partitions). Nothing materializes
    between stages, so the same code runs at 100 TB where
    stage-by-stage temp tables would double the I/O.

    (doc_id is the dedup keeper; lang/source/n_tokens ride along via
    MIN over the duplicate set, which is exact because duplicates of
    identical text share them in the fixture.)"""
    d = read_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct"),
        )
    )
    quality = (
        d.join(toks, "doc_id")
        .filter(
            F.col("n_chars").between(100, 500)
            & (
                F.col("n_distinct").cast("double") / F.col("n_tokens")
                >= 0.2
            )
        )
        .select("doc_id", "text", "lang", "source", "n_tokens")
    )
    dedup = quality.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return dedup.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


_MASK_PCT = 15  # % of token positions selected for corruption


@register(
    "ext_text_span_corruption",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, i AS pos, t[i] AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  CROSS JOIN UNNEST(generate_series(1, len(t))) AS s(i)
),
flagged AS (
  SELECT doc_id, pos, token,
         (CAST('0x' || substr(md5(doc_id || ':' || pos), 1, 8) AS BIGINT)
            % 100) < {_MASK_PCT} AS masked
  FROM toks
),
starts AS (
  SELECT doc_id, pos, token, masked,
         masked AND NOT COALESCE(
           LAG(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE
         ) AS is_start
  FROM flagged
),
runs AS (
  SELECT *,
         CAST(SUM(CASE WHEN is_start THEN 1 ELSE 0 END) OVER
           (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS span_no
  FROM starts
)
SELECT doc_id,
       COALESCE(string_agg(
         CASE WHEN NOT masked THEN token
              WHEN is_start THEN '<extra_id_' || (span_no - 1) || '>' END,
         ' ' ORDER BY pos), '') AS input_text,
       COALESCE(string_agg(
         CASE WHEN masked AND is_start
                THEN '<extra_id_' || (span_no - 1) || '> ' || token
              WHEN masked THEN token END,
         ' ' ORDER BY pos), '') AS target_text,
       CAST(COALESCE(MAX(span_no), 0) AS BIGINT) AS n_spans,
       CAST(COUNT(*) FILTER (masked) AS BIGINT) AS n_masked
FROM runs GROUP BY doc_id
""",
)
def ext_text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption example generation (the T5/UL2 denoising
    objective): ~15% of token positions are masked, adjacent masked
    positions merge into spans, each span is replaced by a sentinel
    in the input and emitted after its sentinel in the target —
    (input_text, target_text) pairs ready for seq2seq pretraining.

    Mask selection is the repo's portable-hash draw (md5 of
    doc_id:pos — no rand(), both engines agree exactly, cf.
    ext_sample_holdout), so the corruption is reproducible across
    runs AND engines. Span merging is the gaps-and-islands pattern:
    is_start = masked AND NOT lag(masked), span_no = running sum.

    Plan: one shuffle — everything is windows over (doc_id, pos)
    then a groupBy doc_id that reuses the same hash partitioning
    (no second Exchange). Per-doc state is O(doc tokens) inside
    ordered collect_list aggregates, the same bound as reading the
    document; at 100 TB this is a pure map+single-keyed-shuffle
    pipeline, linear in corpus size.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")

    masked = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", "doc_id", "pos")), 1, 8), 16, 10
        ).cast("long")
        % 100
        < _MASK_PCT
    )
    flagged = toks.withColumn("masked", masked)

    w = Window.partitionBy("doc_id").orderBy("pos")
    starts = flagged.withColumn(
        "is_start",
        F.col("masked") & ~F.coalesce(F.lag("masked").over(w), F.lit(False)),
    )
    runs = starts.withColumn(
        "span_no",
        F.sum(F.when(F.col("is_start"), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("span_no") - 1).cast("string"), F.lit(">")
    )
    in_tok = F.when(~F.col("masked"), F.col("token")).when(
        F.col("is_start"), sentinel
    )
    tg_tok = F.when(
        F.col("masked") & F.col("is_start"),
        F.concat(sentinel, F.lit(" "), F.col("token")),
    ).when(F.col("masked"), F.col("token"))

    def ordered_text(val):
        arr = F.array_sort(
            F.collect_list(F.when(val.isNotNull(), F.struct(F.col("pos"), val.alias("v"))))
        )
        return F.concat_ws(" ", F.transform(arr, lambda s: s["v"]))

    return runs.groupBy("doc_id").agg(
        ordered_text(in_tok).alias("input_text"),
        ordered_text(tg_tok).alias("target_text"),
        F.coalesce(F.max("span_no"), F.lit(0)).cast("long").alias("n_spans"),
        F.count(F.when(F.col("masked"), 1)).alias("n_masked"),
    )


_SFT_PROMPT_PREFIX = "Continue the passage: "
_SFT_VAL_PCT = 20  # % of examples held out for validation


@register(
    "ext_pipeline_sft",
    oracle=f"""
WITH quality AS (
  SELECT doc_id, source, string_split(text, ' ') AS t
  FROM documents
  WHERE n_chars BETWEEN 100 AND 500
),
cut AS (
  SELECT doc_id, source, t,
         GREATEST(1, (len(t) * 2) // 5) AS k
  FROM quality
  WHERE len(t) >= 2
),
ex AS (
  SELECT doc_id, source,
         CASE WHEN CAST('0x' || substr(md5('sft:' || doc_id), 1, 8) AS BIGINT)
                   % 100 < {_SFT_VAL_PCT}
              THEN 'val' ELSE 'train' END AS split,
         '{_SFT_PROMPT_PREFIX}' || array_to_string(t[1:k], ' ') AS prompt,
         array_to_string(t[k+1:len(t)], ' ') AS completion,
         k AS n_prompt_tokens,
         len(t) - k AS n_completion_tokens
  FROM cut
)
SELECT * FROM ex
""",
)
def ext_pipeline_sft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT (instruction-tuning) example construction — the sibling of
    ext_pipeline_pretrain for the fine-tuning leg: quality-gated docs
    become (prompt, completion) pairs by a deterministic 40/60 token
    split under an instruction template, with a portable-hash
    train/val split (md5, the ext_sample_holdout convention). The
    split point uses pure integer math ((n·2) div 5) — no float
    multiply whose rounding could move a token across the boundary.

    Scale: entirely map-side — tokenize, slice, hash, template are
    all per-row expressions inside whole-stage codegen; ZERO
    shuffles. At 100 TB this runs at scan speed, which is exactly
    what an example-construction pass must do; the downstream
    pack-to-sequence step (ext_text_pack) adds the one keyed
    shuffle.
    """
    d = read_table(spark, sf_dir, "documents")
    q = d.filter(F.col("n_chars").between(100, 500)).select(
        "doc_id", "source", F.split("text", " ").alias("t")
    )
    cut = q.filter(F.size("t") >= 2).withColumn(
        "k", F.greatest(F.lit(1), F.expr("(size(t) * 2) div 5"))
    )
    split = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("sft:"), F.col("doc_id"))), 1, 8), 16, 10)
        .cast("bigint") % 100
        < _SFT_VAL_PCT,
        F.lit("val"),
    ).otherwise(F.lit("train"))
    return cut.select(
        "doc_id",
        "source",
        split.alias("split"),
        F.concat(
            F.lit(_SFT_PROMPT_PREFIX),
            F.array_join(F.expr("slice(t, 1, k)"), " "),
        ).alias("prompt"),
        F.array_join(F.expr("slice(t, k + 1, size(t) - k)"), " ").alias(
            "completion"
        ),
        F.col("k").alias("n_prompt_tokens"),
        (F.size("t") - F.col("k")).alias("n_completion_tokens"),
    )


# per-source epoch weights: how many times each source's docs repeat
# in the output mixture (fractional part = probabilistic extra epoch)
_EPOCH_W = {"web": 1.0, "books": 2.5, "code": 1.25, "wiki": 3.0}
_EPOCH_DEFAULT = 1.0


def _epoch_case(col: str) -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in sorted(_EPOCH_W.items())
    )
    return f"CASE {col} {whens} ELSE {_EPOCH_DEFAULT} END"


@register(
    "ext_sample_epochs",
    oracle=f"""
WITH planned AS (
  SELECT doc_id, source,
         CAST(FLOOR({_epoch_case('source')}) AS BIGINT)
           + CASE WHEN (CAST('0x' || substr(md5('epoch:' || doc_id), 1, 8)
                             AS BIGINT) % 1000000) / 1000000.0
                       < {_epoch_case('source')}
                         - FLOOR({_epoch_case('source')})
                  THEN 1 ELSE 0 END AS n_epochs
  FROM documents
)
SELECT doc_id, source, UNNEST(generate_series(1, n_epochs)) AS epoch_no
FROM planned WHERE n_epochs > 0
""",
)
def ext_sample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch upsampling — the standard mixture builder:
    each source repeats ⌊w⌋ times plus one extra epoch with
    probability frac(w) (books ×2.5 → every book doc twice, half of
    them a third time), decided per document by a portable md5 draw
    so reruns and both engines replicate the identical multiset.
    Complement of the down-sampling ops (temperature / domain_mix):
    this is how undersupplied high-quality sources get upweighted.

    Scale: pure map-side — a CASE lookup, one hash draw, and an
    explode(sequence(1, n)) fan-out; ZERO shuffles, output volume =
    Σ n_epochs by construction. At 100 TB the epoch column also
    becomes the natural shard key for writing the mixed corpus.
    """
    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = F.expr(_epoch_case("source"))
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("epoch:"), F.col("doc_id"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    ) / 1_000_000.0
    n_epochs = (
        F.floor(w).cast("bigint")
        + F.when(draw < (w - F.floor(w)), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        d.withColumn("n_epochs", n_epochs)
        .filter(F.col("n_epochs") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.expr("sequence(1L, n_epochs)")).alias("epoch_no"),
        )
    )


@register(
    "ext_pipeline_filter_audit",
    oracle="""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
),
stats AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct,
         MAX(cnt) AS top_cnt
  FROM (SELECT doc_id, token, COUNT(*) AS cnt
        FROM toks GROUP BY doc_id, token)
  GROUP BY doc_id
),
audit AS (
  SELECT d.doc_id, d.n_chars, s.n_tokens,
         CAST(FLOOR(CAST(s.n_distinct AS DOUBLE) / s.n_tokens * 1000000)
              AS DOUBLE) / 1000000 AS diversity,
         CAST(FLOOR(CAST(s.top_cnt AS DOUBLE) / s.n_tokens * 1000000)
              AS DOUBLE) / 1000000 AS top_tok_share
  FROM documents d JOIN stats s ON d.doc_id = s.doc_id
)
SELECT doc_id, n_tokens, diversity, top_tok_share,
       CASE WHEN n_chars < 100 THEN 'too_short'
            WHEN n_chars > 500 THEN 'too_long'
            WHEN diversity < 0.2 THEN 'low_diversity'
            WHEN top_tok_share > 0.12 THEN 'repetitive'
            ELSE 'kept' END AS reason,
       CASE WHEN n_chars < 100 THEN false
            WHEN n_chars > 500 THEN false
            WHEN diversity < 0.2 THEN false
            WHEN top_tok_share > 0.12 THEN false
            ELSE true END AS keep
FROM audit
""",
)
def ext_pipeline_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-cascade AUDIT (the CCNet-style quality gauntlet with
    receipts): every document gets a keep/drop verdict plus the
    FIRST gate that failed it — too_short → too_long →
    low_diversity → repetitive → kept. The reason codes are what
    make a 100 TB filtering run debuggable: "we dropped 31% of
    source X as repetitive" is an aggregation over this output,
    and re-admitting a gate's casualties is a filter, not a re-run.

    Determinism: all gates are integer-ratio thresholds; the two
    ratios are single divisions FLOOR-scaled to 1e-6 (not ROUNDed:
    n/2^k ratios land exactly on 6-dp rounding ties where the
    engines' half-up vs half-even disagree), and the thresholds
    (0.2, 0.12) sit far from any 6-dp boundary.

    Scale: one (doc, token) count and one doc rollup — two keyed
    shuffles; the verdict CASE is map-side. Gates ORDER matters and
    is part of the contract (first-fail attribution), mirrored
    exactly in the oracle.
    """
    d = read_table(spark, sf_dir, "documents")
    tok_counts = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = tok_counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    )
    audit = d.select("doc_id", "n_chars").join(stats, "doc_id").select(
        "doc_id",
        "n_chars",
        "n_tokens",
        # FLOOR-scale, not ROUND: n/2^k token ratios land exactly on
        # 6-dp rounding ties where Spark (half-up) and DuckDB
        # (half-even) disagree — the documented house rule
        (
            F.floor(
                F.col("n_distinct").cast("double")
                / F.col("n_tokens")
                * 1_000_000
            ).cast("double")
            / 1_000_000
        ).alias("diversity"),
        (
            F.floor(
                F.col("top_cnt").cast("double")
                / F.col("n_tokens")
                * 1_000_000
            ).cast("double")
            / 1_000_000
        ).alias("top_tok_share"),
    )
    reason = (
        F.when(F.col("n_chars") < 100, F.lit("too_short"))
        .when(F.col("n_chars") > 500, F.lit("too_long"))
        .when(F.col("diversity") < 0.2, F.lit("low_diversity"))
        .when(F.col("top_tok_share") > 0.12, F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    return audit.select(
        "doc_id",
        "n_tokens",
        "diversity",
        "top_tok_share",
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
    )


@register(
    "ext_pipeline_dpo",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, source,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_uniq
  FROM documents
),
s2 AS (
  SELECT doc_id, lang, source,
         (n_uniq * 10000) // n_tok AS score
  FROM scored WHERE n_tok > 0
),
rk AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY score DESC, doc_id) AS rk_best,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY score ASC, doc_id DESC) AS rk_worst,
         COUNT(*) OVER (PARTITION BY lang, source) AS n
  FROM s2
)
SELECT b.lang, b.source,
       b.rk_best AS pair_rank,
       b.doc_id AS chosen_doc_id,
       w.doc_id AS rejected_doc_id,
       b.score AS chosen_score,
       w.score AS rejected_score,
       b.score - w.score AS margin
FROM rk b
JOIN rk w ON b.lang = w.lang AND b.source = w.source
         AND w.rk_worst = b.rk_best
WHERE b.rk_best <= b.n // 2
  AND b.score - w.score >= 1
""",
)
def ext_pipeline_dpo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO / RLHF preference-pair construction — the fine-tuning leg
    after SFT (ext_pipeline_sft): within each (lang, source) prompt
    bucket, rank documents by a deterministic quality score
    (type-token ratio in scaled integer math: distinct-tokens ×
    10000 div tokens — no float whose rounding could reorder ties)
    and pair the i-th best with the i-th worst, chosen vs rejected,
    keeping pairs with a strictly positive margin. The standard
    "best-vs-worst within prompt group" pairing used to bootstrap
    preference data from quality signals.

    Spark-first: one map-side tokenize+score pass (whole-stage
    codegen, no Python), then two ROW_NUMBERs and a COUNT over the
    SAME (lang, source) window partition — Catalyst plans the
    opposite sort orders as two Window nodes over one exchange — and
    a self-join keyed on (lang, source, rank), co-partitioned with
    the windows so AQE reuses the layout. At 100 TB prompt buckets
    are the natural unit of skew: a zipf-hot source is handled by
    AQE skew-split on the self-join, and the rank windows stay
    bounded because ranking is per bucket, never global. Mirror-image
    tiebreaks ((score DESC, doc_id) vs (score ASC, doc_id DESC))
    make rk_worst = n - rk_best + 1 exactly, so chosen and rejected
    can never alias while ranks stay deterministic in both engines.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    ).filter(F.col("n_tok") > 0)
    s2 = scored.select(
        "doc_id",
        "lang",
        "source",
        F.expr("(n_uniq * 10000) div n_tok").alias("score"),
    )
    bucket = ["lang", "source"]
    w_best = Window.partitionBy(*bucket).orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    w_worst = Window.partitionBy(*bucket).orderBy(
        F.col("score").asc(), F.col("doc_id").desc()
    )
    rk = s2.select(
        "*",
        F.row_number().over(w_best).alias("rk_best"),
        F.row_number().over(w_worst).alias("rk_worst"),
        F.count(F.lit(1)).over(Window.partitionBy(*bucket)).alias("n"),
    )
    b = rk.select(
        "lang", "source",
        F.col("rk_best").alias("pair_rank"),
        F.col("doc_id").alias("chosen_doc_id"),
        F.col("score").alias("chosen_score"),
        F.col("n"),
    )
    w_side = rk.select(
        "lang", "source",
        F.col("rk_worst").alias("pair_rank"),
        F.col("doc_id").alias("rejected_doc_id"),
        F.col("score").alias("rejected_score"),
    )
    return (
        b.join(w_side, ["lang", "source", "pair_rank"])
        .filter(
            (F.col("pair_rank") <= F.expr("n div 2"))
            & (F.col("chosen_score") - F.col("rejected_score") >= 1)
        )
        .select(
            "lang", "source", "pair_rank",
            "chosen_doc_id", "rejected_doc_id",
            "chosen_score", "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
        )
    )


@register(
    "ext_sample_importance",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, source,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_uniq
  FROM documents
),
w AS (
  SELECT doc_id, lang, source,
         LEAST(10000, (n_uniq * 20000) // n_tok) AS keep_micro,
         ('0x' || substr(md5('imp:' || doc_id), 1, 8))::BIGINT % 10000
           AS bucket
  FROM scored WHERE n_tok > 0
)
SELECT doc_id, lang, source,
       keep_micro,
       10000000000 // keep_micro AS ipw_micro
FROM w
WHERE bucket < keep_micro
""",
)
def ext_sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling — keep each document with
    probability proportional to a quality proxy (type-token ratio,
    capped at 1), and emit the inverse-propensity weight that makes
    downstream statistics unbiased (Horvitz-Thompson). The doc-level
    sibling of ext_sample_temperature's source-level remix: quality
    upsampling at the document grain is how pretraining mixes favor
    clean text without hard-dropping the tail.

    Spark-first: entirely map-side — score, cap, portable-md5 bucket,
    threshold compare, all integer arithmetic inside whole-stage
    codegen; ZERO shuffles, and the selection is partitioning- and
    scale-invariant (each doc's fate depends only on its own id).
    The keep probability lives in basis points (LEAST caps at 10000)
    and the IPW in scaled integer micro-units — floor division in
    both engines, no float boundary.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    ).filter(F.col("n_tok") > 0)
    w = scored.select(
        "doc_id",
        "lang",
        "source",
        F.least(
            F.lit(10000).cast("long"),
            F.expr("(n_uniq * 20000) div n_tok"),
        ).alias("keep_micro"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("imp:"), F.col("doc_id"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 10000
        ).alias("bucket"),
    )
    return w.filter(F.col("bucket") < F.col("keep_micro")).select(
        "doc_id",
        "lang",
        "source",
        "keep_micro",
        F.expr("10000000000 div keep_micro").alias("ipw_micro"),
    )


@register(
    "ext_split_leakage",
    oracle="""
WITH f AS (
  SELECT doc_id, lang,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS fp,
         CASE WHEN ('0x' || substr(md5('holdout:' || doc_id), 1, 8))::BIGINT
                   % 100 < 10
              THEN 'val' ELSE 'train' END AS split
  FROM documents
)
SELECT v.doc_id, v.lang,
       MIN(t.doc_id) AS witness_train_doc_id,
       COUNT(*) AS n_train_dups
FROM f v JOIN f t ON v.fp = t.fp
WHERE v.split = 'val' AND t.split = 'train'
GROUP BY 1, 2
""",
)
def ext_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/validation split-leakage audit — every held-out document
    whose canonical fingerprint (sorted distinct tokens, the
    ext_text_fingerprint canon) also appears in the training split,
    with one witness train doc and the duplicate count. The check
    that keeps eval numbers honest: a val doc with a train-side twin
    measures memorization, not generalization. Composes the
    ext_sample_holdout md5 split with the exact-canonical dup
    relation — the doc-level sibling of ext_text_contamination's
    n-gram benchmark decontamination.

    Spark-first: fingerprint + split label are map-side; the
    val↔train match is ONE equi-join on the fingerprint hash with
    both sides shuffled on fp, and the witness aggregation groups on
    the SAME key, so AQE reuses the exchange. Output is one row per
    leaked VAL doc — deliberately NOT the all-pairs form, whose row
    count grows with dup-cluster size squared (6.3k pairs vs 107
    leaked docs at sf0.1 here; at 100 TB a boilerplate cluster of
    10^5 copies would emit 10^9 pairs) — the aggregate keeps the
    result linear in the held-out set while still counting every
    train twin. Zipf-hot fingerprints are the skew case: AQE
    skew-split handles the join, and the groupBy collapses map-side.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    f = d.select(
        "doc_id",
        "lang",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(toks)), " ")
        ).alias("fp"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("holdout:"), F.col("doc_id"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 100
            < 10,
            F.lit("val"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    val = f.filter(F.col("split") == "val").select("doc_id", "lang", "fp")
    train = f.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("t_doc_id"), "fp"
    )
    return (
        val.join(train, "fp")
        .groupBy("doc_id", "lang")
        .agg(
            F.min("t_doc_id").alias("witness_train_doc_id"),
            F.count(F.lit(1)).alias("n_train_dups"),
        )
    )


# --- learned quality filter: linear probe trained against the LM teacher ----

_LP_ITERS = 4  # bounded gradient-descent depth (fixed, both engines)
_LP_LR_DEN = 8  # learning rate = 1/_LP_LR_DEN

#: feature expressions in MILLI units, all in [0, 1000] so the GD
#: step size has a data-independent stability bound (λmax of the
#: normalized Gram matrix ≤ n_features, so lr = 1/8 < 2/4 converges)
_LP_NFEAT = 4


def _lp_fdiv_sql(a: str, b: str) -> str:
    """FLOOR division for any-sign numerator, positive divisor —
    DuckDB spelling. `(a - posmod(a, b))` is exactly divisible, so
    `//`'s rounding convention is irrelevant."""
    return f"((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) // ({b}))"


def _lp_oracle(iters: int = _LP_ITERS) -> str:
    """DuckDB twin of the probe-training loop: the teacher-score CTE
    (the perplexity queries' scoring, text_analysis.py), the milli-
    scaled surface features, then one (pred → grad → weights) CTE
    triple per GD iteration — generated programmatically so the SQL
    and the Spark loop share iteration structure by construction."""
    f = _lp_fdiv_sql
    dot = "w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3"
    parts = [
        f"""toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
), corpus AS (
  SELECT token, COUNT(*) AS c FROM toks GROUP BY token
), total AS (
  SELECT COUNT(*) AS n FROM toks
), scored AS (
  SELECT t.doc_id,
         ROUND(ln(CAST(c.c AS DOUBLE) / total.n), 6) AS logp
  FROM toks t JOIN corpus c ON t.token = c.token, total
), teacher AS (
  SELECT doc_id,
         CAST(ROUND(
           CAST(SUM(CAST(logp AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) * 1e6
         ) AS BIGINT) AS score_micro
  FROM scored GROUP BY doc_id
), surf AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS ndt,
         n_chars
  FROM documents
), feat AS (
  SELECT t.doc_id,
         {f("t.score_micro", "1000")} AS y,
         CAST(1000 AS BIGINT) AS x0,
         LEAST(s.nt * 10, 1000) AS x1,
         LEAST((s.n_chars * 100) // s.nt, 1000) AS x2,
         (s.ndt * 1000) // s.nt AS x3
  FROM teacher t JOIN surf s USING (doc_id)
), w0_ AS (
  SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3
)"""
    ]
    prev = "w0_"
    for it in range(1, iters + 1):
        pred = f(dot, "1000")
        grads = ", ".join(
            f"CAST(SUM((pred - y) * x{j}) AS BIGINT) AS s{j}"
            for j in range(_LP_NFEAT)
        )
        step = ", ".join(
            f"w{j} - {f(f's{j}', f'{1000 * _LP_LR_DEN} * n')} AS w{j}"
            for j in range(_LP_NFEAT)
        )
        parts.append(
            f""",
p{it} AS (
  SELECT fx.*, {pred} AS pred FROM feat fx CROSS JOIN {prev}
),
g{it} AS (
  SELECT {grads}, COUNT(*) AS n FROM p{it}
),
w{it} AS (
  SELECT {step} FROM {prev} CROSS JOIN g{it}
)"""
        )
        prev = f"w{it}"
    parts.append(
        f""",
pf AS (
  SELECT fx.doc_id, {f(dot, "1000")} AS pred FROM feat fx CROSS JOIN {prev}
),
mn AS (
  SELECT {f("CAST(SUM(pred) AS BIGINT)", "COUNT(*)")} AS m FROM pf
)
SELECT doc_id, pred, CAST(pred >= m AS INT) AS kept FROM pf, mn"""
    )
    return "WITH " + "".join(parts)


def _lp_fdiv(a, b):
    """FLOOR division (Column), exact over the FULL documented 2^62
    operand bound: (a - pmod(a, b)) is exactly divisible by b, and
    the division runs in DECIMAL(38,0) — not double, whose rounding
    is exact only below 2^53 (round-10 advisor item) — so the result
    is the true floor quotient bit-for-bit at any BIGINT scale, the
    same all-integer arithmetic as the DuckDB twin's `//` on the
    pre-subtracted numerator (_lp_fdiv_sql). The exact quotient has
    no fractional part, so the decimal result's scale-6 rounding
    never engages; pmod keeps the subtraction within |a| + |b| ≤
    2^63 for the documented bound."""
    num = (a - F.pmod(a, b)).cast("decimal(38,0)")
    return (num / b.cast("decimal(38,0)")).cast("long")


def _lp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from layer_apache_hive_spark.extensions.text_analysis import (
        _perplexity_doc_scores,
    )

    teacher = _perplexity_doc_scores(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    surf = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("long").alias("nt"),
        F.size(F.array_distinct(toks)).cast("long").alias("ndt"),
        "n_chars",
    )
    return teacher.join(surf, "doc_id").select(
        "doc_id",
        _lp_fdiv(F.col("score_micro"), F.lit(1000)).alias("y"),
        F.lit(1000).cast("long").alias("x0"),
        F.least(F.col("nt") * 10, F.lit(1000).cast("long")).alias("x1"),
        F.least(
            (F.col("n_chars") * 100) / F.col("nt"),
            F.lit(1000.0),
        )
        .cast("long")
        .alias("x2"),
        ((F.col("ndt") * 1000) / F.col("nt")).cast("long").alias("x3"),
    )


@register("ext_quality_linear_probe", oracle=_lp_oracle())
def ext_quality_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter — the CCNet/DCLM pattern: train a CHEAP
    linear probe (surface features: length, mean token length,
    type-token ratio, bias) against the EXPENSIVE teacher signal (the
    unigram-LM document score shared with the perplexity tiers), then
    filter with the probe. At 100 TB the teacher runs once on a
    sample to fit the probe; the probe itself is four scalar-function
    features and a dot product — a map-only pass over the corpus.

    The trainer is _LP_ITERS (4) full-batch gradient-descent steps on
    squared loss in FIXED-POINT arithmetic: features and weights in
    milli units, every update FLOOR-divided (exact pmod identity), so
    the whole loop is BIGINT-exact and DuckDB replays it via the
    generated CTE chain (_lp_oracle — the ext_emb_kmeans_train
    oracle-generation idiom). lr = 1/_LP_LR_DEN (1/8) is stable by
    construction: features are normalized into [0, 1000] so the Gram
    matrix's spectral bound is data-independent.

    Scale/loop shape (the kmeans_train contract): model state (one
    4-weight row) lives in a broadcast DataFrame; each iteration adds
    ONE aggregation over the feature relation (map-side partials →
    scalar), the feature relation itself is computed once behind a
    lazy executor-side localCheckpoint, and the driver never touches
    a data row. Gradient sums stay < 2^62 here; at corpus scale the
    same sums move to DECIMAL(38,0) accumulation unchanged.
    """
    feat = _lp_features(spark, sf_dir).localCheckpoint(eager=False)
    w = _lp_train(spark, feat, _LP_ITERS)
    dot = _lp_dot()
    pf = feat.crossJoin(F.broadcast(w)).select(
        "doc_id", _lp_fdiv(dot, F.lit(1000)).alias("pred")
    )
    mn = pf.agg(
        _lp_fdiv(
            F.sum("pred"), F.count(F.lit(1))
        ).alias("m")
    )
    return pf.crossJoin(F.broadcast(mn)).select(
        "doc_id",
        "pred",
        (F.col("pred") >= F.col("m")).cast("int").alias("kept"),
    )


def _lp_dot():
    return sum(F.col(f"w{j}") * F.col(f"x{j}") for j in range(_LP_NFEAT))


def _lp_train(spark: SparkSession, feat: DataFrame, iters: int) -> DataFrame:
    """Run ``iters`` GD steps over the feature relation; returns the
    1-row weight DataFrame (model state never touches the driver)."""
    w = spark.range(1).select(
        *[F.lit(0).cast("long").alias(f"w{j}") for j in range(_LP_NFEAT)]
    )
    dot = _lp_dot()
    for _ in range(iters):
        p = feat.crossJoin(F.broadcast(w)).withColumn(
            "pred", _lp_fdiv(dot, F.lit(1000))
        )
        g = p.agg(
            *[
                F.sum((F.col("pred") - F.col("y")) * F.col(f"x{j}")).alias(
                    f"s{j}"
                )
                for j in range(_LP_NFEAT)
            ],
            F.count(F.lit(1)).alias("n"),
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                *[
                    (
                        F.col(f"w{j}")
                        - _lp_fdiv(
                            F.col(f"s{j}"),
                            F.lit(1000 * _LP_LR_DEN) * F.col("n"),
                        )
                    ).alias(f"w{j}")
                    for j in range(_LP_NFEAT)
                ]
            )
            .localCheckpoint(eager=False)
        )
    return w


# --- trained-quantizer IVF: the training loop feeding the ANN index ---------

_IVT_ITERS = 3  # Lloyd M-steps before the index freeze
_IVT_NPROBE = 2
_IVT_TOPK = 5
_IVT_NQ = 20  # query set: vec_id < 20 (the sim-family convention)


def _kmeans_centroids_after(
    spark: SparkSession, sf_dir: str, iters: int
) -> tuple[DataFrame, DataFrame]:
    """(vec, cent): the FLOOR-scaled integer vector relation and the
    centroid table after ``iters`` Lloyd M-steps from the
    deterministic vec_id < _KM_K seeds — the ext_emb_kmeans_train
    kernel re-exposed as (state in, state out) so downstream
    consumers (the trained-quantizer IVF index) can freeze the model.
    Same loop contract: centroids stay k-row broadcast DataFrames,
    per-iteration lineage truncated by a lazy executor-side
    localCheckpoint, integer-grid re-quantization keeps every step
    BIGINT-exact."""
    scale = f"CAST(FLOOR(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT)"
    vec = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(f"transform(embedding, x -> {scale})").alias("sv"),
    )
    # consumed by every iteration's crossJoin + join-back and by the
    # downstream index build/search — one barrier instead of a
    # parquet re-scan per consumer (r13; guide §5)
    vec = vec.localCheckpoint(eager=False)
    cent = vec.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("sv").alias("sc")
    )
    # same expression-argmin E-step as _kmeans_train_frame (r13): the
    # k centroids fold into one broadcast array row and the
    # assignment is a map-only array_min(transform(...)) — no argmin
    # Exchange, no join back to the vector relation; struct-min
    # preserves the exact (d2, cluster_id) order.
    best = F.expr(
        "array_min(transform(cents, c -> struct("
        " aggregate(zip_with(sv, c.sc, (x, cc) -> x - cc), 0L,"
        "           (acc, dx) -> acc + dx * dx) AS d2,"
        " c.cluster_id AS cluster_id)))"
    )
    for _ in range(iters):
        cent_arr = cent.groupBy().agg(
            F.expr(
                "array_sort(collect_list(struct(cluster_id, sc)))"
            ).alias("cents")
        )
        # single consumer (the M-step): no assignment checkpoint —
        # lineage truncates on the k-row MODEL below, so executors
        # persist k rows per iteration, never the corpus (r13 s3;
        # guide §5)
        asg = (
            vec.crossJoin(F.broadcast(cent_arr))
            .withColumn("b", best)
            .select(
                "vec_id",
                F.col("b.cluster_id").alias("cluster_id"),
                "sv",
            )
        )
        dimsums = (
            asg.select("cluster_id", F.posexplode("sv").alias("pos", "xi"))
            .groupBy("cluster_id", "pos")
            .agg(
                F.floor(F.sum("xi").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("ci")
            )
        )
        # per-iteration model barrier: also serves the downstream
        # index build + probe election, which both read the frozen
        # centroid table
        cent = (
            dimsums.groupBy("cluster_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, ci))),"
                    " s -> s.ci)"
                ).alias("sc")
            )
            .localCheckpoint(eager=False)
        )
    return vec, cent


def _ivf_trained_oracle(iters: int = _IVT_ITERS) -> str:
    """DuckDB twin of the trained-quantizer IVF: the Lloyd CTE chain
    (the _kmeans_train_oracle generator shape) up to cent{iters+1},
    then index assignment, probe ranking, candidate join, and exact
    integer-L2 top-k — every stage BIGINT, so the whole
    train-then-search composition is value-replayable."""
    parts = [
        f"""ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * {_KM_SCALE}) AS BIGINT) AS xi
  FROM embeddings CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS s(i)
),
cent1 AS (SELECT vec_id AS cluster_id, dim, xi AS ci
          FROM ex WHERE vec_id < {_KM_K})"""
    ]
    for it in range(1, iters + 1):
        parts.append(
            f""",
d{it} AS (
  SELECT e.vec_id, c.cluster_id,
         SUM((e.xi - c.ci) * (e.xi - c.ci)) AS d2
  FROM ex e JOIN cent{it} c USING (dim) GROUP BY 1, 2
),
a{it} AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster_id) AS rn
    FROM d{it}) WHERE rn = 1
),
cent{it + 1} AS (
  SELECT a.cluster_id, e.dim,
         CAST(FLOOR(CAST(SUM(e.xi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
  FROM a{it} a JOIN ex e USING (vec_id) GROUP BY 1, 2
)"""
        )
    cf = f"cent{iters + 1}"
    parts.append(
        f""",
didx AS (
  SELECT e.vec_id, c.cluster_id,
         SUM((e.xi - c.ci) * (e.xi - c.ci)) AS d2
  FROM ex e JOIN {cf} c USING (dim) GROUP BY 1, 2
),
aidx AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster_id) AS rn
    FROM didx) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster_id) AS pr
    FROM didx WHERE vec_id < {_IVT_NQ}) WHERE pr <= {_IVT_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN aidx a USING (cluster_id)
  WHERE a.vec_id <> p.query_id
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
  FROM dots) WHERE rank <= {_IVT_TOPK}"""
    )
    return "WITH " + "".join(parts)


@register("ext_sim_ivf_trained", oracle=_ivf_trained_oracle())
def ext_sim_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer — the training loop
    (ext_emb_kmeans_train's Lloyd kernel, 3 M-steps) feeding the
    similarity index (ext_sim_ivf_nprobe's probe protocol), i.e. the
    actual FAISS/IVF build pipeline: train centroids on the corpus,
    freeze them, assign every vector to its cell, then serve queries
    by ranking centroids and exactly scoring only the nprobe=2 probed
    cells. Distance is the SAME integer-grid L2 the trainer uses, so
    the entire train→index→search composition is BIGINT-exact and
    DuckDB replays it end to end (generated CTE chain).

    100 TB shape: training cost is _IVT_ITERS × the Lloyd step (k-way
    map fan-out + two keyed reductions, constant exchanges per
    iteration); the frozen centroid table is K×d rows (broadcast by
    construction); index assignment is one map pass; the candidate
    join shuffles on the cell key so per-query work is nprobe/K of
    the corpus. The untrained tiers (ext_sim_ivf / _nprobe, label
    cells) stay registered as the recall baseline — STRESS.json's
    clustered gate measures what training buys.
    """
    vec, cent = _kmeans_centroids_after(spark, sf_dir, _IVT_ITERS)
    d2 = F.expr(
        "aggregate(zip_with(sv, sc, (x, c) -> x - c), 0L,"
        " (acc, dx) -> acc + dx * dx)"
    )
    scored = vec.crossJoin(F.broadcast(cent)).withColumn("d2", d2)
    aidx = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cluster_id")).alias("b"))
        .select("vec_id", F.col("b.cluster_id").alias("cluster_id"))
    )
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("cluster_id").asc()
    )
    probes = (
        scored.filter(F.col("vec_id") < _IVT_NQ)
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= _IVT_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cluster_id")
    )
    cand = (
        F.broadcast(probes)
        .join(aidx, "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qv = vec.select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qv")
    ).filter(F.col("query_id") < _IVT_NQ)
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
        F.col("rank") <= _IVT_TOPK
    )
