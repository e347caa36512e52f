"""Multimodal columns (SURVEY.md §2.11): image/audio/video payloads as
opaque BinaryType columns + typed StructType metadata, processed by
Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the DECODE step is a
clearly-marked deterministic fake (and the real-library call path
raises NotImplementedError behind a flag) — but everything Spark-side
is real and tested: the binary column construction, the metadata
struct schema, the mapInPandas signature/batching, and the
partitioning shape.

Scale notes (100 TB of media): payloads stay in binary columns
(parquet keeps them out of dictionary encoding); decode/feature
extraction is mapInPandas so each task streams Arrow batches without
driver involvement; repartition by a content-hash prefix balances
skew from variable payload sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register

# Flip to True in an environment with real codecs (PIL/librosa/ffmpeg).
REAL_DECODERS_AVAILABLE = False


@register(
    "ext_multimodal_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS payload_bytes,
       n_chars AS meta_n_chars,
       lang AS meta_lang,
       CAST(n_chars % 640 AS INTEGER) AS meta_width,
       CAST(n_chars % 480 AS INTEGER) AS meta_height,
       octet_length(encode(text)) = n_chars AS ascii_clean
FROM documents
""",
)
def ext_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column modeling: binary payload + typed metadata.

    documents.text stands in for a media payload (cast to BinaryType);
    metadata is a StructType column with typed fields. The oracle
    checks the byte-level view (octet_length over the encoded payload)
    — i.e. the schema plumbing, which is the real deliverable here.
    """
    d = read_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    meta = F.struct(
        F.col("n_chars").alias("n_chars"),
        F.col("lang").alias("lang"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
    )
    return d.select(
        "doc_id",
        payload.alias("payload"),
        meta.alias("meta"),
    ).select(
        "doc_id",
        F.length("payload").alias("payload_bytes"),
        F.col("meta.n_chars").alias("meta_n_chars"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.width").alias("meta_width"),
        F.col("meta.height").alias("meta_height"),
        (F.length("payload") == F.col("meta.n_chars")).alias("ascii_clean"),
    )


@register(
    "ext_multimodal_cols",
    oracle="""
SELECT d.doc_id,
       octet_length(encode(d.text)) AS payload_bytes,
       d.lang AS meta_lang,
       CAST(d.n_chars % 640 AS INTEGER) AS meta_width,
       len(e.embedding) AS emb_dim,
       CAST(list_sum(list_transform(
           e.embedding,
           x -> CAST(FLOOR(ABS(CAST(x AS DOUBLE)) * 1e12) AS BIGINT)
       )) AS DOUBLE) / 1e12 AS emb_l1
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def ext_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema contract for a full multimodal relation (SURVEY §2.11
    ``ext_multimodal_cols``): binary payload + typed StructType
    metadata + embedding array<float> side by side in ONE relation —
    the row layout a multimodal training shard actually carries.

    The relation is built with all three column kinds, then projected
    to scalar invariants of each (the driver canonicalizer cannot sort
    complex cells): payload byte length, struct fields, embedding
    dimension and its FLOOR-scaled L1 norm (the similarity.py
    decimal-dot convention, so the value is bit-identical in DuckDB).

    Scale: one equi-join documents⋈embeddings on the id — at 100 TB
    both sides bucket/partition by doc_id so the join co-locates;
    payload bytes never leave the scan (only lengths are projected).
    """
    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")
    rel = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.col("text").cast("binary").alias("payload"),
            F.struct(
                F.col("lang").alias("lang"),
                (F.col("n_chars") % 640).cast("int").alias("width"),
            ).alias("meta"),
            "embedding",
        )
    )
    l1 = F.expr(
        "CAST(aggregate(embedding, CAST(0 AS BIGINT), "
        "(acc, x) -> acc + CAST(FLOOR(ABS(CAST(x AS DOUBLE)) * 1e12) "
        "AS BIGINT)) AS DOUBLE) / 1e12"
    )
    return rel.select(
        "doc_id",
        F.length("payload").alias("payload_bytes"),
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.width").alias("meta_width"),
        F.size("embedding").alias("emb_dim"),
        l1.alias("emb_l1"),
    )


def _decode_media(payload: bytes, width: int, height: int) -> list[float]:
    """Feature-extract a media payload.

    REAL PATH (stubbed): decode image bytes → resize → pooled features.
    FAKE PATH: deterministic 4-dim feature from the raw bytes, so the
    full pipeline is testable without codecs.
    """
    if REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "real decode path requires an image library (PIL/opencv); "
            "not installed in this environment by design"
        )
    n = len(payload) or 1
    byte_sum = sum(payload)
    return [
        float(n),
        float(byte_sum % 256),
        float(byte_sum / n),
        float(width * height % 1000),
    ]


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature batch out."""
    for pdf in it:
        feats = [
            _decode_media(p, w, h)
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
        ]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "feat_len": [f[0] for f in feats],
                "feat_bytemod": [f[1] for f in feats],
                "feat_bytemean": [f[2] for f in feats],
                "feat_dims": [f[3] for f in feats],
            }
        )
        yield out


@register(
    "ext_multimodal_decode",
    oracle="""
WITH b AS (
  SELECT doc_id, n_chars,
         len(text) AS n,
         CAST(list_sum(list_transform(range(1, len(text) + 1),
              i -> ord(text[i]))) AS BIGINT) AS bytesum
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN n = 0 THEN 1 ELSE n END AS DOUBLE) AS feat_len,
       CAST(bytesum % 256 AS DOUBLE) AS feat_bytemod,
       bytesum::DOUBLE / (CASE WHEN n = 0 THEN 1 ELSE n END) AS feat_bytemean,
       CAST(((n_chars % 640) * (n_chars % 480)) % 1000 AS DOUBLE) AS feat_dims
FROM b
""",
)
def ext_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract over binary payloads via mapInPandas.

    The decoder runs Python-side by design (a real codec would too —
    that is the point of the mapInPandas shape); because the fake
    decode is pure byte arithmetic and the fixture payloads are ASCII
    (probed: octet_length == len at every sf), the whole pipeline is
    value-checked against a DuckDB byte-arithmetic twin rather than
    rows-only. The repartition(8, doc_id) spreads variable-size
    payloads; at 100 TB partition count comes from data size / 128MB,
    not a literal.
    """
    d = read_table(spark, sf_dir, "documents")
    src = d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
    ).repartition(8, "doc_id")
    return src.mapInPandas(
        _decode_batches,
        schema=(
            "doc_id long, feat_len double, feat_bytemod double, "
            "feat_bytemean double, feat_dims double"
        ),
    )


_RESIZE_W, _RESIZE_H = 16, 16  # target "thumbnail" byte budget


def _resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary in, size-bounded binary out.

    REAL PATH (stubbed behind REAL_DECODERS_AVAILABLE): decode →
    bilinear resize → re-encode. FAKE PATH: deterministic byte
    truncation to the target budget — same schema, batching, and
    binary-in/binary-out shape as the real thing.
    """
    budget = _RESIZE_W * _RESIZE_H
    for pdf in it:
        if REAL_DECODERS_AVAILABLE:
            raise NotImplementedError("real resize needs an image library")
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "thumb": [bytes(p[:budget]) for p in pdf["payload"]],
                "thumb_w": _RESIZE_W,
                "thumb_h": _RESIZE_H,
            }
        )
        yield out


@register(
    "ext_multimodal_resize",
    oracle=f"""
SELECT doc_id,
       LEAST(n_chars, {_RESIZE_W * _RESIZE_H}) AS thumb_bytes,
       {_RESIZE_W} AS thumb_w, {_RESIZE_H} AS thumb_h
FROM documents
""",
)
def ext_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail over binary payloads (mapInPandas, binary →
    binary). The oracle checks the byte-level contract of the fake
    path (output bounded by the target budget)."""
    d = read_table(spark, sf_dir, "documents")
    src = d.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    ).repartition(8, "doc_id")
    resized = src.mapInPandas(
        _resize_batches,
        schema="doc_id long, thumb binary, thumb_w int, thumb_h int",
    )
    return resized.select(
        "doc_id",
        F.length("thumb").alias("thumb_bytes"),
        "thumb_w",
        "thumb_h",
    )


_FRAME_BYTES, _FRAME_STRIDE = 32, 2  # frame size; keep every 2nd frame


def _framesample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one row in → one row per SAMPLED frame out
    (the UDTF/posexplode shape for media)."""
    for pdf in it:
        ids, frames, nos = [], [], []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(p) + _FRAME_BYTES - 1) // _FRAME_BYTES
            for i in range(0, n_frames, _FRAME_STRIDE):
                ids.append(doc_id)
                nos.append(i)
                frames.append(bytes(p[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]))
        yield pd.DataFrame(
            {"doc_id": pd.array(ids, dtype="int64"),
             "frame_no": pd.array(nos, dtype="int64"),
             "frame": frames}
        )


@register(
    "ext_multimodal_framesample",
    oracle=f"""
SELECT d.doc_id,
       f.i AS frame_no,
       LEAST({_FRAME_BYTES}, d.n_chars - f.i * {_FRAME_BYTES}) AS frame_bytes
FROM documents d
CROSS JOIN LATERAL (
  SELECT unnest(range(0, CAST(CEIL(d.n_chars / {_FRAME_BYTES}.0) AS BIGINT))) AS i
) f
WHERE f.i % {_FRAME_STRIDE} = 0
""",
)
def ext_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a video-shaped binary payload: fixed-size
    byte frames, keep every k-th (mapInPandas fan-out — one input row,
    many frame rows). Oracle checks frame numbering + byte lengths."""
    d = read_table(spark, sf_dir, "documents")
    src = d.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    ).repartition(8, "doc_id")
    frames = src.mapInPandas(
        _framesample_batches, schema="doc_id long, frame_no long, frame binary"
    )
    return frames.select(
        "doc_id", "frame_no", F.length("frame").alias("frame_bytes")
    )


# Micro-batch size for the fake "model" — the GPU-memory knob in a
# real deployment. Decoupled from Arrow batch size on purpose: Arrow
# batches arrive at whatever size maxRecordsPerBatch gives, and the
# inference loop re-chunks them so device memory is bounded.
_INFER_BATCH = 64


def _fake_embed(payloads) -> "np.ndarray":
    """Deterministic stand-in for an embedding model: 256-bin byte
    histogram folded to 8 dims, L2-normalized. Pure numpy — the same
    bytes give the same vector on any host, any batch size."""
    import numpy as np

    out = np.zeros((len(payloads), 8), dtype=np.float64)
    for i, p in enumerate(payloads):
        b = np.frombuffer(bytes(p), dtype=np.uint8)
        hist = np.bincount(b, minlength=256).astype(np.float64)
        out[i] = hist.reshape(8, 32).sum(axis=1)
    nrm = np.sqrt((out * out).sum(axis=1, keepdims=True))
    nrm[nrm == 0] = 1.0
    return out / nrm


_EMBED_ORACLE = (
    """
WITH ex AS (
  SELECT doc_id, ord(text[CAST(i AS INT)]) // 32 AS k
  FROM documents, LATERAL (SELECT unnest(range(1, len(text) + 1)) AS i)
), hist AS (
  SELECT doc_id, k, COUNT(*)::DOUBLE AS c FROM ex GROUP BY doc_id, k
), vec AS (
  SELECT d.doc_id, g.k, COALESCE(h.c, 0) AS v
  FROM documents d
  CROSS JOIN (SELECT unnest(range(8)) AS k) g
  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.k = g.k
), nrm AS (
  SELECT doc_id,
         CASE WHEN sqrt(SUM(v * v)) = 0 THEN 1 ELSE sqrt(SUM(v * v)) END AS nv
  FROM vec GROUP BY doc_id
)
SELECT v.doc_id,
"""
    + ",\n".join(
        f"       MAX(CASE WHEN v.k = {k} THEN v.v / n.nv END) AS emb_{k}"
        for k in range(8)
    )
    + """
FROM vec v JOIN nrm n ON n.doc_id = v.doc_id
GROUP BY v.doc_id
"""
)


@register("ext_multimodal_embed", oracle=_EMBED_ORACLE)
def ext_multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched model inference over media payloads — the
    embed-everything pass of a multimodal training pipeline.

    mapInPandas streams Arrow batches; an inner loop re-chunks them to
    _INFER_BATCH rows per model call so accelerator memory stays
    bounded regardless of Arrow batch sizing. The "model" is a
    deterministic fake (byte-histogram projection, see _fake_embed) —
    the real one is a drop-in at the same call site. Value-checked
    against a DuckDB twin: histogram counts are exact integers, the
    squared-norm is an exact integer < 2^53, and IEEE sqrt/division
    are correctly rounded in both engines, so the normalized vectors
    are bit-identical. tests/test_properties.py additionally pins
    batch-size invariance (results must not depend on the chunking)
    and determinism.

    At 100 TB: payloads never leave executors, one Python worker per
    core streams chunks, and `repartition` upstream balances variable
    payload sizes; swap _fake_embed for the real model + a GPU
    scheduling pool and nothing else changes.
    """
    import numpy as np  # noqa: F401 (worker-side import check)

    d = read_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), _INFER_BATCH):
                chunk = pdf.iloc[lo : lo + _INFER_BATCH]
                emb = _fake_embed(list(chunk["payload"]))
                out = {"doc_id": chunk["doc_id"].to_numpy()}
                for k in range(8):
                    out[f"emb_{k}"] = emb[:, k]
                yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(f"emb_{k} double" for k in range(8))
    return payloads.mapInPandas(infer, schema=schema)
