"""Property-based tests (hypothesis) for the hand-built kernels.

The oracle suite checks fixed datasets; these check the *algebraic
claims* the implementations rest on, over generated inputs:

- dsum is partition-layout invariant (the determinism story for every
  double aggregate in the oracle suite);
- the block-pair cosine kernel equals a single-threaded numpy brute
  force with the same FLOOR-scaled integer math (exactness of the
  distributed decomposition);
- the prefix-filter near-dup pipeline finds EXACTLY the pairs a brute
  force finds (completeness theorem holds in the implementation).
"""

from __future__ import annotations

import itertools
import uuid
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from layer_apache_hive_spark.functions.numeric import dsum

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=120,
    ),
    nparts=st.integers(1, 8),
)
def test_dsum_is_partition_invariant(spark, vals, nparts):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = df.repartition(nparts).agg(dsum("v").alias("s")).collect()[0]["s"]
    q = Decimal("0.0001")
    expected = float(
        sum(Decimal(float(v)).quantize(q, rounding=ROUND_HALF_UP) for v in vals)
    )
    assert got == expected


@settings(**_SETTINGS)
@given(
    data=st.data(),
    n=st.integers(2, 24),
    dim=st.integers(2, 8),
)
def test_allpairs_cosine_matches_bruteforce(spark, data, n, dim):
    from layer_apache_hive_spark.extensions.similarity import _allpairs_cosine

    theta = 0.0  # emit everything; exactness is the property
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    vecs = (rng.standard_normal((n, dim)) * 0.2).astype(np.float32)
    # avoid zero-norm vectors (cosine undefined)
    vecs[np.abs(vecs).sum(1) == 0] += 0.1
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in _allpairs_cosine(df, theta).collect()
    }

    v64 = vecs.astype(np.float64)
    norms = np.sqrt(np.floor(v64 * v64 * 1e12).astype(np.int64).sum(1) / 1e12)
    expected = {}
    for a, b in itertools.combinations(range(n), 2):
        dot = np.floor(v64[a] * v64[b] * 1e12).astype(np.int64).sum() / 1e12
        cos = dot / (norms[a] * norms[b])
        if cos >= theta:
            expected[(a, b)] = cos
    assert got == expected


def _brute_jaccard_pairs(texts, tau):
    def shingles(t):
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else None

    sets = {i: s for i, t in enumerate(texts) if (s := shingles(t))}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a]) + len(sets[b]) - inter
        if union and inter / union >= tau:
            out[(a, b)] = inter
    return out


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["join", "scan", "filter", "agg", "sort", "row"]),
            min_size=3,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=20,
    )
)
def test_prefix_filter_neardup_is_complete(spark, tmp_path_factory, texts):
    """The PPJoin prefix/length/positional filters must be lossless:
    pipeline output == brute-force shingle-Jaccard on any corpus."""
    from layer_apache_hive_spark.extensions.dedup import _TAU, ext_dedup_near

    d = tmp_path_factory.mktemp(f"neardup_{uuid.uuid4().hex[:8]}")
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    pdf.to_parquet(d / "documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]): r["shared_shingles"]
        for r in ext_dedup_near(spark, str(d)).collect()
    }
    assert got == _brute_jaccard_pairs(texts, _TAU)
