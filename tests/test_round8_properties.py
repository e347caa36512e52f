"""Round-8 properties: the broadcast-vocabulary gate (round-7 verdict
"what's wrong" #2) — tfidf / unigram-LM / langid must switch their
model-side join from broadcast to keyed shuffle above the measured
vocabulary threshold, with values unchanged on both paths."""

from __future__ import annotations

import pytest

from layer_apache_hive_spark.extensions import text_analysis as ta

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable the optimizer's own size-estimate broadcasts so the
    only BroadcastHashJoin in a plan is a HINTED one — making the
    gate's hint-vs-no-hint decision directly assertable."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


@pytest.mark.parametrize(
    "query_id",
    ["ext_text_tfidf", "ext_text_unigram_lm", "ext_text_langid"],
)
def test_vocab_gate_switches_join_strategy(
    spark, no_auto_broadcast, monkeypatch, query_id
):
    """Below the gate the model join carries the broadcast hint; a
    forced-tiny gate (the 100 TB raw-vocabulary stand-in) drops the
    hint so the join shuffles on its key — and the VALUES are
    identical either way."""
    from layer_apache_hive_spark.registry import _REGISTRY, _load_all_modules

    _load_all_modules()
    fn = _REGISTRY[query_id].fn

    small_df = fn(spark, SF_DIR)
    assert "BroadcastHashJoin" in _plan(small_df), (
        f"{query_id}: model join not broadcast below the gate"
    )
    small = _rows(small_df)

    monkeypatch.setattr(ta, "_BROADCAST_VOCAB_MAX", 0)
    large_df = fn(spark, SF_DIR)
    plan = _plan(large_df)
    assert "BroadcastHashJoin" not in plan, (
        f"{query_id}: model side still broadcast above the gate:\n"
        + plan[:2000]
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
    assert _rows(large_df) == small, (
        f"{query_id}: keyed path changed values"
    )


def test_vocab_gate_constant_is_sane():
    """The gate must stay in the broadcast-safe zone: positive and
    well under a memory-hazard row count (10^8)."""
    assert 0 < ta._BROADCAST_VOCAB_MAX <= 50_000_000
