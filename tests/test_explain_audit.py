"""Regression gate over physical-plan quality: every registered
query's plan must stay free of the scale red flags defined in
layer_apache_hive_spark/plan_audit.py (surprise nested-loop joins,
row-at-a-time Python UDFs, non-top-k global sorts).

Streaming mirrors are excluded: their registered callable runs the
stream and returns a memory-sink table, whose scan plan is trivially
clean and says nothing about the streaming job itself.
"""

from __future__ import annotations

import pytest

from layer_apache_hive_spark.plan_audit import audit, explain_formatted
from layer_apache_hive_spark.registry import _REGISTRY, _load_all_modules
from tests.conftest import SF_DIR

_load_all_modules()
_SKIP = {"evt_watermark_late", "evt_sessionize_state"}
_IDS = [
    q
    for q in sorted(_REGISTRY)
    if not q.startswith("evt_stream") and q not in _SKIP
]


@pytest.mark.parametrize("qid", _IDS)
def test_plan_has_no_scale_red_flags(spark, qid):
    df = _REGISTRY[qid].fn(spark, SF_DIR)
    plan = explain_formatted(spark, df)
    flags = audit(qid, plan)
    assert not flags, (
        f"{qid} plan regressed: {flags}\n--- plan head ---\n{plan[:3000]}"
    )
