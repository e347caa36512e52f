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


def test_global_window_detector_separates_partitioned(spark):
    """The r10 unpartitioned-Window rule: a no-partition-spec window
    is detected, a partitioned one is not, and expression order keys
    (nested parens/commas inside windowspecdefinition) don't confuse
    the balanced-paren parse."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from layer_apache_hive_spark.plan_audit import _has_global_window

    df = spark.range(10).withColumn("g", F.col("id") % 2)
    glob = df.withColumn(
        "rn", F.row_number().over(Window.orderBy((F.col("id") + 1).desc()))
    )
    part = df.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("g").orderBy("id")),
    )
    both = part.withColumn(
        "rt", F.sum("id").over(Window.orderBy("id"))
    )
    assert _has_global_window(explain_formatted(spark, glob))
    assert not _has_global_window(explain_formatted(spark, part))
    assert _has_global_window(explain_formatted(spark, both))
    # and the audit flags it for a non-whitelisted id
    assert audit("some_new_query", explain_formatted(spark, glob)) == [
        "unpartitioned window (single-partition input)"
    ]


def test_global_window_whitelist_entries_are_live(spark):
    """Every GLOBAL_WINDOW_OK entry must actually HAVE a global
    window in its current plan — a stale whitelist row would let the
    next contributor hide a new corpus-sized global window behind an
    id that no longer needs the exemption."""
    from layer_apache_hive_spark.plan_audit import (
        GLOBAL_WINDOW_OK,
        _has_global_window,
    )

    for qid in sorted(GLOBAL_WINDOW_OK):
        df = _REGISTRY[qid].fn(spark, SF_DIR)
        plan = explain_formatted(spark, df)
        assert _has_global_window(plan), (
            f"{qid} is whitelisted but has no unpartitioned window — "
            "remove the stale GLOBAL_WINDOW_OK entry"
        )
