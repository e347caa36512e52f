"""Physical-semantics checks that SQL oracles can't express
(SURVEY §2.6): per-partition ordering and key co-location.
"""

from __future__ import annotations

import pandas as pd

from layer_apache_hive_spark.registry import _REGISTRY, _load_all_modules
from tests.conftest import SF_DIR

_load_all_modules()


def test_sort_by_is_monotonic_per_partition(spark):
    """SORT BY guarantees order WITHIN each partition only."""
    df = _REGISTRY["sort_sort_by"].fn(spark, SF_DIR)

    def check(it):
        for pdf in it:
            ok = pdf["l_shipdate"].is_monotonic_increasing
            yield pd.DataFrame({"ok": [bool(ok)], "n": [len(pdf)]})

    res = df.mapInPandas(check, schema="ok boolean, n long").collect()
    assert res and all(r["ok"] for r in res)


def test_distribute_by_colocates_keys(spark):
    """DISTRIBUTE BY: all rows of a key land in exactly one partition."""
    from pyspark.sql import functions as F

    df = _REGISTRY["sort_distribute_by"].fn(spark, SF_DIR)
    spread = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("o_custkey")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .agg(F.max("n_parts").alias("worst"))
        .collect()[0]["worst"]
    )
    assert spread == 1


def test_partition_prune_scan_reads_one_directory(spark):
    """The partition-key predicate must reach the scan as a
    PartitionFilter (pruned file listing), not a post-scan Filter."""
    df = _REGISTRY["scan_partition_prune"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "1-URGENT" in plan.split("PartitionFilters")[1][:200]


def test_mapjoin_hint_broadcasts(spark):
    """Hive's MAPJOIN hint must lower to BroadcastHashJoin."""
    df = _REGISTRY["join_mapjoin_hint"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
