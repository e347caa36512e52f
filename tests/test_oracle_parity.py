"""The main correctness gate: every registered oracle-able query must
match its DuckDB twin exactly (row-count, schema names, values).

This parametrizes over the full registry, so adding an operator with
``@register(id, oracle=...)`` automatically adds its parity test.
"""

from __future__ import annotations

import pytest

from layer_apache_hive_spark.registry import _load_all_modules, _REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle

_load_all_modules()
_ORACLE_IDS = sorted(qid for qid, q in _REGISTRY.items() if q.oracle)
_ROWS_ONLY_IDS = sorted(qid for qid, q in _REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("qid", _ORACLE_IDS)
def test_oracle_parity(spark, oracle_con, qid):
    q = _REGISTRY[qid]
    assert_matches_oracle(q.fn(spark, SF_DIR), oracle_con, q.oracle)


@pytest.mark.parametrize("qid", _ROWS_ONLY_IDS)
def test_rows_only_runs(spark, qid):
    """No-oracle queries must at least run and return a stable schema."""
    q = _REGISTRY[qid]
    df = q.fn(spark, SF_DIR)
    assert df.columns  # non-empty schema
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())


def test_bench_prepass_ids_are_registered():
    """bench.py's untimed fixture prepass must reference only live
    registry ids — a renamed operator would otherwise silently turn
    the prepass into a KeyError at driver bench time."""
    import bench

    assert set(bench.FIXTURE_PREPASS) <= set(_REGISTRY)


def test_bucket_smb_plan_is_exchange_free(spark):
    """join_bucket_smb's point is physical: bucketed+sorted inputs ⇒
    sort-merge join AND downstream agg with zero Exchange nodes."""
    q = _REGISTRY["join_bucket_smb"]
    df = q.fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_approx_ndv_error(spark):
    """HLL++ estimates must stay within the configured 2% rsd (allow
    4x headroom for small-cardinality groups). The registered query
    emits this as in-bound booleans (its derived oracle expects TRUE);
    this test re-derives the bound from raw estimates independently so
    a broken bound expression can't vacuously pass."""
    from pyspark.sql import functions as F
    from layer_apache_hive_spark.catalog import read_table

    q = _REGISTRY["agg_approx_ndv"]
    rows = {r["l_returnflag"]: r for r in q.fn(spark, SF_DIR).collect()}
    assert rows
    for row in rows.values():
        assert row["ndv_orderkey_in_bound"] and row["ndv_partkey_in_bound"]

    approx = {
        r["l_returnflag"]: r
        for r in read_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("ndv_orderkey"),
            F.approx_count_distinct("l_partkey", 0.02).alias("ndv_partkey"),
        )
        .collect()
    }
    assert approx.keys() == rows.keys()
    for flag, row in approx.items():
        for col in ("orderkey", "partkey"):
            e, a = rows[flag][f"exact_{col}"], row[f"ndv_{col}"]
            assert abs(a - e) <= max(0.08 * e, 2)
