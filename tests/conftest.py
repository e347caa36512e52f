"""Shared fixtures: one SparkSession + one DuckDB oracle per test run.

Mirrors the driver harness (__spark_entry__.py docstring): Spark runs
the registered query, DuckDB runs the oracle SQL over the same parquet,
and ``assert_matches_oracle`` compares row-count + schema +
order-insensitive values — stricter locally (exact equality) so driver
hash-compare can't be flakier than our tests.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from layer_apache_hive_spark.catalog import TABLES, table_path
from layer_apache_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# The driver's correctness gate runs at sf0.01; tests default to
# sf0.001 for speed and CI runs both via SPARK_GRAFT_TEST_SF_DIR.


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values (order-insensitive)."""
    df = df.reindex(sorted(df.columns), axis=1)
    # tz-aware (Spark, session TZ UTC) vs naive (DuckDB) timestamps
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # lists/arrays → tuples so sorting/compare works
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, oracle_con, sql: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
