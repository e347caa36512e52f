"""Shared fixtures: one SparkSession + one DuckDB oracle per test run.

Mirrors the driver harness (__spark_entry__.py docstring): Spark runs
the registered query, DuckDB runs the oracle SQL over the same parquet,
and ``assert_matches_oracle`` compares row-count + schema +
order-insensitive values via layer_apache_hive_spark.oracle_compare.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from layer_apache_hive_spark.catalog import TABLES, table_path
from layer_apache_hive_spark.oracle_compare import assert_matches
from layer_apache_hive_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# The driver's correctness gate runs at sf0.01; tests default to
# sf0.001 for speed and the verify script runs sf0.01.


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


def assert_matches_oracle(spark_df, oracle_con, sql: str) -> None:
    assert_matches(spark_df.toPandas(), oracle_con.execute(sql).df())
