"""Catalog: external-table registration over the testdata parquet.

Hive's metastore (Thrift service + MySQL backing store — the exact
thing the reference charm wires up, SURVEY.md §1.1) maps to the Spark
catalog; for this repo the in-memory catalog + temp views over parquet
is the equivalent of Hive EXTERNAL TABLEs (schema over an existing
path, drop keeps data).

At 100 TB the same function body becomes
``spark.read.parquet('s3://…/table/')`` over a partitioned layout —
partition discovery + pruning are built into the source; nothing here
is scale-sensitive.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The ten driver-generated tables (FIXTURES.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the frames."""
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table without registering a view (operator-level use).

    ``events.ts`` has shipped as either nanosecond int64 (needs
    spark.sql.legacy.parquet.nanosAsLong + µs truncation) or µs
    timestamp with isAdjustedToUTC=false (which Spark ≥3.4 infers as
    TIMESTAMP_NTZ by default — rejected by streaming watermarks). Both
    are normalized here to plain TimestampType; under the UTC session
    timezone the wall-clock values match DuckDB's naive read either way.
    """
    # Hive semantics are non-ANSI (CAST('x' AS INT) -> NULL, overflow
    # wraps). session.py sets this for sessions we build, but queries
    # must also hold under a vanilla session (e.g. a driver harness
    # with default configs, where PySpark 4 defaults ANSI on). It is a
    # runtime conf, so set it at read time like nanosAsLong below.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # Timestamp rendering (date_format, window boundaries, year())
    # follows the session timezone; the DuckDB oracle reads the same
    # parquet naively. Pin UTC at read time so a session we didn't
    # build (driver harness inheriting a non-UTC machine tz) can't
    # shift every rendered timestamp off the oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # runtime-settable, so this also covers sessions we didn't
        # build (e.g. a driver harness with default configs, where the
        # ns footer otherwise throws PARQUET_TYPE_ILLEGAL)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # µs-NTZ footers must surface as TIMESTAMP (LTZ), not
        # TIMESTAMP_NTZ: watermarks reject NTZ event time, and LTZ
        # under a UTC session is value-identical.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if os.environ.get("SPARK_GRAFT_USE_METASTORE") == "1":
        # Opt-in: resolve the table BY NAME through the session's
        # (durable Hive) catalog instead of a direct path read — the
        # mode scripts/verify_metastore.py uses to prove the operator
        # inventory is semantics-identical when tables come from the
        # metastore. Requires a hive_session() + provision_corpus().
        from layer_apache_hive_spark.metastore import corpus_db

        df = spark.table(f"{corpus_db(sf_dir)}.{name}")
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
