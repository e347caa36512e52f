"""DDL / metadata / statistics surface (SURVEY.md §2.12).

Hive loci: DDLSemanticAnalyzer.java (CREATE/ALTER/DROP/SHOW/DESCRIBE),
ql/stats/* (ANALYZE TABLE ... COMPUTE STATISTICS feeding the CBO),
MSCK REPAIR TABLE. Spark SQL supports the same statements verbatim;
this module exercises them end-to-end so the parity claim is
checkable, and returns the catalog listing as the query result.

Scale note: these are metadata operations — O(partitions) listing at
worst (RECOVER PARTITIONS); ANALYZE feeds `spark.sql.cbo.enabled`
join reordering exactly like Hive's `hive.cbo.enable` + Calcite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from layer_apache_hive_spark.catalog import read_table
from layer_apache_hive_spark.registry import register


@register(
    "ddl_catalog",
    oracle="""
SELECT t.tableName,
       false AS isTemporary,
       (SELECT COUNT(*) FROM nation) AS nation_rows,
       (SELECT COUNT(DISTINCT r_regionkey) FROM region) AS region_partitions
FROM (VALUES ('nation_renamed'), ('nation_v'), ('region_part')) t(tableName)
""",
)
def ddl_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips the §2.12 DDL inventory in a scratch database:

    CREATE DATABASE / CREATE TABLE AS SELECT / CREATE VIEW /
    SHOW TABLES / DESCRIBE / ALTER TABLE RENAME /
    ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS] /
    ALTER TABLE ... RECOVER PARTITIONS (Hive: MSCK REPAIR TABLE) /
    DROP. Returns the post-DDL table listing + row-count stats, so a
    wrong statement fails the query rather than passing silently.
    """
    import shutil

    label = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    db = f"ddl_demo_{label}"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    # the in-memory catalog is per-session but the warehouse dir is
    # not: remove leftovers from prior sessions or managed CREATE
    # fails with LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        os.path.join(warehouse.removeprefix("file:"), f"{db}.db"),
        ignore_errors=True,
    )
    spark.sql(f"CREATE DATABASE {db}")

    nation = read_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").saveAsTable(f"{db}.nation_copy")

    # partitioned table + recover-partitions (MSCK analog)
    region = read_table(spark, sf_dir, "region")
    path = f"/root/repo/.tmp/ddl/{label}/region_part"
    region.write.mode("overwrite").partitionBy("r_regionkey").parquet(path)
    spark.sql(
        f"CREATE TABLE {db}.region_part (r_name STRING, r_comment STRING) "
        f"USING PARQUET PARTITIONED BY (r_regionkey BIGINT) LOCATION '{path}'"
    )
    spark.sql(f"ALTER TABLE {db}.region_part RECOVER PARTITIONS")

    spark.sql(
        f"CREATE OR REPLACE VIEW {db}.nation_v AS "
        f"SELECT n_nationkey, upper(n_name) AS n_name FROM {db}.nation_copy"
    )
    spark.sql(f"ALTER TABLE {db}.nation_copy RENAME TO {db}.nation_renamed")
    spark.sql(f"ANALYZE TABLE {db}.nation_renamed COMPUTE STATISTICS")
    spark.sql(
        f"ANALYZE TABLE {db}.nation_renamed COMPUTE STATISTICS FOR ALL COLUMNS"
    )
    # DESCRIBE must parse; result shape is engine-specific
    spark.sql(f"DESCRIBE TABLE {db}.nation_renamed").collect()

    n_rows = spark.table(f"{db}.nation_renamed").count()
    n_parts = spark.sql(f"SHOW PARTITIONS {db}.region_part").count()
    # session-global temp views leak into every database's SHOW TABLES;
    # keep only this db's persistent entries so the result is
    # independent of what else ran in the session
    tables = (
        spark.sql(f"SHOW TABLES IN {db}")
        .filter(~F.col("isTemporary"))
        .select("tableName", "isTemporary")
    )
    return tables.withColumn("nation_rows", F.lit(n_rows)).withColumn(
        "region_partitions", F.lit(n_parts)
    )


@register(
    "ddl_export_import",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
""",
)
def ddl_export_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ``EXPORT TABLE t TO dir`` / ``IMPORT TABLE t2 FROM dir``
    (table replication between warehouses; Hive writes data files plus
    a ``_metadata`` descriptor). Spark has no EXPORT/IMPORT statement,
    so the same contract is rebuilt from parts: export = data as
    parquet + a JSON descriptor carrying the DECLARED schema and
    format; import = parse the descriptor, read the data **with the
    descriptor's schema, not inference**, and register the table.

    The oracle pins the imported relation value-equal to the source —
    true only if both the data and the schema survived the round trip
    (a descriptor/data mismatch fails loudly at read). The export dir
    is write-once, keyed on source identity (the repo's fixture-tag
    convention). Scale: EXPORT is a copy job (map-only, no shuffle);
    IMPORT is metadata + one scan.
    """
    import json

    from pyspark.sql import types as T

    label = os.path.basename(sf_dir.rstrip("/")) or "sf"
    exp_dir = f"/root/repo/.tmp/export/{label}/supplier"
    st = os.stat(f"{sf_dir}/supplier.parquet")
    tag = f"export:{st.st_mtime_ns}:{st.st_size}"
    desc_path = f"{exp_dir}/_metadata.json"
    src = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    fresh = False
    if os.path.exists(desc_path):
        with open(desc_path) as fh:
            desc = json.load(fh)
        fresh = desc.get("source_tag") == tag
    if not fresh:
        src.write.mode("overwrite").parquet(f"{exp_dir}/data")
        with open(desc_path, "w") as fh:
            json.dump(
                {
                    "table": "supplier_export",
                    "format": "parquet",
                    "schema": src.schema.jsonValue(),
                    "source_tag": tag,
                },
                fh,
            )
    with open(desc_path) as fh:
        desc = json.load(fh)
    assert desc["format"] == "parquet", desc
    schema = T.StructType.fromJson(desc["schema"])
    imported = spark.read.schema(schema).parquet(f"{exp_dir}/data")
    imported.createOrReplaceTempView("supplier_imported")
    return spark.table("supplier_imported")
