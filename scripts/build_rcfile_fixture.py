#!/usr/bin/env python
"""Write-once Hive-serde round-trip fixture builder (RCFile, Avro).

These formats live behind Hive's serde stack, which Spark only
exposes through a hive-catalog session — and
``spark.sql.catalogImplementation`` is a STATIC conf that cannot be
flipped on the harness's live session. So the round trip runs here,
in a dedicated helper JVM (the jars ship with PySpark — probed: 15
hive jars plus avro/avro-mapred in pyspark/jars): nation parquet →
CREATE TABLE ... STORED AS <FORMAT> → INSERT → SELECT back →
round-trip parquet + the raw serde data files as evidence.

Usage: build_rcfile_fixture.py <sf_dir> <out_dir> [RCFILE|AVRO]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile


def main(sf_dir: str, out_dir: str, fmt: str = "RCFILE") -> None:
    from pyspark.sql import SparkSession

    scratch = tempfile.mkdtemp(prefix="rcfile_fixture_")
    os.chdir(scratch)  # keep derby.log / metastore_db out of the repo
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("rcfile-fixture")
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.warehouse.dir", f"{scratch}/warehouse")
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={scratch}",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
            "nation_src"
        )
        spark.sql("DROP TABLE IF EXISTS nation_rc")
        spark.sql(
            "CREATE TABLE nation_rc (n_nationkey BIGINT, n_name STRING, "
            f"n_regionkey BIGINT) STORED AS {fmt}"
        )
        spark.sql(
            "INSERT OVERWRITE TABLE nation_rc "
            "SELECT n_nationkey, n_name, n_regionkey FROM nation_src"
        )
        back = spark.sql(
            "SELECT n_nationkey, n_name, n_regionkey FROM nation_rc"
        )
        os.makedirs(out_dir, exist_ok=True)
        back.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/roundtrip")
        # keep the actual serde-written bytes next to the parquet as
        # evidence (RCF\x01 for RCFILE, Obj\x01 Avro container for AVRO)
        rc_dir = f"{out_dir}/raw"
        shutil.rmtree(rc_dir, ignore_errors=True)
        os.makedirs(rc_dir, exist_ok=True)
        for f in glob.glob(f"{scratch}/warehouse/nation_rc/*"):
            shutil.copy(f, rc_dir)
        with open(f"{out_dir}/_SUCCESS", "w") as fh:
            fh.write("ok")
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:4] or []))
