"""layer_apache_hive_spark — a PySpark-native analytics engine.

A from-scratch engine delivering the query & data-processing surface of
the system deployed by the reference (juju-solutions/layer-apache-hive:
a Juju charm that stands up Apache Hive — HiveQL over HDFS; see
SURVEY.md §0.2), re-expressed Spark-first: DataFrame/SQL plans optimized
by Catalyst, plus driver-mandated LLM-data-pipeline extensions
(dedup, similarity search, multimodal columns, text analysis).

Public entry points:
    get_spark()          — configured SparkSession factory (session.py)
    load_tables()        — register the testdata tables (catalog.py)
    all_queries()        — {query_id: callable(spark, sf_dir) -> DataFrame}
    all_oracles()        — {query_id: DuckDB-ANSI-SQL twin}
"""

from layer_apache_hive_spark.session import get_spark
from layer_apache_hive_spark.catalog import TABLES, load_tables
from layer_apache_hive_spark.registry import all_queries, all_oracles

__all__ = ["get_spark", "load_tables", "TABLES", "all_queries", "all_oracles"]
__version__ = "0.1.0"
