"""Query registry: the implementation contract of SURVEY.md §2.

Each operator row in SURVEY §2 registers here as a ``Query``:
a (spark, sf_dir) -> DataFrame callable plus, when SQL-expressible,
a DuckDB-dialect oracle twin. ``__spark_entry__.py`` exposes the
merged registry to the driver.

Determinism rules (SURVEY §5.2) enforced by convention here:
- every computed column aliased identically in both dialects;
- double SUM/AVG go through exact decimal accumulation
  (``functions.numeric.dsum``) so values are bit-identical across
  engines regardless of accumulation order;
- arrays from collect_set are sorted before emission;
- timestamps are cast to strings/dates or truncated to a common
  precision before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    id: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL twin; None → rows-only check
    doc: str = ""


def register(query_id: str, oracle: Optional[str] = None, doc: str = ""):
    """Decorator: register ``fn`` as queries()[query_id]."""

    def deco(fn: QueryFn) -> QueryFn:
        if query_id in _REGISTRY:
            raise ValueError(f"duplicate query id: {query_id}")
        _REGISTRY[query_id] = Query(query_id, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import layer_apache_hive_spark.operators.aggregates  # noqa: F401
    import layer_apache_hive_spark.operators.composite  # noqa: F401
    import layer_apache_hive_spark.operators.ddl  # noqa: F401
    import layer_apache_hive_spark.operators.joins  # noqa: F401
    import layer_apache_hive_spark.operators.relational  # noqa: F401
    import layer_apache_hive_spark.operators.setops  # noqa: F401
    import layer_apache_hive_spark.operators.sorts  # noqa: F401
    import layer_apache_hive_spark.operators.windows  # noqa: F401
    import layer_apache_hive_spark.functions.scalar_groups  # noqa: F401
    import layer_apache_hive_spark.functions.udx  # noqa: F401
    import layer_apache_hive_spark.sources.hive_acid  # noqa: F401
    import layer_apache_hive_spark.sources.scans  # noqa: F401
    import layer_apache_hive_spark.sources.sinks  # noqa: F401
    import layer_apache_hive_spark.streaming.events  # noqa: F401
    import layer_apache_hive_spark.extensions.dedup  # noqa: F401
    import layer_apache_hive_spark.extensions.similarity  # noqa: F401
    import layer_apache_hive_spark.extensions.text_analysis  # noqa: F401
    import layer_apache_hive_spark.extensions.multimodal  # noqa: F401
    import layer_apache_hive_spark.extensions.training  # noqa: F401
    import layer_apache_hive_spark.repl  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {qid: q.fn for qid, q in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all_modules()
    return {qid: q.oracle for qid, q in sorted(_REGISTRY.items()) if q.oracle}
