#!/usr/bin/env python
"""Plan auditor: print .explain("formatted") for registered queries
and grep-able scale red flags.

Checks per plan:
  - CartesianProduct / BroadcastNestedLoopJoin where not expected
  - missing PushedFilters on parquet scans that have a filter
  - row-at-a-time PythonUDF (BatchEvalPython) — pandas/Arrow is fine
  - global Sort without a following Limit (TakeOrderedAndProject is
    the wanted top-k shape)

Usage:
    python scripts/explain_audit.py [qid ...]      # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/explain_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

from layer_apache_hive_spark.registry import all_queries  # noqa: E402
from layer_apache_hive_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Queries where a nested-loop/cartesian shape is the declared design
# (exact-gate all-pairs kernels, literal cross join, theta join,
# broadcast 1-row totals).
_NL_OK = {
    "join_cross", "join_theta", "ext_dedup_embedding", "ext_sim_join",
    "ext_sim_topk", "ext_text_tfidf", "ext_text_unigram_lm",
    "ext_text_langid", "ext_dedup_near", "ext_dedup_minhash",
    "ext_sim_lsh", "ext_sim_ivf",
    # range join against a 21-row broadcast recursive CTE: the scan
    # side never shuffles; NL against a handful of rows is the plan
    "query_recursive_cte",
    # uncorrelated-scalar-subquery shape: crossJoin against a
    # broadcast 1-row aggregate (threshold / budget). BNLJ against
    # one row is the wanted plan — it replaces an eager collect()
    "composite_idle_customers", "composite_important_stock",
    "ext_sample_domain_mix", "ext_sample_temperature",
}


def audit(qid: str, plan: str) -> list[str]:
    flags = []
    if qid not in _NL_OK and re.search(
        r"CartesianProduct|BroadcastNestedLoopJoin", plan
    ):
        flags.append("nested-loop join")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time Python UDF")
    # a Sort that is global (Exchange rangepartitioning right below)
    # and not part of TakeOrderedAndProject
    if re.search(r"Exchange rangepartitioning", plan) and not re.search(
        r"TakeOrderedAndProject", plan
    ) and qid not in {"sort_order_by", "sort_cluster_by"}:
        flags.append("global sort (range exchange) without top-k")
    return flags


def main() -> int:
    spark = get_spark(app_name="explain-audit")
    qs = all_queries()
    ids = sys.argv[1:] or sorted(qs)
    bad = 0
    for qid in ids:
        try:
            df = qs[qid](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # streaming sinks etc. may not explain
            print(f"== {qid}: SKIP ({type(e).__name__})")
            continue
        flags = audit(qid, plan)
        if flags or "-v" in sys.argv:
            bad += bool(flags)
            print(f"== {qid}: {'; '.join(flags) or 'ok'}")
            if flags:
                print(plan[:4000])
    print(f"\n{bad} flagged / {len(ids)} audited")
    return 0


if __name__ == "__main__":
    sys.exit(main())
