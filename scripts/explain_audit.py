#!/usr/bin/env python
"""Plan auditor: print .explain("formatted") for registered queries
and grep-able scale red flags.

The audit rules live in layer_apache_hive_spark/plan_audit.py and are
enforced as a regression gate by tests/test_explain_audit.py; this
script is the ad-hoc/verbose front-end.

Usage:
    python scripts/explain_audit.py [qid ...]      # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/explain_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from layer_apache_hive_spark.plan_audit import audit, explain_formatted  # noqa: E402
from layer_apache_hive_spark.registry import all_queries  # noqa: E402
from layer_apache_hive_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    spark = get_spark(app_name="explain-audit")
    qs = all_queries()
    ids = [a for a in sys.argv[1:] if a != "-v"] or sorted(qs)
    bad = 0
    for qid in ids:
        try:
            df = qs[qid](spark, SF_DIR)
            plan = explain_formatted(spark, df)
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
