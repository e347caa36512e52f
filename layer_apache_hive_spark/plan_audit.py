"""Physical-plan red-flag audit (the SURVEY §4 scale posture, made
mechanical).

Flags the four plan shapes that silently kill a 100 TB run:
  - CartesianProduct / BroadcastNestedLoopJoin outside the whitelist
    of queries where a nested-loop against a tiny broadcast side IS
    the declared design;
  - BatchEvalPython — a row-at-a-time Python UDF in the plan (all
    Python kernels here must be Arrow-batched pandas_udf/mapInPandas);
  - a global range-partitioned Sort that is not a top-k
    (TakeOrderedAndProject) and not a declared ORDER BY query;
  - a Window with NO partition spec (r10 verdict task 5: WindowExec
    moves ALL input to one partition) outside the whitelist of
    queries whose window input is provably scale-INVARIANT
    (aggregated histograms / pair tables, never the corpus).

Used by scripts/explain_audit.py (ad-hoc, verbose) and
tests/test_explain_audit.py (regression gate over every registered
query).
"""

from __future__ import annotations

import re

# Queries where a nested-loop/cartesian shape is the declared design
# (exact-gate all-pairs kernels, literal cross join, theta join,
# broadcast 1-row totals).
NL_OK = {
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
    # 1-row percentile-cutoff aggregate crossJoined onto doc scores
    "ext_text_perplexity_filter",
    # k-seed fan-out: crossJoin against the k-row broadcast centroid
    # set (k=8) — the map-side assignment plan, not a data-data NL
    "ext_emb_kmeans_step",
    # the same k-seed fan-out, once per Lloyd iteration (r9)
    "ext_emb_kmeans_train",
    # 1-row elected-merge broadcast crossJoined into the vocabulary's
    # merge application, once per BPE training iteration (r10)
    "ext_bpe_train",
    # Lloyd coarse-quantizer fan-out against ⌈√n⌉ broadcast seeds (r9)
    "ext_dedup_semantic_learned",
    # 1-row percentile_approx cutoff aggregate crossJoined onto doc
    # scores — the approx twin of ext_text_perplexity_filter (r9)
    "ext_text_perplexity_filter_approx",
    # 1-row broadcast corpus stats (N, avg_dl) attached by crossJoin
    "ext_text_bm25",
    # exact-baseline tier: 20 broadcast query vectors cross-scored
    # against the corpus (the ext_sim_topk shape) to ground recall
    "ext_sim_recall_eval",
    # two 1-row count aggregates crossJoined into the summary row
    "ext_dedup_recall_eval",
    # GD model state: the 1-row weight relation (and the 1-row mean
    # cutoff) crossJoined onto the feature relation each step — BNLJ
    # against one broadcast row is the wanted plan (r9)
    "ext_quality_linear_probe",
    # trained-quantizer fan-out: crossJoin against the k-row (k=8)
    # broadcast centroid table for assignment + probe ranking (r9)
    "ext_sim_ivf_trained",
    # PQ code assignment: crossJoin against the ONE-row broadcast
    # codebook map (M×K codes folded into a single row) — the
    # map-only E-step/encode that replaced the groupBy argmin over
    # n·M·K joined rows (r13, _PQ_BEST)
    "ext_sim_ivfpq_trained", "ext_sim_ivfpq_residual",
    # 1-row top-type relation attached to the 1-row wide aggregate
    "composite_dashboard",
}

# Queries whose contract IS a global ordered result.
GLOBAL_SORT_OK = {"sort_order_by", "sort_cluster_by"}

# Queries where an UNPARTITIONED window is the declared design
# because its input is scale-INVARIANT in corpus size — every entry
# documents why (r10 verdict task 5). Anything else with a
# no-partition-spec Window is flagged: WindowExec moves all input to
# ONE partition, a silent 100 TB killer when the input is data-sized.
GLOBAL_WINDOW_OK = {
    # rank over the DISTINCT-score histogram (an aggregated relation
    # bounded by the score grid, not the corpus) — the exact
    # perplexity tier; the registered production swap is the GK-
    # sketch _approx twin with no single-partition stage
    "ext_text_perplexity_filter",
    # row_number over the aggregated symbol-pair table —
    # O(alphabet²) rows at any corpus size. (ext_bpe_train runs the
    # same election per iteration but needs no entry: its per-
    # iteration windows sit behind localCheckpoint barriers, which
    # explain() renders as Scan ExistingRDD — the whitelist-liveness
    # test would reject a stale entry.)
    "ext_bpe_merge_step",
}


def explain_formatted(spark, df) -> str:
    """The .explain("formatted") text, captured instead of printed."""
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _has_global_window(plan: str) -> bool:
    """True iff any windowspecdefinition in the plan has ZERO
    partition columns. Inside ``windowspecdefinition(args…)`` the
    partition columns come first as bare expressions, order columns
    carry an ASC/DESC direction, and the frame is the trailing
    ``specifiedwindowframe(…)`` — so a spec whose every non-frame
    argument has a sort direction (or that has no non-frame argument
    at all) is unpartitioned. Balanced-paren parse: expression
    arguments may nest parens and commas."""
    for m in re.finditer(r"windowspecdefinition\(", plan):
        depth, cur, args = 1, m.end(), []
        i = m.end()
        while i < len(plan) and depth:
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    args.append(plan[cur:i])
            elif c == "," and depth == 1:
                args.append(plan[cur:i])
                cur = i + 1
            i += 1
        elems = [
            a.strip()
            for a in args
            if not a.strip().startswith("specifiedwindowframe")
        ]
        partition_cols = [
            a for a in elems if " ASC" not in a and " DESC" not in a
        ]
        if not partition_cols:
            return True
    return False


def audit(qid: str, plan: str) -> list[str]:
    """Return red-flag descriptions for one query's physical plan."""
    flags = []
    if qid not in NL_OK and re.search(
        r"CartesianProduct|BroadcastNestedLoopJoin", plan
    ):
        flags.append("nested-loop join")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time Python UDF")
    # a Sort that is global (Exchange rangepartitioning right below)
    # and not part of TakeOrderedAndProject
    if (
        re.search(r"Exchange rangepartitioning", plan)
        and not re.search(r"TakeOrderedAndProject", plan)
        and qid not in GLOBAL_SORT_OK
    ):
        flags.append("global sort (range exchange) without top-k")
    if qid not in GLOBAL_WINDOW_OK and _has_global_window(plan):
        flags.append("unpartitioned window (single-partition input)")
    return flags
