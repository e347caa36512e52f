#!/usr/bin/env python
"""Audit the n-adaptive LSH banding law against MEASURED candidates.

The law (similarity.py): bits = clamp(ceil(log2 n) - 3, 6, 14),
bands = 24·1.5^(bits-6), chosen so expected candidate volume falls
from O(n²·p_rand) (static knob) to ~3n·bands while the cos ≥ 0.5
tier's recall stays constant. The round-5 verdict (#4) asks for the
prediction to be CHECKED, not asserted: this script builds (or
reuses) the k×-replicated stress corpus, counts the actual distinct
candidate pairs from the shared candidate stage
(similarity.lsh_candidates — the same code ext_sim_lsh runs), and
records measured-vs-predicted into STRESS.json under "lsh_law".

Pass criterion (the verdict's): measured ≤ ~2× the 3n·bands
prediction. Under-prediction (measured ≪ predicted) is fine — the
3n·bands figure is an upper-shape envelope with the corpus's true
similar pairs riding on top.

Usage:
    python scripts/lsh_law_check.py [--k 1 8 32] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from layer_apache_hive_spark.extensions.similarity import (  # noqa: E402
    lsh_candidates,
)
from layer_apache_hive_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from scripts.scale_stress import build_corpus  # noqa: E402

    spark = get_spark(app_name="lsh-law-check")
    label = os.path.basename(args.sf_dir.rstrip("/"))
    rows = {}
    for k in args.k:
        if k == 1:
            corpus = args.sf_dir
        else:
            corpus = f"/root/repo/.tmp/stress/{label}x{k}"
            print(f"building {k}x corpus at {corpus} ...", flush=True)
            build_corpus(spark, args.sf_dir, corpus, k)
        t0 = time.monotonic()
        cand, bands, bits, n = lsh_candidates(spark, corpus)
        measured = cand.count()
        wall = time.monotonic() - t0
        predicted = 3 * n * bands
        ratio = measured / predicted if predicted else float("inf")
        rows[f"{label}x{k}"] = {
            "n_vecs": n,
            "bits": bits,
            "bands": bands,
            "candidates_measured": measured,
            "candidates_predicted_3n_bands": predicted,
            "measured_over_predicted": round(ratio, 3),
            "within_2x": ratio <= 2.0,
            "wall_sec": round(wall, 2),
        }
        print(
            f"  {label}x{k}: n={n} bits={bits} bands={bands} "
            f"measured={measured} predicted={predicted} "
            f"ratio={ratio:.3f} {'OK' if ratio <= 2.0 else '** OVER 2x **'}",
            flush=True,
        )
    spark.stop()

    stress_path = "/root/repo/STRESS.json"
    out = {}
    if os.path.exists(stress_path):
        with open(stress_path) as fh:
            out = json.load(fh)
    out.setdefault("lsh_law", {}).update(rows)
    with open(stress_path, "w") as fh:
        json.dump(out, fh, indent=1)
    bad = [k for k, r in rows.items() if not r["within_2x"]]
    print(f"\nwrote lsh_law rows to STRESS.json — {len(bad)} over 2x: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
