#!/usr/bin/env python
"""Quality-at-scale gate: run the two registered recall-eval queries
against the k×-replicated stress corpus and record the numbers next
to the wall-time rows in STRESS.json (round-5 verdict #6).

The adaptive banding law holds the high-similarity tier's collision
probability constant BY DESIGN; sf0.01/0.1 runs certify recall at
fixture scale — this proves it empirically on the stress corpus too:
  - ext_dedup_recall_eval: banded-MinHash recall vs the complete
    prefix-filtered near-dup join (floor 0.6 — the LSH-tier bound the
    recall property test pins at fixture scale).
  - ext_sim_recall_eval: IVF recall@5 vs exact brute force, mean over
    the 20 eval queries (floor 0.55 — the quantized-tier bound).

Usage:
    python scripts/stress_recall.py [--k 8] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from layer_apache_hive_spark.registry import all_queries  # noqa: E402
from layer_apache_hive_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from scripts.scale_stress import build_corpus  # noqa: E402

    spark = get_spark(app_name="stress-recall")
    qs = all_queries()
    label = os.path.basename(args.sf_dir.rstrip("/"))
    corpus = f"/root/repo/.tmp/stress/{label}x{args.k}"
    print(f"building {args.k}x corpus at {corpus} ...", flush=True)
    build_corpus(spark, args.sf_dir, corpus, args.k)

    rows = {}

    t0 = time.monotonic()
    dd = qs["ext_dedup_recall_eval"](spark, corpus).collect()[0]
    rows["ext_dedup_recall_eval"] = {
        "k": args.k,
        "n_true": dd.n_true,
        "n_found": dd.n_found,
        "recall": round(dd.recall, 4),
        "floor": 0.6,
        "ok": dd.recall >= 0.6,
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(f"  dedup: recall={dd.recall:.4f} ({dd.n_found}/{dd.n_true})",
          flush=True)

    t0 = time.monotonic()
    sim = qs["ext_sim_recall_eval"](spark, corpus).toPandas()
    rcol = [c for c in sim.columns if "recall" in c][0]
    mean_r = float(sim[rcol].mean())
    rows["ext_sim_recall_eval"] = {
        "k": args.k,
        "n_queries": len(sim),
        "mean_recall_at_5": round(mean_r, 4),
        "floor": 0.55,
        "ok": mean_r >= 0.55,
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(f"  sim: mean recall@5={mean_r:.4f} over {len(sim)} queries",
          flush=True)
    spark.stop()

    stress_path = "/root/repo/STRESS.json"
    out = {}
    if os.path.exists(stress_path):
        with open(stress_path) as fh:
            out = json.load(fh)
    out.setdefault("recall_at_stress", {}).update(rows)
    with open(stress_path, "w") as fh:
        json.dump(out, fh, indent=1)
    bad = [k for k, r in rows.items() if not r["ok"]]
    print(f"\nwrote recall_at_stress to STRESS.json — below floor: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
