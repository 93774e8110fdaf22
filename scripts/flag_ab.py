#!/usr/bin/env python
"""Controlled A/B of a session conf on the 23-query r1-comparable set
(VERDICT r10 item 3). Alternates ON/OFF subprocess invocations of
bench_subset.py (each a fresh JVM with bench.py's exact methodology),
interleaved so slow host drift hits both sides equally, and reports
per-query medians-of-medians plus totals.

Usage:
    python scripts/flag_ab.py spark.sql.optimizer.canChangeCachedPlanOutputPartitioning [cycles]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMPARABLE = [
    "approved_transactions", "pricing_summary", "star_join",
    "join_inner_agg", "window_topk", "sessionize", "dedup_minhash",
    "dedup_minhash_fast", "lsh_candidate_pairs", "neardup_verified",
    "dedup_clusters", "tfidf", "ann_ivf", "ann_bruteforce", "ann_lsh",
    "lang_id", "token_count", "multimodal_meta", "stream_tumbling",
    "tpch_q3_shipping", "decontaminate", "pack_sequences",
    "neardup_verified_fast",
]


def run_side(conf_key: str, value: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps({conf_key: value})
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", "bench_subset.py"),
         *COMPARABLE],
        capture_output=True, text=True, env=env, cwd=HERE, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    conf_key = sys.argv[1]
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sides: dict[str, list[dict]] = {"true": [], "false": []}
    for c in range(cycles):
        for v in ("true", "false"):
            r = run_side(conf_key, v)
            sides[v].append(r)
            tot = round(sum(r["queries"].values()), 3)
            print(f"# cycle {c} {conf_key}={v}: total {tot} "
                  f"noise {r.get('noise_factor')}", flush=True)
    report: dict = {"conf": conf_key, "cycles": cycles, "per_query": {}}
    for name in COMPARABLE:
        on = statistics.median(r["queries"][name] for r in sides["true"])
        off = statistics.median(r["queries"][name] for r in sides["false"])
        report["per_query"][name] = {
            "on": round(on, 3), "off": round(off, 3),
            "on_over_off": round(on / off, 3) if off else None,
        }
    report["total_on"] = round(
        sum(v["on"] for v in report["per_query"].values()), 3)
    report["total_off"] = round(
        sum(v["off"] for v in report["per_query"].values()), 3)
    report["noise_factors"] = {
        v: [r.get("noise_factor") for r in rs] for v, rs in sides.items()
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
