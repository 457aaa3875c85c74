#!/usr/bin/env python
"""Interleaved A/B benchmark vs a pinned prior commit — the
noise-proofing protocol for this shared-Firecracker host.

Problem this solves (round-4 postmortem): the host drifts 2-5x between
runs hours apart, so an absolute headline number from one session
cannot be compared with one from another — the round-4 driver bench
read 2.2x "slower" than round 3 on identical-throughput code. The only
noise-immune comparison is a RATIO measured within one session with
the two code versions interleaved (B A A B ...), so slow windows hit
both sides equally.

What it does:
  1. `git worktree add` the baseline commit into a temp dir,
  2. alternately runs the SAME headline bench (schedule+dedup pipeline
     + full crawl loop, fresh taskset-pinned JVM per run) in the
     current tree and the baseline tree, `--pairs` times, pattern
     B A A B per pair block to cancel linear drift,
  3. prints per-run numbers and the median current/baseline ratio per
     metric; writes BENCH/ab_result.json.

Usage:  python BENCH/ab_bench.py [--baseline <commit>] [--pairs 2]
Env:    AB_CPUS (16)  AB_FRONTIER_N (2000000)  AB_LOOP_HOSTS (25000)
        AB_LOOP_ROUNDS (3)

Run with the box otherwise idle (one bench at a time — see
BENCH/BASELINE.md protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, tempfile
sys.path.insert(0, os.getcwd())
from heritrix_spark.benchlib import (
    run_crawl_loop_bench,
    run_schedule_dedup_bench,
)
from heritrix_spark.session import build_session

cpus = int(os.environ.get("AB_CPUS", "16"))
n = int(os.environ.get("AB_FRONTIER_N", "2000000"))
loop_hosts = int(os.environ.get("AB_LOOP_HOSTS", "25000"))
loop_rounds = int(os.environ.get("AB_LOOP_ROUNDS", "3"))
spark = build_session(
    app_name="ab-bench", cores=cpus, shuffle_partitions=max(cpus * 2, 16)
)
spark.sparkContext.setLogLevel("ERROR")
out = {}
heads = []
for _ in range(2):  # warm pass + measured pass, best reported
    with tempfile.TemporaryDirectory(prefix="hxab_") as tmp:
        heads.append(run_schedule_dedup_bench(spark, n, tmp))
out["urls_per_sec"] = round(max(h["urls_per_sec"] for h in heads), 1)
if loop_hosts:
    with tempfile.TemporaryDirectory(prefix="hxabloop_") as tmp:
        loop = run_crawl_loop_bench(
            spark, tmp, loop_hosts, 40, rounds=loop_rounds
        )
    out["loop_steady_cands_per_sec"] = loop["steady_candidates_per_sec"]
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_one(tree: str, cpus: int) -> dict:
    cpu_list = f"0-{cpus - 1}"
    r = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c", CHILD],
        cwd=tree,
        capture_output=True,
        text=True,
        env={**os.environ, "AB_CPUS": str(cpus)},
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("ABRESULT ")]
    if r.returncode != 0 or not lines:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"bench child failed in {tree} rc={r.returncode}")
    return json.loads(lines[-1][len("ABRESULT "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default="25cbd5b",
                    help="git commit of the comparison baseline (default: r4)")
    ap.add_argument("--pairs", type=int, default=2)
    args = ap.parse_args()
    cpus = int(os.environ.get("AB_CPUS", "16"))

    runs: list[tuple[str, dict]] = []
    with tempfile.TemporaryDirectory(prefix="hxab_tree_") as base_tree:
        subprocess.run(
            ["git", "worktree", "add", "--detach", base_tree, args.baseline],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            # B A A B per pair block: cancels linear host drift
            order = []
            for _ in range(args.pairs):
                order += [("baseline", base_tree), ("current", REPO),
                          ("current", REPO), ("baseline", base_tree)]
            for label, tree in order:
                res = run_one(tree, cpus)
                runs.append((label, res))
                print(f"{label}: {json.dumps(res)}", flush=True)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", base_tree],
                cwd=REPO, capture_output=True,
            )

    metrics = sorted({k for _, r in runs for k in r})
    summary = {}
    for m in metrics:
        cur = [r[m] for lbl, r in runs if lbl == "current" and m in r]
        base = [r[m] for lbl, r in runs if lbl == "baseline" and m in r]
        if cur and base:
            summary[m] = {
                "current_median": statistics.median(cur),
                "baseline_median": statistics.median(base),
                "ratio_current_over_baseline": round(
                    statistics.median(cur) / statistics.median(base), 3
                ),
            }
    out = {
        "baseline_commit": args.baseline,
        "cpus": cpus,
        "pairs": args.pairs,
        "runs": [{"which": lbl, **r} for lbl, r in runs],
        "summary": summary,
    }
    path = os.environ.get(
        "AB_RESULT", os.path.join(REPO, "BENCH", "ab_result.json")
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
