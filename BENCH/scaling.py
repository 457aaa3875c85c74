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
runs = []
for _ in range(3):  # repeat; report the median (box has noisy neighbors)
    with tempfile.TemporaryDirectory(prefix="hxscale_") as tmp:
        runs.append(run_schedule_dedup_bench(spark, n, tmp))
runs.sort(key=lambda r: r["elapsed_sec"])
print("RESULT " + json.dumps(runs[1]))
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
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r8 = run_at(8, n, repo)
    r32 = run_at(32, n, repo)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4
    result = {
        "n_candidates": n,
        "throughput_local8_urls_per_sec": round(r8["urls_per_sec"], 1),
        "throughput_local32_urls_per_sec": round(r32["urls_per_sec"], 1),
        "elapsed_local8_sec": round(r8["elapsed_sec"], 2),
        "elapsed_local32_sec": round(r32["elapsed_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_result.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
