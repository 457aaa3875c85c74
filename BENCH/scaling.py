#!/usr/bin/env python
"""Two-parallelism scaling study (BASELINE.md sandbox protocol for the
north rule's N→4N executor criterion).

Protocol:
1. Generate the synthetic candidate corpus + pre-seen set ONCE
   (deterministic; heritrix_spark/benchlib.py synth_candidates).
2. Run the identical measured job — one frontier schedule+dedup round
   over that parquet input — in fresh JVMs at local[8] and local[32],
   interleaved, ``repeats`` times each.
3. Report per-config best throughput (this VM has 2-3x run-to-run noise
   from shared-host contention; noise only ever slows a run, so
   min-elapsed is the honest capability estimate; all samples are
   reported) and ``scaling_efficiency = (tp_32 / tp_8) / 4``.

Usage:  python BENCH/scaling.py [N_CANDIDATES] [REPEATS]
Writes BENCH/scaling_result.json and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

GEN = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from heritrix_spark.session import build_session
from heritrix_spark.benchlib import synth_candidates
from heritrix_spark.functions.canonicalize import canonicalize_col
from heritrix_spark.operators.seen import shard_col

n = int(sys.argv[1]); out = sys.argv[2]
spark = build_session(app_name="scaling-gen", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
cands = synth_candidates(spark, n, 10_000)
cands.write.mode("overwrite").parquet(out + "/candidates")
(cands.filter(F.pmod(F.col("parent_ordinal"), 4) == 0)
      .select(canonicalize_col("url").alias("canon_url")).distinct()
      .select("canon_url", shard_col("canon_url", 64).alias("shard"))
      .write.mode("overwrite").parquet(out + "/url_seen"))
print("GENERATED")
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from heritrix_spark.session import build_session
from heritrix_spark.benchlib import schedule_dedup_pipeline

cores = int(sys.argv[1]); n = int(sys.argv[2]); data = sys.argv[3]
spark = build_session(app_name=f"scaling-{{cores}}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))
spark.sparkContext.setLogLevel("ERROR")
candidates = spark.read.parquet(data + "/candidates")
url_seen = spark.read.parquet(data + "/url_seen")

warm = schedule_dedup_pipeline(candidates.limit(20000), url_seen.limit(20000),
                               lead_bound=n)
warm.write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()

t0 = time.monotonic()
result = schedule_dedup_pipeline(candidates, url_seen, lead_bound=n)
result.write.format("noop").mode("overwrite").save()
elapsed = time.monotonic() - t0
print("RESULT " + json.dumps(
    {{"elapsed_sec": elapsed, "urls_per_sec": n / elapsed}}))
spark.stop()
"""


def run_sub(code: str, args: list[str], timeout: int = 2400) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    return out.stdout + "\n" + out.stderr[-500:]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.environ.get("SCALING_DATA_DIR", f"/dev/shm/hxscaling_{n}")

    if not os.path.exists(f"{data}/candidates"):
        out = run_sub(GEN.format(repo=repo), [str(n), data])
        assert "GENERATED" in out, out[-1500:]

    best: dict[int, dict] = {}
    all_runs: dict[int, list] = {8: [], 32: []}
    for _ in range(repeats):
        for cores in (8, 32):
            out = run_sub(RUNNER.format(repo=repo), [str(cores), str(n), data])
            r = None
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[len("RESULT "):])
            assert r is not None, out[-1500:]
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
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scaling_result.json"
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
