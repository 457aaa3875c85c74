#!/usr/bin/env python
"""Two-parallelism scaling study (BASELINE.md sandbox protocol for the
north rule's N→4N executor criterion).

Protocol:
1. Generate the synthetic candidate corpus + pre-seen set ONCE
   (deterministic; heritrix_spark/benchlib.py synth_candidates).
2. For each parallelism level (default local[8] and local[32]) in a
   fresh JVM: run the identical measured job — one frontier
   schedule+dedup round over that parquet input — once to warm
   (JIT/codegen/Python-worker spin-up), then ``inner`` measured
   repetitions, keeping the per-JVM minimum elapsed.
3. Interleave ``outer`` such JVMs per level and keep the overall best.
   This sandbox VM shows 2-5x run-to-run noise from shared-host
   contention; noise only ever slows a run, so min-elapsed is the
   honest capability estimate. All samples are reported.
4. ``scaling_efficiency = (tp_hi / tp_lo) / (hi_cores / lo_cores)``.

Usage:  python BENCH/scaling.py [N_CANDIDATES] [OUTER_REPEATS]
Env:    SCALING_CORES="8,32"   the two parallelism levels
        SCALING_DATA_DIR       input location (default /dev/shm)
Writes BENCH/scaling_result.json and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

GEN = r"""
import sys
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
      .write.mode("overwrite").partitionBy("shard").parquet(out + "/url_seen"))
print("GENERATED")
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from heritrix_spark.session import build_session
from heritrix_spark.benchlib import schedule_dedup_pipeline

cores = int(sys.argv[1]); n = int(sys.argv[2]); data = sys.argv[3]
inner = int(sys.argv[4])
spark = build_session(app_name=f"scaling-{{cores}}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16),
                      # fork a fresh python worker per task: the reused-
                      # worker socket protocol can wedge an executor
                      # under high thread counts in this sandbox (JVM
                      # blocks reading from an idle worker); fork cost is
                      # noise at these task sizes
                      extra_conf={{"spark.python.worker.reuse": "false"}})
spark.sparkContext.setLogLevel("ERROR")
candidates = spark.read.parquet(data + "/candidates")
url_seen = spark.read.parquet(data + "/url_seen")

def once():
    t0 = time.monotonic()
    result = schedule_dedup_pipeline(candidates, url_seen, lead_bound=n)
    result.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    for (_, rdd) in list(spark.sparkContext._jsc.getPersistentRDDs().items()):
        rdd.unpersist()
    spark.catalog.clearCache()
    return dt

warm = once()  # full-size warm pass: JIT + codegen + python workers
samples = [once() for _ in range(inner)]
best = min(samples)
print("RESULT " + json.dumps(
    {{"elapsed_sec": best, "urls_per_sec": n / best,
      "warm_sec": warm, "samples": [round(s, 2) for s in samples]}}))
spark.stop()
"""


def run_sub(
    code: str, args: list[str], timeout: int = 3600, cpus: int | None = None
) -> str:
    """Run a python job, optionally CPU-affinity-bound to ``cpus`` cores.

    Pinning matters for honest scaling numbers: pandas/Arrow UDF worker
    processes are NOT bounded by local[N] (each task adds Python
    workers), so an unpinned local[8] run already saturates the whole
    machine and the 8-vs-32 comparison measures nothing. On a real
    cluster executors are cgroup-bound; ``taskset`` is the single-box
    equivalent, confining the JVM + all its Python workers to the
    config's core budget.

    A timed-out JVM returns "" instead of raising: this sandbox can
    rarely wedge a PySpark python-worker socket (executor blocks forever
    reading from an idle worker); the study then just uses the samples
    from the JVMs that completed.
    """
    cmd = [sys.executable, "-c", code, *args]
    if cpus is not None:
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    try:
        out = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return ""
    return out.stdout + "\n" + out.stderr[-500:]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    outer = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    inner = int(os.environ.get("SCALING_INNER", "3"))
    lo, hi = (
        int(x) for x in os.environ.get("SCALING_CORES", "8,32").split(",")
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.environ.get("SCALING_DATA_DIR", f"/dev/shm/hxscaling_{n}")

    if not os.path.exists(f"{data}/candidates"):
        out = run_sub(GEN.format(repo=repo), [str(n), data])
        assert "GENERATED" in out, out[-1500:]

    best: dict[int, dict] = {}
    all_runs: dict[int, list] = {lo: [], hi: []}
    failures: dict[int, int] = {lo: 0, hi: 0}
    for _ in range(outer):
        for cores in (lo, hi):
            out = run_sub(
                RUNNER.format(repo=repo),
                [str(cores), str(n), data, str(inner)],
                cpus=cores,
            )
            r = None
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[len("RESULT "):])
            if r is None:  # hung/failed JVM — skip, keep the other samples
                failures[cores] += 1
                print(f"WARN: local[{cores}] JVM produced no result "
                      f"(hang/timeout), skipping", file=sys.stderr)
                continue
            all_runs[cores].extend(r["samples"])
            if cores not in best or r["elapsed_sec"] < best[cores]["elapsed_sec"]:
                best[cores] = r
    assert lo in best and hi in best, (
        f"all JVMs failed for a level: failures={failures}"
    )
    rlo, rhi = best[lo], best[hi]
    eff = (rhi["urls_per_sec"] / rlo["urls_per_sec"]) / (hi / lo)
    result = {
        "n_candidates": n,
        "cores_lo": lo,
        "cores_hi": hi,
        f"throughput_local{lo}_urls_per_sec": round(rlo["urls_per_sec"], 1),
        f"throughput_local{hi}_urls_per_sec": round(rhi["urls_per_sec"], 1),
        f"elapsed_local{lo}_sec": round(rlo["elapsed_sec"], 2),
        f"elapsed_local{hi}_sec": round(rhi["elapsed_sec"], 2),
        f"all_elapsed_local{lo}_sec": all_runs[lo],
        f"all_elapsed_local{hi}_sec": all_runs[hi],
        "jvm_failures": failures,
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
