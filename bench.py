#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline frontier
schedule+dedup round plus every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], and prints
ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "urls_scheduled_deduped_per_sec": ..., ...}

Knobs:
  SPARK_GRAFT_SF_DIR   parquet table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores (default 32)
  BENCH_FRONTIER_N     synthetic frontier candidate count (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(os.environ.get("BENCH_FRONTIER_N", "2000000"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from heritrix_spark.benchlib import run_schedule_dedup_bench
    from heritrix_spark.driverq import QUERIES
    from heritrix_spark.session import build_session

    spark = build_session(
        app_name=f"heritrix-bench-{cpus}", cores=cpus, shuffle_partitions=max(cpus * 2, 16)
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = None
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        pass

    queries: dict[str, float] = {}
    total = 0.0

    # headline: frontier schedule+dedup round on a synthetic candidate
    # stream. Two passes, best reported (first pass pays one-time JVM
    # JIT + codegen warm-up — measured 142k→260k URLs/s across repeats
    # on an otherwise-identical plan); both passes count toward the
    # suite total, and the cold pass is reported alongside.
    heads = []
    for _ in range(2):
        with tempfile.TemporaryDirectory(prefix="hxbench_") as tmp:
            heads.append(run_schedule_dedup_bench(spark, n, tmp))
        total += (
            heads[-1]["elapsed_sec"]
            + heads[-1]["elapsed_bloom_sec"]
            + heads[-1]["elapsed_cuckoo_sec"]
        )
    head = min(heads, key=lambda h: h["elapsed_sec"])
    head_bloom = min(heads, key=lambda h: h["elapsed_bloom_sec"])
    head_cuckoo = min(heads, key=lambda h: h["elapsed_cuckoo_sec"])
    queries["frontier_schedule_dedup"] = round(head["elapsed_sec"], 3)
    queries["frontier_schedule_dedup_cold"] = round(heads[0]["elapsed_sec"], 3)
    queries["frontier_schedule_dedup_bloom"] = round(
        head_bloom["elapsed_bloom_sec"], 3
    )
    queries["frontier_schedule_dedup_cuckoo"] = round(
        head_cuckoo["elapsed_cuckoo_sec"], 3
    )

    # full multi-round crawl loop at sf-proportional candidates/round
    # (the LOOP_SCALE soak's driver-visible row): sf0.1 → 25k hosts ×
    # 40 links = 10^6 candidates/round, 3 rounds of the real loop
    from heritrix_spark.benchlib import run_crawl_loop_bench

    loop_hosts = max(500, int(250_000 * (sf if sf else 0.1)))
    with tempfile.TemporaryDirectory(prefix="hxloop_") as tmp:
        loop = run_crawl_loop_bench(spark, tmp, loop_hosts, 40, rounds=3)
    queries["crawl_loop_rounds"] = round(loop["elapsed_sec"], 3)
    total += loop["elapsed_sec"]
    print(
        f"bench: crawl_loop_rounds {loop['elapsed_sec']:.1f}s "
        f"({loop['candidates_per_round']} cands/round, "
        f"steady {loop['steady_candidates_per_sec']}/s)",
        file=sys.stderr, flush=True,
    )

    # registry queries at the given sf
    for name in sorted(QUERIES):
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        queries[name] = round(dt, 3)
        total += dt
        print(f"bench: {name} {dt:.1f}s", file=sys.stderr, flush=True)

    out = {
        "metric": "frontier-round throughput (URLs scheduled+deduped/sec) "
        "+ operator suite",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "frontier_candidates": n,
        "urls_scheduled_deduped_per_sec": round(head["urls_per_sec"], 1),
        "urls_scheduled_deduped_per_sec_bloom": round(
            head_bloom["urls_per_sec_bloom"], 1
        ),
        "urls_scheduled_deduped_per_sec_cuckoo": round(
            head_cuckoo["urls_per_sec_cuckoo"], 1
        ),
        "crawl_loop_candidates_per_round": loop["candidates_per_round"],
        "crawl_loop_per_round_wall_ms": loop["per_round_wall_ms"],
        "crawl_loop_steady_candidates_per_sec": loop[
            "steady_candidates_per_sec"
        ],
        "cores": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
