#!/usr/bin/env python
"""One-off per-round phase profiler for the crawl loop.

Runs a few rounds of plans/crawl.py on the pre-generated 10^6-cand/round
corpus with the UI REST API on, then prints every Spark job with its
submission/completion time, duration and call site, plus the GAPS
between consecutive jobs (gap = driver-serial time: planning, py4j,
manifest commit, python-side work).

Usage: taskset -c 0-15 python BENCH/loop_phase_profile.py [rounds]
Env:   LOOP_DATA_DIR (default /dev/shm/hx_loop1m), PROF_CORES (16)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from heritrix_spark.constants import PolitenessConfig  # noqa: E402
from heritrix_spark.plans.crawl import crawl  # noqa: E402
from heritrix_spark.session import build_session  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    data = os.environ.get("LOOP_DATA_DIR", "/dev/shm/hx_loop1m")
    cores = int(os.environ.get("PROF_CORES", "16"))
    ui_port = 4141
    store_root = f"{data}/store_prof"
    shutil.rmtree(store_root, ignore_errors=True)
    spark = build_session(
        app_name="loop-phase-prof",
        cores=cores,
        shuffle_partitions=int(os.environ.get("LOOP_SHUFFLE", "0"))
        or max(cores * 2, 16),
        extra_conf={
            "spark.python.worker.reuse": os.environ.get("PROF_REUSE", "false"),
            "spark.ui.enabled": "true",
            "spark.ui.port": str(ui_port),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(data + "/docs")
    seeds = spark.read.parquet(data + "/seeds")
    robots = spark.read.parquet(data + "/robots")

    t0 = time.monotonic()
    res = crawl(
        spark, store_root, docs, seeds, robots, PolitenessConfig(),
        stop_after_round=rounds,
    )
    wall = time.monotonic() - t0
    meta = res.store.manifest()["meta"]
    per_round = [
        (m["round"], m.get("wall_ms"), m.get("emitted"), m.get("novel_scheduled"))
        for m in meta["metrics_log"]
    ]
    print(f"TOTAL wall {wall:.1f}s rounds={res.rounds}")
    for r, w, e, n in per_round:
        print(f"  round {r}: wall={w}ms emitted={e} novel={n}")

    def get(path):
        with urllib.request.urlopen(
            f"http://localhost:{ui_port}/api/v1/{path}", timeout=30
        ) as r:
            return json.load(r)

    app_id = get("applications")[0]["id"]
    jobs = get(f"applications/{app_id}/jobs")
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    rows = []
    for j in jobs:
        sub, comp = ts(j["submissionTime"]), ts(j.get("completionTime", j["submissionTime"]))
        name = j.get("description") or j["name"]
        sids = j.get("stageIds", [])
        name = f"stages={sorted(sids)} {name}"
        rows.append((sub, comp, j["jobId"], name, j["numTasks"]))
    rows.sort()
    tbase = rows[0][0]
    prev_end = None
    total_gap = 0.0
    total_busy = 0.0
    print(f"\n{'job':>4} {'start':>8} {'dur':>7} {'gap':>7} {'tasks':>5}  name")
    for sub, comp, jid, name, ntasks in rows:
        gap = (sub - prev_end) if prev_end is not None else 0.0
        # concurrent jobs: negative gap = overlap, count as 0
        total_gap += max(gap, 0.0)
        total_busy += comp - sub
        prev_end = max(prev_end or comp, comp)
        print(
            f"{jid:>4} {sub - tbase:>8.2f} {comp - sub:>7.2f} {gap:>7.2f} "
            f"{ntasks:>5}  {name[:110]}"
        )
    print(f"\nsum(job durations)={total_busy:.1f}s  sum(positive gaps)={total_gap:.1f}s  "
          f"timeline span={prev_end - tbase:.1f}s")

    # stage-level attribution: biggest stages by executor run time, with
    # the first repo line from the call-site details
    stages = get(f"applications/{app_id}/stages?status=complete")
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"\n{'stage':>6} {'tasks':>5} {'runTime':>8} {'cpuTime':>8} "
          f"{'shufR':>8} {'shufW':>8}  name / repo site")
    for s in stages[:30]:
        details = s.get("details", "")
        site = next(
            (ln.strip() for ln in details.splitlines() if "/root/repo" in ln),
            "",
        )
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>5} "
            f"{s.get('executorRunTime', 0)/1000:>8.1f} "
            f"{s.get('executorCpuTime', 0)/1e9:>8.1f} "
            f"gc={s.get('jvmGcTime', 0)/1000:>6.1f} "
            f"{s.get('shuffleReadBytes', 0)/2**20:>7.0f}M "
            f"{s.get('shuffleWriteBytes', 0)/2**20:>7.0f}M  "
            f"{s['name'][:40]} | {site[:90]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
