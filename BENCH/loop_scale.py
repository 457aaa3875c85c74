#!/usr/bin/env python
"""Production-scale soak of the FULL crawl loop (plans/crawl.py) — not
the one-shot schedule+dedup pipeline — at two parallelism levels.

What it proves (the two unmeasured claims from the round-3 plan audit):
1. Per-round driver overhead AMORTIZES at production round sizes:
   per-round wall must be dominated by data work and stay flat as
   rounds accumulate store deltas (no O(rounds) read-side growth).
2. The loop itself scales: identical multi-round crawl at lo vs hi
   cores (taskset-pinned fresh JVMs, BASELINE.md protocol), reporting
   per-round wall, total jobs/stages, shuffle bytes, and
   efficiency = (tp_hi / tp_lo) / (hi / lo).
3. Cross-parallelism determinism AT SCALE: the lo- and hi-core crawls
   of the same corpus must produce bit-identical fetch logs, frontiers
   and url_seen sets (md5 over sorted rows) — the 10^6-row version of
   tests/test_ordering.py's 2/8/31-way fixture pins.

Corpus (synthesized in Spark, input_hint shape (doc_id, spans)):
  H hosts; per host a seed page and C child pages; EVERY page's one
  text span links to the same C children of its host. So round 1
  fetches H seeds and discovers H*C novel candidates; every later
  round fetches H pages (one per host — the politeness law) and
  re-discovers H*C candidates that are all already-seen: per-round
  work = constant H*C-candidate extraction + canonicalization +
  in-batch collapse + seen anti-join + scheduling, the steady-state
  shape of a big crawl. Candidates/round = H*C.

Usage:  python BENCH/loop_scale.py [H] [C] [ROUNDS]
Env:    LOOP_CORES="8,32"  the two parallelism levels
        LOOP_DATA_DIR      corpus dir (default /dev/shm/hx_loopscale)
Writes BENCH/loop_scale_result.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from heritrix_spark.session import build_session

H = int(sys.argv[1]); C = int(sys.argv[2]); out = sys.argv[3]
spark = build_session(app_name="loopscale-gen", cores=32,
                      shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

hosts = spark.range(H).select(
    F.concat(F.lit("http://h"), F.col("id"), F.lit(".example")).alias("base"))
# one text span whose body carries the C child links (the extractor's
# text-span URL-scan law finds them)
links = F.concat_ws(" ", F.array(*[
    F.concat(F.col("base"), F.lit(f"/c/{{j}}")) for j in range(C)]))
span = F.array(F.struct(
    F.lit("text").alias("kind"), links.alias("text"),
    F.lit(None).cast("string").alias("media_ref"),
    F.lit(0).cast("int").alias("offset")))
seed_docs = hosts.select(
    F.concat(F.col("base"), F.lit("/")).alias("doc_id"), span.alias("spans"))
child_docs = (
    hosts.crossJoin(spark.range(C).select(F.col("id").alias("j")))
    .select(F.concat(F.col("base"), F.lit("/c/"), F.col("j")).alias("doc_id"),
            span.alias("spans")))
seed_docs.unionByName(child_docs).repartition(64).write.mode(
    "overwrite").parquet(out + "/docs")
from pyspark.sql import Window
hosts.select(F.concat(F.col("base"), F.lit("/")).alias("url")).withColumn(
    "seq", (F.row_number().over(Window.orderBy("url")) - 1).cast("int")
).write.mode("overwrite").parquet(out + "/seeds")
# allow-all robots per host queue
from heritrix_spark.functions.surt import class_key_col
hosts.select(class_key_col(F.concat(F.col("base"), F.lit("/"))).alias("class_key")) \
    .withColumn("allows", F.array(F.lit("/"))) \
    .withColumn("disallows", F.array().cast("array<string>")) \
    .withColumn("crawl_delay", F.lit(None).cast("double")) \
    .write.mode("overwrite").parquet(out + "/robots")
print("GENERATED", H, C)
spark.stop()
"""

RUNNER = r"""
import hashlib, json, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.plans.crawl import crawl
from heritrix_spark.session import build_session

cores = int(sys.argv[1]); data = sys.argv[2]; rounds = int(sys.argv[3])
digest = sys.argv[4] == "1"
store_root = f"{{data}}/store_{{cores}}"
shutil.rmtree(store_root, ignore_errors=True)
import os as _os
ui_port = 4100 + cores
reuse = _os.environ.get("LOOP_WORKER_REUSE", "false")
extra = {{"spark.python.worker.reuse": reuse,
          "spark.ui.enabled": "true",
          "spark.ui.port": str(ui_port)}}
# LOOP_FIXED_PARTS pins AQE's initial shuffle partition count (the
# pre-round-5 behavior where partitions never scaled with round bytes);
# unset, crawl() floors it at 8x cores and AQE coalesces by size
if _os.environ.get("LOOP_FIXED_PARTS"):
    extra["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] = \
        _os.environ["LOOP_FIXED_PARTS"]
spark = build_session(app_name=f"loopscale-{{cores}}", cores=cores,
                      shuffle_partitions=int(_os.environ.get("LOOP_SHUFFLE", "0")) or max(cores * 2, 16),
                      extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(data + "/docs")
seeds = spark.read.parquet(data + "/seeds")
robots = spark.read.parquet(data + "/robots")
# LOOP_RECRAWL_MS >= 0 turns on the revisit/persist path (successful
# seeds reschedule through future_uris; every round then also filters
# and re-injects due futures at full scale)
cfg = PolitenessConfig(
    recrawl_interval_ms=int(_os.environ.get("LOOP_RECRAWL_MS", "-1"))
)

t0 = time.monotonic()
res = crawl(spark, store_root, docs, seeds, robots, cfg,
            stop_after_round=rounds)
wall = time.monotonic() - t0
meta = res.store.manifest()["meta"]
per_round = [
    {{"round": m["round"], "wall_ms": m.get("wall_ms"),
      "emitted": m.get("emitted"), "novel": m.get("novel_scheduled")}}
    for m in meta["metrics_log"]
]

# totals (jobs / stages / shuffle bytes) — the driver-action-count
# evidence, read from the UI REST API (version-stable JSON)
jobs = stages = s_read = s_write = None
try:
    import urllib.request

    def get(path):
        with urllib.request.urlopen(
            f"http://localhost:{{ui_port}}/api/v1/{{path}}", timeout=30
        ) as r:
            return json.load(r)

    app_id = get("applications")[0]["id"]
    jl = get(f"applications/{{app_id}}/jobs?status=succeeded")
    jobs = len(jl)
    sl = get(f"applications/{{app_id}}/stages?status=complete")
    stages = len(sl)
    s_read = sum(s.get("shuffleReadBytes", 0) for s in sl)
    s_write = sum(s.get("shuffleWriteBytes", 0) for s in sl)
except Exception as e:
    jobs = f"unavailable: {{e}}"

out = {{"cores": cores, "rounds": res.rounds, "total_wall_s": round(wall, 2),
        "per_round": per_round, "jobs": jobs, "stages": stages,
        "shuffle_read_bytes": s_read, "shuffle_write_bytes": s_write}}

if digest:
    def h(df, cols):
        rows = sorted(map(str, df.select(*cols).collect()))
        return hashlib.md5("\n".join(rows).encode()).hexdigest()
    out["fetch_log_md5"] = h(res.fetch_log().drop("politeness_delay_ms"),
                             ["round", "class_key", "canon_url", "ordinal",
                              "directive", "fetch_status", "disposition"])
    out["url_seen_md5"] = h(res.url_seen(), ["canon_url"])
    out["frontier_md5"] = h(res.frontier(),
                            ["class_key", "canon_url", "ordinal"])
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run(cmd, **kw):
    print("+", " ".join(cmd[:4]), file=sys.stderr, flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"child failed rc={r.returncode}")
    return r


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    cores_levels = [
        int(c) for c in os.environ.get("LOOP_CORES", "8,32").split(",")
    ]
    data = os.environ.get("LOOP_DATA_DIR", "/dev/shm/hx_loopscale")
    digest = os.environ.get("LOOP_DIGEST", "1")

    if not os.path.exists(data + "/docs/_SUCCESS"):
        r = run([sys.executable, "-c", GEN.format(repo=REPO),
                 str(H), str(C), data])
        print(r.stdout[-200:], file=sys.stderr)

    results = {}
    for cores in cores_levels:
        cpus = f"0-{cores - 1}"
        r = run(["taskset", "-c", cpus, sys.executable, "-c",
                 RUNNER.format(repo=REPO), str(cores), data, str(rounds),
                 digest])
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")][-1]
        results[cores] = json.loads(line[len("RESULT "):])
        print(json.dumps(results[cores], indent=1), file=sys.stderr)

    lo, hi = min(cores_levels), max(cores_levels)
    # steady-state throughput: candidates processed per second over the
    # post-warm-up rounds (drop round 1 = novel flood + first-JIT)
    def steady(res):
        rws = [m for m in res["per_round"] if m["round"] >= 2 and m["wall_ms"]]
        wall_s = sum(m["wall_ms"] for m in rws) / 1000
        cands = len(rws) * H * C
        return cands / wall_s if wall_s else None

    tp = {c: steady(results[c]) for c in cores_levels}
    eff = None
    if tp.get(lo) and tp.get(hi):
        eff = round((tp[hi] / tp[lo]) / (hi / lo), 3)
    out = {
        "hosts": H, "children": C, "rounds": rounds,
        "candidates_per_round": H * C,
        "results": results,
        "steady_state_candidates_per_sec": {str(c): round(t, 1) for c, t in tp.items() if t},
        "scaling_efficiency": eff,
        "deterministic_across_parallelism": (
            results[lo].get("fetch_log_md5") == results[hi].get("fetch_log_md5")
            and results[lo].get("url_seen_md5") == results[hi].get("url_seen_md5")
            and results[lo].get("frontier_md5") == results[hi].get("frontier_md5")
        ) if digest == "1" and len(cores_levels) > 1 else None,
    }
    path = os.environ.get(
        "LOOP_RESULT", os.path.join(REPO, "BENCH", "loop_scale_result.json")
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
