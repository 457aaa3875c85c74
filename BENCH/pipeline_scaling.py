#!/usr/bin/env python
"""Two-parallelism scaling study for the training-data pipeline
(documents → MinHash-LSH pairs → connected-component clusters →
canonical survivors → quality filter → split), the same sandbox
protocol as BENCH/scaling.py (the north-rule N→4N criterion evidenced
at two pinned parallelism levels, fresh JVM per level, min-of-samples).

The measured job is benchlib.training_pipeline — identical composition
to the ``training_corpus`` driver row — over a deterministic synthetic
near-dup corpus (benchlib.synth_documents: groups of 5 docs share a
base text, variants mutate ~1 word in 13, so the LSH banding and the
contraction loop do real work).

Usage:  python BENCH/pipeline_scaling.py [N_DOCS] [OUTER_REPEATS]
Env:    PSCALING_CORES="4,16"   the two parallelism levels
Writes BENCH/pipeline_scaling_result.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from BENCH.scaling import run_sub  # noqa: E402  (shared subprocess/pinning)

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from heritrix_spark.session import build_session
from heritrix_spark.benchlib import synth_documents

n = int(sys.argv[1]); out = sys.argv[2]
spark = build_session(app_name="pscaling-gen", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
synth_documents(spark, n).write.mode("overwrite").parquet(out + "/documents")
print("GENERATED")
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from heritrix_spark.session import build_session
from heritrix_spark.benchlib import training_pipeline

cores = int(sys.argv[1]); n = int(sys.argv[2]); data = sys.argv[3]
inner = int(sys.argv[4])
spark = build_session(app_name=f"pscaling-{{cores}}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16),
                      extra_conf={{"spark.python.worker.reuse": "false"}})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(data + "/documents")

def once():
    t0 = time.monotonic()
    training_pipeline(docs).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    spark.catalog.clearCache()
    return dt

warm = once()
samples = [once() for _ in range(inner)]
best = min(samples)
print("RESULT " + json.dumps(
    {{"elapsed_sec": best, "docs_per_sec": n / best,
      "warm_sec": warm, "samples": [round(s, 2) for s in samples]}}))
spark.stop()
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    outer = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    inner = int(os.environ.get("PSCALING_INNER", "2"))
    lo, hi = (
        int(x) for x in os.environ.get("PSCALING_CORES", "4,16").split(",")
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.environ.get("PSCALING_DATA_DIR", f"/dev/shm/hxpscaling_{n}")

    meta_path = f"{data}/meta.json"
    if not os.path.exists(f"{data}/documents"):
        out = run_sub(GEN.format(repo=repo), [str(n), data])
        assert "GENERATED" in out, out[-1500:]
        with open(meta_path, "w") as f:
            json.dump({"n_docs": n}, f)
    else:
        # a reused PSCALING_DATA_DIR must actually hold N_DOCS rows —
        # otherwise docs_per_sec = n/elapsed silently reports a wrong
        # throughput (and efficiency) with no warning
        assert os.path.exists(meta_path), (
            f"{data}/documents exists but has no meta.json; regenerate "
            "or point PSCALING_DATA_DIR elsewhere"
        )
        with open(meta_path) as f:
            have = json.load(f)["n_docs"]
        assert have == n, (
            f"dataset at {data} holds {have} docs but N_DOCS={n}"
        )

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
            if r is None:
                failures[cores] += 1
                print(f"WARN: local[{cores}] JVM produced no result, skipping",
                      file=sys.stderr)
                continue
            all_runs[cores].extend(r["samples"])
            if cores not in best or r["elapsed_sec"] < best[cores]["elapsed_sec"]:
                best[cores] = r
    assert lo in best and hi in best, (
        f"all JVMs failed for a level: failures={failures}"
    )
    rlo, rhi = best[lo], best[hi]
    eff = (rhi["docs_per_sec"] / rlo["docs_per_sec"]) / (hi / lo)
    result = {
        "n_docs": n,
        "cores_lo": lo,
        "cores_hi": hi,
        f"throughput_local{lo}_docs_per_sec": round(rlo["docs_per_sec"], 1),
        f"throughput_local{hi}_docs_per_sec": round(rhi["docs_per_sec"], 1),
        f"elapsed_local{lo}_sec": round(rlo["elapsed_sec"], 2),
        f"elapsed_local{hi}_sec": round(rhi["elapsed_sec"], 2),
        f"all_elapsed_local{lo}_sec": all_runs[lo],
        f"all_elapsed_local{hi}_sec": all_runs[hi],
        "jvm_failures": failures,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "pipeline_scaling_result.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
