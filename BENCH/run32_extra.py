#!/usr/bin/env python
"""Supplemental scaling JVM: one more local[32] measurement of the SAME
study (same corpus, same measured job, same min-of-samples estimator) —
run when a wedged python-worker socket cost the study one of its
local[32] JVMs. Launch pinned: ``taskset -c 0-31 python BENCH/run32_extra.py
[N] [INNER]``. Prints RESULT lines compatible with scaling.py; merge by
taking min over all reported samples."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from heritrix_spark.benchlib import schedule_dedup_pipeline
from heritrix_spark.session import build_session


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000_000
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    data = f"/dev/shm/hxscaling_{n}"
    spark = build_session(
        app_name="scaling-32-extra",
        cores=32,
        shuffle_partitions=64,
        # fresh python worker per task — avoids the reused-worker socket
        # wedge that can block an executor indefinitely in this sandbox
        extra_conf={"spark.python.worker.reuse": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    candidates = spark.read.parquet(data + "/candidates")
    url_seen = spark.read.parquet(data + "/url_seen")

    def once() -> float:
        t0 = time.monotonic()
        result = schedule_dedup_pipeline(candidates, url_seen, lead_bound=n)
        result.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        for (_, rdd) in list(
            spark.sparkContext._jsc.getPersistentRDDs().items()
        ):
            rdd.unpersist()
        spark.catalog.clearCache()
        return dt

    warm = once()
    print(f"WARM {warm:.2f}", flush=True)
    samples = []
    for _ in range(inner):
        samples.append(once())
        print(f"SAMPLE {samples[-1]:.2f}", flush=True)
    best = min(samples)
    print("RESULT " + json.dumps(
        {"elapsed_sec": best, "urls_per_sec": n / best,
         "warm_sec": warm, "samples": [round(s, 2) for s in samples]}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
