#!/usr/bin/env python
"""AQE skew-join backstop vs explicit salting, hot90 (round-3 verdict
item): does spark.sql.adaptive.skewJoin alone rescue a hot-host join,
and does the engine's salting compose with it?

The measured shape: candidates (one host holding 90% of rows) sort-
merge-joined to a per-host dimension on class_key — the shape the
engine would hit if host_state ever outgrew broadcast. Four cells:

  plain  x {skewJoin off, on}   — AQE's own answer (it CAN split a
                                   skewed sort-merge join partition)
  salted x {skewJoin off, on}   — parallelQueues-style pre-salt: fact
                                   key + hash(path_seg)%16, dimension
                                   exploded x16; composes with AQE

plus the window-shape control: AQE skewJoin CANNOT split a window
partition (its balance numbers live in skew_result.json) — salting is
the only fix there. Broadcast is disabled for the join cells
(autoBroadcastJoinThreshold=-1, runtime bloom off) to force the skewed
exchange this bench studies.

Noise protocol as BENCH/scaling.py: rep0 warms, min of the rest; all
samples reported. Run: python BENCH/skewjoin_bench.py [N]; writes
BENCH/skewjoin_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from BENCH.skew_bench import synth  # same hot-host synthesizer
from heritrix_spark.session import build_session

N_SALTS = 16


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = build_session(
        app_name="hx-skewjoin-bench", cores=cpus, shuffle_partitions=32,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory(prefix="hxskj_") as tmp:
        synth(spark, n, 0.9).write.mode("overwrite").parquet(f"{tmp}/cands")
        cands = spark.read.parquet(f"{tmp}/cands")
        dim = (
            cands.select("class_key").distinct()
            .withColumn("host_budget", F.xxhash64("class_key") % 1000)
        )
        dim.write.mode("overwrite").parquet(f"{tmp}/dim")
        dim = spark.read.parquet(f"{tmp}/dim")

        salt = F.pmod(F.xxhash64(F.col("path_seg")), F.lit(N_SALTS))
        cands_salted = cands.withColumn(
            "__sk", F.concat(F.col("class_key"), F.lit("#"), salt.cast("string"))
        )
        dim_salted = dim.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
        ).withColumn(
            "__sk",
            F.concat(F.col("class_key"), F.lit("#"), F.col("__salt").cast("string")),
        ).drop("__salt")

        def q_plain():
            return (
                cands.join(dim, on="class_key")
                .agg(F.sum("host_budget").alias("s"), F.count("*").alias("c"))
            )

        def q_salted():
            return (
                cands_salted.join(
                    dim_salted.drop("class_key"), on="__sk"
                ).agg(F.sum("host_budget").alias("s"), F.count("*").alias("c"))
            )

        # law check once: identical aggregate either way
        a, b = q_plain().first(), q_salted().first()
        assert (a.s, a.c) == (b.s, b.c), (a, b)

        cells: dict[str, dict] = {}
        for variant, q in (("plain", q_plain), ("salted", q_salted)):
            for aqe_skew in ("false", "true"):
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
                name = f"{variant}_skewjoin_{'on' if aqe_skew == 'true' else 'off'}"
                samples = []
                for rep in range(3):
                    t0 = time.monotonic()
                    q().write.format("noop").mode("overwrite").save()
                    dt = round(time.monotonic() - t0, 2)
                    if rep > 0:
                        samples.append(dt)
                    print(f"{name} rep{rep}: {dt}s", file=sys.stderr, flush=True)
                cells[name] = {"samples_s": samples, "best_s": min(samples)}

    out = {
        "n_candidates": n,
        "cores": cpus,
        "hot_fraction": 0.9,
        "n_salts": N_SALTS,
        "cells": cells,
        "aqe_gain_plain": round(
            cells["plain_skewjoin_off"]["best_s"]
            / cells["plain_skewjoin_on"]["best_s"], 2),
        "salting_gain_no_aqe": round(
            cells["plain_skewjoin_off"]["best_s"]
            / cells["salted_skewjoin_off"]["best_s"], 2),
        "composed_over_aqe_alone": round(
            cells["plain_skewjoin_on"]["best_s"]
            / cells["salted_skewjoin_on"]["best_s"], 2),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "skewjoin_result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
