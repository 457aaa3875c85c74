#!/usr/bin/env python
"""Throughput datapoint for the stateful streaming seen filter
(streaming/stateful.dedup_stream — applyInPandasWithState holding
per-shard fingerprint sets).

Protocol: synthesize an N-row candidate feed (same url shape as
benchlib.synth_candidates: hot-host skew, ~25% duplicate rate), split
it into K json-lines files, run ONE availableNow query with
maxFilesPerTrigger=1 (K genuine micro-batches) through dedup_stream
into a noop-equivalent foreachBatch counter sink, and report end-to-end
rows/s plus the per-batch novel counts. A second pass over a fresh
checkpoint reports the warm number (JIT + python workers already up).

Usage:  python BENCH/streaming_bench.py [N_ROWS] [N_FILES]
Env:    STREAMING_BENCH_CORES (default 16)
Writes BENCH/streaming_bench_result.json and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cores = int(os.environ.get("STREAMING_BENCH_CORES", "16"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import functions as F

    from heritrix_spark.benchlib import synth_candidates
    from heritrix_spark.functions.canonicalize import canonicalize_col
    from heritrix_spark.session import build_session
    from heritrix_spark.streaming.stateful import dedup_stream

    spark = build_session(
        app_name=f"streaming-bench-{cores}",
        cores=cores,
        shuffle_partitions=max(cores * 2, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="hxstreambench_")
    feed = os.path.join(workdir, "feed")
    os.makedirs(feed)
    # K json feed files with disjoint increasing parent_ordinal ranges
    # (file == micro-batch), canon computed up front so the measured job
    # is the stateful filter itself, not URL prep (bench.py measures
    # that separately)
    cands = synth_candidates(spark, n, 10_000).withColumn(
        "canon_url", canonicalize_col("url")
    )
    per = n // k
    base_t = time.time() - 3600
    for i in range(k):
        part = os.path.join(workdir, f"part-{i}")
        (
            cands.filter(
                (F.col("parent_ordinal") >= i * per)
                & (
                    (F.col("parent_ordinal") < (i + 1) * per)
                    if i < k - 1
                    else F.lit(True)
                )
            )
            .select("canon_url", "parent_ordinal", "link_seq")
            .coalesce(max(1, cores // 2))
            .write.mode("overwrite")
            .json(part)
        )
        # move the json parts into the feed dir as one logical batch
        # with a deterministic mtime ordering
        seq = 0
        for f in sorted(os.listdir(part)):
            if f.endswith(".json"):
                dst = os.path.join(feed, f"b{i:02d}-{seq:04d}.json")
                shutil.move(os.path.join(part, f), dst)
                os.utime(dst, (base_t + 60 * i, base_t + 60 * i))
                seq += 1

    files_per_batch = max(
        1, len([f for f in os.listdir(feed)]) // k
    )

    def run_once(tag: str) -> dict:
        ckpt = os.path.join(workdir, f"ckpt-{tag}")
        stream = (
            spark.readStream.schema(
                "canon_url string, parent_ordinal long, link_seq long"
            )
            .option("maxFilesPerTrigger", files_per_batch)
            .json(feed)
        )
        novel = dedup_stream(stream, key="canon_url", n_shards=max(64, cores * 4))
        counts: list[int] = []

        def sink(batch_df, batch_id):
            counts.append(batch_df.count())

        t0 = time.monotonic()
        q = (
            novel.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.monotonic() - t0
        return {
            "elapsed_sec": round(dt, 2),
            "rows_per_sec": round(n / dt, 1),
            # actual micro-batch count can exceed n_batches: the file
            # source groups by maxFilesPerTrigger, and availableNow may
            # add an empty finishing batch
            "n_microbatches": len(counts),
            "novel_per_batch": counts,
            "novel_total": sum(counts),
        }

    cold = run_once("cold")
    warm = run_once("warm")
    result = {
        "n_rows": n,
        "n_batches": k,
        "cores": cores,
        "cold": cold,
        "warm": warm,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "streaming_bench_result.json"
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
