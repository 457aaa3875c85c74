"""Watermark + event-time window law, pinned on a hand fixture.

Three arrival rounds (one availableNow query per new feed file against
one checkpoint — the same restart-with-state protocol as the
streaming_ingest driver row) demonstrate all three clauses of the law:
a too-late row is dropped, a late row lands in its still-open window,
and a window the watermark never passes is never emitted.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from heritrix_spark.streaming.windowed import windowed_fetch_metrics

BASE = 1_600_000_200  # multiple of 600: windows align at BASE + k*600


def _run_rounds(spark, tmp, files, delay_s=120):
    feed = f"{tmp}/feed"
    out_dir = f"{tmp}/out"
    os.makedirs(feed, exist_ok=True)
    t0 = time.time() - 3600

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    for k, rows in enumerate(files):
        fn = f"{feed}/f{k:02d}.json"
        with open(fn, "w") as f:
            for ts, h, b in rows:
                f.write(json.dumps({"ts": ts, "host": h, "bytes": b}) + "\n")
        os.utime(fn, (t0 + 60 * k, t0 + 60 * k))
        stream = (
            spark.readStream.schema("ts long, host string, bytes long")
            .json(feed)
            .withColumn("ts", F.timestamp_seconds("ts"))
        )
        agg = windowed_fetch_metrics(stream, window_s=600, delay_s=delay_s)
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return sorted(
        (r["window_start"] - BASE, r["host"], r["n_fetches"], r["total_bytes"])
        for r in spark.read.parquet(out_dir).collect()
    )


def test_watermark_window_law(spark, tmp_path):
    files = [
        # round 0: ts 10..900 -> wm becomes 780, closing window [0,600)
        [(BASE + 10, "a", 5), (BASE + 350, "a", 7), (BASE + 900, "b", 1)],
        # round 1: wm advances to 1780, closing [600,1200) (both hosts)
        [(BASE + 1000, "a", 2), (BASE + 1900, "b", 3)],
        # round 2: ts 350 is too late (window end 600 <= wm 1780) -> DROPPED;
        # ts 1750 opens [1200,1800) (end > wm — still admissible) and the
        # final wm 2380 closes it; [1800,2400) (holds ts 1900) and
        # [2400,3000) (ts 2500) stay open past stream end -> never emitted
        [(BASE + 350, "a", 100), (BASE + 1750, "b", 11), (BASE + 2500, "a", 13)],
    ]
    got = _run_rounds(spark, str(tmp_path), files)
    assert got == sorted(
        [
            (0, "a", 2, 12),  # ts 10 + 350; the late duplicate of 350 absent
            (600, "a", 1, 2),
            (600, "b", 1, 1),
            (1200, "b", 1, 11),  # late-but-admissible 1750
        ]
    )
