#!/usr/bin/env python
"""html_extract throughput budget (round-3 watch item): bytes/sec of
the ExtractorHTML Arrow kernel at local[N] over a realistic page-size
mix, with and without the JVM-side no-'<' gate.

Two corpora, both built from the sf documents table text:
- html:  every row wrapped in link-bearing markup (the kernel's
         worst case — all bytes scanned in Python)
- mixed: 50% of rows left as plain text (a crawl's fetch mix) —
         measures what the gate saves by not shipping/scanning
         non-markup bytes through Python

Usage: python BENCH/html_bench.py [SF_DIR] [CORES] [REPEAT]
Writes BENCH/html_bench_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from heritrix_spark.operators.html_extract import html_outlinks
    from heritrix_spark.session import build_session

    spark = build_session(app_name="html-bench", cores=cores,
                          shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # realistic page sizes: tile the sf text into ~30 KB bodies with
    # markup sprinkled through each tile (log-ish size mix via doc_id)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    tiles = (F.col("doc_id") % 40 + 3).cast("int")  # 3..42 tiles/page
    base = docs.select(
        F.concat(F.lit("http://h"), (F.col("doc_id") % 500).cast("string"),
                 F.lit(".example/p"), F.col("doc_id").cast("string")
                 ).alias("url"),
        # tag-dense tile (~35% markup bytes, like real pages): text
        # fragment + nested divs/spans with attributes + one anchor +
        # one img per tile, so links and tag-scan work scale with size
        F.repeat(
            F.concat(
                F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 400),
                F.lit('<div class="row main" data-i="7"><span style="x:1">'
                      's</span><a href="/seg/p">n</a><img src="/i/t.png" '
                      'alt="t"><input type="hidden" value="v"></div>'),
            ),
            tiles,
        ).alias("text"),
        F.col("doc_id"),
    )
    markup = F.concat(
        F.lit('<html><head><base href="http://b.example/"><meta name="x" '
              'content="y"></head><body><a href="/l1">one</a>'),
        F.col("text"),
        F.lit('<img src="i.png"><script>var u="http://s.example/j";</script>'
              '<a href=\'rel/p\'>two</a></body></html>'),
    )
    corpora = {
        "html": base.withColumn("content", markup),
        "mixed": base.withColumn(
            "content",
            F.when(F.col("doc_id") % 2 == 0, markup).otherwise(
                # plain text with NO '<' (strip any in the source text)
                F.regexp_replace(F.col("text"), "<", "(")
            ),
        ),
    }

    out = {"sf_dir": sf, "cores": cores, "corpora": {}}
    for name, df in corpora.items():
        # the tiled blow-up happens AFTER the (tiny) parquet scan, so
        # repartition first or the whole corpus sits in 1-2 input splits
        df = df.select("url", "content").repartition(cores * 2)
        df = df.localCheckpoint(eager=True)
        n_rows = df.count()
        n_bytes = df.select(
            F.sum(F.octet_length("content")).alias("b")).first()["b"]
        def build_q():
            # a FRESH DataFrame per measurement: Spark 4 reuses the
            # materialized result of an already-executed identical plan
            # object, so re-collecting one q measures nothing
            return df.select(
                F.explode(
                    html_outlinks(F.col("url"), F.col("content"))
                ).alias("l")
            ).agg(F.count("*").alias("n"), F.max(F.col("l.uri")).alias("m"))

        build_q().collect()  # warm (JIT + python workers)
        samples = []
        for _ in range(repeat):
            q = build_q()
            t0 = time.monotonic()
            row = q.collect()[0]
            samples.append(time.monotonic() - t0)
        best = min(samples)
        out["corpora"][name] = {
            "rows": n_rows,
            "input_mb": round(n_bytes / 1e6, 1),
            "links": row["n"],
            "samples_s": [round(s, 3) for s in samples],
            "best_s": round(best, 3),
            "mb_per_s": round(n_bytes / 1e6 / best, 1),
        }
        print(name, out["corpora"][name], file=sys.stderr)

    path = os.path.join(REPO, "BENCH", "html_bench_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
