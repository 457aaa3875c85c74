#!/usr/bin/env python
"""spark-submit entry point: run (or resume) a frontier crawl on a cluster.

The north-rule deployment surface — the same batch-iterative loop the
tests pin, launched as a cluster job:

    bin/package.sh                       # builds dist/heritrix_spark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/heritrix_spark.zip \
        bin/submit_crawl.py \
        --store  s3://bucket/crawl-state \
        --docs   s3://bucket/docs.parquet \
        --seeds  s3://bucket/seeds.parquet \
        --robots s3://bucket/robots.parquet \
        --max-rounds 100

The job is resumable: re-submitting with the same --store continues
from the last committed round manifest (kill/resume bit-identity is
pinned by tests/test_resume.py). All session tuning that matters on a
real cluster (AQE, shuffle partitions, maxPartitionBytes) is plain
spark conf — override via ``spark-submit --conf``; the script only
sets a master when run OUTSIDE spark-submit (``--local N`` smoke mode).

Smoke test without a cluster (synthesizes the deterministic fixture):

    spark-submit --master 'local[8]' --py-files dist/heritrix_spark.zip \
        bin/submit_crawl.py --store /tmp/crawl --fixture --max-rounds 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

try:  # deployed: package arrives via --py-files; dev: repo root
    import heritrix_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", required=True, help="crawl-state root (any Hadoop FS path)")
    p.add_argument("--docs", help="parquet of (doc_id, spans) interleaved documents")
    p.add_argument("--seeds", help="parquet of (url, seq) seed list")
    p.add_argument("--robots", help="parquet of (class_key, allows, disallows, crawl_delay)")
    p.add_argument("--host-config", help="optional parquet of per-host overlay columns")
    p.add_argument("--fixture", action="store_true",
                   help="generate the deterministic synthetic fixture instead of --docs/--seeds/--robots")
    p.add_argument("--fixture-hosts", type=int, default=24)
    p.add_argument("--fixture-docs-per-host", type=int, default=16)
    p.add_argument("--max-rounds", type=int, default=10_000)
    p.add_argument("--reconsider-retired", action="store_true",
                   help="un-retire retired queues once at start (changed budgets)")
    p.add_argument("--rollback", type=int, metavar="ROUND",
                   help="first roll the store back to this committed round's "
                        "snapshot (Iceberg rollback analog), then resume — "
                        "rounds after it are re-crawled bit-identically")
    p.add_argument("--local", type=int, metavar="CORES",
                   help="run without spark-submit on local[CORES] (smoke mode)")
    args = p.parse_args(argv)

    if not args.fixture and not (args.docs and args.seeds and args.robots):
        p.error("provide --docs/--seeds/--robots or --fixture")

    from heritrix_spark.plans.crawl import crawl
    from heritrix_spark.session import build_session

    spark = build_session(
        app_name="heritrix-spark-crawl",
        cores=args.local,
        master=(None if args.local else "external"),
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.fixture:
        from heritrix_spark.fixtures.gen import generate, write_parquet

        fx = generate(hosts=args.fixture_hosts,
                      docs_per_host=args.fixture_docs_per_host)
        paths = write_parquet(fx, tempfile.mkdtemp(prefix="crawl_fixture_"))
        docs = spark.read.parquet(paths["docs"])
        seeds = spark.read.parquet(paths["seeds"])
        robots = spark.read.parquet(paths["robots"])
    else:
        docs = spark.read.parquet(args.docs)
        seeds = spark.read.parquet(args.seeds)
        robots = spark.read.parquet(args.robots)
    host_config = spark.read.parquet(args.host_config) if args.host_config else None

    if args.rollback is not None:
        from heritrix_spark.store.snapstore import SnapStore

        SnapStore(args.store, spark).rollback(args.rollback)

    result = crawl(
        spark,
        args.store,
        docs,
        seeds,
        robots,
        max_rounds=args.max_rounds,
        reconsider_retired=args.reconsider_retired,
        host_config=host_config,
    )
    metrics = [r.asDict() for r in result.metrics().orderBy("round").collect()]
    summary = {
        "rounds": result.rounds,
        "fetched": sum(m.get("succeeded", 0) for m in metrics),
        "emitted": sum(m.get("emitted", 0) for m in metrics),
        "novel_scheduled": sum(m.get("novel_scheduled", 0) for m in metrics),
        "store": args.store,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
