"""Checkpoint/resume: a crawl killed between rounds (or mid-round, after
some table writes but before the manifest commit) must resume and finish
bit-identically to an uninterrupted crawl (CheckpointSelfTest analog,
heritrix3/engine/src/test/java/.../selftest/CheckpointSelfTest.java:36)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.plans.crawl import crawl


@pytest.fixture(scope="module")
def fx_paths(tmp_path_factory):
    fx = generate(hosts=3, docs_per_host=3, links_per_doc=2, seed=11)
    out = tmp_path_factory.mktemp("fx_resume")
    return write_parquet(fx, str(out))


def _final_state(spark, result):
    log = sorted(
        tuple(sorted(r.asDict().items()))
        for r in result.fetch_log().collect()
    )
    seen = sorted(r["canon_url"] for r in result.url_seen().collect())
    return log, seen, result.rounds


def test_resume_between_rounds(spark, fx_paths, tmp_path):
    cfg = PolitenessConfig()
    docs = spark.read.parquet(fx_paths["docs"])
    seeds = spark.read.parquet(fx_paths["seeds"])
    robots = spark.read.parquet(fx_paths["robots"])

    full = crawl(spark, str(tmp_path / "full"), docs, seeds, robots, cfg)
    assert full.rounds > 4

    # interrupted: stop after round 3, then resume in a fresh call
    part = crawl(
        spark, str(tmp_path / "part"), docs, seeds, robots, cfg, stop_after_round=3
    )
    assert part.rounds == 3
    resumed = crawl(spark, str(tmp_path / "part"), docs, seeds, robots, cfg)

    assert _final_state(spark, resumed) == _final_state(spark, full)


def test_resume_mid_round_partial_writes(spark, fx_paths, tmp_path):
    """Kill-mid-round: tables for round N+1 written but manifest not
    committed → resume must ignore the orphan writes and still converge
    to the identical final state."""
    cfg = PolitenessConfig()
    docs = spark.read.parquet(fx_paths["docs"])
    seeds = spark.read.parquet(fx_paths["seeds"])
    robots = spark.read.parquet(fx_paths["robots"])

    full = crawl(spark, str(tmp_path / "full2"), docs, seeds, robots, cfg)

    store_root = str(tmp_path / "mid")
    part = crawl(spark, store_root, docs, seeds, robots, cfg, stop_after_round=2)

    # simulate a crash mid-round-3: round-3 partitions written through
    # the same write paths the crawler uses (same schema/partition spec
    # — a real crash leaves partial versions of THESE writes), but the
    # manifest is never committed
    from pyspark.sql import functions as F

    from heritrix_spark.operators.seen import shard_col

    orphan = part.store.read("frontier").limit(1)
    part.store.write_delta(orphan, "frontier", 3)
    part.store.write_delta(
        orphan.select("canon_url").withColumn(
            "shard", shard_col("canon_url", cfg.n_seen_shards)
        ),
        "url_seen",
        3,
        partition_by=("shard",),
    )
    part.store._staged = {}  # crash before commit_round

    resumed = crawl(spark, store_root, docs, seeds, robots, cfg)
    assert _final_state(spark, resumed) == _final_state(spark, full)
