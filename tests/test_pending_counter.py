"""The incrementally-maintained per-queue ``pending`` counter (the
WorkQueue cached item-count analog, heritrix3/engine/.../frontier/
WorkQueue.java getCount) must equal the true per-host live-frontier row
count at every committed round — eligibility at scale reads the counter
instead of scanning/shuffling the frontier, so an exact invariant is the
correctness contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.plans.crawl import crawl, live_frontier


@pytest.fixture(scope="module")
def fx_paths(tmp_path_factory):
    fx = generate(hosts=4, docs_per_host=4, links_per_doc=3, seed=7)
    out = tmp_path_factory.mktemp("fx_pending")
    return write_parquet(fx, str(out))


def _check_invariant(result) -> None:
    hs = result.store.read("host_state").select("class_key", "pending")
    actual = (
        live_frontier(result.store)
        .groupBy("class_key")
        .agg(F.count("*").cast("long").alias("actual"))
    )
    bad = (
        hs.join(actual, on="class_key", how="full")
        .select(
            "class_key",
            F.coalesce(F.col("pending"), F.lit(-1)).alias("pending"),
            F.coalesce(F.col("actual"), F.lit(0)).alias("actual"),
        )
        .filter(F.col("pending") != F.col("actual"))
        .collect()
    )
    assert bad == [], f"pending counter drift: {bad}"


def test_pending_equals_frontier_counts(spark, fx_paths, tmp_path):
    cfg = PolitenessConfig()
    docs = spark.read.parquet(fx_paths["docs"])
    seeds = spark.read.parquet(fx_paths["seeds"])
    robots = spark.read.parquet(fx_paths["robots"])

    # mid-crawl: counters must already be exact, not only at drain
    mid = crawl(
        spark, str(tmp_path / "mid"), docs, seeds, robots, cfg, stop_after_round=3
    )
    _check_invariant(mid)

    # resumed to completion: every queue drained ⇒ pending all zero
    done = crawl(spark, str(tmp_path / "mid"), docs, seeds, robots, cfg)
    _check_invariant(done)
    leftover = (
        done.store.read("host_state").filter(F.col("pending") != 0).count()
    )
    assert leftover == 0
