"""Retired-queue reconsideration (WorkQueueFrontier.reconsiderRetiredQueues
:525-545): a crawl whose host retires over total-budget leaves pending
work; resuming with a raised budget and reconsideration un-retires the
queue and finishes the work — without it, the queue stays retired."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.plans.crawl import crawl


def test_reconsider_retired_unblocks_raised_budget(spark, tmp_path):
    fx = generate(hosts=2, docs_per_host=4, links_per_doc=2, seed=31)
    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])

    store_root = str(tmp_path / "store")
    tight = replace(PolitenessConfig(), total_budget=2)
    first = crawl(spark, store_root, docs, seeds, robots, tight)
    hs = first.store.read("host_state")
    retired = [r["class_key"] for r in hs.filter(F.col("retired")).collect()]
    assert retired, "tight budget must retire at least one queue"
    pending = first.frontier().count()
    assert pending > 0, "retirement must leave pending work"
    log1 = first.fetch_log().count()

    # resume WITHOUT reconsideration: nothing changes
    again = crawl(spark, store_root, docs, seeds, robots, tight)
    assert again.fetch_log().count() == log1
    assert again.rounds == first.rounds

    # resume WITH a raised budget + reconsideration: queues un-retire,
    # pending work completes
    raised = replace(PolitenessConfig(), total_budget=100_000)
    resumed = crawl(
        spark, store_root, docs, seeds, robots, raised, reconsider_retired=True
    )
    assert resumed.fetch_log().count() > log1
    assert resumed.frontier().count() == 0
    hs2 = resumed.store.read("host_state")
    assert hs2.filter(F.col("retired")).count() == 0
