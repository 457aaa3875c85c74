"""url_seen / bloom-sidecar compaction: the seen set is a per-round
READ input, so its delta-partition fan-in must stay bounded by
COMPACT_EVERY like the frontier's — and compaction must never change
membership (the accuracy half of the BloomUriUniqFilter tradeoff,
heritrix3/engine/.../util/BloomUriUniqFilter.java:81-90: filters may
only skip work, never decide membership)."""

from __future__ import annotations

from dataclasses import replace

import pytest

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.plans.crawl import COMPACT_EVERY, crawl


@pytest.fixture(scope="module")
def fx_paths(tmp_path_factory):
    # big enough to run well past one COMPACT_EVERY boundary
    fx = generate(hosts=4, docs_per_host=6, links_per_doc=3, seed=23)
    out = tmp_path_factory.mktemp("fx_seen_compact")
    return write_parquet(fx, str(out))


def test_seen_and_bloom_partitions_bounded_and_membership_stable(
    spark, fx_paths, tmp_path
):
    cfg = replace(PolitenessConfig(), seen_bloom_bits=1 << 10)
    docs = spark.read.parquet(fx_paths["docs"])
    seeds = spark.read.parquet(fx_paths["seeds"])
    robots = spark.read.parquet(fx_paths["robots"])

    result = crawl(spark, str(tmp_path / "store"), docs, seeds, robots, cfg)
    assert result.rounds > COMPACT_EVERY, "fixture must cross a compaction"

    manifest = result.store.manifest()
    for table in ("url_seen", "url_seen_bloom", "frontier"):
        rounds = manifest["tables"][table]["rounds"]
        assert len(rounds) <= COMPACT_EVERY, (table, rounds)

    # membership after compaction == the crawl's own fetch discoveries:
    # every fetched canon_url is a member, and row count equals the
    # distinct member count (compaction introduced no dupes/losses)
    seen = {r["canon_url"] for r in result.url_seen().collect()}
    assert result.url_seen().count() == len(seen)
    fetched = {r["canon_url"] for r in result.fetch_log().collect()}
    assert fetched <= seen

    # the OR-merged bloom still covers every member: re-offering the
    # full membership set through the bloom-prefiltered dedup yields
    # zero "novel" rows (no false negatives after collapse)
    from pyspark.sql import functions as F

    from heritrix_spark.operators.bloomseen import dedup_candidates_bloom

    cands = (
        result.url_seen()
        .select("canon_url")
        .withColumn("force_fetch", F.lit(False))
    )
    novel = dedup_candidates_bloom(
        cands,
        result.url_seen(),
        result.store.read("url_seen_bloom"),
        n_shards=cfg.n_seen_shards,
        bits=cfg.seen_bloom_bits,
    )
    assert novel.count() == 0
