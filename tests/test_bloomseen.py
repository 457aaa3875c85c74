"""Bloom sidecar prefilter: accuracy-preserving (membership identical
to the exact anti-join), OR-mergeable deltas, shard pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.operators.bloomseen import (
    bloom_delta,
    bloom_prefilter,
    dedup_candidates_bloom,
    merge_blooms,
)
from heritrix_spark.operators.seen import dedup_candidates, shard_col

N_SHARDS = 8
BITS = 1 << 10  # deliberately small so false positives occur


@pytest.fixture(scope="module")
def seen(spark):
    urls = [(f"http://h{i % 7}.example/p{i}",) for i in range(500)]
    return (
        spark.createDataFrame(urls, ["canon_url"])
        .withColumn("shard", shard_col("canon_url", N_SHARDS))
        .persist()
    )


@pytest.fixture(scope="module")
def blooms(spark, seen):
    return bloom_delta(seen, bits=BITS).persist()


def _cands(spark, lo, hi):
    # 50% overlap with the seen set
    urls = [(f"http://h{i % 7}.example/p{i}", i) for i in range(lo, hi)]
    return spark.createDataFrame(urls, ["canon_url", "ordinal"])


def test_membership_never_changes(spark, seen, blooms):
    cands = _cands(spark, 250, 750)
    exact = sorted(
        r["canon_url"]
        for r in dedup_candidates(cands, seen, n_shards=N_SHARDS).collect()
    )
    with_bloom = sorted(
        r["canon_url"]
        for r in dedup_candidates_bloom(
            cands, seen, blooms, n_shards=N_SHARDS, bits=BITS
        ).collect()
    )
    assert with_bloom == exact
    assert len(exact) == 250  # p250..p499 are members


def test_prefilter_split_is_sound(spark, seen, blooms):
    cands = _cands(spark, 250, 750).withColumn(
        "shard", shard_col("canon_url", N_SHARDS)
    )
    certain, maybe = bloom_prefilter(cands, blooms, bits=BITS)
    certain_urls = {r["canon_url"] for r in certain.collect()}
    maybe_urls = {r["canon_url"] for r in maybe.collect()}
    members = {f"http://h{i % 7}.example/p{i}" for i in range(250, 500)}
    # no member may ever land in certain_novel (zero false negatives)
    assert not (certain_urls & members)
    assert members <= maybe_urls
    # split is a partition of the input
    assert len(certain_urls) + len(maybe_urls) == 500
    # and the prefilter actually filters (most non-members miss)
    assert len(certain_urls) > 100


def test_bloom_deltas_or_merge(spark, seen):
    half1 = seen.filter(F.col("canon_url").rlike("p[0-4]?[0-9]?[0-9]$"))
    b1 = bloom_delta(seen.limit(250), bits=BITS)
    b2 = bloom_delta(seen.subtract(seen.limit(250)), bits=BITS)
    merged = merge_blooms(b1.unionByName(b2))
    full = bloom_delta(seen, bits=BITS)
    got = {
        (r["shard"], r["word_idx"]): r["bits"] for r in merged.collect()
    }
    want = {(r["shard"], r["word_idx"]): r["bits"] for r in full.collect()}
    assert got == want


def test_no_blooms_means_all_maybe_is_empty(spark, seen):
    cands = _cands(spark, 0, 100).withColumn(
        "shard", shard_col("canon_url", N_SHARDS)
    )
    certain, maybe = bloom_prefilter(cands, None, bits=BITS)
    assert certain.count() == 100
    assert maybe.count() == 0


def test_seen_scan_pruned_to_hit_shards(spark, seen, blooms):
    """Candidates confined to one shard → the exact join's seen side
    carries a static shard IN-filter (file-prune-able)."""
    one = seen.limit(1).collect()[0]
    cands = spark.createDataFrame(
        [(one["canon_url"], 0)], ["canon_url", "ordinal"]
    )
    out = dedup_candidates_bloom(
        cands, seen, blooms, n_shards=N_SHARDS, bits=BITS
    )
    assert out.count() == 0  # the one candidate is a member


def test_crawl_with_bloom_bit_identical(spark, tmp_path):
    """A full crawl with the bloom sidecar enabled must produce exactly
    the same fetch log, seen set, and round count as without it."""
    from dataclasses import replace

    from heritrix_spark.constants import PolitenessConfig
    from heritrix_spark.fixtures.gen import generate, write_parquet
    from heritrix_spark.plans.crawl import crawl

    fx = generate(hosts=3, docs_per_host=3, links_per_doc=2, seed=23)
    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])

    base = crawl(
        spark, str(tmp_path / "plain"), docs, seeds, robots, PolitenessConfig()
    )
    bloomed = crawl(
        spark,
        str(tmp_path / "bloomed"),
        docs,
        seeds,
        robots,
        replace(PolitenessConfig(), seen_bloom_bits=1 << 10),
    )

    def state(res):
        log = sorted(
            tuple(sorted(r.asDict().items())) for r in res.fetch_log().collect()
        )
        seen = sorted(r["canon_url"] for r in res.url_seen().collect())
        return log, seen, res.rounds

    assert state(bloomed) == state(base)
