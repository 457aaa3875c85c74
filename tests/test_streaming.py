"""Structured Streaming candidate ingestion: micro-batches must produce
the same seen-set semantics as batch scheduling (dedup within batch,
against state, ordinals continue monotonically)."""

from __future__ import annotations

from heritrix_spark.streaming.ingest import (
    start_candidate_ingest,
    write_candidate_feed,
)


def test_stream_ingest_dedups_and_numbers(spark, tmp_path):
    src = str(tmp_path / "feed")
    store_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    write_candidate_feed(
        src,
        [
            {"url": "http://a.example/x", "parent_ordinal": 1, "link_seq": 1, "hops_path": "L"},
            {"url": "http://A.EXAMPLE/x", "parent_ordinal": 2, "link_seq": 1, "hops_path": "L"},  # dup post-canon
            {"url": "http://b.example/y", "parent_ordinal": 1, "link_seq": 2, "hops_path": "L"},
        ],
    )
    q = start_candidate_ingest(spark, src, store_root, ckpt)
    q.awaitTermination(600)

    from heritrix_spark.store.snapstore import SnapStore

    store = SnapStore(store_root, spark)
    seen = sorted(r["canon_url"] for r in store.read("url_seen").collect())
    assert seen == ["http://a.example/x", "http://b.example/y"]
    frontier = store.read("frontier").collect()
    assert len(frontier) == 2
    assert store.manifest()["meta"]["max_ordinal"] == 2

    # second micro-batch: one dup against state, one novel → ordinal 3
    write_candidate_feed(
        src,
        [
            {"url": "http://a.example/x?", "parent_ordinal": 3, "link_seq": 1, "hops_path": "LL"},
            {"url": "http://c.example/z", "parent_ordinal": 3, "link_seq": 2, "hops_path": "LL"},
        ],
    )
    q2 = start_candidate_ingest(spark, src, store_root, ckpt)
    q2.awaitTermination(600)
    seen2 = sorted(r["canon_url"] for r in store.read("url_seen").collect())
    assert seen2 == [
        "http://a.example/x",
        "http://b.example/y",
        "http://c.example/z",
    ]
    ords = {
        r["canon_url"]: r["ordinal"] for r in store.read("frontier").collect()
    }
    assert ords["http://c.example/z"] == 3


def test_stream_ingest_writes_bloom_sidecar(spark, tmp_path):
    """A bloom-enabled stream batch must leave the seen table AND its
    bloom sidecar consistent: every streamed URL later probes as a
    bloom hit, so the fused prefilter (operators/bloomseen.py) keeps
    exact membership — a seen delta without bloom coverage would be
    misclassified 'certainly novel' and re-scheduled."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from heritrix_spark.constants import PolitenessConfig
    from heritrix_spark.operators.bloomseen import dedup_candidates_bloom
    from heritrix_spark.store.snapstore import SnapStore

    cfg = replace(PolitenessConfig(), seen_bloom_bits=1 << 10)
    src = str(tmp_path / "feed")
    store_root = str(tmp_path / "store")
    write_candidate_feed(
        src,
        [
            {"url": "http://a.example/x", "parent_ordinal": 1, "link_seq": 1, "hops_path": "L"},
            {"url": "http://b.example/y", "parent_ordinal": 1, "link_seq": 2, "hops_path": "L"},
        ],
    )
    q = start_candidate_ingest(
        spark, src, store_root, str(tmp_path / "ckpt"), cfg=cfg
    )
    q.awaitTermination(600)

    store = SnapStore(store_root, spark)
    blooms = store.read("url_seen_bloom")
    assert blooms is not None and blooms.count() > 0

    # re-offer one streamed dup + one novel through the bloom-prefiltered
    # membership test the crawl loop uses
    cands = spark.createDataFrame(
        [("http://a.example/x", False), ("http://c.example/z", False)],
        "canon_url string, force_fetch boolean",
    ).withColumn("canon_url", F.col("canon_url"))
    novel = dedup_candidates_bloom(
        cands,
        store.read("url_seen"),
        blooms,
        n_shards=cfg.n_seen_shards,
        bits=cfg.seen_bloom_bits,
    )
    assert [r["canon_url"] for r in novel.collect()] == ["http://c.example/z"]
