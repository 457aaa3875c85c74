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
    q.awaitTermination(120)

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
    q2.awaitTermination(120)
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
