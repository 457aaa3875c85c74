"""Stateful streaming seen filter (streaming/stateful.dedup_stream):
first-discovery-wins across micro-batches, in-batch collapse along the
scheduling order, equality with the batch-path semantics."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from heritrix_spark.streaming.stateful import dedup_stream

SCHEMA = "canon_url string, parent_ordinal long, link_seq long"


def _write_feed_file(dirpath: str, name: str, rows: list[dict], mtime: float):
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


def _run(spark, src: str, ckpt: str, out_dir: str | None = None):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file == one micro-batch
        .json(src)
    )
    novel = dedup_stream(stream, key="canon_url", n_shards=8)
    if out_dir is None:
        writer = (
            novel.writeStream.format("memory")
            .queryName("novel_out")
            .outputMode("update")
        )
    else:
        # foreachBatch parquet-append sink: unlike the memory sink it
        # supports restart-from-checkpoint (the restart test needs it)
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        writer = novel.writeStream.foreachBatch(sink).outputMode("update")
    q = (
        writer.option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if out_dir is None:
        return spark.sql("select * from novel_out")
    return spark.read.parquet(out_dir)


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    src, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    t = time.time()
    # batch 1: one in-batch dup (b wins by order), two novel keys
    _write_feed_file(
        src,
        "b1.json",
        [
            {"canon_url": "http://a.example/x", "parent_ordinal": 2, "link_seq": 5},
            {"canon_url": "http://a.example/x", "parent_ordinal": 1, "link_seq": 3},
            {"canon_url": "http://b.example/y", "parent_ordinal": 1, "link_seq": 4},
        ],
        t - 20,
    )
    # batch 2: one dup-against-state, one novel
    _write_feed_file(
        src,
        "b2.json",
        [
            {"canon_url": "http://a.example/x", "parent_ordinal": 9, "link_seq": 1},
            {"canon_url": "http://c.example/z", "parent_ordinal": 9, "link_seq": 2},
        ],
        t - 10,
    )
    out = _run(spark, src, ckpt)
    rows = {r["canon_url"]: r for r in out.collect()}
    assert sorted(rows) == [
        "http://a.example/x",
        "http://b.example/y",
        "http://c.example/z",
    ]
    # in-batch first-wins along (parent_ordinal, link_seq)
    assert rows["http://a.example/x"]["parent_ordinal"] == 1
    assert rows["http://a.example/x"]["link_seq"] == 3
    # batch-2 dup against batch-1 state was dropped (ordinal 9 never won)
    assert rows["http://c.example/z"]["parent_ordinal"] == 9


def test_stateful_dedup_state_survives_restart(spark, tmp_path):
    """A new query over the same checkpoint must remember the seen set
    (exactly-once across stream restarts — the UriUniqFilter contract)."""
    src, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    t = time.time()
    _write_feed_file(
        src,
        "b1.json",
        [{"canon_url": "http://a.example/x", "parent_ordinal": 1, "link_seq": 1}],
        t - 20,
    )
    out1 = _run(spark, src, ckpt, out_dir=out_dir)
    assert out1.count() == 1

    _write_feed_file(
        src,
        "b2.json",
        [
            {"canon_url": "http://a.example/x", "parent_ordinal": 2, "link_seq": 1},
            {"canon_url": "http://d.example/w", "parent_ordinal": 2, "link_seq": 2},
        ],
        t - 10,
    )
    out2 = _run(spark, src, ckpt, out_dir=out_dir)  # restart, same ckpt
    novel2 = sorted(r["canon_url"] for r in out2.collect())
    # batch-1 output + only the genuinely novel row of batch 2
    assert novel2 == ["http://a.example/x", "http://d.example/w"]
    assert out2.filter("canon_url = 'http://a.example/x'").count() == 1


def test_stateful_dedup_matches_batch_path(spark, tmp_path):
    """Union of the stream's novel outputs == the batch path's result
    (collapse_batch_duplicates + anti-join per batch) on the same feed."""
    src, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    t = time.time()
    b1 = [
        {"canon_url": f"http://h{i % 4}.example/p{i % 7}", "parent_ordinal": i, "link_seq": i}
        for i in range(20)
    ]
    b2 = [
        {"canon_url": f"http://h{i % 5}.example/p{i % 9}", "parent_ordinal": 100 + i, "link_seq": i}
        for i in range(20)
    ]
    _write_feed_file(src, "b1.json", b1, t - 20)
    _write_feed_file(src, "b2.json", b2, t - 10)
    got = {
        (r["canon_url"], r["parent_ordinal"])
        for r in _run(spark, src, ckpt).collect()
    }

    # batch twin, micro-batch by micro-batch
    from heritrix_spark.operators.seen import (
        collapse_batch_duplicates,
        dedup_candidates,
    )

    seen = spark.createDataFrame([], schema="canon_url string")
    want = set()
    for batch in (b1, b2):
        df = spark.createDataFrame(
            [(r["canon_url"], r["parent_ordinal"], r["link_seq"]) for r in batch],
            SCHEMA,
        )
        uniq = collapse_batch_duplicates(
            df, key="canon_url", order_cols=("parent_ordinal", "link_seq")
        )
        novel = dedup_candidates(uniq, seen)
        want |= {
            (r["canon_url"], r["parent_ordinal"]) for r in novel.collect()
        }
        seen = seen.unionByName(novel.select("canon_url")).distinct()
    assert got == want


def test_stateful_dedup_on_rocksdb_state_store(spark, tmp_path):
    """The 10^10-scale configuration: per-shard FP-set state on the
    RocksDB state store (shard sets page to disk instead of executor
    heap — the config streaming/stateful.py prescribes for production).
    Same feed as the across-microbatches test; semantics must be
    identical, and the checkpoint must actually contain RocksDB state
    (sst/zip artifacts), proving the provider was in effect."""
    src, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    t = time.time()
    _write_feed_file(
        src,
        "b1.json",
        [
            {"canon_url": "http://a.example/x", "parent_ordinal": 2, "link_seq": 5},
            {"canon_url": "http://a.example/x", "parent_ordinal": 1, "link_seq": 3},
            {"canon_url": "http://b.example/y", "parent_ordinal": 1, "link_seq": 4},
        ],
        t - 20,
    )
    _write_feed_file(
        src,
        "b2.json",
        [
            {"canon_url": "http://a.example/x", "parent_ordinal": 9, "link_seq": 1},
            {"canon_url": "http://c.example/z", "parent_ordinal": 9, "link_seq": 2},
        ],
        t - 10,
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        novel = dedup_stream(stream, key="canon_url", n_shards=8)
        q = (
            novel.writeStream.format("memory")
            .queryName("novel_rocks")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    rows = {r["canon_url"]: r for r in spark.sql("select * from novel_rocks").collect()}
    assert sorted(rows) == [
        "http://a.example/x",
        "http://b.example/y",
        "http://c.example/z",
    ]
    assert rows["http://a.example/x"]["parent_ordinal"] == 1
    assert rows["http://c.example/z"]["parent_ordinal"] == 9

    # RocksDB leaves zip/sst artifacts under the state dir; the default
    # HDFSBackedStateStore writes .delta/.snapshot files instead
    arts = []
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        arts.extend(f for f in files if f.endswith((".zip", ".sst")))
    assert arts, "no RocksDB state artifacts found — provider not in effect"
