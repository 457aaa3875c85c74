"""Structured Streaming ingestion: continuous candidate scheduling.

The reference is a continuous push system (ToeThreads feeding the
frontier); the batch-iterative round loop (plans/crawl.py) is the
primary re-expression, but for *candidate ingestion* — URLs arriving
from an external discovery feed (recover-log replay, sitemap diffs,
cross-crawler handoff a la HashCrawlMapper divert files,
heritrix3/engine/.../processor/CrawlMapper.java) — a true streaming
path fits Spark's model: ``readStream`` over a file/kafka source →
``foreachBatch`` running the exact same schedule+dedup pipeline against
the persistent url_seen/frontier state.

Semantics per micro-batch == one ``add()`` batch of the UriUniqFilter:
batch-internal duplicates collapse first-wins, then the exact anti-join
against the committed seen set, then deterministic ordinals continuing
from the committed max — identical operators to plans/round.py steps
4-5, so streaming and batch ingestion produce the same frontier rows.

Exactly-once: foreachBatch appends through SnapStore's manifest commit,
keyed by (stream batch id), so replays of a failed micro-batch
overwrite the same delta directory idempotently.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heritrix_spark.benchlib import schedule_dedup_pipeline
from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.operators.seen import shard_col
from heritrix_spark.store.snapstore import SnapStore

CANDIDATE_STREAM_SCHEMA = (
    "url string, parent_ordinal long, link_seq long, hops_path string"
)


def start_candidate_ingest(
    spark: SparkSession,
    source_dir: str,
    store_root: str,
    checkpoint_dir: str,
    cfg: PolitenessConfig = PolitenessConfig(),
    trigger_once: bool = True,
):
    """Stream candidate URLs (json-lines files in ``source_dir``) into
    the frontier store. Returns the StreamingQuery.

    ``trigger_once=True`` processes all available input then stops —
    the testable mode; pass False for a continuous micro-batch trigger.
    """
    store = SnapStore(store_root, spark)

    stream = (
        spark.readStream.schema(CANDIDATE_STREAM_SCHEMA)
        .json(source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        manifest = store.manifest() or {"round": 0, "meta": {"max_ordinal": 0}}
        max_ordinal = manifest["meta"].get("max_ordinal", 0)
        round_no = manifest.get("round", 0) + 1

        url_seen = store.read("url_seen")
        if url_seen is None:
            url_seen = spark.createDataFrame([], schema="canon_url string, shard int")

        novel = schedule_dedup_pipeline(
            batch_df, url_seen, max_ordinal=max_ordinal,
            lead_bound=None,
        )
        # eager localCheckpoint (not persist): truncates the batch's
        # logical plan so the 2-3 downstream write jobs analyze a
        # LogicalRDD instead of re-analyzing the full schedule/dedup
        # expression trees — same plan-truncation law as the batch
        # round loop (plans/round.py)
        novel = novel.localCheckpoint(eager=True)
        n_novel = novel.count()

        novel_frontier = novel.select(
            "url",
            "canon_url",
            "class_key",
            "directive",
            "precedence",
            "ordinal",
            "cost",
            "hops_path",
            F.lit(None).cast("string").alias("via"),
            F.lit(0).cast("int").alias("attempts"),
        )
        # append-only delta: a micro-batch writes only its novel rows
        # (the frontier is never rewritten — same O(delta) protocol as
        # the batch round loop)
        store.write_delta(novel_frontier, "frontier", round_no)
        seen_delta = novel.select(
            "canon_url", shard_col("canon_url", cfg.n_seen_shards).alias("shard")
        )
        # same shard-partitioned layout as the batch loop (the two
        # ingestion paths share one url_seen table), and the bloom
        # sidecar MUST cover every seen delta: a seen row without its
        # bloom bits would later be prefiltered as "certainly novel"
        store.write_delta(
            seen_delta, "url_seen", round_no, partition_by=("shard",)
        )
        if cfg.seen_bloom_bits > 0:
            from heritrix_spark.operators.bloomseen import bloom_delta

            store.write_delta(
                bloom_delta(seen_delta, bits=cfg.seen_bloom_bits),
                "url_seen_bloom",
                round_no,
            )
        store.commit_round(
            round_no,
            {
                "now_ms": manifest["meta"].get("now_ms", 0),
                "max_ordinal": max_ordinal + n_novel,
                "stream_batch_id": batch_id,
            },
        )
        novel.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query


def write_candidate_feed(path: str, candidates: list[dict]) -> None:
    """Test helper: write a json-lines candidate feed file."""
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, f"feed-{len(os.listdir(path)):04d}.json")
    with open(fn, "w") as f:
        for c in candidates:
            f.write(json.dumps(c) + "\n")
