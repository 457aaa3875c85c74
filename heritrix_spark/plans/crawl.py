"""The crawl driver loop: rounds over SnapStore-committed state.

Checkpoint/resume protocol (analog of BdbFrontier.doCheckpoint /
setRecoveryCheckpoint, heritrix3/engine/.../frontier/BdbFrontier.java:225-330):
each round writes host_state + future_uris (full — small per-host /
per-seed tables) and frontier + url_seen + fetch_log + lineage
(delta — O(changed rows) per round; per-round metrics ride the
manifest itself), then commits the manifest with {round, now_ms,
max_ordinal, metrics_log}. Because
every round is a pure function of committed state, killing the process
anywhere and rerunning ``crawl()`` resumes from the last committed
round and produces a bit-identical final state (tests/test_resume.py).

Frontier storage is merge-on-read (the Iceberg MERGE shape): per round
only the rows that CHANGED are appended (novel, retries, un-emitted
injected futures) plus (ordinal, delta_round) tombstone rows (flagged
in-table) for the rows emitted — never a rewrite of all pending URIs,
exactly as the reference's BdbMultipleWorkQueues mutates its B-tree in
place (BdbMultipleWorkQueues.java:425-441). The live frontier is
``rows LEFT ANTI JOIN tombstones ON (ordinal, delta_round)``;
every COMPACT_EVERY rounds the resolved view is rewritten as a single
base delta and the tombstones collapse away (rewrite-data-files /
expire-snapshots), so a crawl reads at most COMPACT_EVERY delta dirs.
url_seen and its bloom sidecar — per-round READ inputs too — compact
on the same cadence (seen: plain append-only rewrite; bloom: bit_or
collapse of the sparse rows), so every input table's partition fan-in
is bounded by COMPACT_EVERY regardless of crawl length
(tests/test_seen_compaction.py).
At a 10^10-row frontier this makes per-round write I/O O(delta), with
the O(frontier) rewrite amortized 1/COMPACT_EVERY per round. A round's
independent write jobs are submitted concurrently (wall time =
max(write), not sum — job-scheduling overhead dominates small rounds).

Reading state back from parquet each round also truncates the logical
plan — the iterative loop never builds an unbounded lineage chain.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.plans.round import (
    clock_probe,
    finalize_metrics,
    run_round,
    schedule_seeds,
)
from heritrix_spark.store.snapstore import SnapStore


# compaction cadence: resolved frontier rewritten as a single base delta
# every N rounds (Iceberg rewrite-data-files); reads touch ≤ N delta dirs
COMPACT_EVERY = 16


def live_frontier(store: SnapStore) -> DataFrame | None:
    """Resolve the frontier's merge-on-read view: appended row versions
    minus positional-delete tombstones, joined on (ordinal, delta_round).

    Tombstones live in the same delta table flagged ``tombstone=true``
    (equivalent to a separate delete-file table, but one write job per
    round instead of two — per-round job count is the fixture-scale
    bottleneck and a real cost at any scale).

    The anti-join BROADCASTS the tombstone side explicitly: tombstones
    are two ints per emitted row since the last compaction — bounded by
    ``COMPACT_EVERY × hosts``, orders of magnitude under the row-version
    side — but their size ESTIMATE comes from the whole delta table's
    parquet stats, so without the hint Catalyst picks a sort-merge join
    and shuffles every full-width frontier row version on (ordinal,
    delta_round): measured 2.28 GB/round at the 10^7-candidate soak,
    the single largest exchange in the loop. At extreme host counts
    where even that bound outgrows broadcast, Iceberg positional
    deletes replace this resolution entirely (store/iceberg.py)."""
    deltas = store.read("frontier")
    if deltas is None:
        return None
    tombs = deltas.filter(F.col("tombstone")).select("ordinal", "delta_round")
    return (
        deltas.filter(~F.col("tombstone"))
        .join(F.broadcast(tombs), on=["ordinal", "delta_round"], how="left_anti")
        .drop("tombstone")
    )


@dataclass
class CrawlResult:
    rounds: int
    store: SnapStore

    def fetch_log(self) -> DataFrame:
        return self.store.read("fetch_log")

    def url_seen(self) -> DataFrame:
        return self.store.read("url_seen")

    def frontier(self) -> DataFrame:
        return live_frontier(self.store).drop("delta_round")

    def metrics(self) -> DataFrame:
        """Per-round counters. Stored in the manifest (snapshot-summary
        analog — one dict per round), not as a parquet table: a 1-row
        write job per round costs more scheduling than the data."""
        log = (self.store.manifest() or {}).get("meta", {}).get("metrics_log", [])
        return self.store.spark.createDataFrame(log)


def seed_scope_prefixes_spark(seeds: DataFrame) -> list[str]:
    """Seed SURT prefixes (spec step 4's scope law), computed via the
    same Python twin the oracle uses — seeds are a tiny list."""
    from heritrix_spark.oracle.simulator import seed_scope_prefixes

    return seed_scope_prefixes([r["url"] for r in seeds.select("url").collect()])


def crawl(
    spark: SparkSession,
    store_root: str,
    docs: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    cfg: PolitenessConfig = PolitenessConfig(),
    max_rounds: int = 10_000,
    stop_after_round: int | None = None,
    reconsider_retired: bool = False,
    host_config: DataFrame | None = None,
    store_factory=None,
) -> CrawlResult:
    """Run (or resume) a crawl to completion. ``stop_after_round`` kills
    the loop early — used by the resume tests. ``reconsider_retired``
    un-retires every retired queue once at (re)start — the operator
    action for changed budgets (WorkQueueFrontier.reconsiderRetiredQueues
    :525-545); still-over-budget queues re-retire on their next round.
    ``store_factory(store_root, spark)`` selects the state backend —
    default :class:`SnapStore` (parquet + atomic manifest); pass
    :class:`heritrix_spark.store.iceberg.IcebergStore` on a cluster
    with an Iceberg catalog (store_root = table namespace)."""
    store = (store_factory or SnapStore)(store_root, spark)
    prefixes = seed_scope_prefixes_spark(seeds)

    # Shuffle-partition auto-sizing for the loop: plan every exchange
    # with a GENEROUS initial partition count and let AQE coalesce down
    # to the advisory size (~round bytes / advisory per partition).
    # Inheriting the session's fixed spark.sql.shuffle.partitions broke
    # in exactly one direction at the 4x10^7-candidate soak cells: too
    # few partitions -> 1.2 GB+ per shuffle partition -> spill, and
    # throughput DROPPED as rounds grew. Over-provisioning the initial
    # count is free (AQE merges tiny outputs), under-provisioning is
    # not — so the loop floors it at 8x the core count unless the
    # operator pinned one explicitly. Partition counts never affect
    # results (the ordinal law is partition-invariant; pinned by the
    # cross-parallelism md5-equal crawls in BENCH/LOOP_SCALE.md).
    try:
        spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    except Exception:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(256, 8 * spark.sparkContext.defaultParallelism)),
        )

    manifest = store.manifest()
    if reconsider_retired and manifest is not None:
        from heritrix_spark.operators.budget import reconsider_retired_queues

        # localCheckpoint materializes the updated table before the
        # overwrite — the source and destination are the same round dir
        host_state = reconsider_retired_queues(
            store.read("host_state")
        ).localCheckpoint(eager=True)
        round_no0 = manifest["round"]
        store.write_full(host_state, "host_state", round_no0)
        store.commit_round(round_no0, manifest["meta"])
    if manifest is None:
        frontier, url_seen, host_state, max_ordinal = schedule_seeds(spark, seeds, cfg)
        store.write_delta(
            frontier.withColumn("tombstone", F.lit(False)), "frontier", 0
        )
        store.write_full(host_state, "host_state", 0)
        store.write_delta(url_seen, "url_seen", 0, partition_by=("shard",))
        if cfg.seen_bloom_bits > 0:
            from heritrix_spark.operators.bloomseen import bloom_delta

            store.write_delta(
                bloom_delta(url_seen, bits=cfg.seen_bloom_bits),
                "url_seen_bloom",
                0,
            )
        if cfg.seen_cuckoo_buckets > 0:
            from heritrix_spark.operators.cuckooseen import cuckoo_delta

            store.write_delta(
                cuckoo_delta(url_seen, buckets=cfg.seen_cuckoo_buckets),
                "url_seen_cuckoo",
                0,
            )
        store.write_delta(
            frontier.select(
                F.lit(0).alias("round"),
                F.lit("F+").alias("tag"),
                "canon_url",
                "class_key",
                F.spark_partition_id().alias("partition_id"),
            ),
            "lineage",
            0,
        )
        metrics0 = {
            "round": 0,
            "now_ms": 0,
            "emitted": 0,
            "succeeded": 0,
            "failed": 0,
            "disregarded": 0,
            "retried": 0,
            "novel_scheduled": max_ordinal,
            "max_ordinal": max_ordinal,
            "rescheduled": 0,
        }
        empty_log = spark.createDataFrame(
            [],
            schema="round int, now_ms long, class_key string, url string, "
            "canon_url string, ordinal long, directive int, precedence int, "
            "fetch_status int, disposition string, cost int, "
            "politeness_delay_ms long, hops_path string, via string, "
            "source string, is_seed boolean",
        )
        store.write_delta(empty_log, "fetch_log", 0)
        store.commit_round(
            0,
            {"now_ms": 0, "max_ordinal": max_ordinal, "metrics_log": [metrics0]},
        )
        manifest = store.manifest()

    round_no = manifest["round"]
    now_ms = manifest["meta"]["now_ms"]
    max_ordinal = manifest["meta"]["max_ordinal"]
    metrics_log = list(manifest["meta"].get("metrics_log", []))
    # scope prefixes added by redirect-promoted seeds
    # (SeedListener.addedSeed → SurtPrefixedDecideRule :236-240), carried
    # in the manifest so a resumed crawl scopes identically
    extra_prefixes = set(manifest["meta"].get("extra_seed_prefixes", []))
    base_prefixes = set(prefixes)
    prefixes = sorted(base_prefixes | extra_prefixes)

    import time as _time

    # next round's clock/event probe, precomputed CONCURRENTLY with the
    # previous round's write pool (see clock_probe). Deliberately NOT
    # persisted in the manifest: a resumed process recomputes it once
    # from committed state (same deterministic aggregates), which also
    # makes it immune to cfg changes between process runs.
    next_probe: dict | None = None

    while round_no < max_rounds:
        if stop_after_round is not None and round_no >= stop_after_round:
            break
        round_no += 1
        _round_t0 = _time.monotonic()
        frontier = live_frontier(store)
        host_state = store.read("host_state")
        url_seen = store.read("url_seen")
        future_uris = store.read("future_uris")
        seen_blooms = (
            store.read("url_seen_bloom") if cfg.seen_bloom_bits > 0 else None
        )
        seen_cuckoo = (
            store.read("url_seen_cuckoo")
            if cfg.seen_cuckoo_buckets > 0
            else None
        )
        result = run_round(
            spark,
            round_no,
            now_ms,
            max_ordinal,
            frontier,
            host_state,
            url_seen,
            docs,
            robots,
            prefixes,
            cfg,
            future_uris=future_uris,
            seen_blooms=seen_blooms,
            seen_cuckoo=seen_cuckoo,
            host_config=host_config,
            probe=next_probe,
        )
        next_probe = None
        if result.done:
            round_no -= 1
            break
        compact = round_no % COMPACT_EVERY == 0
        if compact:
            # periodic compaction: materialize the resolved view as the
            # single base delta; tombstones vanish with the collapse
            # (atomic at the manifest commit)
            frontier_out = result.frontier.withColumn("tombstone", F.lit(False))
            frontier_reset = True
        else:
            frontier_out = result.frontier_delta.withColumn(
                "tombstone", F.lit(False)
            ).unionByName(
                result.emitted_ordinals.withColumn("tombstone", F.lit(True)),
                allowMissingColumns=True,
            )
            frontier_reset = False
        # url_seen and its bloom sidecar are per-round READ inputs, so
        # their delta-partition count must stay bounded too: on the same
        # cadence, rewrite the seen set as one base delta (append-only —
        # a plain concat, no resolution needed) and collapse the sparse
        # bloom rows with the same bit_or the read-side merge applies.
        # Production analog: Iceberg rewrite-data-files on the seen
        # table; without this, reads fan in O(rounds) partitions.
        if compact:
            seen_out = url_seen.unionByName(result.url_seen_delta)
        else:
            seen_out = result.url_seen_delta

        # the round's write jobs are independent (each reads only the
        # persisted intra-round intermediates, warm by the time
        # run_round returns) — submit them concurrently so per-round
        # wall time is max(write) instead of sum(write). Scheduling
        # overhead, not data volume, dominates a fixture round; on a
        # real cluster concurrent jobs also overlap their I/O.
        writes = [
            lambda: store.write_delta(
                frontier_out, "frontier", round_no, reset=frontier_reset
            ),
            lambda: store.write_full(result.host_state, "host_state", round_no),
            lambda: store.write_delta(
                seen_out,
                "url_seen",
                round_no,
                partition_by=("shard",),
                reset=compact,
            ),
            lambda: store.write_delta(result.fetch_log, "fetch_log", round_no),
            lambda: store.write_delta(result.lineage, "lineage", round_no),
        ]
        if result.future_uris is not None:
            writes.append(
                lambda: store.write_full(
                    result.future_uris, "future_uris", round_no
                )
            )
        if cfg.seen_bloom_bits > 0:
            from heritrix_spark.operators.bloomseen import bloom_delta

            bloom_out = bloom_delta(
                result.url_seen_delta, bits=cfg.seen_bloom_bits
            )
            bloom_reset = compact and seen_blooms is not None
            if bloom_reset:
                bloom_out = (
                    seen_blooms.unionByName(bloom_out)
                    .groupBy("shard", "word_idx")
                    .agg(F.bit_or("bits").alias("bits"))
                )
            writes.append(
                lambda: store.write_delta(
                    bloom_out, "url_seen_bloom", round_no, reset=bloom_reset
                )
            )
        if cfg.seen_cuckoo_buckets > 0:
            from heritrix_spark.operators.cuckooseen import (
                cuckoo_delta,
                merge_cuckoo,
            )

            cuckoo_out = cuckoo_delta(
                result.url_seen_delta, buckets=cfg.seen_cuckoo_buckets
            )
            cuckoo_reset = compact and seen_cuckoo is not None
            if cuckoo_reset:
                # compaction = sum-merge, freed (cnt<=0) slots dropped —
                # the cuckoo-deletion analog of the bloom's bit_or fold
                cuckoo_out = merge_cuckoo(
                    seen_cuckoo.unionByName(cuckoo_out)
                )
            writes.append(
                lambda: store.write_delta(
                    cuckoo_out, "url_seen_cuckoo", round_no, reset=cuckoo_reset
                )
            )
        # the metrics aggregate reads only the persisted fetched set —
        # collect it alongside the writes instead of as a serial driver
        # action before them
        round_metrics = dict(result.metrics)
        if result.metrics_agg is not None:
            writes.append(
                lambda: round_metrics.update(
                    finalize_metrics(result.metrics, result.metrics_agg.first())
                )
            )
        # next round's event probe, concurrent with the writes: its
        # inputs are this round's output views over the same persisted
        # intermediates the write jobs read, so round r+1 starts with
        # ZERO serial driver actions before its own write batch
        probe_holder: dict = {}
        writes.append(
            lambda: probe_holder.update(
                clock_probe(
                    result.frontier, result.host_state, result.future_uris, cfg
                )
            )
        )
        # redirect-promoted seeds widen the scope from the NEXT round
        # (the round-discretized SeedListener.addedSeed); novel is
        # persisted inside run_round, so this rides the pool as a tiny
        # probe over this round's delta only
        promoted_holder: list = []
        if cfg.seeds_redirect_new_seeds:
            writes.append(
                lambda: promoted_holder.extend(
                    result.frontier_delta.filter(
                        F.col("is_seed") & (F.col("hops_path") != "")
                    )
                    .select("url")
                    .distinct()
                    .collect()
                )
            )
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            for f in [pool.submit(w) for w in writes]:
                f.result()  # propagate the first failure
        next_probe = probe_holder or None
        now_ms, max_ordinal = result.now_ms, result.max_ordinal
        if promoted_holder:
            from heritrix_spark.oracle.simulator import seed_scope_prefixes

            new = set(seed_scope_prefixes([r["url"] for r in promoted_holder]))
            if not new <= (base_prefixes | extra_prefixes):
                extra_prefixes |= new
                prefixes = sorted(base_prefixes | extra_prefixes)
                # the wider scope can change next round's candidate set
                # but not its clock/eligibility probe (scope acts on
                # candidates, not on queue wake times), so next_probe
                # stays valid
        # a re-run round after a crash replaces its own metrics entry
        # (wall_ms: real elapsed — plan + writes + commit — for the
        # LOOP_SCALE soak; the crawl clock itself stays virtual)
        round_metrics["wall_ms"] = int((_time.monotonic() - _round_t0) * 1000)
        metrics_log = [m for m in metrics_log if m["round"] < round_no]
        metrics_log.append(round_metrics)
        store.commit_round(
            round_no,
            {
                "now_ms": now_ms,
                "max_ordinal": max_ordinal,
                "metrics_log": metrics_log,
                "extra_seed_prefixes": sorted(extra_prefixes),
            },
        )
        spark.catalog.clearCache()  # state is re-read from parquet next round

    return CrawlResult(rounds=round_no, store=store)
