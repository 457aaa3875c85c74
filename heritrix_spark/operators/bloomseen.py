"""Persisted per-shard bloom sidecar for the URL-seen set.

The reference's BloomUriUniqFilter (heritrix3/modules/.../util/
BloomUriUniqFilter.java:81-90, BloomFilter64bit.java:84,203-208) trades
a small false-positive rate for an in-memory membership test so most
novel URIs never touch the backing store. This module is the
distributed analog — but **accuracy-preserving**: the bloom is only a
*prefilter* in front of the exact anti-join (operators/seen.py), so
seen-set membership NEVER changes (tests/test_bloomseen.py pins this).
What the bloom buys at scale:

- candidates whose fingerprints miss the bloom are **certainly novel**
  and bypass the exact anti-join entirely (at a typical 25% duplicate
  rate, 75% of candidates never join);
- seen shards with **zero** bloom hits this round are pruned from the
  anti-join's seen-side parquet scan (`shard IN (hit shards)` reaches
  the reader as a partition filter — whole untouched shard directories
  are skipped without file reads).

Representation: one bloom per seen shard, ``words`` 64-bit words
(sparse rows ``(shard, word_idx, bits)`` in the store — append-only
deltas that OR-merge on read, exactly like the seen table itself), k=2
bit positions per key by double hashing the same ``xxhash64(canon_url)``
the shard function uses. Sized via the standard ``m = -n ln p / (ln 2)^2``
law; at 10^10 URLs / 4096 shards / p=1%, ~3 MB per shard — each
executor probes only the shards it holds (the sidecar joins on
``shard``, the table's own partition key), so no single node ever needs
the whole bloom; the sandbox default broadcasts because the fixture
blooms are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

# default bloom geometry (per shard): 2^14 bits = 256 words = 2 KiB.
# Fixture-friendly; production sizes via the -n*ln(p)/ln2^2 law.
DEFAULT_BITS = 1 << 14
K_HASHES = 2

BLOOM_SCHEMA = "shard int, word_idx int, bits long"


def _positions(key: Column, bits: int) -> list[Column]:
    """k=2 double-hashed bit positions from one xxhash64 evaluation."""
    h = F.xxhash64(key)
    h1 = F.pmod(h, F.lit(bits))
    # independent second hash: salted xxhash64 (no multiply — ANSI mode
    # forbids wrapping arithmetic)
    h2 = F.pmod(F.xxhash64(key, F.lit("bloom-h2")), F.lit(bits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(bits)).cast("int") for i in range(K_HASHES)]


def bloom_delta(
    keys: DataFrame,
    key: str = "canon_url",
    shard: str = "shard",
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Sparse bloom rows for a batch of newly-seen keys: one row per
    populated (shard, word) — the same one-shuffle groupBy shape as any
    partial-aggregated count; append-only, OR-mergeable."""
    pos = _positions(F.col(key), bits)
    exploded = keys.select(
        F.col(shard),
        F.explode(F.array(*pos)).alias("__pos"),
    ).select(
        shard,
        (F.col("__pos") / 64).cast("int").alias("word_idx"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.pmod(F.col("__pos"), F.lit(64)).cast("int"),
        ).alias("bits"),
    )
    return (
        exploded.groupBy(shard, "word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def merge_blooms(deltas: DataFrame) -> DataFrame:
    """OR-merge appended bloom deltas (read-side compaction)."""
    return deltas.groupBy("shard", "word_idx").agg(F.bit_or("bits").alias("bits"))


def _dense(spark_blooms: DataFrame, bits: int) -> DataFrame:
    """(shard, word_idx, bits) sparse rows → (shard, bloom array<long>)."""
    nwords = bits // 64
    return (
        merge_blooms(spark_blooms)
        .groupBy("shard")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word_idx", "bits"))
            ).alias("__m")
        )
        .select(
            "shard",
            F.transform(
                F.sequence(F.lit(0), F.lit(nwords - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("long")
                ),
            ).alias("bloom"),
        )
    )


def bloom_prefilter(
    candidates: DataFrame,
    blooms: DataFrame | None,
    key: str = "canon_url",
    shard: str = "shard",
    bits: int = DEFAULT_BITS,
    persist_probe: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (certain_novel, maybe_seen).

    ``certain_novel``: at least one bloom bit clear (or no bloom for the
    shard) — cannot be in the seen set, skips the exact join.
    ``maybe_seen``: all k bits set — goes through the authoritative
    anti-join (bloom false positives end up here and are resolved
    exactly, so membership is never wrong).

    Physical shape: the dense sidecar joins on ``shard`` — the seen
    table's own partition key — broadcast here (tiny at fixture scale);
    at production bloom sizes the same equi-join runs co-partitioned
    with zero extra shuffle.
    """
    cols = candidates.columns
    if blooms is None:
        return candidates, candidates.limit(0)
    dense = _dense(blooms, bits)
    pos = _positions(F.col(key), bits)
    checks = [
        (
            F.element_at(F.col("__bloom"), ((p / 64).cast("int") + 1))
            .bitwiseAND(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.pmod(p, F.lit(64)).cast("int"),
                )
            )
            != 0
        )
        for p in pos
    ]
    hit = F.col("__bloom").isNotNull()
    for c in checks:
        hit = hit & c
    probed = (
        candidates.join(
            F.broadcast(dense.withColumnRenamed("bloom", "__bloom")),
            on=shard,
            how="left",
        )
        .withColumn("__hit", hit)
        # project the bloom word array away BEFORE any materialization:
        # carrying bits//8 bytes per candidate row through a persist or
        # shuffle would dwarf the join it prefilters
        .select(*cols, "__hit")
    )
    if persist_probe:
        # the probe output fans out to several consumers (novel branch,
        # exact-join branch, hit-shard census) — persist so the upstream
        # candidate-prep pipeline runs exactly once per batch, the same
        # once-per-round materialization the crawl loop gives `novel`
        probed = probed.persist()
    certain_novel = probed.filter(~F.col("__hit")).select(*cols)
    maybe_seen = probed.filter(F.col("__hit")).select(*cols)
    return certain_novel, maybe_seen


def dedup_candidates_bloom(
    candidates: DataFrame,
    url_seen: DataFrame,
    blooms: DataFrame | None,
    key: str = "canon_url",
    force_col: str = "force_fetch",
    n_shards: int = 64,
    bits: int = DEFAULT_BITS,
    prune_seen_shards: bool = False,
) -> DataFrame:
    """Bloom-prefiltered ``add``/``addForce``: same contract and same
    results as :func:`heritrix_spark.operators.seen.dedup_candidates`.

    The prefilter is FUSED into the exact anti-join rather than splitting
    the batch: a candidate whose bloom probe misses gets a NULL join key,
    and a left-anti join keeps unmatched rows — so definite-novel rows
    flow through the very same join node without ever probing (or, under
    sort-merge at scale, without their key competing in the merge). One
    linear pipeline: no candidate split, no union, no persist, no extra
    driver job — the bloom costs one broadcast of the dense sidecar plus
    codegen'd bit math per row. Membership is still decided exactly for
    every bloom hit (false positives resolve in the join), so results
    never differ from the plain path (tests/test_bloomseen.py).

    ``prune_seen_shards=True`` additionally collects the hit-shard list
    (≤ n_shards ints) and statically filters the seen side with
    ``shard IN (...)`` — a partition-pruning predicate when the seen
    table is hive/bucket-partitioned by shard. That costs one extra
    driver job to materialize the probe column first, which only pays
    off when untouched shard directories are plausible: batches small
    or clustered relative to ``n_shards`` (e.g. a focused recrawl), or
    very large seen tables where skipping a shard saves real I/O.
    """
    from heritrix_spark.operators.seen import shard_col

    had_shard = "shard" in candidates.columns
    if not had_shard:
        candidates = candidates.withColumn("shard", shard_col(key, n_shards))
    cols = candidates.columns
    if force_col in candidates.columns:
        forced = candidates.filter(F.col(force_col))
        unforced = candidates.filter(~F.col(force_col))
    else:
        forced = None
        unforced = candidates

    if blooms is None:
        out = unforced.join(
            url_seen.select("shard", key), on=["shard", key], how="left_anti"
        )
    else:
        dense = _dense(blooms, bits)
        pos = _positions(F.col(key), bits)
        checks = [
            (
                F.element_at(F.col("__bloom"), ((p / 64).cast("int") + 1))
                .bitwiseAND(
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        F.pmod(p, F.lit(64)).cast("int"),
                    )
                )
                != 0
            )
            for p in pos
        ]
        hit = F.col("__bloom").isNotNull()
        for c in checks:
            hit = hit & c
        probed = (
            unforced.join(
                F.broadcast(dense.withColumnRenamed("bloom", "__bloom")),
                on="shard",
                how="left",
            )
            # project the bloom word array away immediately: carrying
            # bits//8 bytes per row through a shuffle or cache would
            # dwarf the join this prefilters
            .select(*cols, hit.alias("__hit"))
        )
        seen_keys = url_seen.select("shard", key)
        if prune_seen_shards:
            probed = probed.persist()
            hit_shards = [
                r["shard"]
                for r in probed.filter(F.col("__hit"))
                .select("shard")
                .distinct()
                .collect()
            ]
            if len(hit_shards) < n_shards:
                seen_keys = seen_keys.filter(F.col("shard").isin(hit_shards))
        # NULL probe key for definite-novel rows: an anti-join keeps
        # rows with no match, and NULL never equals a seen key, so the
        # bloom-miss rows pass straight through the join node
        out = (
            probed.withColumn("__k", F.when(F.col("__hit"), F.col(key)))
            .join(
                seen_keys.withColumnRenamed(key, "__k"),
                on=["shard", "__k"],
                how="left_anti",
            )
            .select(*cols)
        )
    if forced is not None:
        out = out.unionByName(forced.select(*cols))
    return out if had_shard else out.drop("shard")
