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
    probed = candidates.join(
        F.broadcast(dense.withColumnRenamed("bloom", "__bloom")),
        on=shard,
        how="left",
    ).withColumn("__hit", hit)
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
) -> DataFrame:
    """Bloom-prefiltered ``add``/``addForce``: same contract and same
    results as :func:`heritrix_spark.operators.seen.dedup_candidates`,
    with the exact anti-join restricted to bloom hits and the seen-side
    scan pruned to shards that actually have hits."""
    from heritrix_spark.operators.seen import shard_col

    had_shard = "shard" in candidates.columns
    if not had_shard:
        candidates = candidates.withColumn("shard", shard_col(key, n_shards))
    if force_col in candidates.columns:
        forced = candidates.filter(F.col(force_col))
        unforced = candidates.filter(~F.col(force_col))
    else:
        forced = None
        unforced = candidates
    certain_novel, maybe_seen = bloom_prefilter(
        unforced, blooms, key=key, bits=bits, persist_probe=True
    )
    # seen-side shard pruning: only shards with ≥1 bloom hit can matter.
    # The hit-shard list is bounded by n_shards (a per-shard boolean,
    # like the existing per-bucket count maps) — collecting it turns the
    # filter into a static partition predicate the parquet reader prunes
    # files with.
    hit_shards = [r["shard"] for r in maybe_seen.select("shard").distinct().collect()]
    seen_keys = url_seen.select("shard", key)
    if len(hit_shards) < n_shards:
        seen_keys = seen_keys.filter(F.col("shard").isin(hit_shards))
    survived = maybe_seen.join(seen_keys, on=["shard", key], how="left_anti")
    out = certain_novel.unionByName(survived)
    if forced is not None:
        out = out.unionByName(forced)
    return out if had_shard else out.drop("shard")
