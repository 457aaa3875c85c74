"""Cuckoo-style fingerprint sidecar for the URL-seen set — the
deletable half of the north star's "partitioned bloom/cuckoo URL-seen
set".

Why a second sidecar exists next to operators/bloomseen.py: a Bloom
filter cannot delete (the reference's BloomUriUniqFilter has no
``forget`` — SetBasedUriUniqFilter's forget contract is only honored by
the exact-set filters). Under forget/recrawl churn the bloom's stale
bits accumulate as false positives — still *correct* (every bloom hit
is resolved by the exact anti-join) but progressively less selective.
Cuckoo filters (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT 2014 — public) fix exactly this: per-key fingerprints
in hash buckets support deletion. This module keeps the cuckoo
*fingerprint-in-bucket* semantics and drops the kicking/eviction dance
— kicking exists only to fit fingerprints into a fixed bit array,
while our sidecar is an append-only Iceberg-style table of
``(shard, bucket, fp, cnt)`` deltas: ``add`` appends +1, ``forget``
appends -1, compaction sums and drops zeros. Counting entries make
deletion collision-safe (two keys sharing (bucket, fp) keep cnt>=1
until both are forgotten), so a miss remains a **certain miss** as
long as forget only removes previously-added keys — the UriUniqFilter
contract (WorkQueueFrontier.forget :1048-1051 is only called for
in-set URIs).

Scale shape: probes carry (int shard, int bucket, int fp) — 12 bytes of
join key instead of a canon_url string — and the sidecar joins on
``shard``, the seen table's own partition key, so at production scale
the probe runs co-partitioned with the exact anti-join it fuses into;
the fixture path broadcasts. Same accuracy law as the bloom sidecar,
pinned by tests/test_cuckooseen.py: prefiltered results NEVER differ
from the plain exact anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

#: buckets per shard (fixture-friendly; production sizes at ~0.95 load
#: via n_keys/(shards*4) buckets of 4 the way a real cuckoo table would,
#: but the counting representation has no hard capacity)
DEFAULT_BUCKETS = 1 << 12

#: fingerprint bits (16 → 1/65535 per-bucket collision odds)
FP_MASK = (1 << 16) - 1

CUCKOO_SCHEMA = "shard int, bucket int, fp int, cnt long"


def _bucket_fp(key: Column, buckets: int) -> tuple[Column, Column]:
    """(bucket, fingerprint) per key: independent xxhash64 salts; fp is
    never 0 (0 is the cuckoo empty-slot sentinel — kept for parity with
    the classic layout)."""
    bucket = F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int")
    fp = (F.pmod(F.xxhash64(key, F.lit("cuckoo-fp")), F.lit(FP_MASK)) + 1) \
        .cast("int")
    return bucket, fp


def cuckoo_delta(
    keys: DataFrame,
    key: str = "canon_url",
    shard: str = "shard",
    buckets: int = DEFAULT_BUCKETS,
    sign: int = 1,
) -> DataFrame:
    """Sparse counting rows for a batch of added (sign=+1) or forgotten
    (sign=-1) keys — one map-side-combined groupBy, append-only."""
    bucket, fp = _bucket_fp(F.col(key), buckets)
    return (
        keys.select(F.col(shard), bucket.alias("bucket"), fp.alias("fp"))
        .groupBy(shard, "bucket", "fp")
        .agg((F.count(F.lit(1)) * sign).alias("cnt"))
    )


def cuckoo_forget_delta(keys: DataFrame, key: str = "canon_url",
                        shard: str = "shard",
                        buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """forget (UriUniqFilter.forget): -1 deltas for previously-added
    keys; after compaction the slot frees exactly like a cuckoo
    deletion."""
    return cuckoo_delta(keys, key, shard, buckets, sign=-1)


def merge_cuckoo(deltas: DataFrame, drop_zeros: bool = True) -> DataFrame:
    """Sum-merge appended deltas (read-side; compaction persists this
    and drops freed slots)."""
    merged = deltas.groupBy("shard", "bucket", "fp").agg(
        F.sum("cnt").alias("cnt"))
    return merged.filter(F.col("cnt") > 0) if drop_zeros else merged


def dedup_candidates_cuckoo(
    candidates: DataFrame,
    url_seen: DataFrame,
    cuckoo: DataFrame | None,
    key: str = "canon_url",
    force_col: str = "force_fetch",
    n_shards: int = 64,
    buckets: int = DEFAULT_BUCKETS,
    broadcast_filter: bool = True,
) -> DataFrame:
    """Cuckoo-prefiltered ``add``/``addForce`` — same contract and same
    results as ``seen.dedup_candidates`` (tests pin equality).

    Fused shape, like dedup_candidates_bloom: probe the sidecar with a
    LEFT join on (shard, bucket, fp); a miss is certainly novel and its
    exact-join key is nulled, so it flows through the authoritative
    anti-join without competing in the merge; a hit (true or fp/bucket
    collision) resolves exactly. ``broadcast_filter`` fits fixtures; at
    scale the sidecar is shard-co-partitioned with the candidates and
    the planner picks the co-partitioned join.
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

    if cuckoo is None:
        out = unforced.join(
            url_seen.select("shard", key), on=["shard", key], how="left_anti"
        )
    else:
        table = merge_cuckoo(cuckoo).select(
            "shard", "bucket", "fp", F.lit(True).alias("__present"))
        if broadcast_filter:
            table = F.broadcast(table)
        bucket, fp = _bucket_fp(F.col(key), buckets)
        probed = (
            unforced.withColumn("__b", bucket).withColumn("__f", fp)
            .join(
                table.withColumnRenamed("bucket", "__b")
                     .withColumnRenamed("fp", "__f"),
                on=["shard", "__b", "__f"],
                how="left",
            )
            .select(*cols, F.coalesce("__present", F.lit(False)).alias("__hit"))
        )
        out = (
            probed.withColumn("__k", F.when(F.col("__hit"), F.col(key)))
            .join(
                url_seen.select("shard", key).withColumnRenamed(key, "__k"),
                on=["shard", "__k"],
                how="left_anti",
            )
            .select(*cols)
        )
    if forced is not None:
        out = out.unionByName(forced.select(*cols))
    return out if had_shard else out.drop("shard")
