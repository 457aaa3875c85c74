"""URL-seen set (the reference's "alreadyIncluded" / UriUniqFilter).

Reference semantics (heritrix3/engine/.../datamodel/UriUniqFilter.java:36+,
SetBasedUriUniqFilter.add/addForce/note/forget; BdbUriUniqFilter.setAdd
:317-340 is a B-tree test-and-set):

- ``add(canon, uri)``      — novel keys pass through and become seen;
                             duplicates are dropped (counted).
- ``addForce(canon, uri)`` — pass through even when present (robots/DNS
                             refetch, redirect-to-self-canonical case,
                             FrontierPreparer.java:237-257).
- ``note(canon)``          — mark seen without scheduling.
- ``forget(canon)``        — remove from the seen set.

Spark-first design: membership is an **exact LEFT ANTI JOIN** against a
hash-sharded seen table; the reference's own batch design
(MemFPMergeUriUniqFilter — sorted-fingerprint merge, FPMergeUriUniqFilter.java:43-46,
after Najork & Heydon 2001 §3.2) *is* a sort-merge anti-join, so this is
the same algorithm executed by Catalyst. The reference's Bloom variant
(BloomUriUniqFilter.java:81-90) is an accuracy tradeoff; here Spark's
runtime bloom-filter join (enabled in session.py) plays the prefilter
role while the exact anti-join stays authoritative, so seen-set equality
is never violated.

Scale notes (10^10 URLs):
- ``url_seen`` is stored hash-partitioned by ``shard = pmod(xxhash64(canon_url), n)``
  (analog of BdbUriUniqFilter.createKey's host-prefixed fingerprint
  :303-312, but sharded on the full canon URL so shards stay balanced
  even with one hot host — SURVEY.md §7 hard-part 5).
- candidates are repartitioned on the same key, so the anti-join is a
  co-partitioned shuffle on (shard, canon_url) and each round touches
  every seen shard at most once.
- duplicates *within* the candidate batch are collapsed first
  (min-ordinal representative wins) so the anti-join's left side is
  unique per key — this mirrors the reference processing candidates
  one-at-a-time through the filter (first discovery wins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from heritrix_spark.functions.colcache import cached


def shard_col(
    canon_url: Column | str, n_shards: int, fp: str = "xxhash64"
) -> Column:
    """Seen-set shard key. ``fp="xxhash64"`` (default) is the JVM-side
    codegen hash — membership semantics don't depend on the hash, so
    the fast path wins. ``fp="rabin"`` uses the reference's exact
    BdbUriUniqFilter.createKey Rabin fingerprint
    (functions/rabin.py; goldens BdbUriUniqFilterTest.java:89-97) for
    byte-interop with a reference seen-set export — one vectorized
    Arrow pass, host-prefixed so one authority's URLs share top bits.

    NULL handling is aligned across backends: a NULL canon_url yields a
    NULL shard under either fingerprint (membership code never shards
    null keys; xxhash64 alone would hash the null away to the seed's
    bucket and silently group all null keys together)."""
    if fp not in ("xxhash64", "rabin"):
        raise ValueError(
            f"unknown seen-set fingerprint {fp!r} (expected 'xxhash64' or"
            " 'rabin')"
        )
    col = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    if fp == "rabin":
        from heritrix_spark.functions.rabin import rabin_key_col

        return F.pmod(rabin_key_col(col), F.lit(n_shards)).cast("int")
    return F.when(
        col.isNotNull(), F.pmod(F.xxhash64(col), F.lit(n_shards))
    ).cast("int")


def collapse_batch_duplicates(
    candidates: DataFrame,
    key: str | tuple[str, ...] = "canon_url",
    order_cols: tuple[str, ...] = ("ordinal",),
) -> DataFrame:
    """Keep one row per key within the batch: the first by ``order_cols``.

    Mirrors first-discovery-wins of the per-URI filter. Deterministic:
    ``order_cols`` must be a total order within key (caller guarantees
    uniqueness, e.g. ordinal), so the lexicographic struct-min below
    never reaches the non-ordering fields.

    Physical choice: ``min(struct(order_cols..., rest...))`` instead of
    a ``row_number() over`` window — a hash aggregate PARTIALLY combines
    on the map side, so with a 25%-duplicate batch only one row per
    (key, input-partition) crosses the shuffle, while a window must
    shuffle every row before it can rank. Same one shuffle on ``key``,
    strictly less data in flight — the difference that matters at
    10^10-candidate rounds.

    ``key`` may be a composite, e.g. ``("shard", "canon_url")`` where
    shard is a pure function of canon_url: grouping is then identical
    to grouping by canon_url alone, but the aggregate's output
    partitioning (and SortAggregate output order) already matches the
    downstream seen anti-join's ``(shard, canon_url)`` keys, so
    Catalyst reuses ONE exchange for collapse + anti-join instead of
    shuffling the full candidate batch twice.
    """
    keys = (key,) if isinstance(key, str) else tuple(key)
    cols = tuple(candidates.columns)
    packed, unpack_sel = cached(
        ("collapse_batch_duplicates", cols, keys, tuple(order_cols)),
        lambda: _collapse_exprs(cols, keys, tuple(order_cols)),
    )
    collapsed = candidates.groupBy(*keys).agg(packed)
    return collapsed.select(*keys, *unpack_sel).select(*cols)


def _collapse_exprs(
    cols: tuple[str, ...], keys: tuple[str, ...], order_cols: tuple[str, ...]
) -> tuple:
    rest = [c for c in cols if c not in keys and c not in order_cols]
    packed = F.min(
        F.struct(*[F.col(c) for c in order_cols], *[F.col(c) for c in rest])
    ).alias("__first")
    unpack_sel = tuple(
        F.col(f"__first.{c}").alias(c) for c in (*order_cols, *rest)
    )
    return packed, unpack_sel


def dedup_candidates(
    candidates: DataFrame,
    url_seen: DataFrame,
    key: str = "canon_url",
    force_col: str = "force_fetch",
    n_shards: int | None = None,
) -> DataFrame:
    """``add`` + ``addForce``: return the rows that pass the seen filter.

    ``candidates`` must already be unique per key (collapse_batch_duplicates).
    Rows with ``force_fetch = true`` bypass the membership test
    (UriUniqFilter.addForce). The caller appends the passed rows' keys to
    the seen table afterwards.

    When ``n_shards`` is given and the seen table carries its ``shard``
    column, the anti-join key is ``(shard, canon_url)`` — semantically
    identical (shard is a pure function of the key) but physically the
    shape that scales: with url_seen stored partitioned by shard
    (SnapStore partition_by / Iceberg ``bucket(canon_url)``), the join
    becomes a storage-partitioned join candidate (no seen-side
    re-shuffle on Spark ≥3.3 + Iceberg) and seen-side file pruning can
    skip every shard the candidate batch doesn't touch.
    """
    if n_shards is not None and "shard" in url_seen.columns:
        on = ["shard", key]
        seen_keys = url_seen.select("shard", key)
        if "shard" not in candidates.columns:
            candidates = candidates.withColumn(
                "shard", shard_col(key, n_shards)
            )
        drop_after = ["shard"]
    else:
        on = [key]
        seen_keys = url_seen.select(F.col(key))
        drop_after = []
    if force_col in candidates.columns:
        forced = candidates.filter(F.col(force_col))
        unforced = candidates.filter(~F.col(force_col))
        novel = unforced.join(seen_keys, on=on, how="left_anti")
        out = novel.unionByName(forced)
    else:
        out = candidates.join(seen_keys, on=on, how="left_anti")
    return out.drop(*drop_after) if drop_after else out


def note(url_seen: DataFrame, keys: DataFrame, key: str = "canon_url") -> DataFrame:
    """Mark keys seen without scheduling (include-only import)."""
    return url_seen.select(key).unionByName(keys.select(key)).distinct()


def forget(url_seen: DataFrame, keys: DataFrame, key: str = "canon_url") -> DataFrame:
    """Remove keys from the seen set (WorkQueueFrontier.forget :1048-1051)."""
    return url_seen.join(keys.select(key), on=key, how="left_anti")
