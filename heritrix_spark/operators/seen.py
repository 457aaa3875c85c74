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


def shard_col(canon_url: Column | str, n_shards: int) -> Column:
    col = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    return F.pmod(F.xxhash64(col), F.lit(n_shards)).cast("int")


def collapse_batch_duplicates(
    candidates: DataFrame,
    key: str = "canon_url",
    order_cols: tuple[str, ...] = ("ordinal",),
) -> DataFrame:
    """Keep one row per key within the batch: the first by ``order_cols``.

    Mirrors first-discovery-wins of the per-URI filter. Deterministic:
    the window order must be a total order within key (caller guarantees
    order_cols are unique per key, e.g. ordinal).
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_candidates(
    candidates: DataFrame,
    url_seen: DataFrame,
    key: str = "canon_url",
    force_col: str = "force_fetch",
) -> DataFrame:
    """``add`` + ``addForce``: return the rows that pass the seen filter.

    ``candidates`` must already be unique per key (collapse_batch_duplicates).
    Rows with ``force_fetch = true`` bypass the membership test
    (UriUniqFilter.addForce). The caller appends the passed rows' keys to
    the seen table afterwards (see :func:`novel_keys`).
    """
    seen_keys = url_seen.select(F.col(key))
    if force_col in candidates.columns:
        forced = candidates.filter(F.col(force_col))
        unforced = candidates.filter(~F.col(force_col))
        novel = unforced.join(seen_keys, on=key, how="left_anti")
        return novel.unionByName(forced)
    return candidates.join(seen_keys, on=key, how="left_anti")


def note(url_seen: DataFrame, keys: DataFrame, key: str = "canon_url") -> DataFrame:
    """Mark keys seen without scheduling (include-only import)."""
    return url_seen.select(key).unionByName(keys.select(key)).distinct()


def forget(url_seen: DataFrame, keys: DataFrame, key: str = "canon_url") -> DataFrame:
    """Remove keys from the seen set (WorkQueueFrontier.forget :1048-1051)."""
    return url_seen.join(keys.select(key), on=key, how="left_anti")
