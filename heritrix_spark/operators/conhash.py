"""Consistent-hash subqueue assignment — the exact
LongToIntConsistentHash law behind ``parallelQueues``.

Reference: URIAuthorityBasedQueueAssignmentPolicy.getClassKey
(:75-102) appends ``"+<subqueue>"`` to the class key when
parallelQueues > 1, where subqueue = conhash.bucketFor(first path
segment, parallelQueues) (:105-111, bucketBasis :113-124), and
LongToIntConsistentHash.bucketFor (LongToIntConsistentHash.java:84-109)
resolves a 64-bit key hash against a replica circle: ``numReplicas``
points per bucket at fp64("<bucket>.<replica>"), the key maps to the
first circle point at-or-above its hash (TreeMap.tailMap inclusive),
wrapping to the circle's smallest point when none is
(``bucketFor(Long.MIN_VALUE)`` :101-103).  Quirks kept: an empty first
path segment yields subqueue 0 (:107-109), and subqueue 0 leaves the
class key bare — only subqueue > 0 appends "+N" (:97-100).

Why this beats ``hash % N`` (operators/salt.py's simplification): when
an operator raises parallelQueues N → N+1 on a hot host mid-crawl,
modulo reassigns ~all keys (breaking per-prefix fetch-order locality
and politeness state), while the circle moves only the ~1/(N+1) of
keys whose arc the new bucket's replicas claim.  Same reason the law
matters at 1000 executors: re-sharding a running 10^10-URL frontier
must not reshuffle every queue.  tests/test_conhash.py pins the
monotone-migration property.

Hash substitute: FPGenerator.std64 (Rabin) → the repo's portable
md5-60 (``conv(substr(md5(x),1,15),16,10)``), the SURVEY §2.7
sanctioned swap, applied to BOTH the circle points and the keys — the
geometry of the law is hash-agnostic.  All values are non-negative
(60-bit), so Java's signed-long circle order is preserved.

Plan shape: the circle is a tiny static literal (up_to × replicas
points, ≤ a few KB) evaluated as a per-row JVM array scan — zero
shuffle, zero Python, no join; the DuckDB twin joins a VALUES table.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: LongToIntConsistentHash.DEFAULT_REPLICAS = 128 (:34)
DEFAULT_REPLICAS = 128


def fp60_py(s: str) -> int:
    """Portable md5-60 (python twin of pipeline/dedup.md5_60)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def fp60_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fp60_sql(expr: str) -> str:
    """DuckDB twin."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def circle_points(up_to: int, replicas: int = DEFAULT_REPLICAS) -> list[tuple[int, int]]:
    """The replica circle: ``replicas`` points per bucket at
    fp60("<bucket>.<replica>") (installReplicas :62-68 /
    replicaLocation :71-79), sorted by location."""
    pts = [
        (fp60_py(f"{b}.{r}"), b)
        for b in range(up_to)
        for r in range(replicas)
    ]
    pts.sort()
    return pts


def consistent_bucket_py(
    key: str, up_to: int, replicas: int = DEFAULT_REPLICAS
) -> int:
    """bucketFor(hash(key), up_to) — python twin."""
    import bisect

    pts = circle_points(up_to, replicas)
    locs = [p[0] for p in pts]
    h = fp60_py(key)
    i = bisect.bisect_left(locs, h)  # first loc >= h (tailMap inclusive)
    return pts[i][1] if i < len(pts) else pts[0][1]  # wrap :101-103


def consistent_bucket_col(
    key: Column, up_to: int, replicas: int = DEFAULT_REPLICAS
) -> Column:
    """bucketFor as a zero-shuffle Column: linear scan of the literal
    circle (sorted, so the first match is the tailMap answer; empty
    filter result wraps to the circle head)."""
    pts = circle_points(up_to, replicas)
    zipped = F.array(
        *[
            F.struct(F.lit(loc).alias("loc"), F.lit(b).alias("b"))
            for loc, b in pts
        ]
    )
    h = fp60_col(key)
    matches = F.filter(zipped, lambda p: p["loc"] >= h)
    # F.get is null-on-empty (ANSI-safe), unlike element_at
    return F.coalesce(F.get(matches, 0)["b"], F.lit(pts[0][1])).cast("int")


def parallel_class_key_col(
    class_key: Column,
    url: Column,
    parallel_queues: int,
    replicas: int = DEFAULT_REPLICAS,
) -> Column:
    """URIAuthorityBasedQueueAssignmentPolicy parallel-queue suffix law
    (:96-111): basis = first path segment; empty basis or subqueue 0
    leaves the key bare; otherwise key + "+" + subqueue."""
    from heritrix_spark.operators.salt import first_path_segment_col

    if parallel_queues <= 1:
        return class_key
    basis = first_path_segment_col(url)
    sub = consistent_bucket_col(basis, parallel_queues, replicas)
    return F.when(
        (basis == "") | basis.isNull() | (sub == 0), class_key
    ).otherwise(F.concat(class_key, F.lit("+"), sub.cast("string")))
