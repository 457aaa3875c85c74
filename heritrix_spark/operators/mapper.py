"""Crawl mappers: splitting one logical crawl across crawler nodes.

Reference analogs (engine/src/main/java/org/archive/crawler/processor/):

- ``LexicalCrawlMapper`` (LexicalCrawlMapper.java:144-153): a TreeMap of
  ``end_key -> node`` lines; a URI maps to the value of the nearest
  mapping key **equal or subsequent** to its classKey
  (``tailMap(classKey).firstKey()``), wrapping around to the first
  entry when no key follows. URIs mapped to the local node continue;
  others are written to per-node diversion logs for import elsewhere.
- ``HashCrawlMapper`` (HashCrawlMapper.java:106-134): optionally reduce
  the classKey by a regex (first match wins — often the PSL
  topmost-assigned-prefix regex), 64-bit-fingerprint it, and take
  ``abs(fp % crawlerCount)`` as the node name.

Spark restatement: the "map" is a pure column expression (boundary
lists are cluster-size-sized, i.e. tiny — they compile to a nested
CASE inside whole-stage codegen; no join, no shuffle). Diversion is a
single ``partitionBy(node)`` parquet/text write — one file tree per
crawler node, the diversion-log analog — and diverted rows re-enter a
peer crawl through the existing recover-log import
(operators/journal.py). The Rabin ``FPGenerator.std64`` fingerprint is
substituted by xxhash64 (or the md5-60 fallback), the same sanctioned
substitution the seen-set shards use (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lexical_map_col(
    class_key: Column, boundaries: list[tuple[str, str]]
) -> Column:
    """LexicalCrawlMapper.map (LexicalCrawlMapper.java:144-153).

    ``boundaries`` is the parsed map file: (end_key, node) pairs. The
    result is the node of the smallest end_key >= class_key, else (the
    wraparound) the node of the smallest end_key overall.

    Built as a nested CASE evaluated smallest-boundary-first, exactly
    ``TreeMap.tailMap(classKey).firstKey()``; for the ~cluster-sized
    boundary lists this stays inside whole-stage codegen.
    """
    if not boundaries:
        raise ValueError("boundary map must be non-empty")
    bs = sorted(boundaries)
    out = F.lit(bs[0][1])  # wraparound: first mapping key
    for end_key, node in reversed(bs):
        out = F.when(class_key <= F.lit(end_key), F.lit(node)).otherwise(out)
    return out


def hash_map_col(
    class_key: Column,
    crawler_count: int,
    reduce_regex: str | None = None,
    fp: str = "xxhash64",
) -> Column:
    """HashCrawlMapper.mapString (HashCrawlMapper.java:121-134).

    Reduce the key to its first regex match when ``reduce_regex`` is
    given (``Matcher.find()`` semantics = un-anchored regexp_extract),
    fingerprint, ``abs(fp % crawlerCount)`` as a string node name.

    ``fp='xxhash64'`` is the engine default; ``fp='md5_60'`` (first 60
    bits of md5, via conv) exists for cross-engine oracles — DuckDB has
    no xxhash64 but computes the identical md5 walk.
    """
    key = class_key
    if reduce_regex:
        key = F.regexp_extract(key, f"({reduce_regex})", 1)
    if fp == "xxhash64":
        fpc = F.xxhash64(key)
    elif fp == "md5_60":
        fpc = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown fp backend {fp!r}")
    return F.abs(fpc % F.lit(crawler_count)).cast("string")


def divert(
    df: DataFrame, node_col: str, local_name: str
) -> tuple[DataFrame, DataFrame]:
    """Split mapped candidates into (local, diverted) — CrawlMapper's
    decision (CrawlMapper.java: localName check). Both halves share the
    parent plan; Spark evaluates the mapper expression once per branch
    with no shuffle."""
    return (
        df.filter(F.col(node_col) == local_name).drop(node_col),
        df.filter(F.col(node_col) != local_name),
    )


def write_diversion_logs(
    diverted: DataFrame, node_col: str, out_dir: str
) -> None:
    """Per-node diversion logs as one partitioned write (the per-node
    ``.divert.gz`` files of CrawlMapper, re-importable via
    operators/journal.import_recover_log). One job, one file tree —
    never a per-node loop over filters."""
    diverted.write.mode("overwrite").partitionBy(node_col).parquet(out_dir)


def ip_queue_assignment(
    df: DataFrame,
    dns: DataFrame,
    url_col: str = "url",
    out_col: str = "class_key",
) -> DataFrame:
    """IPQueueAssignmentPolicy (engine/.../frontier/
    IPQueueAssignmentPolicy.java:46-55): the queue key is the target's
    dotted-decimal IP when the server cache has resolved the URI's
    host; otherwise it degrades to HostnameQueueAssignmentPolicy.

    ``dns(host, ip)`` is the ServerCache dimension — in the reference a
    live DNS cache; here a provided table (the live lookup is the only
    out-of-scope part, same stance as the multimodal codec stub).
    Spark shape: hosts ≪ URIs, so the cache rides one broadcast hash
    join; unresolved hosts (absent row or null ip) coalesce into the
    hostname key — no second pass, no shuffle of the URI side."""
    from heritrix_spark.functions.surt import hostname_class_key_col

    url = F.col(url_col)
    host = F.lower(
        F.regexp_extract(url, r"^\w+://(?:[^/@]+@)?([^/?#:]+)", 1)
    )
    cache = dns.select(
        F.lower(F.col("host")).alias("__host"), F.col("ip").alias("__ip")
    )
    return (
        df.withColumn("__host", host)
        .join(F.broadcast(cache), on="__host", how="left")
        .withColumn(
            out_col, F.coalesce(F.col("__ip"), hostname_class_key_col(url))
        )
        .drop("__host", "__ip")
    )
