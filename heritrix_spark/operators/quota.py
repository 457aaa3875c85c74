"""Quotas and crawl-wide limits.

- :func:`apply_quotas` — QuotaEnforcer analog (heritrix3/engine/.../prefetch/
  QuotaEnforcer.java:55-95): stop emitting from a server/host/group once
  its cumulative successes / novel KB exceed configured quotas. In the
  batch round model this is an eligibility filter on per-host cumulative
  aggregates (exactly the reference's precondition check, evaluated from
  committed state instead of live counters). Exceeded hosts' pending
  URIs are disregarded-by-quota (S_BLOCKED_BY_QUOTA).
- :func:`crawl_limits_reached` — CrawlLimitEnforcer analog
  (engine/.../framework/CrawlLimitEnforcer.java): crawl-wide max
  documents / max bytes / max logical duration → loop stop condition.
- :func:`preloaded_uri_precedence` — PreloadedUriPrecedencePolicy analog
  (engine/.../frontier/precedence/PreloadedUriPrecedencePolicy.java:47 +
  PrecedenceLoader :56): join candidates against an external
  (url → precedence) ranking table; unmatched keep their computed
  precedence.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Quotas:
    max_successes_per_host: int = -1  # -1 = unlimited
    max_success_kb_per_host: int = -1
    max_successes_per_group: int = -1  # group = assignment-level domain


def apply_quotas(
    ready_hosts: DataFrame,
    host_stats: DataFrame,
    quotas: Quotas,
    class_key: str = "class_key",
) -> DataFrame:
    """Filter ready hosts down to those within quota.

    ``host_stats``: (class_key, succeeded, success_bytes[, group_key]).
    """
    out = ready_hosts.join(host_stats, on=class_key, how="left")
    if quotas.max_successes_per_host >= 0:
        out = out.filter(
            F.coalesce(F.col("succeeded"), F.lit(0))
            < F.lit(quotas.max_successes_per_host)
        )
    if quotas.max_success_kb_per_host >= 0:
        out = out.filter(
            F.coalesce(F.col("success_bytes"), F.lit(0)) / 1024
            < F.lit(quotas.max_success_kb_per_host)
        )
    if quotas.max_successes_per_group >= 0 and "group_key" in out.columns:
        group_tot = out.groupBy("group_key").agg(
            F.sum(F.coalesce(F.col("succeeded"), F.lit(0))).alias("__gsucc")
        )
        out = out.join(group_tot, on="group_key", how="left").filter(
            F.col("__gsucc") < F.lit(quotas.max_successes_per_group)
        ).drop("__gsucc")
    return out.select(*ready_hosts.columns)


@dataclass(frozen=True)
class CrawlLimits:
    max_documents: int = -1
    max_bytes: int = -1
    max_logical_ms: int = -1


def crawl_limits_reached(
    cum_succeeded: int, cum_bytes: int, now_ms: int, limits: CrawlLimits
) -> bool:
    if limits.max_documents >= 0 and cum_succeeded >= limits.max_documents:
        return True
    if limits.max_bytes >= 0 and cum_bytes >= limits.max_bytes:
        return True
    if limits.max_logical_ms >= 0 and now_ms >= limits.max_logical_ms:
        return True
    return False


def preloaded_uri_precedence(
    candidates: DataFrame,
    rank_table: DataFrame,
    key: str = "canon_url",
    precedence_col: str = "precedence",
) -> DataFrame:
    """Override computed precedence with preloaded ranks where present."""
    ranks = rank_table.select(
        F.col(key), F.col("preloaded_precedence").cast("int").alias("__pp")
    )
    return (
        candidates.join(F.broadcast(ranks), on=key, how="left")
        .withColumn(
            precedence_col,
            F.coalesce(F.col("__pp"), F.col(precedence_col)).cast("int"),
        )
        .drop("__pp")
    )


def dsf_scope_col(host: Column, mode: str = "domain") -> Column:
    """DomainSensitiveFrontier counting scope (heritrix/src/java/org/
    archive/crawler/frontier/DomainSensitiveFrontier.java:173-182):
    ``host`` mode counts per full hostname; ``domain`` mode counts per
    the host's last two dot-labels (lastIndexOf('.') twice then
    substring — a single-label or two-label host maps to itself)."""
    if mode == "host":
        return host
    if mode != "domain":
        raise ValueError(f"unknown counter mode {mode!r}")
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).otherwise(host)


def domain_max_docs(
    fetch_log: DataFrame,
    max_docs: int,
    mode: str = "domain",
    host_col: str = "host",
    order_col: str = "ordinal",
    status_col: str = "fetch_status",
) -> DataFrame:
    """DomainSensitiveFrontier max-docs law (DomainSensitiveFrontier.java
    :159-226 checkDownloadLimits): once a scope (host or domain) has
    accumulated ``max_docs`` successful downloads, every later URI in
    that scope is discarded (queue deleted + exclude filter added) — the
    crawl keeps exactly the first ``max_docs`` successes per scope plus
    whatever non-success attempts preceded the cutoff.  dns: URIs are
    exempt (:165-167).

    Batch expression: a running count of *prior* successes per scope in
    fetch order; a row is blocked when that count has already reached
    ``max_docs``.  One window (== one hash shuffle on the scope key); at
    10^10 rows the scope key is host-grained, same skew profile as every
    other per-host window in the engine (hot hosts are bounded by
    max_docs itself — the window can early-stop on compacted state).
    """
    from pyspark.sql import Window

    scope = dsf_scope_col(F.col(host_col), mode)
    is_dns = F.col(host_col).startswith("dns:")
    w = (
        Window.partitionBy(scope)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.sum(
        F.when(F.col(status_col) > 0, F.lit(1)).otherwise(F.lit(0))
    ).over(w)
    blocked = (
        (F.lit(max_docs) > 0)
        & ~is_dns
        & (F.coalesce(prior, F.lit(0)) >= F.lit(max_docs))
    )
    return fetch_log.withColumn("dsf_scope", scope).withColumn(
        "dsf_blocked", blocked
    )


def runtime_limit_status(
    elapsed_ms: Column,
    runtime_seconds: int,
    operation: str = "PAUSE",
) -> tuple[Column, Column]:
    """RuntimeLimitEnforcer (engine/.../prefetch/RuntimeLimitEnforcer
    .java:62-120): once crawl elapsed time exceeds ``runtimeSeconds``,
    PAUSE/TERMINATE request a crawl state change (here: a boolean the
    driver loop reads, like crawl_limits_reached) while BLOCK_URIS
    stamps each in-flight URI S_BLOCKED_BY_RUNTIME_LIMIT (-5004) and
    finishes it. Returns (stop_requested, blocked_status) columns —
    blocked_status is null unless the op is BLOCK_URIS and the limit
    has passed."""
    from heritrix_spark.constants import S_BLOCKED_BY_RUNTIME_LIMIT

    over = elapsed_ms > F.lit(runtime_seconds * 1000)
    stop = over if operation in ("PAUSE", "TERMINATE") else F.lit(False)
    blocked = (
        F.when(over, F.lit(S_BLOCKED_BY_RUNTIME_LIMIT))
        if operation == "BLOCK_URIS"
        else F.lit(None).cast("int")
    )
    return stop, blocked
