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

from pyspark.sql import DataFrame
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
