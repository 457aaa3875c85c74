"""Politeness: robots.txt gating + the post-fetch delay formula.

Robots semantics (heritrix3/modules/.../net/RobotsDirectives.java:39-58):
a path is allowed iff NOT (longest matching disallow prefix > longest
matching allow prefix); empty disallow entries are dropped at parse
time (Robotstxt.java:118-166). Expressed with higher-order array
functions over the pre-parsed ``robots(class_key, allows, disallows,
crawl_delay)`` dimension table (FIXTURES.md §3) — JVM-native, no UDF.

Delay formula (DispositionProcessor.politenessDelayFor :231-294):

    d = clamp(delay_factor * fetch_duration_ms, min_delay_ms, max_delay_ms)
    if d < respect_threshold_ms:
        d = max(d, min(crawl_delay_ms, respect_threshold_ms))

(bandwidth throttling is modeled as optional and off by default, as in
the reference where maxPerHostBandwidthUsageKbSec defaults 0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.functions.colcache import cached


def url_path_col(url: Column | str) -> Column:
    """Path+query part used for robots prefix matching ('/' when empty)."""
    col = F.col(url) if isinstance(url, str) else url
    path = F.regexp_extract(col, r"^\w+://[^/]+(/.*)$", 1)
    return F.when(path == "", F.lit("/")).otherwise(path)


def _longest_prefix_len(prefixes: Column, path: Column) -> Column:
    """Length of the longest element of ``prefixes`` that path starts
    with, 0 if none (RobotsDirectives.longestPrefixLength :49-58)."""
    matching = F.filter(prefixes, lambda p: path.startswith(p))
    return F.coalesce(
        F.array_max(F.transform(matching, lambda p: F.length(p))), F.lit(0)
    )


def robots_allows_col(
    allows: Column, disallows: Column, path: Column
) -> Column:
    """RobotsDirectives.allows (:39-49): NOT (longest disallow > longest
    allow). Null directive arrays (no robots row) → allowed."""
    da = _longest_prefix_len(F.coalesce(disallows, F.array()), path)
    aa = _longest_prefix_len(F.coalesce(allows, F.array()), path)
    return ~(da > aa)


def join_robots(
    df: DataFrame, robots: DataFrame, class_key: str = "class_key"
) -> DataFrame:
    """Broadcast-join the robots dimension and add ``robots_allowed``
    and ``crawl_delay`` columns. The robots table is per-host — small
    relative to the frontier — so broadcast keeps this shuffle-free on
    the candidate side (SURVEY.md §2.3 "broadcast-able")."""
    # static trees (the higher-order prefix matchers are the expensive
    # ones to build) cached across rounds — functions/colcache.py
    r_sel, allowed_col, delay_col = cached(
        ("join_robots", class_key),
        lambda: (
            (
                F.col(class_key),
                F.col("allows").alias("__allows"),
                F.col("disallows").alias("__disallows"),
                F.col("crawl_delay").alias("crawl_delay"),
            ),
            robots_allows_col(
                F.col("__allows"), F.col("__disallows"), url_path_col(F.col("url"))
            ),
            F.coalesce(F.col("crawl_delay"), F.lit(-1.0)),
        ),
    )
    r = robots.select(*r_sel)
    joined = df.join(F.broadcast(r), on=class_key, how="left")
    return (
        joined.withColumn("robots_allowed", allowed_col)
        .withColumn("crawl_delay", delay_col)
        .drop("__allows", "__disallows")
    )


def politeness_delay_col(
    fetch_duration_ms: Column,
    crawl_delay_s: Column,
    cfg: PolitenessConfig = PolitenessConfig(),
    delay_factor: Column | None = None,
    min_delay_ms: Column | None = None,
    max_delay_ms: Column | None = None,
) -> Column:
    """politenessDelayFor (DispositionProcessor.java:231-294) as one expr.

    The optional ``delay_factor``/``min_delay_ms``/``max_delay_ms``
    columns are per-host sheet overlays (KeyedProperties analog —
    commons/.../spring/ overlays, profile-crawler-beans.cxml:218-383):
    null falls back to the global cfg value, exactly like an absent
    overlay falling through to the containing sheet."""
    factor = (
        F.coalesce(delay_factor, F.lit(float(cfg.delay_factor)))
        if delay_factor is not None
        else F.lit(float(cfg.delay_factor))
    )
    lo = (
        F.coalesce(min_delay_ms, F.lit(cfg.min_delay_ms))
        if min_delay_ms is not None
        else F.lit(cfg.min_delay_ms)
    )
    hi = (
        F.coalesce(max_delay_ms, F.lit(cfg.max_delay_ms))
        if max_delay_ms is not None
        else F.lit(cfg.max_delay_ms)
    )
    d = (factor * fetch_duration_ms).cast("long")
    d = F.greatest(d, lo.cast("long"))
    d = F.least(d, hi.cast("long"))
    respect = F.lit(cfg.respect_crawl_delay_up_to_s * 1000).cast("long")
    cd_ms = F.when(crawl_delay_s > 0, (crawl_delay_s * 1000).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    cd_ms = F.least(cd_ms, respect)
    return F.when((d < respect) & (cd_ms > d), cd_ms).otherwise(d)


# ------------------------------------------------------------ Python twins
# (used by the oracle simulator — heritrix_spark/oracle/simulator.py)


def robots_allows_py(allows: list[str], disallows: list[str], path: str) -> bool:
    def longest(prefixes: list[str]) -> int:
        lens = [len(p) for p in prefixes if path.startswith(p)]
        return max(lens) if lens else 0

    return not (longest(disallows or []) > longest(allows or []))


def politeness_delay_py(
    fetch_duration_ms: int,
    crawl_delay_s: float,
    cfg: PolitenessConfig = PolitenessConfig(),
) -> int:
    d = int(cfg.delay_factor * fetch_duration_ms)
    d = max(d, cfg.min_delay_ms)
    d = min(d, cfg.max_delay_ms)
    respect = cfg.respect_crawl_delay_up_to_s * 1000
    cd_ms = int(crawl_delay_s * 1000) if crawl_delay_s and crawl_delay_s > 0 else 0
    cd_ms = min(cd_ms, respect)
    if d < respect and cd_ms > d:
        d = cd_ms
    return d
