"""Adaptive-revisit frontier semantics (Heritrix 1.x AR frontier family).

The reference's ``AdaptiveRevisitFrontier`` re-fetches every URI forever,
spacing visits by a per-URI *wait interval* that adapts to how often the
content actually changes.  Three cooperating pieces define the law:

- ``ChangeEvaluator`` (heritrix/src/java/org/archive/crawler/extractor/
  ChangeEvaluator.java:69-163): on a successful fetch, compare the new
  content digest with ``A_LAST_CONTENT_DIGEST``.  Both null -> hard
  return (no state change, no counters).  Equal -> CONTENT_UNCHANGED
  (stored digest untouched).  Otherwise CONTENT_CHANGED and the stored
  digest is overwritten (possibly with null).  Only when the comparison
  ran: ``A_NUMBER_OF_VISITS`` += 1, and on CHANGED ``A_NUMBER_OF_VERSIONS``
  += 1 (ChangeEvaluator.java:148-163).
- ``WaitEvaluator`` (heritrix/src/java/org/archive/crawler/postprocessor/
  WaitEvaluator.java:169-292): on a successful fetch, pick the next wait:
  content state unset/UNKNOWN -> fixed default wait (259200 s,
  :74-77); state known and a prior wait exists -> divide by
  ``changed-factor`` on CHANGED, multiply by ``unchanged-factor`` on
  UNCHANGED (both default 1.5, :67-71; Java ``(long)(w/f)`` /
  ``(long)(w*f)`` double-math truncation); no prior wait -> the initial
  wait (86400 s, :52-55).  Optionally add the fetch-overdue time first
  (:80-81, default off).  Clamp to [min, max] = [3600 s, 2419200 s]
  (:57-65, clamp :278-282).
- ``AdaptiveRevisitFrontier`` success path (heritrix/src/java/org/archive/
  crawler/frontier/AdaptiveRevisitFrontier.java:736-737):
  ``A_TIME_OF_NEXT_PROCESSING = now + waitInterval``; at emission the
  overdue time is ``now - timeOfNextProcessing`` (:567-586).  Failed
  fetches never reach either evaluator (both early-return on
  ``!isSuccess()``; isSuccess = fetchStatus > 0, CrawlURI.java:999-1009).
- ``AdaptiveRevisitHostQueue`` (AdaptiveRevisitHostQueueTest.java:50-140):
  per host the *ready* URI is the one with the smallest
  ``A_TIME_OF_NEXT_PROCESSING``; an empty queue reports next-ready-time
  ``Long.MAX_VALUE``.

Spark shape: the whole per-URI visit history folds in one JVM-side
``F.aggregate`` over a sorted visit array — one shuffle (the groupBy on
the URI key), zero Python on the hot path, and the per-host peek is a
plain window over the folded output.  At 10^10 URIs the groupBy key is
the canonical URL (uniformly hash-partitioned); visit histories are
bounded (one element per completed fetch round), so no skew handling
beyond the default hash shuffle is needed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RevisitConfig:
    """WaitEvaluator settings (WaitEvaluator.java:52-81 defaults)."""

    initial_wait_s: int = 86400  # 1 day
    max_wait_s: int = 2419200  # 4 weeks
    min_wait_s: int = 3600  # 1 hour
    default_wait_s: int = 259200  # 3 days (unknown change status)
    unchanged_factor: float = 1.5
    changed_factor: float = 1.5
    use_overdue_time: bool = False


_STATE_FIELDS = ("last_digest", "wait_ms", "visits", "versions", "next_ms")

LONG_MAX = 9223372036854775807  # Long.MAX_VALUE empty-queue next-ready time


def _init_state() -> Column:
    return F.struct(
        F.lit(None).cast("string").alias("last_digest"),
        F.lit(None).cast("long").alias("wait_ms"),
        F.lit(0).cast("int").alias("visits"),
        F.lit(0).cast("int").alias("versions"),
        F.lit(None).cast("long").alias("next_ms"),
    )


def _step(acc: Column, v: Column, cfg: RevisitConfig) -> Column:
    """One visit through ChangeEvaluator + WaitEvaluator + reschedule."""
    success = v["fetch_status"] > 0
    cur = v["digest"]
    old = acc["last_digest"]

    both_null = cur.isNull() & old.isNull()
    unchanged = cur.isNotNull() & old.isNotNull() & (cur == old)
    # ChangeEvaluator ran to a decision (i.e. did not hard-return):
    state_known = success & ~both_null
    changed = state_known & ~unchanged

    new_digest = F.when(changed, cur).otherwise(old)
    new_visits = (acc["visits"] + F.when(state_known, 1).otherwise(0)).cast("int")
    new_versions = (acc["versions"] + F.when(changed, 1).otherwise(0)).cast("int")

    # WaitEvaluator (success only).  Prior-wait branch, with optional
    # overdue credit (WaitEvaluator.java:228-243); factors apply via
    # Java (long) truncation — values are non-negative so floor == trunc.
    prior = acc["wait_ms"]
    if cfg.use_overdue_time:
        overdue = F.when(
            acc["next_ms"].isNotNull(), v["ts_ms"] - acc["next_ms"]
        ).otherwise(F.lit(0).cast("long"))
        prior = prior + overdue
    revised = (
        F.when(changed, F.floor(prior / F.lit(cfg.changed_factor)))
        .when(unchanged, F.floor(prior * F.lit(cfg.unchanged_factor)))
        .otherwise(prior)
    )
    raw_wait = F.when(
        ~state_known, F.lit(cfg.default_wait_s * 1000).cast("long")
    ).otherwise(
        F.when(acc["wait_ms"].isNotNull(), revised).otherwise(
            F.lit(cfg.initial_wait_s * 1000).cast("long")
        )
    )
    clamped = F.least(
        F.greatest(raw_wait, F.lit(cfg.min_wait_s * 1000).cast("long")),
        F.lit(cfg.max_wait_s * 1000).cast("long"),
    )
    new_wait = F.when(success, clamped).otherwise(acc["wait_ms"]).cast("long")
    new_next = (
        F.when(success, v["ts_ms"] + new_wait).otherwise(acc["next_ms"]).cast("long")
    )

    return F.struct(
        new_digest.alias("last_digest"),
        new_wait.alias("wait_ms"),
        new_visits.alias("visits"),
        new_versions.alias("versions"),
        new_next.alias("next_ms"),
    )


def revisit_state_col(visits_array: Column, cfg: RevisitConfig | None = None) -> Column:
    """Fold a sorted array<struct{seq, ts_ms, fetch_status, digest}> of one
    URI's visit history into its final adaptive-revisit state struct."""
    cfg = cfg or RevisitConfig()
    return F.aggregate(visits_array, _init_state(), lambda acc, v: _step(acc, v, cfg))


def adaptive_revisit(
    history: DataFrame,
    cfg: RevisitConfig | None = None,
    key_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Per-URI adaptive-revisit state from a fetch-history table.

    ``history`` columns: the key columns + ``seq`` (visit order), ``ts_ms``
    (fetch completion epoch-ms), ``fetch_status``, ``digest`` (nullable
    content digest).  Returns one row per key with visits / versions /
    last_digest / wait_ms / next_ms.
    """
    cfg = cfg or RevisitConfig()
    folded = (
        history.groupBy(*key_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "ts_ms", "fetch_status", "digest"))
            ).alias("vs")
        )
        .withColumn("state", revisit_state_col(F.col("vs"), cfg))
    )
    return folded.select(
        *key_cols,
        F.col("state.visits").alias("visits"),
        F.col("state.versions").alias("versions"),
        F.col("state.last_digest").alias("last_digest"),
        F.col("state.wait_ms").alias("wait_ms"),
        F.col("state.next_ms").alias("next_ms"),
    )


def revisit_peek(state: DataFrame, host_col: str = "class_key") -> DataFrame:
    """AdaptiveRevisitHostQueue peek law: per host, the ready URI is the
    one with the smallest time-of-next-processing (ties broken by URI for
    determinism); next_ready_time is that minimum
    (AdaptiveRevisitHostQueueTest.java:94-116)."""
    from pyspark.sql import Window

    # A URI with no successful visit has no scheduled time; the AR queue
    # law reports Long.MAX_VALUE when nothing is scheduled
    # (AdaptiveRevisitHostQueueTest.java:91-93), so null sorts last.
    ready = F.coalesce(F.col("next_ms"), F.lit(LONG_MAX))
    w = Window.partitionBy(host_col).orderBy(ready.asc(), "url")
    return (
        state.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            host_col,
            F.col("url").alias("peek_url"),
            ready.alias("next_ready_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Pure-Python twin (the normative mirror used by pytest goldens)
# ---------------------------------------------------------------------------


def revisit_state_py(
    visits: list[tuple[int, int, int, str | None]],
    cfg: RevisitConfig | None = None,
) -> dict:
    """Reference fold over [(seq, ts_ms, fetch_status, digest), ...]."""
    cfg = cfg or RevisitConfig()
    last_digest: str | None = None
    wait_ms: int | None = None
    n_visits = 0
    n_versions = 0
    next_ms: int | None = None
    for _seq, ts_ms, status, digest in sorted(visits):
        if status <= 0:
            continue
        both_null = digest is None and last_digest is None
        unchanged = (
            digest is not None and last_digest is not None and digest == last_digest
        )
        state_known = not both_null
        changed = state_known and not unchanged
        if changed:
            last_digest = digest
        if state_known:
            n_visits += 1
        if changed:
            n_versions += 1
        if not state_known:
            raw = cfg.default_wait_s * 1000
        elif wait_ms is not None:
            w = wait_ms
            if cfg.use_overdue_time and next_ms is not None:
                w += ts_ms - next_ms
            if changed:
                raw = math.floor(w / cfg.changed_factor)
            else:
                raw = math.floor(w * cfg.unchanged_factor)
        else:
            raw = cfg.initial_wait_s * 1000
        wait_ms = min(max(raw, cfg.min_wait_s * 1000), cfg.max_wait_s * 1000)
        next_ms = ts_ms + wait_ms
    return {
        "last_digest": last_digest,
        "wait_ms": wait_ms,
        "visits": n_visits,
        "versions": n_versions,
        "next_ms": next_ms,
    }
