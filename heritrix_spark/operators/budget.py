"""Disposition classification, retries, and per-queue budgets.

Reference semantics:
- success = fetch_status > 0 (CrawlURI.isSuccess :942-952; the
  401-with-credentials carve-out needs live auth and is out of scope);
- disregarded statuses (AbstractFrontier.isDisregarded :1054-1067) —
  robots-precluded, out-of-scope, blocked, too-many-hops, deleted —
  are neither success nor failure and expend no cost (processFinish
  journals 'Fd' with cost 0);
- retry (AbstractFrontier.needsReenqueuing :1078-1111): deferred /
  connect-failed / connect-lost / DNS-fail, while attempts < max_retries
  (:863 overMaxRetries); retry delay = retry_delay_s for those statuses,
  0 otherwise (retryDelayFor :836-841);
- queue expenditure: success/failure expend the URI's holder cost;
  failures add error_penalty (WorkQueue.expend :293-301, noteError
  :308-311; processFinish :976);
- session budget: a queue whose expenditure since its last activation
  exceeds session_budget is deactivated — it must wait for
  re-activation (WorkQueue.isOverSessionBudget :260-264); total budget
  exceeded → retired (isOverTotalBudget :271-275, retireQueue :498-509).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from heritrix_spark.constants import (
    DISREGARD_STATUSES,
    RETRY_STATUSES,
    PolitenessConfig,
)


def is_success_col(fetch_status: Column) -> Column:
    return fetch_status > 0


def is_disregarded_col(fetch_status: Column) -> Column:
    return fetch_status.isin(*DISREGARD_STATUSES)


def needs_retry_col(
    fetch_status: Column,
    attempts: Column,
    cfg: PolitenessConfig = PolitenessConfig(),
    max_retries: Column | None = None,
) -> Column:
    """``max_retries`` (optional Column) is the per-host sheet override
    of AbstractFrontier.maxRetries (AbstractFrontier.java:116); null
    cells fall through to the global cfg like an absent sheet property."""
    cap = (
        F.coalesce(max_retries.cast("int"), F.lit(cfg.max_retries))
        if max_retries is not None
        else F.lit(cfg.max_retries)
    )
    return fetch_status.isin(*RETRY_STATUSES) & (attempts < cap)


def retry_delay_ms_col(
    fetch_status: Column, cfg: PolitenessConfig = PolitenessConfig()
) -> Column:
    """retryDelayFor (AbstractFrontier.java:836-841): the standard delay
    for connect-failed / connect-lost / DNS-fail; 0 otherwise — including
    S_DEFERRED, whose re-enqueue must not snooze the queue (the deferred
    URI's prerequisite is fetched on the queue's very next emission)."""
    from heritrix_spark.constants import S_DEFERRED

    return F.when(
        fetch_status.isin(*RETRY_STATUSES) & (fetch_status != F.lit(S_DEFERRED)),
        F.lit(cfg.retry_delay_s * 1000),
    ).otherwise(F.lit(0)).cast("long")


def disposition_col(fetch_status: Column, attempts: Column,
                    cfg: PolitenessConfig = PolitenessConfig(),
                    max_retries: Column | None = None) -> Column:
    """One of 'success' | 'disregard' | 'retry' | 'failure'.
    ``max_retries`` — optional per-host override column (see
    :func:`needs_retry_col`)."""
    return (
        F.when(is_success_col(fetch_status), F.lit("success"))
        .when(is_disregarded_col(fetch_status), F.lit("disregard"))
        .when(
            needs_retry_col(fetch_status, attempts, cfg, max_retries),
            F.lit("retry"),
        )
        .otherwise(F.lit("failure"))
    )


def expenditure_col(disposition: Column, cost: Column, fetch_status: Column,
                    cfg: PolitenessConfig = PolitenessConfig()) -> Column:
    """Cost charged to the queue for this disposition
    (WorkQueueFrontier.processFinish :906-997):

    success → cost; failure → cost + error_penalty; disregard → 0;
    retry → cost, except S_DEFERRED which expends nothing (:976
    "expend(cost) unless DEFERRED").
    """
    from heritrix_spark.constants import S_DEFERRED

    return (
        F.when(disposition == "success", cost)
        .when(disposition == "failure", cost + F.lit(cfg.error_penalty))
        .when(
            (disposition == "retry") & (fetch_status != F.lit(S_DEFERRED)), cost
        )
        .otherwise(F.lit(0))
    ).cast("long")


# ------------------------------------------------------------ Python twins


def disposition_py(
    fetch_status: int, attempts: int, cfg: PolitenessConfig = PolitenessConfig()
) -> str:
    if fetch_status > 0:
        return "success"
    if fetch_status in DISREGARD_STATUSES:
        return "disregard"
    if fetch_status in RETRY_STATUSES and attempts < cfg.max_retries:
        return "retry"
    return "failure"


def expenditure_py(
    disposition: str,
    cost: int,
    fetch_status: int,
    cfg: PolitenessConfig = PolitenessConfig(),
) -> int:
    from heritrix_spark.constants import S_DEFERRED

    if disposition == "success":
        return cost
    if disposition == "failure":
        return cost + cfg.error_penalty
    if disposition == "retry" and fetch_status != S_DEFERRED:
        return cost
    return 0


def reconsider_retired_queues(host_state):
    """WorkQueueFrontier.reconsiderRetiredQueues (:525-545): when
    retirement-determining settings change (a raised total budget, a
    lifted force-retire overlay), un-retire EVERY retired queue back to
    inactive. A queue that still qualifies as over-budget is re-retired
    the next time it comes up (run_round re-applies the budget rule each
    round), so clearing the flag is sufficient and safe."""
    from pyspark.sql import functions as F

    return host_state.withColumn("retired", F.lit(False))
