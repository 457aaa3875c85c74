"""Operator-facing frontier maintenance tools.

``WorkQueueFrontier.deleteURIs(queueRegex, uriRegex)``
(engine/.../frontier/WorkQueueFrontier.java:1064-1078): for every queue
whose class key FULL-matches ``queueRegex`` (java.util.regex
``matches()``), delete pending URIs that full-match ``uriRegex``;
return the count and decrement the queued tally.  Deleted URIs stay in
the already-seen set — the reference's ``deleteMatching`` touches only
the pending queue, so a re-discovered URI is still a duplicate.

Spark shape: one predicate filter over the frontier (no shuffle for the
kept side — the filter pipelines into whatever reads the frontier next)
plus one hash aggregation on the queue key for the per-queue
deleted/remaining tallies the frontier report shows.  Anchoring is
explicit (``^(?:…)$``) because Java ``matches()`` is full-match while
Spark ``rlike`` is find().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _full_match(col, regex: str):
    return col.rlike(f"^(?:{regex})$")


def delete_uris(
    frontier: DataFrame,
    queue_regex: str,
    uri_regex: str,
    queue_col: str = "class_key",
    uri_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(kept_frontier, per_queue_counts)`` where the counts
    frame is (queue_col, deleted, remaining) for every queue the
    frontier currently holds."""
    # null url/class_key must behave as "not matched" on BOTH the kept
    # filter and the tallies (a bare null predicate would silently drop
    # the row from kept while counting it as remaining)
    doomed = F.coalesce(
        _full_match(F.col(queue_col), queue_regex)
        & _full_match(F.col(uri_col), uri_regex),
        F.lit(False),
    )
    kept = frontier.filter(~doomed)
    counts = frontier.groupBy(queue_col).agg(
        F.sum(F.when(doomed, 1).otherwise(0)).cast("int").alias("deleted"),
        F.sum(F.when(doomed, 0).otherwise(1)).cast("int").alias("remaining"),
    )
    return kept, counts
