"""Watermarked event-time windowed aggregation over the fetch stream.

The reference reports crawl rates from periodically-snapshotted live
counters (CrawlStatSnapshot.java:39-107 computes docs/sec and KB/sec
between snapshots; StatisticsTracker keeps per-host/mime/status tallies
updated as ToeThreads finish fetches).  The Structured-Streaming-native
re-expression is an *event-time* tumbling-window aggregate with a
watermark: fetch-completion events are bucketed by when the fetch
happened (not when the row arrived), late events are merged into their
window while it is still open, events later than the watermark are
dropped, and a window's row is emitted exactly once — when the
watermark passes its end (append mode).  That gives the same
"rates per interval" report with an explicit, checkpointed lateness
bound instead of wall-clock snapshot racing.

Law (pinned by tests/test_windowed_stream.py and the DuckDB twin of the
``streaming_windowed_metrics`` driver row, both replaying Spark's
documented semantics):
- watermark after batch k = max(event time seen through batch k) − delay;
- a row arriving in batch k joins its window iff the window's end is
  later than the watermark in force during batch k (the one computed
  after batch k−1), otherwise it is dropped as too late;
- a window is emitted (once) when the watermark reaches past its end;
  windows still open when the stream ends are never emitted.

Scale shape: the aggregation state is one row per (window, host) —
bounded by the watermark horizon, evicted on emission.  The groupBy
shuffles on (window, host), the same host-grained key as every batch
report; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_fetch_metrics(
    events: DataFrame,
    window_s: int = 600,
    delay_s: int = 121,
    ts_col: str = "ts",
    host_col: str = "host",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Tumbling event-time fetch metrics: per (window, host) fetch count
    and byte total, with a ``delay_s`` lateness bound.  ``events`` is a
    streaming DataFrame whose ``ts_col`` is a timestamp."""
    return (
        events.withWatermark(ts_col, f"{delay_s} seconds")
        .groupBy(F.window(ts_col, f"{window_s} seconds"), F.col(host_col))
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(bytes_col).alias("total_bytes"),
        )
        .select(
            F.unix_timestamp("window.start").cast("long").alias("window_start"),
            F.unix_timestamp("window.end").cast("long").alias("window_end"),
            F.col(host_col),
            F.col("n_fetches").cast("long").alias("n_fetches"),
            F.col("total_bytes").cast("long").alias("total_bytes"),
        )
    )
