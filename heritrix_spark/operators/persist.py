"""Cross-crawl URI-history persistence (the Heritrix 3 ``recrawl``
persist processors).

- ``PersistProcessor.persistKeyFor`` (recrawl/PersistProcessor.java:
  106-113): the store key is the CASE-SENSITIVE SURT of the URI
  (``SURT.fromURI(uri, true)`` — "uniqueness and sorting benefits").
- ``PersistStoreProcessor`` / ``PersistOnlineProcessor`` (shouldStore:
  only URIs that accumulated fetch history are stored): at crawl end,
  each URI's persistent data — here its rotated fetch-history array —
  is stored under its persist key.
- ``PersistLoadProcessor.innerProcess`` (PersistLoadProcessor.java:
  83-92): in the NEXT crawl, prior data for the key is merged into the
  fresh CrawlURI (prior keys only where the current URI has none — a
  fresh URI has no history, so the prior history array attaches whole).

Spark shape: the store is a DataFrame keyed by persist key — written
as one shard-partitioned table at crawl end (one hash shuffle), joined
back at the next crawl's start.  Continuation
(:func:`continue_fetch_history`) re-expresses "loaded history seeds the
processors" exactly: prior entries become pseudo-rows with negative
sequence numbers unioned below the new crawl's fetches, the same
fetch-history windows run over the union, and prior rows are dropped
from the output.  Because every stored entry already carries its
correct reference length, setting the pseudo-row's content length to
that stored value makes the 304 carry-forward recurrence
(FetchHTTP.setSizes) hold seamlessly across the crawl boundary — the
round-trip is bit-equal to running the windows over the unbroken log,
which is exactly what the driver oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heritrix_spark.functions.surt import surt_case_col
from heritrix_spark.operators.recrawl import fetch_history


def persist_key_col(url: Column | str) -> Column:
    """persistKeyFor: case-sensitive SURT (PersistProcessor.java:106-113)."""
    return surt_case_col(url)


def persist_store(
    history_df: DataFrame,
    key_col: str = "persist_key",
    order_cols: tuple[str, ...] = ("seq",),
) -> DataFrame:
    """Final history per URI — the state PersistStoreProcessor leaves in
    the store at crawl end: each key's rotated array as of its LAST
    fetch.  One max_by aggregation (hash shuffle on the persist key)."""
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    return history_df.groupBy(key_col).agg(
        F.max_by("history", ord_struct).alias("history")
    )


def prior_history_rows(prior: DataFrame, key_col: str = "persist_key") -> DataFrame:
    """Stored history arrays → pseudo fetch rows with negative seq
    (newest prior entry = -1).  Stored reference lengths stand in as
    content lengths so the 304 carry-forward recurrence continues
    exactly (module docstring)."""
    e = prior.select(
        key_col, F.posexplode("history").alias("pos", "entry")
    )
    return e.select(
        key_col,
        (-1 - F.col("pos")).cast("int").alias("seq"),
        F.col("entry")["fetch_status"].alias("fetch_status"),
        F.col("entry")["fetch_began_ms"].alias("ts_ms"),
        F.col("entry")["content_digest"].alias("content_digest"),
        F.col("entry")["etag"].alias("etag"),
        F.col("entry")["last_modified"].alias("last_modified"),
        F.col("entry")["reference_length"].alias("content_length"),
        F.lit(True).alias("is_prior"),
    )


def continue_fetch_history(
    current: DataFrame,
    prior: DataFrame,
    k: int = 2,
    key_col: str = "persist_key",
) -> DataFrame:
    """PersistLoadProcessor + FetchHistoryProcessor across a crawl
    boundary: seed this crawl's history windows with the stored arrays.
    ``current`` needs (key_col, seq>=0, fetch_status, ts_ms,
    content_digest, etag, last_modified, content_length)."""
    cur = current.withColumn("is_prior", F.lit(False))
    unioned = cur.unionByName(
        prior_history_rows(prior, key_col), allowMissingColumns=True
    )
    out = fetch_history(
        unioned,
        k=k,
        key_cols=(key_col,),
        order_cols=("seq",),
        etag="etag",
        last_modified="last_modified",
        content_length="content_length",
    )
    return out.filter(~F.col("is_prior")).drop("is_prior")
