"""Recrawl / fetch-history semantics (the Heritrix 3 ``recrawl`` package).

- ``FetchHistoryProcessor`` (modules/.../recrawl/FetchHistoryProcessor.java:62-117):
  after every fetch attempt, rotate a per-URI array of the last K fetch
  entries — status, fetch-began time, content digest when present,
  ETag / Last-Modified response headers when present, reference length —
  newest at [0].  K defaults to 2 (the current fetch plus one previous).
- reference length (``FetchHTTP.setSizes``, fetcher/FetchHTTP.java:747-766):
  normally the fetch's content length, but a 304-Not-Modified carries the
  previous entry's reference length forward (the "virtual size"), so a
  chain of 304s keeps reporting the last real body's length.
- ``IdenticalDigestDecideRule``
  (deciderules/recrawl/IdenticalDigestDecideRule.java:62-80): true iff
  the two newest history entries BOTH carry a digest and they are equal.
- WARC record-type selection (writer/WARCWriterProcessor.java:350-358,
  writeRevisitDigest :530, writeRevisitNotModified :560): identical
  digest → ``warcRevisit:digest``; else fetch status 304 →
  ``warcRevisit:notModified``; else a full ``response`` record.

Spark shape: everything is a window over (uri key, fetch order) — a
per-row sliding ``collect_list`` for the rotating history array (frame
``rowsBetween(1-K, 0)``, reversed so index 1 is newest — exactly the
processor's rotate-up / insert-at-0), and ``last(..., ignorenulls)``
for the 304 reference-length carry-forward.  One hash shuffle on the
URI key; history state per row is O(K), independent of visit count, so
the plan survives a 10^10-frontier scale-up like every other per-URI
window in this engine (uniform key, map-side sort, no skew beyond the
hot-host salting the frontier already applies upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NOT_MODIFIED = 304  # HttpStatus.SC_NOT_MODIFIED (FetchHTTP.java:751)


def reference_length_col(
    fetch_status: Column, content_length: Column, w_all, w_ord
) -> Column:
    """FetchHTTP.setSizes (:747-766): a 304 carries the newest history
    entry's reference length forward; anything else records its own
    content length.  Unrolled, that is "content length of the most
    recent non-304 fetch", falling back to the FIRST fetch's length
    when the whole prefix is 304s (the first fetch stored its own
    content length as reference length — FetchHistoryProcessor.java:92)."""
    last_real = F.last(
        F.when(fetch_status != NOT_MODIFIED, content_length), ignorenulls=True
    ).over(w_all)
    return F.coalesce(last_real, F.first(content_length).over(w_ord))


def fetch_history(
    df: DataFrame,
    k: int = 2,
    key_cols: tuple[str, ...] = ("url",),
    order_cols: tuple[str, ...] = ("seq",),
    status: str = "fetch_status",
    began_ms: str = "ts_ms",
    digest: str = "content_digest",
    etag: str | None = None,
    last_modified: str | None = None,
    content_length: str | None = None,
) -> DataFrame:
    """FetchHistoryProcessor as a sliding window: adds ``reference_length``
    (the 304 carry-forward) and ``history`` — the rotated last-``k``
    entry array, newest first, exactly the state of the reference's
    A_FETCH_HISTORY immediately after this fetch's processor step.

    Optional ``etag``/``last_modified``/``content_length`` name input
    columns; absent ones become null entry fields (the reference stores
    no key when the header is missing — null is this schema's "no key")."""
    keys = [F.col(c) for c in key_cols]
    order = [F.col(c) for c in order_cols]
    w_ord = Window.partitionBy(*keys).orderBy(*order)
    w_all = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_hist = w_ord.rowsBetween(1 - k, 0)

    st = F.col(status)
    cl = (
        F.col(content_length).cast("long")
        if content_length
        else F.lit(None).cast("long")
    )
    # materialize the carry-forward once; the history struct references
    # the named column so the window runs a single pass (not two
    # identical Window nodes — Catalyst does not CSE across usages)
    df = df.withColumn(
        "reference_length", reference_length_col(st, cl, w_all, w_ord)
    )
    entry = F.struct(
        st.cast("int").alias("fetch_status"),
        F.col(began_ms).cast("long").alias("fetch_began_ms"),
        F.col(digest).alias("content_digest"),
        (F.col(etag) if etag else F.lit(None).cast("string")).alias("etag"),
        (
            F.col(last_modified)
            if last_modified
            else F.lit(None).cast("string")
        ).alias("last_modified"),
        F.col("reference_length"),
    )
    return df.withColumn(
        "history", F.reverse(F.collect_list(entry).over(w_hist))
    )


def has_identical_digest_col(history: Column) -> Column:
    """IdenticalDigestDecideRule.hasIdenticalDigest (:62-80): the two
    newest entries exist, both carry a digest, and the digests match."""
    h0 = F.get(history, 0)
    h1 = F.get(history, 1)
    return (
        (F.size(history) >= 2)
        & h0["content_digest"].isNotNull()
        & h1["content_digest"].isNotNull()
        & (h0["content_digest"] == h1["content_digest"])
    )


def warc_record_type_col(
    identical_digest: Column,
    fetch_status: Column,
    write_revisit_for_identical_digests: bool = True,
    write_revisit_for_not_modified: bool = True,
) -> Column:
    """WARCWriterProcessor.writeHttpRecords (:350-358) record selection,
    with the two kp toggles (:150-169). Annotation strings are the
    reference's own (:530, :560)."""
    out = F.lit("response")
    if write_revisit_for_not_modified:
        out = F.when(
            fetch_status == NOT_MODIFIED, F.lit("warcRevisit:notModified")
        ).otherwise(out)
    if write_revisit_for_identical_digests:
        out = F.when(
            identical_digest, F.lit("warcRevisit:digest")
        ).otherwise(out)
    return out


def reschedule_time_col(
    hops_path: Column, now_ms: Column, reschedule_delay_s: int = -1
) -> Column:
    """ReschedulingProcessor.innerProcess
    (modules/.../recrawl/ReschedulingProcessor.java:59-73): force a URI
    back onto the future queue after a fixed delay — prerequisites
    never reschedule ("they get rescheduled as needed", last hop 'P'),
    otherwise ``now + 1000*delay`` when the configured delay is
    positive, else -1 ("don't reschedule", the default). The -1/time
    value feeds the frontier's ``reschedule_time`` future-row plumbing
    (plans/round.py futureUris)."""
    no = F.lit(-1).cast("long")
    if reschedule_delay_s <= 0:
        return no
    is_prereq = hops_path.endswith("P")
    return F.when(is_prereq, no).otherwise(
        (now_ms + F.lit(1000 * reschedule_delay_s)).cast("long")
    )
