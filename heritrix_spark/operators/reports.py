"""Reporting aggregations over the crawl's output tables.

Reference analog: engine/.../reporting/*.java (FrontierSummaryReport,
HostsReport, MimetypesReport, ResponseCodeReport, SeedsReport,
CrawlStatSnapshot) — all are groupBy().agg() jobs here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hosts_report(fetch_log: DataFrame) -> DataFrame:
    """Per-host fetch outcomes (HostsReport analog)."""
    return (
        fetch_log.groupBy("class_key")
        .agg(
            F.count("*").cast("long").alias("emitted"),
            F.sum(F.when(F.col("disposition") == "success", 1).otherwise(0))
            .cast("long")
            .alias("succeeded"),
            F.sum(F.when(F.col("disposition") == "failure", 1).otherwise(0))
            .cast("long")
            .alias("failed"),
            F.sum(F.when(F.col("disposition") == "disregard", 1).otherwise(0))
            .cast("long")
            .alias("disregarded"),
            F.sum(F.when(F.col("disposition") == "retry", 1).otherwise(0))
            .cast("long")
            .alias("retried"),
            F.max("round").cast("long").alias("last_round"),
        )
        .orderBy("class_key")
    )


def response_code_report(fetch_log: DataFrame) -> DataFrame:
    """Counts per fetch status (ResponseCodeReport analog)."""
    return (
        fetch_log.groupBy("fetch_status")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("fetch_status")
    )


def seeds_report(fetch_log: DataFrame, docs: DataFrame | None = None) -> DataFrame:
    """The "[code] [status] [seed] [redirect]" seeds report
    (engine/.../reporting/SeedsReport.java:38-70 over SeedRecord):

    - one row per seed (hops_path = ''), reflecting its MOST-RECENT
      processing (SeedRecord.updateWith — recrawled seeds report their
      latest fetch);
    - status = CRAWLED iff status code > 0 (SeedsReport.java:53-58);
    - redirect = the Location target when the latest status is 301/302
      (SeedRecord.fillWith :108-118 reads the "location:" out-candidate;
      here the docs table's redirect span, independent of whether the
      target was scheduled). Null without ``docs`` or for non-redirects.

    Report order = status code descending (SeedRecord.sortShiftStatusCode
    :149-151), then seed. One shuffle on the seed key; the docs join is
    an equi-join on the seed's canon key only (seeds ≪ docs).

    Seed rows are identified by the ``is_seed`` flag (present on every
    engine fetch log), which covers redirect-PROMOTED discovered seeds
    too (checkForSeedPromotion — they enter processedSeedsRecords like
    scheduled seeds); logs without the column fall back to the
    hops_path = '' identification of scheduled seeds.
    """
    seed_cond = (
        F.col("is_seed")
        if "is_seed" in fetch_log.columns
        else F.col("hops_path") == ""
    )
    seeds = fetch_log.filter(seed_cond)
    latest = (
        seeds.groupBy("canon_url")
        .agg(
            F.max(
                F.struct(
                    F.col("round"),
                    F.col("fetch_status").alias("status_code"),
                    F.col("disposition"),
                    F.col("url").alias("seed"),
                )
            ).alias("__last")
        )
        .select(
            F.col("__last.status_code").alias("status_code"),
            F.when(F.col("__last.status_code") > 0, F.lit("CRAWLED"))
            .otherwise(F.lit("NOTCRAWLED"))
            .alias("status"),
            F.col("__last.seed").alias("seed"),
            F.col("__last.disposition").alias("disposition"),
            F.col("canon_url"),
        )
    )
    if docs is not None:
        redirect = docs.select(
            F.col("doc_id"),
            F.when(
                F.element_at(F.col("spans"), 1)["kind"] == F.lit("redirect"),
                F.element_at(F.col("spans"), 1)["media_ref"],
            ).alias("__redirect"),
        )
        latest = latest.join(
            redirect, on=latest["canon_url"] == redirect["doc_id"], how="left"
        ).drop("doc_id")
        redirect_col = F.when(
            F.col("status_code").isin(301, 302), F.col("__redirect")
        )
    else:
        redirect_col = F.lit(None).cast("string")
    return (
        latest.withColumn("redirect", redirect_col)
        .select("status_code", "status", "seed", "disposition", "redirect")
        .orderBy(F.desc("status_code"), F.asc("seed"))
    )


def source_tags_report(fetch_log: DataFrame) -> DataFrame:
    """The "[source] [host] [#urls]" source report
    (engine/.../reporting/SourceTagsReport.java:35-65): per source tag,
    hosts by successful-fetch count descending. Tallies follow
    StatisticsTracker.crawledURISuccessful :765-769 — only successful
    crawls count, host = the crawled URI's hostname (not its queue key).

    One hash aggregate on (source, host); map-side partial combine makes
    this O(distinct pairs) over the shuffle at any log size.
    """
    host = F.regexp_extract(F.col("canon_url"), r"^\w+://([^/:]+)", 1)
    return (
        fetch_log.filter(
            (F.col("disposition") == "success") & F.col("source").isNotNull()
        )
        .groupBy(F.col("source"), host.alias("host"))
        .agg(F.count("*").cast("long").alias("n_urls"))
        .orderBy(F.asc("source"), F.desc("n_urls"), F.asc("host"))
    )


def frontier_summary(frontier: DataFrame, host_state: DataFrame) -> DataFrame:
    """Queue-of-queues summary (WorkQueueFrontier report analog
    :1092-1120): per-host depth plus lifecycle flags derived from state."""
    depth = frontier.groupBy("class_key").agg(
        F.count("*").cast("long").alias("queue_depth"),
        F.min("ordinal").cast("long").alias("head_ordinal"),
    )
    return (
        depth.join(host_state, on="class_key", how="left")
        .select(
            "class_key",
            "queue_depth",
            "head_ordinal",
            "wake_time",
            "total_expenditure",
            F.coalesce(F.col("retired"), F.lit(False)).alias("retired"),
        )
        .orderBy("class_key")
    )


def crawl_snapshot(metrics: DataFrame) -> DataFrame:
    """Round-over-round rates (CrawlStatSnapshot analog :39-107):
    per-round emitted/succeeded plus docs-per-ms over the logical clock
    and cumulative totals via running windows."""
    w = Window.orderBy("round").rowsBetween(Window.unboundedPreceding, 0)
    return metrics.select(
        "round",
        "now_ms",
        "emitted",
        "succeeded",
        F.sum("succeeded").over(w).cast("long").alias("cum_succeeded"),
        F.sum("novel_scheduled").over(w).cast("long").alias("cum_scheduled"),
    ).orderBy("round")


def substats_tally(fetch_log: DataFrame) -> DataFrame:
    """Tri-level FetchStats tally (AbstractFrontier.tally :615-630 +
    FetchStats.java:53-97): outcomes aggregated at the server
    (class_key incl. #port), host (class_key minus port), and
    frontier-group (assignment-level domain) levels.

    Single shuffle at 100 TB: each log row explodes into its three
    (level, key) memberships, then one groupBy — instead of three
    separate aggregation passes over the log.
    """
    from heritrix_spark.functions.psl import reduce_surt_authority_col

    server = F.col("class_key")
    host = F.regexp_replace(F.col("class_key"), "#[0-9]+$", "")
    group = reduce_surt_authority_col(host)
    lk = F.explode(
        F.array(
            F.struct(F.lit("server").alias("level"), server.alias("key")),
            F.struct(F.lit("host").alias("level"), host.alias("key")),
            F.struct(F.lit("group").alias("level"), group.alias("key")),
        )
    ).alias("lk")
    exploded = fetch_log.select(lk, "disposition")
    return (
        exploded.groupBy(F.col("lk.level").alias("level"), F.col("lk.key").alias("key"))
        .agg(
            F.count("*").cast("long").alias("emitted"),
            F.sum(F.when(F.col("disposition") == "success", 1).otherwise(0))
            .cast("long")
            .alias("fetch_successes"),
            F.sum(F.when(F.col("disposition") == "failure", 1).otherwise(0))
            .cast("long")
            .alias("fetch_failures"),
            F.sum(F.when(F.col("disposition") == "disregard", 1).otherwise(0))
            .cast("long")
            .alias("fetch_disregards"),
            F.sum(F.when(F.col("disposition") == "retry", 1).otherwise(0))
            .cast("long")
            .alias("fetch_retries"),
        )
        .orderBy("level", "key")
    )


def average_queue_depth(frontier: DataFrame) -> DataFrame:
    """averageDepth / deepestUri analog (WorkQueueFrontier :1547-1575)."""
    return frontier.groupBy("class_key").count().agg(
        F.avg("count").alias("average_depth"),
        F.max("count").cast("long").alias("deepest"),
        F.count("*").cast("long").alias("n_queues"),
    )


def congestion_ratio(
    frontier: DataFrame, host_state: DataFrame, now_ms: int
) -> DataFrame:
    """congestionRatio analog (WorkQueueFrontier.java:1564-1574): how many
    queues *want* attention per queue *getting* it —
    ``(active + inactive) / (in-process + snoozed)`` in the reference.

    Round-model state mapping (SURVEY.md §1.3 — lifecycle is derived, not
    stored): a host with pending URIs is ``ready`` when ``wake_time <=
    now`` (it will emit this round — the serviced set; in-process is
    empty between rounds) and ``snoozed`` otherwise. So
    ``congestion = nonempty_hosts / max(1, ready_hosts)``: 1.0 = every
    queue is being serviced; >1 = politeness/budget backlog.
    """
    nonempty = frontier.select("class_key").distinct()
    joined = nonempty.join(
        host_state.select("class_key", "wake_time", "retired"),
        on="class_key",
        how="left",
    ).filter(~F.coalesce(F.col("retired"), F.lit(False)))
    ready = F.coalesce(
        F.sum((F.col("wake_time") <= F.lit(now_ms)).cast("long")), F.lit(0)
    )
    return joined.agg(
        F.count("*").cast("long").alias("nonempty_queues"),
        ready.cast("long").alias("ready_queues"),
        (F.count("*") / F.greatest(ready, F.lit(1))).alias("congestion_ratio"),
    )


def precedence_histogram(
    frontier: DataFrame, base_precedence: int = 3
) -> DataFrame:
    """Per-queue Histotable of enqueued URI precedences plus the derived
    queue precedence (HighestUriQueuePrecedencePolicy.java:33-60 keeps
    ``enqueuedCounts`` as an incrementally-tallied Histotable per queue;
    the queue's precedence is base + the lowest enqueued value, and the
    full distribution feeds the precedence report).

    Batch restatement: the histogram IS ``groupBy(class_key,
    precedence).count()`` — one map-side-combinable shuffle — and the
    derived precedence is a per-queue min window over the (already
    tiny) histogram, not over the frontier."""
    hist = frontier.groupBy("class_key", "precedence").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("class_key")
    return hist.withColumn(
        "queue_precedence",
        (F.lit(base_precedence) + F.min("precedence").over(w)).cast("int"),
    )


def format_bytes_col(amount) -> F.Column:
    """ArchiveUtils.formatBytesForDisplay (ArchiveUtils.java:579-598):
    largest unit of B/KiB/MiB/GiB/TiB with the display amount < 1024
    (TiB uncapped), one fraction digit only when the display amount is
    under 10, NumberFormat's HALF_EVEN rounding and US grouping commas
    (so 1023 bytes renders "1,023 B"), and any amount <= 0 as "0 B".
    Pure Catalyst: ``bround`` supplies the banker's rounding before
    ``format_number``'s grouping, so format_number's own mode is moot.
    """
    c = amount.cast("double") if hasattr(amount, "cast") else F.col(amount).cast("double")
    out = F.lit("0 B")
    for p, unit in reversed(list(enumerate([" B", " KiB", " MiB", " GiB", " TiB"]))):
        disp = c / F.lit(float(1024 ** p))
        digits_1 = F.concat(F.format_number(F.bround(disp, 1), 1), F.lit(unit))
        digits_0 = F.concat(F.format_number(F.bround(disp, 0), 0), F.lit(unit))
        rendered = F.when(disp < 10, digits_1).otherwise(digits_0)
        if p == 4:
            out = F.when(c >= F.lit(float(1024 ** 4)), rendered).otherwise(out)
        elif p == 0:
            out = F.when(c > 0, F.when(c < 1024, rendered).otherwise(out)).otherwise(
                F.lit("0 B")
            )
        else:
            out = F.when(
                (c >= F.lit(float(1024 ** p))) & (c < F.lit(float(1024 ** (p + 1)))),
                rendered,
            ).otherwise(out)
    return out


def format_bytes_py(amount: int) -> str:
    """Python twin of ``format_bytes_col`` (test oracle)."""
    if amount <= 0:
        return "0 B"
    disp = float(amount)
    p = 0
    while disp >= 1024 and p < 4:
        disp /= 1024
        p += 1
    digits = 1 if disp < 10 else 0
    # banker's rounding like java.text.NumberFormat HALF_EVEN
    from decimal import ROUND_HALF_EVEN, Decimal

    q = Decimal(disp).quantize(Decimal(1).scaleb(-digits), ROUND_HALF_EVEN)
    s = f"{q:,.{digits}f}"
    return s + [" B", " KiB", " MiB", " GiB", " TiB"][p]


def crawled_bytes_histotable(
    fetch_log: DataFrame,
    status_col: str = "fetch_status",
    size_col: str = "content_size",
    identical_col: str = "identical_digest",
) -> DataFrame:
    """CrawledBytesHistotable (CrawledBytesHistotable.java:45-56): each
    fetched URI tallies its content size + a count into exactly one of
    three classes, in the reference's precedence order — HTTP 304
    (notModified) wins over an identical-digest revisit (dupByHash),
    everything else is novel.  One map-side-combinable shuffle on a
    3-value key; ``display`` renders each class's byte total with the
    ArchiveUtils law used by the reference's summary()."""
    klass = (
        F.when(F.col(status_col) == 304, F.lit("notModified"))
        .when(F.coalesce(F.col(identical_col), F.lit(False)), F.lit("dupByHash"))
        .otherwise(F.lit("novel"))
    )
    return (
        fetch_log.select(klass.alias("class"), F.col(size_col).alias("sz"))
        .groupBy("class")
        .agg(
            F.sum("sz").cast("long").alias("bytes"),
            F.count(F.lit(1)).cast("long").alias("urls"),
        )
        .withColumn("display", format_bytes_col(F.col("bytes")))
        .orderBy("class")
    )


def crawled_bytes_summary(fetch_log: DataFrame, **kw) -> DataFrame:
    """One-row summary string (CrawledBytesHistotable.summary :58-76):
    '<total> crawled (<novel> novel[, <dup> dupByHash][, <nm>
    notModified])' — the dup/notModified clauses appear only when those
    classes occurred, exactly as the null-guards in the reference."""
    t = crawled_bytes_histotable(fetch_log, **kw)
    pivoted = t.groupBy().pivot("class", ["novel", "dupByHash", "notModified"]).agg(
        F.first("bytes")
    )
    total = (
        F.coalesce(F.col("novel"), F.lit(0))
        + F.coalesce(F.col("dupByHash"), F.lit(0))
        + F.coalesce(F.col("notModified"), F.lit(0))
    )
    summary = F.concat(
        format_bytes_col(total),
        F.lit(" crawled ("),
        format_bytes_col(F.coalesce(F.col("novel"), F.lit(0))),
        F.lit(" novel"),
        F.when(
            F.col("dupByHash").isNotNull(),
            F.concat(F.lit(", "), format_bytes_col(F.col("dupByHash")), F.lit(" dupByHash")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("notModified").isNotNull(),
            F.concat(
                F.lit(", "), format_bytes_col(F.col("notModified")), F.lit(" notModified")
            ),
        ).otherwise(F.lit("")),
        F.lit(")"),
    )
    return pivoted.select(summary.alias("summary"))
