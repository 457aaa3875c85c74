"""One frontier round as a pure DataFrame program.

Implements the normative round spec of ``oracle/simulator.py`` (which
restates SURVEY.md §3's schedule/next/finished lifecycle as discrete
rounds) with Spark-first physical choices:

- head-of-queue pick = ``row_number() over (partition by class_key
  order by directive, precedence, ordinal)`` — the
  BdbMultipleWorkQueues insert-key law (:425-441) as a window, shuffled
  once on class_key;
- robots + host_state are broadcast-joined dimensions (hosts ≪ frontier);
- the docs "fetch" is an equi-join on canon_url = doc_id;
- candidate scope / directive / cost / precedence are column
  expressions (operators/scope.py, operators/prepare.py);
- seen-set dedup = batch-duplicate collapse + LEFT ANTI JOIN
  (operators/seen.py), both shuffled on canon_url;
- ordinal assignment = deterministic distributed row-number
  (operators/prepare.py assign_ordinals) under the ordinal law.

Scale notes: every shuffle is keyed on class_key (bounded by host
count) or canon_url (uniform by construction); the only driver-side
values are the round clock, max ordinal, and metric counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from heritrix_spark.constants import (
    NORMAL,
    S_CONNECT_FAILED,
    S_ROBOTS_PRECLUDED,
    PolitenessConfig,
)
from heritrix_spark.functions.canonicalize import canonicalize_col
from heritrix_spark.functions.surt import class_key_col
from heritrix_spark.operators.budget import disposition_col, expenditure_col
from heritrix_spark.operators.extract import extract_outlinks
from heritrix_spark.operators.politeness import (
    join_robots,
    politeness_delay_col,
)
from heritrix_spark.operators.prepare import (
    assign_ordinals,
    cost_uri_precedence_col,
    scheduling_directive_col,
    unit_cost_col,
)
from heritrix_spark.operators.scope import default_scope
from heritrix_spark.operators.seen import (
    collapse_batch_duplicates,
    dedup_candidates,
    shard_col,
)

FRONTIER_COLUMNS = [
    "url",
    "canon_url",
    "class_key",
    "directive",
    "precedence",
    "ordinal",
    "cost",
    "hops_path",
    "via",
    "attempts",
    "recrawls",
]

HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("class_key", T.StringType()),
        T.StructField("wake_time", T.LongType()),
        T.StructField("total_expenditure", T.LongType()),
        T.StructField("succeeded", T.LongType()),
        T.StructField("retired", T.BooleanType()),
    ]
)


@dataclass
class RoundResult:
    done: bool
    now_ms: int = 0
    max_ordinal: int = 0
    frontier: DataFrame | None = None
    host_state: DataFrame | None = None
    url_seen_delta: DataFrame | None = None
    fetch_log: DataFrame | None = None
    lineage: DataFrame | None = None
    metrics: dict | None = None
    future_uris: DataFrame | None = None


def schedule_seeds(
    spark: SparkSession,
    seeds: DataFrame,
    cfg: PolitenessConfig = PolitenessConfig(),
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Seed ingestion (spec step 0) → (frontier, url_seen, host_state, max_ordinal)."""
    prepared = seeds.select(
        F.col("url"),
        F.col("seq").cast("long").alias("seq"),
        canonicalize_col("url").alias("canon_url"),
    ).withColumn("class_key", class_key_col("canon_url"))
    unique = collapse_batch_duplicates(prepared, key="canon_url", order_cols=("seq",))
    numbered, n = assign_ordinals(unique, ["seq"], base=0)
    frontier = numbered.select(
        "url",
        "canon_url",
        "class_key",
        F.lit(NORMAL).cast("int").alias("directive"),
        F.lit(1).cast("int").alias("precedence"),
        F.col("ordinal"),
        F.lit(1).cast("int").alias("cost"),
        F.lit("").alias("hops_path"),
        F.lit(None).cast("string").alias("via"),
        F.lit(0).cast("int").alias("attempts"),
        F.lit(0).cast("int").alias("recrawls"),
    )
    url_seen = frontier.select(
        "canon_url", shard_col("canon_url", cfg.n_seen_shards).alias("shard")
    )
    host_state = frontier.select("class_key").distinct().select(
        "class_key",
        F.lit(0).cast("long").alias("wake_time"),
        F.lit(0).cast("long").alias("total_expenditure"),
        F.lit(0).cast("long").alias("succeeded"),
        F.lit(False).alias("retired"),
    )
    return frontier, url_seen, host_state, n


def run_round(
    spark: SparkSession,
    round_no: int,
    now_prev: int,
    max_ordinal: int,
    frontier: DataFrame,
    host_state: DataFrame,
    url_seen: DataFrame,
    docs: DataFrame,
    robots: DataFrame,
    seed_surt_prefixes: list[str],
    cfg: PolitenessConfig = PolitenessConfig(),
    future_uris: DataFrame | None = None,
) -> RoundResult:
    # ---- clock + ready-host selection (spec step 1)
    from heritrix_spark.operators.prepare import (
        base_queue_precedence_col,
        highest_uri_queue_precedence_col,
        success_counts_queue_precedence_col,
    )

    queue_stats = frontier.groupBy("class_key").agg(
        F.min("precedence").alias("__min_uri_prec")
    )
    eligible = queue_stats.join(
        host_state.filter(~F.col("retired")), on="class_key", how="inner"
    )
    if cfg.queue_precedence_policy == "highest_uri":
        qprec = highest_uri_queue_precedence_col(F.col("__min_uri_prec"), cfg)
    elif cfg.queue_precedence_policy == "success_counts":
        qprec = success_counts_queue_precedence_col(F.col("succeeded"), cfg)
    else:
        qprec = base_queue_precedence_col(cfg)
    # precedence floor: queues at/above the floor are never crawled
    # (WorkQueueFrontier.java:164-170, gating :594,820)
    eligible = eligible.withColumn("__qprec", qprec.cast("int")).filter(
        F.col("__qprec") < F.lit(cfg.precedence_floor)
    )
    # one driver action probes both event sources (frontier wake times
    # and futures, checkFutures :731-748): cross-join of two single-row
    # aggregates — halves the per-round fixed job overhead
    agg_e = eligible.agg(F.min("wake_time").alias("w"), F.count("*").alias("n"))
    if future_uris is not None:
        agg_f = future_uris.agg(
            F.min("reschedule_time").alias("t"), F.count("*").alias("nf")
        )
        row = agg_e.crossJoin(agg_f).first()
        fut_row = {"t": row["t"], "n": row["nf"]}
    else:
        row = agg_e.first()
        fut_row = None
    have_frontier = row["n"] > 0
    have_futures = fut_row is not None and fut_row["n"] > 0
    if not have_frontier and not have_futures:
        return RoundResult(done=True, now_ms=now_prev, max_ordinal=max_ordinal)
    events = []
    if have_frontier:
        events.append(int(row["w"]))
    if have_futures:
        events.append(int(fut_row["t"]))
    now = max(now_prev, min(events))

    # re-inject due futures (attempts already reset at scheduling time)
    injected_futures = None
    futures_next = future_uris
    if have_futures and int(fut_row["t"]) <= now:
        injected_futures = future_uris.filter(
            F.col("reschedule_time") <= F.lit(now)
        ).select(*FRONTIER_COLUMNS)
        futures_next = future_uris.filter(F.col("reschedule_time") > F.lit(now))
        frontier = frontier.unionByName(injected_futures)
        # recompute eligibility for hosts that only have future rows
        queue_stats = frontier.groupBy("class_key").agg(
            F.min("precedence").alias("__min_uri_prec")
        )
        eligible = queue_stats.join(
            host_state.filter(~F.col("retired")), on="class_key", how="inner"
        )
        if cfg.queue_precedence_policy == "highest_uri":
            qprec = highest_uri_queue_precedence_col(F.col("__min_uri_prec"), cfg)
        elif cfg.queue_precedence_policy == "success_counts":
            qprec = success_counts_queue_precedence_col(F.col("succeeded"), cfg)
        else:
            qprec = base_queue_precedence_col(cfg)
        eligible = eligible.withColumn("__qprec", qprec.cast("int")).filter(
            F.col("__qprec") < F.lit(cfg.precedence_floor)
        )

    head_w = Window.partitionBy("class_key").orderBy(
        "directive", "precedence", "ordinal"
    )
    heads = (
        frontier.withColumn("__rank", F.row_number().over(head_w))
        .filter(F.col("__rank") == 1)
        .drop("__rank")
    )
    ready = eligible.filter(F.col("wake_time") <= F.lit(now))
    if cfg.max_hosts_per_round > 0:
        # precedence-ordered activation: best (lowest) queue precedence
        # first, class_key tiebreak (activateInactiveQueue :753-786)
        act_w = Window.orderBy(F.asc("__qprec"), F.asc("class_key"))
        ready = (
            ready.withColumn("__arank", F.row_number().over(act_w))
            .filter(F.col("__arank") <= cfg.max_hosts_per_round)
            .drop("__arank")
        )
    ready_hosts = ready.select("class_key")
    emitted = heads.join(F.broadcast(ready_hosts), on="class_key", how="inner")

    # ---- fetch (spec step 2): robots gate + docs join
    emitted = join_robots(emitted, robots)  # adds robots_allowed, crawl_delay
    docs_sel = docs.select(F.col("doc_id"), F.col("spans"))
    fetched = emitted.join(
        docs_sel, on=emitted["canon_url"] == docs_sel["doc_id"], how="left"
    ).drop("doc_id")
    total_text = F.aggregate(
        F.col("spans"),
        F.lit(0),
        lambda acc, s: acc + F.length(F.coalesce(s["text"], F.lit(""))),
    )
    duration_found = F.lit(10) + F.pmod(
        total_text + F.lit(7) * F.size("spans"), F.lit(491)
    )
    is_flaky = (
        F.conv(F.substring(F.md5(F.col("canon_url")), 1, 2), 16, 10).cast("int")
        % 7
        == 0
    ) if cfg.flaky_first_attempt else F.lit(False)
    # a doc whose first span is kind='redirect' models a 301 response
    # whose Location header is that span's media_ref (ExtractorHTTP)
    is_redirect = (
        F.col("spans").isNotNull()
        & (F.size("spans") > 0)
        & (F.element_at(F.col("spans"), 1)["kind"] == F.lit("redirect"))
    )
    fetched = (
        fetched.withColumn(
            "fetch_status",
            F.when(~F.col("robots_allowed"), F.lit(S_ROBOTS_PRECLUDED))
            .when(
                F.col("spans").isNotNull() & is_flaky & (F.col("attempts") == 0),
                F.lit(S_CONNECT_FAILED),
            )
            .when(is_redirect, F.lit(301))
            .when(F.col("spans").isNotNull(), F.lit(200))
            .otherwise(F.lit(404)),
        )
        .withColumn(
            "fetch_duration_ms",
            F.when(F.col("fetch_status") == 200, duration_found)
            .when(F.col("fetch_status") == 301, F.lit(15))
            .when(F.col("fetch_status") == 404, F.lit(25))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "disposition", disposition_col(F.col("fetch_status"), F.col("attempts"), cfg)
        )
    )
    fetched = fetched.persist()

    # ---- extraction (spec step 3) + candidates (spec step 4)
    links = extract_outlinks(
        fetched, max_outlinks=cfg.max_outlinks, url_col="canon_url"
    )
    from heritrix_spark.functions.hops import extend_hops_path_col

    cands = links.select(
        F.col("target").alias("url"),
        F.col("parent_ordinal"),
        F.col("link_seq"),
        F.col("via"),
        extend_hops_path_col(F.col("via_hops_path"), F.col("hop_char")).alias(
            "hops_path"
        ),
    )
    from heritrix_spark.functions.surt import url_prep_struct_col

    cands = cands.withColumn("__prep", url_prep_struct_col("url"))
    cands = cands.filter(
        default_scope(
            F.col("url"),
            F.col("hops_path"),
            seed_surt_prefixes,
            cfg,
            surt=F.col("__prep.surt"),
        )
    )
    cands = (
        cands.withColumn("canon_url", F.col("__prep.canon_url"))
        .withColumn("class_key", F.col("__prep.class_key"))
        .drop("__prep")
        .withColumn(
            "directive",
            scheduling_directive_col(
                F.col("hops_path"), F.lit(NORMAL).cast("int"), cfg
            ).cast("int"),
        )
        .withColumn("cost", unit_cost_col().cast("int"))
        .withColumn("precedence", cost_uri_precedence_col(F.col("cost")).cast("int"))
    )

    # ---- dedup + ordinals (spec step 5)
    unique = collapse_batch_duplicates(
        cands, key="canon_url", order_cols=("parent_ordinal", "link_seq")
    )
    novel = dedup_candidates(unique, url_seen)
    novel, n_novel = assign_ordinals(
        novel,
        ["parent_ordinal", "link_seq", "canon_url"],
        base=max_ordinal,
        lead_bound=max_ordinal,
    )
    novel = novel.persist()
    new_max_ordinal = max_ordinal + n_novel

    novel_frontier = novel.select(
        "url",
        "canon_url",
        "class_key",
        "directive",
        "precedence",
        "ordinal",
        "cost",
        "hops_path",
        F.col("via"),
        F.lit(0).cast("int").alias("attempts"),
        F.lit(0).cast("int").alias("recrawls"),
    )

    # ---- frontier update: drop emitted, re-enqueue retries, add novel
    emitted_ordinals = fetched.select("ordinal")
    remaining = frontier.join(emitted_ordinals, on="ordinal", how="left_anti")
    retries = (
        fetched.filter(F.col("disposition") == "retry")
        .withColumn("attempts", F.col("attempts") + 1)
        .select(*FRONTIER_COLUMNS)
    )
    frontier_next = (
        remaining.select(*FRONTIER_COLUMNS)
        .unionByName(retries)
        .unionByName(novel_frontier)
    )

    # ---- future rescheduling (spec step 7: recrawl successful seeds)
    reschedulable = (
        (F.col("disposition") == "success")
        & (F.col("hops_path") == "")
        & (F.col("recrawls") < cfg.max_recrawls)
    )
    if cfg.recrawl_interval_ms >= 0:
        to_future = fetched.filter(reschedulable).select(
            "url",
            "canon_url",
            "class_key",
            "directive",
            "precedence",
            "ordinal",
            "cost",
            "hops_path",
            "via",
            F.lit(0).cast("int").alias("attempts"),  # resetForRescheduling :1816
            (F.col("recrawls") + 1).cast("int").alias("recrawls"),
            (F.lit(now) + F.lit(cfg.recrawl_interval_ms)).cast("long").alias(
                "reschedule_time"
            ),
        )
        if futures_next is not None:
            futures_next = futures_next.unionByName(to_future)
        else:
            futures_next = to_future

    # ---- host/budget update (spec step 6)
    delay_expr = (
        F.when(
            F.col("disposition").isin("success", "failure"),
            politeness_delay_col(F.col("fetch_duration_ms"), F.col("crawl_delay"), cfg),
        )
        .when(F.col("disposition") == "retry", F.lit(cfg.retry_delay_s * 1000))
        .otherwise(F.lit(0))
        .cast("long")
    )
    host_updates = fetched.select(
        "class_key",
        expenditure_col(
            F.col("disposition"), F.col("cost"), F.col("fetch_status"), cfg
        ).alias("expend"),
        (F.lit(now) + delay_expr).cast("long").alias("new_wake"),
        delay_expr.alias("politeness_delay_ms"),
        F.when(F.col("disposition") == "success", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("succ_inc"),
    )
    updated = (
        host_state.join(
            host_updates.select("class_key", "expend", "new_wake", "succ_inc"),
            on="class_key",
            how="left",
        )
        .select(
            "class_key",
            F.coalesce(F.col("new_wake"), F.col("wake_time")).alias("wake_time"),
            (F.col("total_expenditure") + F.coalesce(F.col("expend"), F.lit(0))).alias(
                "total_expenditure"
            ),
            (F.col("succeeded") + F.coalesce(F.col("succ_inc"), F.lit(0))).alias(
                "succeeded"
            ),
            F.col("retired"),
        )
        .withColumn(
            "retired",
            F.col("retired")
            | (
                F.lit(cfg.total_budget >= 0)
                & (F.col("total_expenditure") > F.lit(cfg.total_budget))
            ),
        )
    )
    new_hosts = (
        novel_frontier.select("class_key")
        .distinct()
        .join(host_state.select("class_key"), on="class_key", how="left_anti")
        .select(
            "class_key",
            F.lit(0).cast("long").alias("wake_time"),
            F.lit(0).cast("long").alias("total_expenditure"),
            F.lit(0).cast("long").alias("succeeded"),
            F.lit(False).alias("retired"),
        )
    )
    host_state_next = updated.unionByName(new_hosts)

    # ---- outputs: seen delta, fetch log, lineage, metrics
    url_seen_delta = novel.select(
        "canon_url", shard_col("canon_url", cfg.n_seen_shards).alias("shard")
    )
    fetch_log = (
        fetched.join(
            host_updates.select("class_key", "politeness_delay_ms"),
            on="class_key",
            how="left",
        )
        .select(
            F.lit(round_no).alias("round"),
            F.lit(now).cast("long").alias("now_ms"),
            "class_key",
            "url",
            "canon_url",
            "ordinal",
            "directive",
            "precedence",
            "fetch_status",
            "disposition",
            "cost",
            F.coalesce(F.col("politeness_delay_ms"), F.lit(0)).alias(
                "politeness_delay_ms"
            ),
            "hops_path",
            "via",
        )
    )
    lineage = (
        fetched.select(
            F.lit(round_no).alias("round"),
            F.lit("Fe").alias("tag"),
            "canon_url",
            "class_key",
            F.spark_partition_id().alias("partition_id"),
        )
        .unionByName(
            fetched.select(
                F.lit(round_no).alias("round"),
                F.when(F.col("disposition") == "success", F.lit("Fs"))
                .when(F.col("disposition") == "disregard", F.lit("Fd"))
                .when(F.col("disposition") == "retry", F.lit("Fr"))
                .otherwise(F.lit("Ff"))
                .alias("tag"),
                "canon_url",
                "class_key",
                F.spark_partition_id().alias("partition_id"),
            )
        )
        .unionByName(
            novel.select(
                F.lit(round_no).alias("round"),
                F.lit("F+").alias("tag"),
                "canon_url",
                "class_key",
                F.spark_partition_id().alias("partition_id"),
            )
        )
    )

    def _n(d: str):
        return F.sum((F.col("disposition") == d).cast("long"))

    mrow = fetched.agg(
        F.count("*").alias("emitted"),
        _n("success").alias("succeeded"),
        _n("failure").alias("failed"),
        _n("disregard").alias("disregarded"),
        _n("retry").alias("retried"),
        F.sum(reschedulable.cast("long")).alias("rescheduled"),
    ).first()
    metrics = {
        "round": round_no,
        "now_ms": now,
        "emitted": int(mrow["emitted"] or 0),
        "succeeded": int(mrow["succeeded"] or 0),
        "failed": int(mrow["failed"] or 0),
        "disregarded": int(mrow["disregarded"] or 0),
        "retried": int(mrow["retried"] or 0),
        "novel_scheduled": int(n_novel),
        "max_ordinal": int(new_max_ordinal),
        "rescheduled": int(mrow["rescheduled"] or 0)
        if cfg.recrawl_interval_ms >= 0
        else 0,
    }
    return RoundResult(
        done=False,
        now_ms=now,
        max_ordinal=new_max_ordinal,
        frontier=frontier_next,
        host_state=host_state_next,
        url_seen_delta=url_seen_delta,
        fetch_log=fetch_log,
        lineage=lineage,
        metrics=metrics,
        future_uris=futures_next,
    )
