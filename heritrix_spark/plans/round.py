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
from heritrix_spark.functions.colcache import cached
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
    "deferrals",
    "recrawls",
    # seed-of-origin attribution (SeedModule.sourceTagSeeds,
    # modules/.../seeds/SeedModule.java:40-46): heritable — every child
    # candidate copies its parent's value (CrawlURI.setSourceTag
    # :1503-1505 makeHeritable). Null when cfg.source_tag_seeds is off.
    "source",
    # CrawlURI.isSeed: true for scheduled seeds AND redirect-promoted
    # discovered seeds (CandidatesProcessor.checkForSeedPromotion
    # :218-237 under cfg.seeds_redirect_new_seeds)
    "is_seed",
]

HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("class_key", T.StringType()),
        T.StructField("wake_time", T.LongType()),
        T.StructField("total_expenditure", T.LongType()),
        T.StructField("succeeded", T.LongType()),
        T.StructField("retired", T.BooleanType()),
        # epoch-ms of the host's last robots.txt fetch, -1 = never
        # (CrawlServer.robotsFetched, modules/.../net/CrawlServer.java:62-70)
        T.StructField("robots_fetched", T.LongType()),
        # session budget ("duty cycle", WorkQueueFrontier.java:119-127):
        # expenditure since last activation; > session_budget → the queue
        # deactivates (WorkQueue.isOverSessionBudget :260-264) — spent
        # resets and the host moves to the back of the activation line
        T.StructField("session_spent", T.LongType()),
        # FIFO position in the inactive line (round number at which the
        # host last entered it); activation order = (queue precedence,
        # activation_seq, class_key) — the per-precedence FIFO of
        # getInactiveQueuesForPrecedence (WorkQueueFrontier.java:485-496)
        # at round granularity
        T.StructField("activation_seq", T.LongType()),
    ]
)

# canon form of a host's robots.txt URI (robots special-casing,
# PreconditionEnforcer.java:206-214 isRobotsTxt check)
ROBOTS_URI_PATTERN = r"^https?://[^/]+/robots\.txt$"

# Per-host sheet-overlay columns (KeyedProperties analog — the reference
# overlays politeness/budget settings per SURT via Spring sheets,
# commons/.../spring/Sheet.java + profile-crawler-beans.cxml:218-383).
# A ``host_config(class_key, <subset of these>)`` dimension broadcast-
# joins into the round; null (or absent host) falls through to the
# global cfg, like an overlay falling through to the containing sheet.
# Covered properties: politeness delay (delay_factor/min/max —
# DispositionProcessor), budgets (WorkQueue), retry policy
# (retryDelaySeconds/maxRetries — AbstractFrontier.java:104,116) and
# the per-document outlink cap (maxOutlinks — AbstractFrontier.java:138).
# The scope hop cap (TooManyHopsDecideRule maxHops) overlays on the
# CANDIDATE side via a ``max_hops`` column, keyed by the candidate's
# own queue key (see run_round).
OVERLAY_COLS = (
    "delay_factor",
    "min_delay_ms",
    "max_delay_ms",
    "total_budget",
    "session_budget",
    "retry_delay_s",
    "max_retries",
    "max_outlinks",
)


def _overlay(df: DataFrame, host_config: DataFrame | None) -> DataFrame:
    """Left-broadcast-join ``__o_<col>`` overlay columns (all-null when
    no host_config table is configured)."""
    if host_config is None:
        for c in OVERLAY_COLS:
            df = df.withColumn(f"__o_{c}", F.lit(None).cast("double"))
        return df
    sel = [F.col("class_key")]
    for c in OVERLAY_COLS:
        if c in host_config.columns:
            sel.append(F.col(c).cast("double").alias(f"__o_{c}"))
    ov = host_config.select(*sel)
    df = df.join(F.broadcast(ov), on="class_key", how="left")
    for c in OVERLAY_COLS:
        if f"__o_{c}" not in df.columns:
            df = df.withColumn(f"__o_{c}", F.lit(None).cast("double"))
    return df


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
    # lazy 1-row aggregate over the (persisted) fetched set: crawl()
    # collects it CONCURRENTLY with the round's write jobs instead of
    # paying a serial driver action before the writes start; merge with
    # `metrics` (the statically-known fields) via finalize_metrics()
    metrics_agg: DataFrame | None = None
    future_uris: DataFrame | None = None
    # delta-store protocol (O(delta) per-round writes — the Iceberg
    # MERGE shape; the reference's BdbMultipleWorkQueues mutates its
    # B-tree in place and never rewrites all pending URIs,
    # heritrix3/engine/.../frontier/BdbMultipleWorkQueues.java:425-441):
    # rows to APPEND to the frontier this round...
    frontier_delta: DataFrame | None = None
    # ...and the ordinals REMOVED this round (positional-delete analog);
    # a reader resolves `live = deltas anti tombstones-newer-than-row`.
    emitted_ordinals: DataFrame | None = None


def finalize_metrics(base: dict, row) -> dict:
    """Merge the statically-known metric fields with the collected
    1-row ``metrics_agg`` result."""
    out = dict(base)
    for k in (
        "emitted",
        "succeeded",
        "failed",
        "disregarded",
        "retried",
        "rescheduled",
    ):
        out[k] = int(row[k] or 0)
    return out


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
        F.lit(0).cast("int").alias("deferrals"),
        F.lit(0).cast("int").alias("recrawls"),
        # a seed's source tag is its own URI string (TextSeedModule
        # .announceSeeds :181, curi.setSourceTag(curi.toString()))
        (
            F.col("url") if cfg.source_tag_seeds else F.lit(None).cast("string")
        ).alias("source"),
        F.lit(True).alias("is_seed"),
        # round this row version was appended in — the positional-delete
        # key half; see RoundResult.emitted_ordinals
        F.lit(0).cast("int").alias("delta_round"),
    )
    url_seen = frontier.select(
        "canon_url", shard_col("canon_url", cfg.n_seen_shards).alias("shard")
    )
    host_state = (
        frontier.groupBy("class_key")
        # pending: per-queue item count, maintained incrementally each
        # round (novel + injected - emitted + retried) — the WorkQueue
        # cached-count analog that lets eligibility skip frontier scans
        .agg(F.count("*").cast("long").alias("pending"))
        .select(
            "class_key",
            F.lit(0).cast("long").alias("wake_time"),
            F.lit(0).cast("long").alias("total_expenditure"),
            F.lit(0).cast("long").alias("succeeded"),
            F.lit(False).alias("retired"),
            F.lit(-1).cast("long").alias("robots_fetched"),
            F.lit(0).cast("long").alias("session_spent"),
            F.lit(0).cast("long").alias("activation_seq"),
            "pending",
        )
    )
    return frontier, url_seen, host_state, n


def eligible_queues(
    frontier: DataFrame,
    host_state: DataFrame,
    cfg: PolitenessConfig,
    extra_pending: DataFrame | None = None,
) -> DataFrame:
    """Non-retired queues with ≥1 pending URI, below the precedence
    floor, with ``__qprec`` (precedence floor:
    WorkQueueFrontier.java:164-170, gating :594,820).

    Scale shape: under the default (``base``) and ``success_counts``
    policies the queue precedence is a function of host_state alone, so
    "has pending URIs" comes from the incrementally-maintained
    ``pending`` counter in host_state (O(hosts), no frontier access) —
    the analog of each BdbWorkQueue's cached item count
    (WorkQueue.java getCount). A 10^10-row frontier is NOT scanned (let
    alone shuffled) per round just to find ready hosts. Only the
    ``highest_uri`` policy, whose precedence derives from the best
    pending URI (HighestUriQueuePrecedencePolicy.java:33-60), aggregates
    the frontier — inherent to that policy's definition.

    ``extra_pending`` (class_key, __extra) adds mid-round injections
    (due future URIs) that the stored counter can't know about yet; the
    ``highest_uri`` caller passes the already-unioned frontier instead."""
    from heritrix_spark.operators.prepare import (
        base_queue_precedence_col,
        highest_uri_queue_precedence_col,
        success_counts_queue_precedence_col,
    )

    hs = host_state.filter(~F.col("retired"))
    if cfg.queue_precedence_policy == "highest_uri":
        queue_stats = frontier.groupBy("class_key").agg(
            F.min("precedence").alias("__min_uri_prec")
        )
        eligible = queue_stats.join(hs, on="class_key", how="inner")
        qprec = cached(
            ("qprec.highest", cfg),
            lambda: highest_uri_queue_precedence_col(F.col("__min_uri_prec"), cfg),
        )
    else:
        pend = F.col("pending")
        if extra_pending is not None:
            hs = hs.join(F.broadcast(extra_pending), on="class_key", how="left")
            pend = pend + F.coalesce(F.col("__extra"), F.lit(0))
        eligible = hs.filter(pend > 0)
        if extra_pending is not None:
            eligible = eligible.drop("__extra")
        if cfg.queue_precedence_policy == "success_counts":
            qprec = cached(
                ("qprec.success", cfg),
                lambda: success_counts_queue_precedence_col(F.col("succeeded"), cfg),
            )
        else:
            qprec = cached(
                ("qprec.base", cfg), lambda: base_queue_precedence_col(cfg)
            )
    return eligible.withColumn("__qprec", qprec.cast("int")).filter(
        F.col("__qprec") < F.lit(cfg.precedence_floor)
    )


def clock_probe(
    frontier: DataFrame | None,
    host_state: DataFrame,
    future_uris: DataFrame | None,
    cfg: PolitenessConfig,
) -> dict:
    """One driver action probing both next-round event sources (frontier
    wake times and futures, checkFutures :731-748): cross-join of two
    single-row aggregates — halves the per-round fixed job overhead.

    Returned as a plain JSON-able dict so ``crawl()`` can compute it at
    the END of round r (concurrently with r's write jobs, over the same
    in-memory state those jobs materialize) and persist it in the round
    manifest: round r+1 then starts with ZERO serial driver actions
    before its write batch. The values are deterministic aggregates of
    committed state, so a resumed process reads the identical probe."""
    eligible = eligible_queues(frontier, host_state, cfg)
    agg_e = eligible.agg(F.min("wake_time").alias("w"), F.count("*").alias("n"))
    if future_uris is not None:
        agg_f = future_uris.agg(
            F.min("reschedule_time").alias("t"), F.count("*").alias("nf")
        )
        row = agg_e.crossJoin(agg_f).first()
        return {
            "w": None if row["w"] is None else int(row["w"]),
            "n": int(row["n"]),
            "t": None if row["t"] is None else int(row["t"]),
            "nf": int(row["nf"]),
        }
    row = agg_e.first()
    return {
        "w": None if row["w"] is None else int(row["w"]),
        "n": int(row["n"]),
        "t": None,
        "nf": 0,
    }


def _round_exprs(
    cfg: PolitenessConfig,
    seed_prefixes: tuple[str, ...],
    overlay_scope: bool = False,
) -> dict:
    """The static Column trees of one crawl round, built ONCE per
    (cfg, seed set, overlay flags) and reused by every round
    (functions/colcache.py). ``overlay_scope`` = the host_config
    dimension carries a ``max_hops`` column, so the scope tree reads
    the candidate-side ``__o_max_hops`` overlay.

    The reference wires its processor chain once at crawl launch
    (profile-crawler-beans.cxml); re-building the equivalent Catalyst
    trees every round cost ~8.8k synchronous py4j calls/round — ~40% of
    fixture-round wall (BENCH/PLANS.md cProfile audit). Everything here
    references columns by NAME, so Catalyst re-resolves the same tree
    against each round's plan; the only per-round values (round_no,
    now, max_ordinal) remain fresh literals inside run_round."""
    return cached(
        ("round.exprs", cfg, seed_prefixes, overlay_scope),
        lambda: _build_round_exprs(cfg, seed_prefixes, overlay_scope),
    )


def _build_round_exprs(
    cfg: PolitenessConfig,
    seed_prefixes: tuple[str, ...],
    overlay_scope: bool = False,
) -> dict:
    from heritrix_spark.constants import S_DEFERRED
    from heritrix_spark.functions.hops import extend_hops_path_col
    from heritrix_spark.functions.surt import url_prep_struct_col

    E: dict = {}

    # ---- robots prerequisite gate
    if cfg.robots_prereq:
        is_robots_uri = F.col("canon_url").rlike(ROBOTS_URI_PATTERN)
        stale = F.col("robots_fetched") < 0
        if cfg.robots_validity_ms > 0:
            # robots expiry (CrawlServer.isRobotsExpired :308-323):
            # expired iff fetched + validity < now (strict). __now_ms is
            # the round clock, attached per round in run_round — the
            # only per-round value this cached tree reads as a column.
            stale = stale | (
                F.col("robots_fetched") + F.lit(cfg.robots_validity_ms)
                < F.col("__now_ms")
            )
        defer_cond = stale & ~is_robots_uri
    else:
        is_robots_uri = F.lit(False)
        defer_cond = F.lit(False)
    E["is_robots_uri"] = is_robots_uri

    # ---- head-of-queue pick (narrow min-struct; see run_round comments)
    E["head_agg"] = F.min(
        F.struct(F.col("directive"), F.col("precedence"), F.col("ordinal"))
    ).alias("__head")
    E["act_w_rank"] = F.row_number().over(
        Window.orderBy(F.asc("__qprec"), F.asc("activation_seq"), F.asc("class_key"))
    )

    # ---- fetch simulation columns
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
    is_redirect = (
        F.col("spans").isNotNull()
        & (F.size("spans") > 0)
        & (F.element_at(F.col("spans"), 1)["kind"] == F.lit("redirect"))
    )
    E["fetch_status"] = (
        F.when(defer_cond, F.lit(S_DEFERRED))
        .when(~F.col("robots_allowed") & ~is_robots_uri, F.lit(S_ROBOTS_PRECLUDED))
        .when(
            F.col("spans").isNotNull() & is_flaky & (F.col("attempts") == 0),
            F.lit(S_CONNECT_FAILED),
        )
        .when(is_redirect, F.lit(301))
        .when(F.col("spans").isNotNull(), F.lit(200))
        .otherwise(F.lit(404))
    )
    E["fetch_duration"] = (
        F.when(F.col("fetch_status") == 200, duration_found)
        .when(F.col("fetch_status") == 301, F.lit(15))
        .when(F.col("fetch_status") == 404, F.lit(25))
        .otherwise(F.lit(0))
        .cast("long")
    )
    # per-host maxRetries overlay: the __o_* columns always exist on the
    # emitted rows (_overlay attaches all-null ones when no host_config)
    E["disposition"] = disposition_col(
        F.col("fetch_status"),
        F.col("attempts"),
        cfg,
        max_retries=F.col("__o_max_retries"),
    )

    # ---- candidates
    child_hops = extend_hops_path_col(F.col("via_hops_path"), F.col("hop_char"))
    if cfg.seeds_redirect_new_seeds:
        # seed promotion (CandidatesProcessor :183-188): a seed's REFER
        # child under 5 hops is itself a seed
        from heritrix_spark.functions.hops import hop_count_col

        promoted = (
            F.col("is_seed")
            & (F.col("hop_char") == "R")
            & (hop_count_col(child_hops) < F.lit(5))
        )
    else:
        promoted = F.lit(False)
    E["cands_sel"] = (
        F.col("target").alias("url"),
        F.col("parent_ordinal"),
        F.col("link_seq"),
        F.col("via"),
        child_hops.alias("hops_path"),
        F.col("source"),  # heritable seed attribution (makeHeritable)
        promoted.alias("is_seed"),
    )
    if cfg.robots_prereq:
        E["prereq_sel"] = (
            F.concat(
                F.regexp_extract(F.col("canon_url"), r"^(https?://[^/]+)", 1),
                F.lit("/robots.txt"),
            ).alias("url"),
            F.col("ordinal").alias("parent_ordinal"),
            F.lit(-1).cast("long").alias("link_seq"),
            F.col("canon_url").alias("via"),
            extend_hops_path_col(F.col("hops_path"), F.lit("P")).alias("hops_path"),
            F.col("source"),  # prerequisites inherit heritable data too
            F.lit(False).alias("is_seed"),
            F.greatest(F.col("directive") - 1, F.lit(0))
            .cast("int")
            .alias("__directive_override"),
            F.lit(True).alias("force_fetch"),
        )
    # URL-prep + scope wiring. The prep struct carries the SURT string;
    # past the OR-chain threshold the prefix rule becomes the bisect
    # membership kernel over it (scope.surt_prefix_member_col — a
    # second, chained Arrow stage). NOTE a fused variant (bisect inside
    # the prep UDF, no SURT across Arrow, one Python stage) measured
    # ~30% FASTER in isolation but reliably ~80% slower inside the full
    # loop (unexplained JVM-side cost inflation, not GC — A/B'd both
    # ways at the 10^7 soak, see BENCH/LOOP_SCALE.md round-5 notes), so
    # the two-stage shape is deliberate.
    E["prep_col"] = url_prep_struct_col("url")
    E["scope_filter"] = default_scope(
        F.col("url"),
        F.col("hops_path"),
        list(seed_prefixes),
        cfg,
        surt=F.col("__prep.surt"),
        max_hops_col=F.col("__o_max_hops") if overlay_scope else None,
    )
    directive_plain = scheduling_directive_col(
        F.col("hops_path"), F.lit(NORMAL).cast("int"), cfg
    )
    if cfg.seeds_redirect_new_seeds:
        # promoted seeds need rapid scheduling: NORMAL → MEDIUM
        # (checkForSeedPromotion :230-233)
        from heritrix_spark.constants import MEDIUM

        directive_plain = F.when(
            F.col("is_seed") & (directive_plain == F.lit(NORMAL)), F.lit(MEDIUM)
        ).otherwise(directive_plain)
    E["directive_col"] = (
        F.coalesce(F.col("__directive_override"), directive_plain)
        if cfg.robots_prereq
        else directive_plain
    ).cast("int")
    E["cost_col"] = unit_cost_col().cast("int")
    E["precedence_col"] = cost_uri_precedence_col(F.col("cost")).cast("int")

    # ---- frontier maintenance
    E["novel_sel"] = (
        F.col("url"),
        F.col("canon_url"),
        F.col("class_key"),
        F.col("directive"),
        F.col("precedence"),
        F.col("ordinal"),
        F.col("cost"),
        F.col("hops_path"),
        F.col("via"),
        F.lit(0).cast("int").alias("attempts"),
        F.lit(0).cast("int").alias("deferrals"),
        F.lit(0).cast("int").alias("recrawls"),
        F.col("source"),
        F.col("is_seed"),
    )
    E["retry_attempts"] = F.when(
        F.col("fetch_status") == S_DEFERRED, F.col("attempts")
    ).otherwise(F.col("attempts") + 1)
    E["retry_deferrals"] = F.when(
        F.col("fetch_status") == S_DEFERRED, F.col("deferrals") + 1
    ).otherwise(F.col("deferrals"))
    E["reschedulable"] = (
        (F.col("disposition") == "success")
        & (F.col("hops_path") == "")
        & (F.col("recrawls") < cfg.max_recrawls)
    )

    # ---- host/budget update
    delay_expr = (
        F.when(
            F.col("disposition").isin("success", "failure"),
            politeness_delay_col(
                F.col("fetch_duration_ms"),
                F.col("crawl_delay"),
                cfg,
                delay_factor=F.col("__o_delay_factor"),
                min_delay_ms=F.col("__o_min_delay_ms"),
                max_delay_ms=F.col("__o_max_delay_ms"),
            ),
        )
        .when(
            F.col("disposition") == "retry",
            F.when(F.col("fetch_status") == S_DEFERRED, F.lit(0)).otherwise(
                # per-host retryDelaySeconds overlay
                (
                    F.coalesce(
                        F.col("__o_retry_delay_s"),
                        F.lit(float(cfg.retry_delay_s)),
                    )
                    * 1000
                ).cast("long")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    E["delay_expr"] = delay_expr
    if cfg.max_per_host_kb_sec > 0:
        content_bytes = F.coalesce(
            F.aggregate(
                F.col("spans"),
                F.lit(0).cast("long"),
                lambda acc, s: acc
                + F.length(F.coalesce(s["text"], F.lit("")))
                + F.length(F.coalesce(s["media_ref"], F.lit(""))),
            ),
            F.lit(0).cast("long"),
        )
        bw_ms = F.when(
            F.col("fetch_status").isin(200, 301),
            F.floor(content_bytes * 1000 / F.lit(cfg.max_per_host_kb_sec * 1024)),
        ).otherwise(F.lit(0)).cast("long")
        E["wake_delay"] = F.greatest(delay_expr, bw_ms)
    else:
        E["wake_delay"] = delay_expr
    E["expend"] = expenditure_col(
        F.col("disposition"), F.col("cost"), F.col("fetch_status"), cfg
    ).alias("expend")
    E["succ_inc"] = (
        F.when(F.col("disposition") == "success", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("succ_inc")
    )
    E["pending_delta"] = (
        F.when(F.col("disposition") == "retry", F.lit(0))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("pending_delta")
    )
    E["updated_sel"] = (
        F.col("class_key"),
        (
            F.col("pending")
            + F.coalesce(F.col("__novel_cnt"), F.lit(0))
            + F.coalesce(F.col("__extra"), F.lit(0))
            + F.coalesce(F.col("pending_delta"), F.lit(0))
        ).alias("pending"),
        F.coalesce(F.col("new_wake"), F.col("wake_time")).alias("wake_time"),
        (F.col("total_expenditure") + F.coalesce(F.col("expend"), F.lit(0))).alias(
            "total_expenditure"
        ),
        (F.col("succeeded") + F.coalesce(F.col("succ_inc"), F.lit(0))).alias(
            "succeeded"
        ),
        F.col("retired"),
        F.coalesce(F.col("new_robots_fetched"), F.col("robots_fetched")).alias(
            "robots_fetched"
        ),
        (F.col("session_spent") + F.coalesce(F.col("expend"), F.lit(0))).alias(
            "session_spent"
        ),
        F.col("activation_seq"),
        F.coalesce(F.col("__o_total_budget"), F.lit(float(cfg.total_budget)))
        .alias("__eff_tb"),
        F.coalesce(F.col("__o_session_budget"), F.lit(float(cfg.session_budget)))
        .alias("__eff_sb"),
    )
    E["retired_col"] = F.col("retired") | (
        (F.col("__eff_tb") >= 0)
        & (F.col("total_expenditure") > F.col("__eff_tb"))
    )
    E["over_session"] = F.col("session_spent") > F.col("__eff_sb")
    E["session_spent_col"] = F.when(F.col("__over_session"), F.lit(0)).otherwise(
        F.col("session_spent")
    )
    E["new_hosts_static"] = (
        F.col("class_key"),
        F.col("__novel_cnt").alias("pending"),
        F.lit(0).cast("long").alias("wake_time"),
        F.lit(0).cast("long").alias("total_expenditure"),
        F.lit(0).cast("long").alias("succeeded"),
        F.lit(False).alias("retired"),
        F.lit(-1).cast("long").alias("robots_fetched"),
        F.lit(0).cast("long").alias("session_spent"),
    )

    # ---- outputs
    E["seen_shard"] = shard_col("canon_url", cfg.n_seen_shards).alias("shard")
    E["fetch_log_tail"] = (
        F.col("class_key"),
        F.col("url"),
        F.col("canon_url"),
        F.col("ordinal"),
        F.col("directive"),
        F.col("precedence"),
        F.col("fetch_status"),
        F.col("disposition"),
        F.col("cost"),
        F.coalesce(F.col("politeness_delay_ms"), F.lit(0)).alias(
            "politeness_delay_ms"
        ),
        F.col("hops_path"),
        F.col("via"),
        F.col("source"),
        F.col("is_seed"),
    )
    E["lineage_tag_disp"] = (
        F.when(F.col("disposition") == "success", F.lit("Fs"))
        .when(F.col("disposition") == "disregard", F.lit("Fd"))
        .when(F.col("disposition") == "retry", F.lit("Fr"))
        .otherwise(F.lit("Ff"))
        .alias("tag")
    )
    E["partition_id"] = F.spark_partition_id().alias("partition_id")

    def _n(d: str):
        return F.sum((F.col("disposition") == d).cast("long"))

    E["metrics_aggs"] = (
        F.count("*").alias("emitted"),
        _n("success").alias("succeeded"),
        _n("failure").alias("failed"),
        _n("disregard").alias("disregarded"),
        _n("retry").alias("retried"),
        (
            F.sum(E["reschedulable"].cast("long"))
            if cfg.recrawl_interval_ms >= 0
            else F.lit(0).cast("long")
        ).alias("rescheduled"),
    )
    return E


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
    seen_blooms: DataFrame | None = None,
    seen_cuckoo: DataFrame | None = None,
    host_config: DataFrame | None = None,
    probe: dict | None = None,
) -> RoundResult:
    # ---- clock + ready-host selection (spec step 1); ``probe`` is the
    # previous round's precomputed event aggregate (see clock_probe)
    if probe is None:
        probe = clock_probe(frontier, host_state, future_uris, cfg)
    fut_row = (
        {"t": probe["t"], "n": probe["nf"]} if future_uris is not None else None
    )
    have_frontier = probe["n"] > 0
    have_futures = fut_row is not None and fut_row["n"] > 0
    if not have_frontier and not have_futures:
        return RoundResult(done=True, now_ms=now_prev, max_ordinal=max_ordinal)
    events = []
    if have_frontier:
        events.append(int(probe["w"]))
    if have_futures:
        events.append(int(fut_row["t"]))
    now = max(now_prev, min(events))
    # lazy plan only — the probe above was the round's single pre-write
    # driver action (or zero when precomputed by the previous round)
    eligible = eligible_queues(frontier, host_state, cfg)

    # re-inject due futures (attempts already reset at scheduling time)
    injected_futures = None
    injected_counts = None
    futures_next = future_uris
    if have_futures and int(fut_row["t"]) <= now:
        injected_futures = (
            future_uris.filter(F.col("reschedule_time") <= F.lit(now))
            .select(*FRONTIER_COLUMNS)
            .withColumn("delta_round", F.lit(round_no).cast("int"))
        )
        injected_counts = injected_futures.groupBy("class_key").agg(
            F.count("*").cast("long").alias("__extra")
        )
        futures_next = future_uris.filter(F.col("reschedule_time") > F.lit(now))
        frontier = frontier.unionByName(injected_futures)
        # recompute eligibility for hosts that only have future rows
        eligible = eligible_queues(
            frontier, host_state, cfg, extra_pending=injected_counts
        )

    # static expression templates, built once per crawl (colcache)
    overlay_scope = (
        host_config is not None and "max_hops" in host_config.columns
    )
    E = _round_exprs(cfg, tuple(seed_surt_prefixes), overlay_scope)
    ready = eligible.filter(F.col("wake_time") <= F.lit(now))
    if cfg.max_hosts_per_round > 0:
        # precedence-ordered activation: best (lowest) queue precedence
        # first, then FIFO inactive order (activation_seq — hosts that
        # rotated out over session budget go to the back), class_key
        # tiebreak (activateInactiveQueue :753-786)
        ready = (
            ready.withColumn("__arank", E["act_w_rank"])
            .filter(F.col("__arank") <= cfg.max_hosts_per_round)
            .drop("__arank")
        )
    # head-of-queue pick, ready hosts only. Three scale-critical physical
    # choices vs the naive "window-rank the whole frontier then join":
    # 1. the broadcast semi-join with ready_hosts comes FIRST, so the
    #    head-pick only touches the ready hosts' pending rows (partition
    #    pruning by host), never the full 10^10-row frontier;
    # 2. the pick itself is min(struct(directive, precedence, ordinal))
    #    — the BdbMultipleWorkQueues insert-key order (:425-441) as a
    #    lexicographic struct-min. A hash aggregate partially combines
    #    map-side (one candidate head per host per input partition
    #    crosses the shuffle); a row_number window must shuffle every
    #    row first. Ordinal is unique per host, so the min is a unique
    #    winner — deterministic;
    # 3. the aggregate shuffles ONLY the three ordering columns +
    #    class_key (a few dozen bytes/row); the winners' full payload
    #    rows come from a broadcast semi-join back on ordinal (unique
    #    across the live frontier — the same invariant the tombstone
    #    anti-join relies on). Shuffling the whole row through the
    #    min-struct measured 2.28 GB/round at the 10^7-candidate soak
    #    (~7x the narrow shuffle) and forced a full-width SortAggregate;
    #    the picked-ordinal broadcast is one long per ready host.
    ready_hosts = ready.select("class_key", "robots_fetched")
    pick = (
        frontier.join(
            F.broadcast(ready_hosts.select("class_key")),
            on="class_key",
            how="leftsemi",
        )
        .groupBy("class_key")
        .agg(E["head_agg"])
        .select(F.col("__head.ordinal").alias("ordinal"))
    )
    emitted = frontier.join(
        F.broadcast(pick), on="ordinal", how="leftsemi"
    ).join(F.broadcast(ready_hosts), on="class_key", how="inner")
    # per-host sheet overlays attach HERE (O(ready hosts) rows, one
    # broadcast join) so the __o_* columns ride the checkpoint and are
    # visible to disposition/retry/delay/extraction alike
    emitted = _overlay(emitted, host_config)

    # ---- fetch (spec step 2): robots gate + docs join
    emitted = join_robots(emitted, robots)  # adds robots_allowed, crawl_delay
    # robots prerequisite chain (PreconditionEnforcer.considerRobotsPreconditions
    # :203-245): with robots never fetched, a non-robots emission defers
    # (S_DEFERRED) and force-schedules http://host/robots.txt with hop 'P';
    # the robots URI itself is exempt from deferral and preclusion.
    # (fetch_status / duration / disposition trees live in
    # _build_round_exprs; a doc whose first span is kind='redirect'
    # models a 301 whose Location is that span's media_ref.)
    is_robots_uri = E["is_robots_uri"]
    from heritrix_spark.constants import S_DEFERRED

    # The docs "fetch" join prefilters the docs side with an explicit
    # broadcast semi-join on the picked canon_urls (a second NARROW
    # frontier scan reusing the broadcast pick). Only the scheduled
    # rows' documents ever reach the join's exchange — without this the
    # left-outer SMJ shuffles the ENTIRE docs table every round
    # (measured 2.28 GB/round at the 10^7 soak whenever Catalyst's
    # runtime bloom-filter declined to inject, which depends on fragile
    # size estimates). This is also the production shape: a round
    # fetches what it scheduled, never the whole corpus.
    picked_keys = (
        frontier.select("ordinal", "canon_url")
        .join(F.broadcast(pick), on="ordinal", how="leftsemi")
        .select(F.col("canon_url").alias("doc_id"))
    )
    docs_sel = docs.select(F.col("doc_id"), F.col("spans")).join(
        F.broadcast(picked_keys), on="doc_id", how="leftsemi"
    )
    fetched = emitted.join(
        docs_sel, on=emitted["canon_url"] == docs_sel["doc_id"], how="left"
    ).drop("doc_id")
    if cfg.robots_prereq and cfg.robots_validity_ms > 0:
        # the round clock, read by the cached defer_cond tree
        fetched = fetched.withColumn("__now_ms", F.lit(now).cast("long"))
    fetched = (
        fetched.withColumn("fetch_status", E["fetch_status"])
        .withColumn("fetch_duration_ms", E["fetch_duration"])
        .withColumn("disposition", E["disposition"])
    )
    # Eager localCheckpoint, not persist(): persist caches the DATA but
    # every downstream action still re-analyzes the full logical plan —
    # and a round's plan embeds the (large) canonicalization/SURT
    # expression trees, so with ~8 independent write jobs per round the
    # driver re-analyzed the whole round plan 8×. Checkpointing truncates
    # the plan to a LogicalRDD, making every derived write job's analysis
    # O(columns). Crash-safety is unchanged: a lost executor voids the
    # round, and the round is idempotent from the last committed manifest
    # (the same story as a mid-round kill, tests/test_resume.py).
    fetched = fetched.localCheckpoint(eager=True)

    # ---- extraction (spec step 3) + candidates (spec step 4)
    extractable = (
        fetched.filter(~F.col("canon_url").rlike(ROBOTS_URI_PATTERN))
        if cfg.robots_prereq
        else fetched
    )
    links = extract_outlinks(
        extractable,
        max_outlinks=cfg.max_outlinks,
        url_col="canon_url",
        carry_cols=("source", "is_seed"),
        max_outlinks_col="__o_max_outlinks",
    )
    cands = links.select(*E["cands_sel"])
    if cfg.robots_prereq:
        # prerequisite candidates (CrawlURI.markPrerequisite :1875-1896):
        # one per deferred emission, link_seq = -1 so the prereq sorts
        # ahead of the parent's real outlinks under the ordinal law;
        # directive = max(parent - 1, HIGHEST); forceFetch bypasses the
        # seen check (UriUniqFilter.addForce). Routed to the via's queue
        # (getPolicyBasisUURI :1731-1742) — same authority, same class_key.
        prereq_cands = fetched.filter(F.col("fetch_status") == S_DEFERRED).select(
            *E["prereq_sel"]
        )
        cands = cands.withColumn(
            "__directive_override", F.lit(None).cast("int")
        ).withColumn("force_fetch", F.lit(False)).unionByName(prereq_cands)
    if cfg.seeds_redirect_new_seeds:
        # promoted seeds force-fetch past the seen set (HER-1891,
        # CandidatesProcessor :190-198 setForceFetch before addSeed)
        base_force = (
            F.col("force_fetch") if cfg.robots_prereq else F.lit(False)
        )
        cands = cands.withColumn("force_fetch", base_force | F.col("is_seed"))
    cands = cands.withColumn("__prep", E["prep_col"])
    if overlay_scope:
        # scope-parameter overlay (TooManyHops maxHops) keys on the
        # CANDIDATE's own queue key — the reference resolves sheet
        # overlays by the SURT of the URI being decided, not its parent
        ov_scope = host_config.select(
            F.col("class_key").alias("__sck"),
            F.col("max_hops").cast("double").alias("__o_max_hops"),
        )
        cands = cands.join(
            F.broadcast(ov_scope),
            on=cands["__prep.class_key"] == ov_scope["__sck"],
            how="left",
        ).drop("__sck")
    cands = cands.filter(E["scope_filter"])
    if overlay_scope:
        cands = cands.drop("__o_max_hops")
    cands = (
        cands.withColumn("canon_url", F.col("__prep.canon_url"))
        .withColumn("class_key", F.col("__prep.class_key"))
        .drop("__prep")
        .withColumn("directive", E["directive_col"])
        .withColumn("cost", E["cost_col"])
        .withColumn("precedence", E["precedence_col"])
    )
    if cfg.robots_prereq:
        cands = cands.drop("__directive_override")

    # ---- dedup + ordinals (spec step 5)
    # The collapse groups by (shard, canon_url) — identical grouping
    # (shard is a pure function of canon_url) but its output exchange
    # and sort order already match the seen anti-join's keys, so the
    # candidate batch crosses ONE shuffle for collapse + membership
    # instead of two (see collapse_batch_duplicates).
    cands = cands.withColumn("shard", E["seen_shard"])
    unique = collapse_batch_duplicates(
        cands,
        key=("shard", "canon_url"),
        order_cols=("parent_ordinal", "link_seq"),
    )
    if cfg.seen_bloom_bits > 0 and seen_blooms is not None:
        # bloom prefilter (BloomUriUniqFilter analog): definite misses
        # bypass the exact anti-join; membership unchanged by design
        from heritrix_spark.operators.bloomseen import dedup_candidates_bloom

        novel = dedup_candidates_bloom(
            unique,
            url_seen,
            seen_blooms,
            n_shards=cfg.n_seen_shards,
            bits=cfg.seen_bloom_bits,
        )
    elif cfg.seen_cuckoo_buckets > 0 and seen_cuckoo is not None:
        # cuckoo prefilter: same accuracy law, plus deletion support
        # (forget appends -1 deltas; the crawl loop itself only adds)
        from heritrix_spark.operators.cuckooseen import dedup_candidates_cuckoo

        novel = dedup_candidates_cuckoo(
            unique,
            url_seen,
            seen_cuckoo,
            n_shards=cfg.n_seen_shards,
            buckets=cfg.seen_cuckoo_buckets,
        )
    else:
        novel = dedup_candidates(unique, url_seen, n_shards=cfg.n_seen_shards)
    # defer_count: ordinal offsets become a lazy cumulative-sum window
    # broadcast-joined back (no per-round driver collect — the event-log
    # audit showed that collect was ~15 AQE sub-jobs/round, the largest
    # driver action after the write pool). The single materialization is
    # the eager checkpoint below; the batch count then comes from a
    # trivial count() over the already-checkpointed partitions.
    novel, _ = assign_ordinals(
        novel,
        ["parent_ordinal", "link_seq", "canon_url"],
        base=max_ordinal,
        lead_bound=max_ordinal,
        defer_count=True,
    )
    novel = novel.localCheckpoint(eager=True)  # same plan-truncation law as fetched
    n_novel = novel.count()  # reads the checkpointed RDD, no recompute
    new_max_ordinal = max_ordinal + n_novel

    novel_frontier = novel.select(
        *E["novel_sel"], F.lit(round_no).cast("int").alias("delta_round")
    )

    # ---- frontier update: drop emitted, re-enqueue retries, add novel
    # (deferrals count separately from fetch attempts: the precondition
    # defer happens before any fetch — CrawlURI.incrementDeferrals vs
    # fetchAttempts, CrawlURI.java:173-174)
    # tombstones carry (ordinal, delta_round): each emitted row's exact
    # stored version — the Iceberg positional-delete key
    emitted_ordinals = fetched.select("ordinal", "delta_round")
    # broadcast: one (ordinal, delta_round) pair per emitted row — the
    # full-frontier side must not shuffle just to drop them (same
    # reasoning as live_frontier's tombstone broadcast)
    remaining = frontier.join(
        F.broadcast(emitted_ordinals), on="ordinal", how="left_anti"
    )
    retries = (
        fetched.filter(F.col("disposition") == "retry")
        .withColumn("attempts", E["retry_attempts"])
        .withColumn("deferrals", E["retry_deferrals"])
        .select(*FRONTIER_COLUMNS)
        .withColumn("delta_round", F.lit(round_no).cast("int"))
    )
    frontier_next = (
        remaining.select(*FRONTIER_COLUMNS, "delta_round")
        .unionByName(retries)
        .unionByName(novel_frontier)
    )
    # delta protocol outputs: only rows that CHANGED this round. Injected
    # futures that weren't emitted must be appended too — they came from
    # the future_uris table, not the stored frontier deltas.
    frontier_delta = retries.unionByName(novel_frontier)
    if injected_futures is not None:
        frontier_delta = frontier_delta.unionByName(
            injected_futures.join(
                F.broadcast(emitted_ordinals), on="ordinal", how="left_anti"
            )
        )

    # ---- future rescheduling (spec step 7: recrawl successful seeds)
    reschedulable = E["reschedulable"]
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
            F.lit(0).cast("int").alias("deferrals"),
            (F.col("recrawls") + 1).cast("int").alias("recrawls"),
            F.col("source"),
            F.col("is_seed"),
            (F.lit(now) + F.lit(cfg.recrawl_interval_ms)).cast("long").alias(
                "reschedule_time"
            ),
        )
        if futures_next is not None:
            futures_next = futures_next.unionByName(to_future)
        else:
            futures_next = to_future

    # ---- host/budget update (spec step 6)
    # per-host sheet overlays were joined onto emitted (pre-checkpoint);
    # nulls fall back to global cfg inside each formula
    # (delay/bandwidth/expenditure trees live in _build_round_exprs:
    # retryDelayFor :836-841 — S_DEFERRED re-enqueues without snoozing;
    # bandwidth throttle DispositionProcessor.java:263-290, effective
    # wake = max(politeness wake, now + bytes*1000/(kb*1024)), integer
    # division keeps engine and oracle bit-identical.)
    host_updates = fetched.select(
        "class_key",
        F.col("__o_total_budget"),
        F.col("__o_session_budget"),
        E["expend"],
        (F.lit(now) + E["wake_delay"]).cast("long").alias("new_wake"),
        E["delay_expr"].alias("politeness_delay_ms"),
        E["succ_inc"],
        # any completed robots.txt fetch stamps the host (CrawlServer.updateRobots
        # :138 — a 404 means allow-all but still counts as fetched)
        F.when(
            is_robots_uri & (F.col("fetch_status") != S_DEFERRED), F.lit(now)
        )
        .cast("long")
        .alias("new_robots_fetched"),
        # queue item-count delta from this emission: a retry (incl.
        # deferral) re-enqueues the row, anything else leaves for good
        E["pending_delta"],
    )
    # per-queue novel additions (one tiny aggregate over the delta —
    # pending is maintained in O(changed rows), never from the frontier)
    novel_counts = novel.groupBy("class_key").agg(
        F.count("*").cast("long").alias("__novel_cnt")
    )
    updated = (
        host_state.join(
            host_updates.select(
                "class_key",
                "expend",
                "new_wake",
                "succ_inc",
                "new_robots_fetched",
                "pending_delta",
                "__o_total_budget",
                "__o_session_budget",
            ),
            on="class_key",
            how="left",
        )
        .join(novel_counts, on="class_key", how="left")
        .transform(
            lambda d: d.join(injected_counts, on="class_key", how="left")
            if injected_counts is not None
            else d.withColumn("__extra", F.lit(None).cast("long"))
        )
        # effective budgets under per-host overlays: evaluated where
        # expenditure changed (= emitting hosts this round); a
        # non-emitting host's budgets were evaluated the round its
        # expenditure last changed
        .select(*E["updated_sel"])
        .withColumn("retired", E["retired_col"])
        # duty cycle: over session budget → deactivate (reset spent,
        # move to the back of the activation line). With unbounded
        # activation this is observably a no-op (the host re-activates
        # next round regardless), matching unbounded toe threads.
        .withColumn("__over_session", E["over_session"])
        .withColumn("session_spent", E["session_spent_col"])
        .withColumn(
            "activation_seq",
            F.when(F.col("__over_session"), F.lit(round_no).cast("long")).otherwise(
                F.col("activation_seq")
            ),
        )
        .drop("__over_session", "__eff_tb", "__eff_sb")
    )
    new_hosts = (
        novel_counts.join(
            host_state.select("class_key"), on="class_key", how="left_anti"
        )
        .select(
            *E["new_hosts_static"],
            # new hosts join the back of the inactive line this round
            F.lit(round_no).cast("long").alias("activation_seq"),
        )
    )
    host_state_next = updated.unionByName(new_hosts)

    # ---- outputs: seen delta, fetch log, lineage, metrics
    url_seen_delta = novel.select("canon_url", E["seen_shard"])
    if cfg.robots_prereq or cfg.seeds_redirect_new_seeds:
        # forced (addForce) rows may already be members; keep the seen
        # table duplicate-free (the delta is small — one anti-join probe)
        url_seen_delta = url_seen_delta.join(
            url_seen.select("canon_url"), on="canon_url", how="left_anti"
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
            *E["fetch_log_tail"],
        )
    )
    lineage = (
        fetched.select(
            F.lit(round_no).alias("round"),
            F.lit("Fe").alias("tag"),
            "canon_url",
            "class_key",
            E["partition_id"],
        )
        .unionByName(
            fetched.select(
                F.lit(round_no).alias("round"),
                E["lineage_tag_disp"],
                "canon_url",
                "class_key",
                E["partition_id"],
            )
        )
        .unionByName(
            novel.select(
                F.lit(round_no).alias("round"),
                F.lit("F+").alias("tag"),
                "canon_url",
                "class_key",
                E["partition_id"],
            )
        )
    )

    metrics_agg = fetched.agg(*E["metrics_aggs"])
    metrics = {
        "round": round_no,
        "now_ms": now,
        "novel_scheduled": int(n_novel),
        "max_ordinal": int(new_max_ordinal),
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
        metrics_agg=metrics_agg,
        future_uris=futures_next,
        frontier_delta=frontier_delta,
        emitted_ordinals=emitted_ordinals,
    )
