"""Candidate preparation (the reference's FrontierPreparer) + ordinal law.

Reference pipeline (heritrix3/engine/.../prefetch/FrontierPreparer.java:161-179):
for every candidate URI assign, in order: scheduling directive, canonical
form, queue key, cost, precedence. Here each is a pure column expression;
the canonical form / queue key come from ``functions/``.

The **ordinal** (CrawlURI.java:257, 48-bit monotonic discovery serial,
assigned at AbstractFrontier.prepForFrontier :806-810 from a single
atomic counter) is the breadth-first tiebreak of the intra-queue order.
A global atomic counter does not exist on a cluster, so we define the
*deterministic ordinal law* (SURVEY.md §7 step 3):

    within one scheduling batch, novel candidates are numbered
    ``base + rank`` where rank is the dense row number under the total
    order (parent_ordinal, link_seq, canon_url)

— i.e. discovery order = (order the parent was fetched, position of the
link within the parent's spans, canonical URL as final tiebreak). This
reproduces the reference's discovery-order semantics for any fixed
round discretization while being independent of partitioning and
parallelism level. :func:`assign_ordinals` implements the numbering as a
range-partitioned distributed row-number (no single-partition window,
no driver collect of data rows — only one count-per-partition collect),
so it scales to 10^10 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from heritrix_spark.constants import HIGH, MEDIUM, PolitenessConfig
from heritrix_spark.functions.hops import trans_hops_col


def scheduling_directive_col(
    hops_path: Column,
    current_directive: Column,
    cfg: PolitenessConfig = PolitenessConfig(),
) -> Column:
    """FrontierPreparer.getSchedulingDirective (FrontierPreparer.java:188-221).

    - last hop 'R' (redirect) → MEDIUM (HIGH when preferenceDepthHops >= 0)
    - within preferenceDepthHops of a seed → HIGH
    - embed trans-hops in (0, preferenceEmbedHops] and currently NORMAL → MEDIUM
    - else keep current directive.
    """
    last_hop = F.substring(hops_path, -1, 1)
    pd, pe = cfg.preference_depth_hops, cfg.preference_embed_hops
    redirect_case = F.lit(HIGH) if pd >= 0 else F.lit(MEDIUM)
    out = F.when((F.length(hops_path) > 0) & (last_hop == "R"), redirect_case)
    if pd == 0:
        return out.otherwise(F.lit(HIGH))
    if pd > 0:
        out = out.when(F.length(hops_path) + 1 <= pd, F.lit(HIGH))
    if pe > 0:
        th = trans_hops_col(hops_path)
        out = out.when(
            (th > 0) & (th <= pe) & (current_directive == F.lit(3)), F.lit(MEDIUM)
        )
    return out.otherwise(current_directive)


# ------------------------------------------------------------------ cost


def unit_cost_col() -> Column:
    """UnitCostAssignmentPolicy (default): cost = 1 (UnitCostAssignmentPolicy.java:34-37)."""
    return F.lit(1)


def wag_cost_col(canon_url: Column) -> Column:
    """WagCostAssignmentPolicy (WagCostAssignmentPolicy.java:41-64): +1 if
    the URL has a query string (simplified: the same-path-as-via extra
    charge needs the via URL; see :func:`wag_cost_with_via_col`)."""
    return F.lit(1) + F.when(canon_url.contains("?"), F.lit(1)).otherwise(F.lit(0))


def wag_cost_with_via_col(canon_url: Column, via: Column) -> Column:
    """Full Wag policy: +1 for query string, +1 more when the via shares
    the same path-minus-query (a crawler-trap signature)."""
    path = F.regexp_extract(canon_url, r"^[^?]*", 0)
    via_path = F.regexp_extract(via, r"^[^?]*", 0)
    has_q = canon_url.contains("?")
    same_path = has_q & via.isNotNull() & (path == via_path)
    return (
        F.lit(1)
        + F.when(has_q, F.lit(1)).otherwise(F.lit(0))
        + F.when(same_path, F.lit(1)).otherwise(F.lit(0))
    )


CALENDARISH = (
    r"(?i)(calendar)|(\bdate\b)|(\byear\b)|(\bmonth\b)|(\bday\b)"
)


def anti_calendar_cost_col(canon_url: Column) -> Column:
    """AntiCalendarCostAssignmentPolicy (AntiCalendarCostAssignmentPolicy.java:41-58):
    unit cost +1 when the URL looks calendar-generated."""
    return F.lit(1) + F.when(canon_url.rlike(CALENDARISH), F.lit(1)).otherwise(F.lit(0))


# ------------------------------------------------------------ precedence


def cost_uri_precedence_col(cost: Column) -> Column:
    """CostUriPrecedencePolicy (default): precedence = cost
    (CostUriPrecedencePolicy.java:35-37)."""
    return cost


def base_uri_precedence_col(base: int = 1) -> Column:
    return F.lit(base)


def hops_uri_precedence_col(hops_path: Column, base: int = 1) -> Column:
    """HopsUriPrecedencePolicy: base + hop count."""
    from heritrix_spark.functions.hops import hop_count_col

    return F.lit(base) + hop_count_col(hops_path)


# -------------------------------------------------------------- ordinals

# Above this many buckets the per-bucket offset map switches from a
# create_map literal to a broadcast join: a literal of B entries grows
# the plan (and codegen) linearly with cluster size, while a broadcast
# hash probe stays O(1)/row no matter how many buckets a 1000-executor
# round uses.
_OFFSET_MAP_LITERAL_MAX = 256


def _attach_offsets(df: DataFrame, key: str, offsets: dict[int, int]) -> DataFrame:
    """Add ``__offset`` = offsets[key] — literal map while tiny,
    broadcast join when the bucket count grows with cluster size."""
    if len(offsets) <= _OFFSET_MAP_LITERAL_MAX:
        m = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        return df.withColumn("__offset", m[F.col(key)])
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in offsets.items()],
        schema=f"{key} int, __offset long",
    )
    return df.join(F.broadcast(off_df), key, "left")


def assign_ordinals(
    df: DataFrame,
    order_cols: list[str],
    base: int = 0,
    out_col: str = "ordinal",
    num_buckets: int | None = None,
    lead_bound: int | None = None,
    defer_count: bool = False,
) -> tuple[DataFrame, int | None]:
    """Number rows ``base + 1 .. base + n`` along the total order of
    ``order_cols``, without a global single-partition window. Returns
    ``(numbered_df, n)``.

    Fast path (``lead_bound`` given — the non-negative upper bound of
    ``order_cols[0]``, e.g. the current max ordinal for parent_ordinal):
    rows are bucketed by the *computed* monotone bucket
    ``floor(lead * B / (bound+1))`` — one hash shuffle, no range-sampling
    pass — then ranked per bucket with a window and offset by tiny
    per-bucket counts (the only driver-side data: one long per bucket).
    Monotone bucketing preserves the total order across buckets because
    equal leads share a bucket and larger leads never map to a smaller
    bucket.

    Generic path (no bound): range-repartition + sort-within-partitions,
    within-partition position from ``monotonically_increasing_id``
    (``pid << 33 | row_pos`` in plan order), plus per-partition offsets.
    The input is persisted so the range partitioner's sampling job does
    not recompute the upstream chain.

    Either way the result is independent of ``num_buckets`` and input
    partitioning because the order is total (callers include a unique
    final tiebreak column, e.g. canon_url).

    ``defer_count=True`` (fast path only) removes the per-batch driver
    action entirely: bucket offsets become a LAZY cumulative-sum window
    over the per-bucket counts (one row per bucket) broadcast-joined
    back, and the returned count is ``None``. When to use which
    (both directions A/B-measured, BENCH/PLANS.md): the crawl round
    uses defer — its eager ``novel.localCheckpoint`` already provides
    the materialization barrier, so the eager collect's ~15 AQE
    sub-jobs bought nothing and the deferred path drops one
    multi-stage driver action per round. One-shot batch callers
    (the bench headline) keep the eager collect — its literal-map
    offset attach is a pure projection in the same codegen stage,
    whereas the deferred broadcast join serializes a build-side
    materialization before the final stage and measured ~20% slower.
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    if lead_bound is not None:
        lead = F.col(order_cols[0]).cast("long")
        bucket = F.floor(
            lead * F.lit(num_buckets) / F.lit(int(lead_bound) + 1)
        ).cast("int")
        work = df.withColumn("__bucket", bucket).repartition(
            num_buckets, F.col("__bucket")
        )
        w = Window.partitionBy("__bucket").orderBy(
            *[F.col(c).asc() for c in order_cols]
        )
        work = work.withColumn("__lrank", F.row_number().over(w)).persist()
        if defer_count:
            # zero-action offsets: cumulative count over bucket order
            # (one row per bucket — a trivial single-partition window),
            # broadcast-joined back. `work` is (lazily) persisted above
            # so the first materializing job computes the upstream
            # pipeline once and both join sides read the cache.
            woff = Window.orderBy("__bucket").rowsBetween(
                Window.unboundedPreceding, -1
            )
            offsets_df = (
                work.groupBy("__bucket")
                .agg(F.count("*").alias("__cnt"))
                .select(
                    "__bucket",
                    (
                        F.coalesce(F.sum("__cnt").over(woff), F.lit(0))
                        + F.lit(base)
                    ).alias("__offset"),
                )
            )
            result = (
                work.join(F.broadcast(offsets_df), "__bucket")
                .withColumn(
                    out_col, (F.col("__offset") + F.col("__lrank")).cast("long")
                )
                .drop("__bucket", "__lrank", "__offset")
            )
            return result, None
        counts = {
            r["__bucket"]: r["cnt"]
            for r in work.groupBy("__bucket").agg(F.count("*").alias("cnt")).collect()
        }
        if not counts:
            return (
                work.drop("__bucket", "__lrank").withColumn(
                    out_col, F.lit(0).cast("long")
                ),
                0,
            )
        offsets, acc = {}, base
        for b in sorted(counts):
            offsets[b] = acc
            acc += counts[b]
        result = (
            _attach_offsets(work, "__bucket", offsets)
            .withColumn(
                out_col, (F.col("__offset") + F.col("__lrank")).cast("long")
            )
            .drop("__bucket", "__lrank", "__offset")
        )
        return result, int(sum(counts.values()))

    inp = df.persist()
    ordered = (
        inp.repartitionByRange(num_buckets, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*[F.col(c) for c in order_cols])
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ordered.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    if not counts:  # empty batch
        return (
            ordered.drop("__mid", "__pid").withColumn(out_col, F.lit(0).cast("long")),
            0,
        )
    offsets, acc = {}, base
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    local_pos = F.col("__mid") - (F.col("__pid").cast("long") * F.lit(1 << 33))
    result = (
        _attach_offsets(ordered, "__pid", offsets)
        .withColumn(
            out_col, (F.col("__offset") + local_pos + F.lit(1)).cast("long")
        )
        .drop("__mid", "__pid", "__offset")
    )
    return result, int(sum(counts.values()))


# ------------------------------------------------------ queue precedence
# (engine/.../frontier/precedence/*QueuePrecedencePolicy.java)


def base_queue_precedence_col(cfg: PolitenessConfig = PolitenessConfig()) -> Column:
    """BaseQueuePrecedencePolicy: constant (default 3, :44)."""
    return F.lit(cfg.queue_base_precedence)


def highest_uri_queue_precedence_col(
    min_uri_precedence: Column, cfg: PolitenessConfig = PolitenessConfig()
) -> Column:
    """HighestUriQueuePrecedencePolicy (:80-90): base + lowest enqueued
    URI precedence (0 when the queue is empty)."""
    return F.lit(cfg.queue_base_precedence) + F.coalesce(
        min_uri_precedence, F.lit(0)
    )


def success_counts_queue_precedence_col(
    successes: Column, cfg: PolitenessConfig = PolitenessConfig()
) -> Column:
    """SuccessCountsQueuePrecedencePolicy (:84-100): start at base-1 and
    add one rank per increment threshold crossed by the queue's success
    count; the last increment repeats."""
    incs = list(cfg.success_increments)
    base = cfg.queue_base_precedence
    out = F.when(successes <= 0, F.lit(0))
    cum = 0
    for k, inc in enumerate(incs[:-1]):
        cum += inc
        out = out.when(successes <= cum, F.lit(k + 1))
    last = incs[-1]
    out = out.otherwise(
        F.lit(len(incs) - 1)
        + F.ceil((successes - F.lit(cum)).cast("double") / F.lit(last)).cast("int")
    )
    return (F.lit(base - 1) + out).cast("int")


def queue_precedence_py(
    policy: str,
    base: int,
    successes: int,
    min_uri_precedence: int | None,
    increments: tuple[int, ...],
) -> int:
    """Python twin used by the oracle simulator."""
    if policy == "base":
        return base
    if policy == "highest_uri":
        return base + (min_uri_precedence if min_uri_precedence is not None else 0)
    if policy == "success_counts":
        prec, s, i = base - 1, successes, 0
        while s > 0:
            s -= increments[min(i, len(increments) - 1)]
            prec += 1
            i += 1
        return prec
    raise ValueError(f"unknown queue precedence policy {policy!r}")


def zero_cost_col() -> Column:
    """ZeroCostAssignmentPolicy.costOf (:23-25): every URI costless —
    disables budgeting (expenditure never grows, queues never retire on
    total_budget)."""
    return F.lit(0).cast("int")
