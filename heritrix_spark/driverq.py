"""Driver-facing query registry: Spark queries + DuckDB oracle twins.

The driver (see ``__spark_entry__.py``) runs each ``QUERIES[name]`` on
the sf-dir parquet tables and compares row-count/schema/value-hash with
``ORACLE_SQL[name]`` executed by DuckDB over the same tables.

Because the crawl operators need URL/frontier-shaped input and the
shared tables are generic, every query first derives a deterministic
URL corpus from ``documents`` via :data:`URL_DERIVATION` — a SQL
snippet written in the Spark-SQL ∩ DuckDB dialect subset so both
engines compute byte-identical inputs. The crawl operators themselves
then run as the package's Column expressions on the Spark side and as
the ``*_sql`` renderers (functions/canonicalize.py, functions/surt.py)
on the DuckDB side.

Column-naming contract: every computed column is aliased identically on
both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.functions.canonicalize import canonicalize_col, canonicalize_sql
from heritrix_spark.functions.surt import class_key_col, class_key_sql, surt_col, surt_sql

# ---------------------------------------------------------------------------
# Shared derivation (Spark SQL ∩ DuckDB dialect)
# ---------------------------------------------------------------------------

URL_DERIVATION = """
  'http://' ||
  case when doc_id % 11 = 0 then 'WWW.' when doc_id % 11 = 1 then 'www3.' else '' end ||
  'host' || cast(doc_id % 40 as string) || '.example' ||
  '/' || source || '/page' || cast(doc_id % 13 as string) || '.html' ||
  case when doc_id % 7 = 0 then '?'
       when doc_id % 7 = 1 then '?x=' || cast(doc_id as string) || '&'
       when doc_id % 7 = 2 then '?CFID=12&CFTOKEN=34&d=' || cast(doc_id % 9 as string)
       when doc_id % 7 = 3 then '?jsessionid=' || repeat('ab12', 8)
       else '' end
""".strip()

# frontier-shaped columns derived deterministically from doc_id
FRONTIER_DERIVATION = (
    "cast(doc_id % 4 as int) as directive, "
    "cast(1 + doc_id % 3 as int) as precedence, "
    "cast(doc_id as bigint) as ordinal, "
    "cast(10 + doc_id % 997 as bigint) as fetch_duration_ms, "
    "cast(case when doc_id % 6 = 0 then 20.0 when doc_id % 6 = 1 then 400.0 "
    "else -1.0 end as double) as crawl_delay"
)

STATUS_DERIVATION = (
    "cast(case when doc_id % 9 = 0 then -9998 when doc_id % 9 = 1 then 404 "
    "when doc_id % 9 = 2 then -2 when doc_id % 9 = 3 then -5000 "
    "when doc_id % 9 = 4 then 503 else 200 end as int) as fetch_status, "
    "cast(doc_id % 40 as int) as attempts"
)

HOPS_DERIVATION = (
    "case when doc_id % 5 = 0 then '' "
    "when doc_id % 5 = 1 then repeat('L', cast(doc_id % 23 as int)) "
    "when doc_id % 5 = 2 then repeat('L', cast(doc_id % 8 as int)) || 'E' "
    "when doc_id % 5 = 3 then 'LLR' "
    "else cast(doc_id % 90 as string) || '+' || repeat('L', 49) || 'E' end as hops_path"
)


def _docs_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        f"select doc_id, {URL_DERIVATION} as url, {FRONTIER_DERIVATION}, "
        f"{STATUS_DERIVATION}, {HOPS_DERIVATION}, n_chars from documents"
    )


_DUCK_URLS = (
    f"select doc_id, {URL_DERIVATION} as url, {FRONTIER_DERIVATION}, "
    f"{STATUS_DERIVATION}, {HOPS_DERIVATION}, n_chars from documents"
)


# ---------------------------------------------------------------------------
# Query registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# -------------------------------------------------- 1. canonicalization

@register(
    "canonicalize",
    f"""
    with u as ({_DUCK_URLS})
    select cast(doc_id as bigint) as doc_id, url,
           {canonicalize_sql('url')} as canon_url
    from u order by doc_id
    """,
)
def q_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _docs_urls(spark, sf_dir)
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "url",
        canonicalize_col("url").alias("canon_url"),
    ).orderBy("doc_id")


def _custom_canon_sql() -> str:
    from heritrix_spark.functions.canonicalize import (
        strip_extra_slashes_sql,
        strip_www_sql,
    )

    return f"""
    with u as ({_DUCK_URLS}),
    v as (select doc_id,
                 case when doc_id % 3 = 0 then replace(url, '/page', '///page')
                      else url end as url
          from u)
    select cast(doc_id as bigint) as doc_id, url,
           {strip_extra_slashes_sql(strip_www_sql('lower(url)'))} as canon_custom
    from v order by doc_id
    """


@register("canonicalize_custom", _custom_canon_sql())
def q_canonicalize_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-default canonicalization rules (RulesCanonicalizationPolicy
    with an operator-supplied rule list): StripWWWRule
    (StripWWWRule.java:45-53) + StripExtraSlashes
    (StripExtraSlashes.java:34-47) — the configurable-chain analog."""
    from heritrix_spark.functions.canonicalize import (
        STRIP_WWW_RULE,
        canonicalize_custom_col,
        strip_extra_slashes_col,
    )

    u = _docs_urls(spark, sf_dir)
    v = u.withColumn(
        "url",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.replace(F.col("url"), F.lit("/page"), F.lit("///page")),
        ).otherwise(F.col("url")),
    )
    return v.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "url",
        strip_extra_slashes_col(
            canonicalize_custom_col(F.col("url"), (STRIP_WWW_RULE,))
        ).alias("canon_custom"),
    ).orderBy("doc_id")


# -------------------------------------------------- 2. SURT transform

@register(
    "surt",
    f"""
    with u as ({_DUCK_URLS})
    select cast(doc_id as bigint) as doc_id,
           {surt_sql(canonicalize_sql('url'))} as surt_form
    from u order by doc_id
    """,
)
def q_surt(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _docs_urls(spark, sf_dir)
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        surt_col(canonicalize_col("url")).alias("surt_form"),
    ).orderBy("doc_id")


# -------------------------------------------------- 3. queue keys

@register(
    "class_key_counts",
    f"""
    with u as ({_DUCK_URLS})
    select {class_key_sql(canonicalize_sql('url'))} as class_key,
           cast(count(*) as bigint) as n_urls
    from u group by 1 order by class_key
    """,
)
def q_class_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _docs_urls(spark, sf_dir)
    return (
        u.select(class_key_col(canonicalize_col("url")).alias("class_key"))
        .groupBy("class_key")
        .agg(F.count("*").cast("long").alias("n_urls"))
        .orderBy("class_key")
    )


# -------------------------------------------------- 4. seen-set dedup (anti-join)

@register(
    "seen_dedup",
    f"""
    with u as ({_DUCK_URLS}),
    c as (select doc_id, {canonicalize_sql('url')} as canon_url from u),
    firsts as (
      select canon_url, min(doc_id) as doc_id from c group by canon_url
    ),
    seen as (select canon_url from c where doc_id % 3 = 0)
    select f.canon_url, cast(f.doc_id as bigint) as first_doc_id
    from firsts f left join seen s on f.canon_url = s.canon_url
    where s.canon_url is null
    order by f.canon_url
    """,
)
def q_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.operators.seen import collapse_batch_duplicates

    u = _docs_urls(spark, sf_dir).withColumn("canon_url", canonicalize_col("url"))
    uniq = collapse_batch_duplicates(
        u.select("canon_url", F.col("doc_id").alias("ordinal")),
        order_cols=("ordinal",),
    )
    seen = u.filter(F.col("doc_id") % 3 == 0).select("canon_url")
    novel = uniq.join(seen, on="canon_url", how="left_anti")
    return novel.select(
        "canon_url", F.col("ordinal").cast("long").alias("first_doc_id")
    ).orderBy("canon_url")


# ---------------------------------------- 4b. cuckoo-prefiltered dedup + forget

@register(
    "cuckoo_seen_dedup",
    f"""
    with u as ({_DUCK_URLS}),
    c as (select doc_id, {canonicalize_sql('url')} as canon_url from u),
    firsts as (
      select canon_url, min(doc_id) as doc_id from c group by canon_url
    ),
    seen as (select distinct canon_url from c
             where doc_id % 3 = 0 and doc_id % 9 != 0)
    select f.canon_url, cast(f.doc_id as bigint) as first_doc_id
    from firsts f left join seen s on f.canon_url = s.canon_url
    where s.canon_url is null
    order by f.canon_url
    """,
)
def q_cuckoo_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuckoo-fingerprint-prefiltered already-seen check with deletion:
    the seen set is doc_id%3==0 URLs, then the doc_id%9==0 slice is
    ``forget``-ed from BOTH the exact set and the cuckoo sidecar
    (counting -1 deltas). The oracle is the plain anti-join against
    (seen minus forgotten) — so the row is green only if the prefilter
    never changes membership AND deletion frees slots without creating
    false negatives (UriUniqFilter.forget; the north star's
    "partitioned bloom/cuckoo URL-seen set"). Buckets are deliberately
    tiny (2^8) so (bucket, fp) collisions occur and the exact join
    genuinely resolves prefilter hits."""
    from heritrix_spark.operators.cuckooseen import (
        cuckoo_delta,
        cuckoo_forget_delta,
        dedup_candidates_cuckoo,
    )
    from heritrix_spark.operators.seen import (
        collapse_batch_duplicates,
        shard_col,
    )

    buckets = 1 << 8
    n_shards = 16
    u = _docs_urls(spark, sf_dir).withColumn("canon_url", canonicalize_col("url"))
    cands = collapse_batch_duplicates(
        u.select("canon_url", F.col("doc_id").alias("ordinal")),
        order_cols=("ordinal",),
    )
    added = (
        u.filter(F.col("doc_id") % 3 == 0)
        .select("canon_url")
        .distinct()
        .withColumn("shard", shard_col("canon_url", n_shards))
    )
    # forget the doc_id%9==0 slice (a subset of added, as the contract
    # requires: forget only removes previously-added keys)
    gone = (
        u.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 9 == 0))
        .select("canon_url")
        .distinct()
        .withColumn("shard", shard_col("canon_url", n_shards))
    )
    seen2 = added.join(gone.select("canon_url"), on="canon_url", how="left_anti")
    deltas = cuckoo_delta(added, buckets=buckets).unionByName(
        cuckoo_forget_delta(gone, buckets=buckets)
    )
    novel = dedup_candidates_cuckoo(
        cands, seen2, deltas, n_shards=n_shards, buckets=buckets
    )
    return novel.select(
        "canon_url", F.col("ordinal").cast("long").alias("first_doc_id")
    ).orderBy("canon_url")


# -------------------------------------------------- 5. intra-queue ordering + head pick

@register(
    "queue_order_heads",
    f"""
    with u as ({_DUCK_URLS}),
    k as (select {class_key_sql(canonicalize_sql('url'))} as class_key,
                 directive, precedence, ordinal from u),
    r as (select *, row_number() over (
            partition by class_key
            order by directive, precedence, ordinal) as rank
          from k)
    select class_key, directive, precedence, cast(ordinal as bigint) as ordinal
    from r where rank = 1 order by class_key
    """,
)
def q_queue_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    u = _docs_urls(spark, sf_dir).withColumn(
        "class_key", class_key_col(canonicalize_col("url"))
    )
    w = Window.partitionBy("class_key").orderBy("directive", "precedence", "ordinal")
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select(
            "class_key", "directive", "precedence", F.col("ordinal").cast("long")
        )
        .orderBy("class_key")
    )


# -------------------------------------------------- 6. politeness delay formula

_DELAY_SQL = """
    case when least(greatest(cast(5.0 * fetch_duration_ms as bigint), 3000), 30000)
              < 300000
          and least(cast(case when crawl_delay > 0 then crawl_delay * 1000
                              else 0 end as bigint), 300000)
              > least(greatest(cast(5.0 * fetch_duration_ms as bigint), 3000), 30000)
         then least(cast(case when crawl_delay > 0 then crawl_delay * 1000
                              else 0 end as bigint), 300000)
         else least(greatest(cast(5.0 * fetch_duration_ms as bigint), 3000), 30000)
    end
"""


@register(
    "politeness_delay",
    f"""
    with u as ({_DUCK_URLS})
    select cast(doc_id as bigint) as doc_id,
           cast(fetch_duration_ms as bigint) as fetch_duration_ms,
           cast(crawl_delay as double) as crawl_delay,
           cast({_DELAY_SQL} as bigint) as delay_ms
    from u order by doc_id
    """,
)
def q_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.operators.politeness import politeness_delay_col

    u = _docs_urls(spark, sf_dir)
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("fetch_duration_ms").cast("long"),
        F.col("crawl_delay").cast("double"),
        politeness_delay_col(F.col("fetch_duration_ms"), F.col("crawl_delay"))
        .cast("long")
        .alias("delay_ms"),
    ).orderBy("doc_id")


@register(
    "robots_allows",
    f"""
    with u as ({_DUCK_URLS}),
    p as (select doc_id,
            case when regexp_extract(url, '^\\w+://[^/]+(/.*)$', 1) = '' then '/'
                 else regexp_extract(url, '^\\w+://[^/]+(/.*)$', 1) end as path,
            case when doc_id % 4 = 0 then ['/src']
                 when doc_id % 4 = 2 then ['/src0'] else []::varchar[] end as allows,
            case when doc_id % 4 = 0 then ['/']
                 when doc_id % 4 = 1 then ['/src1/', '/src2/']
                 when doc_id % 4 = 2 then ['/'] else []::varchar[] end as disallows
          from u)
    select cast(doc_id as bigint) as doc_id, path,
      not (coalesce(list_max(list_transform(
             list_filter(disallows, d -> starts_with(path, d)), d -> length(d))), 0)
         > coalesce(list_max(list_transform(
             list_filter(allows, a -> starts_with(path, a)), a -> length(a))), 0))
        as allowed
    from p order by doc_id
    """,
)
def q_robots_allows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RobotsDirectives.allows prefix law (RobotsDirectives.java:39-58) as
    higher-order array expressions over a deterministic directive mix:
    full exclusion with an allow carve-out, path disallows, and empty."""
    from heritrix_spark.operators.politeness import robots_allows_col, url_path_col

    u = _docs_urls(spark, sf_dir)
    mod = F.col("doc_id") % 4
    empty = F.array().cast("array<string>")
    allows = (
        F.when(mod == 0, F.array(F.lit("/src")))
        .when(mod == 2, F.array(F.lit("/src0")))
        .otherwise(empty)
    )
    disallows = (
        F.when(mod == 0, F.array(F.lit("/")))
        .when(mod == 1, F.array(F.lit("/src1/"), F.lit("/src2/")))
        .when(mod == 2, F.array(F.lit("/")))
        .otherwise(empty)
    )
    path = url_path_col(F.col("url"))
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        path.alias("path"),
        robots_allows_col(allows, disallows, path).alias("allowed"),
    ).orderBy("doc_id")


# -------------------------------------------------- 7. hops-path functions

@register(
    "hop_counts",
    f"""
    with u as ({_DUCK_URLS}),
    h as (select doc_id, hops_path,
            coalesce(try_cast(regexp_extract(hops_path, '^([0-9]+)\\+', 1) as bigint), 0)
              as n_over,
            regexp_replace(hops_path, '^[0-9]+\\+', '') as tail
          from u)
    select cast(doc_id as bigint) as doc_id, hops_path,
      cast(n_over + length(tail) as int) as hop_count,
      cast(n_over + length(tail) - length(replace(tail, 'L', '')) as int) as link_hops,
      cast(length(regexp_extract(tail, '([^L]*)$', 1)) as int) as trans_hops
    from h order by doc_id
    """,
)
def q_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.functions.hops import (
        hop_count_col,
        link_hops_col,
        trans_hops_col,
    )

    u = _docs_urls(spark, sf_dir)
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "hops_path",
        hop_count_col("hops_path").alias("hop_count"),
        link_hops_col("hops_path").alias("link_hops"),
        trans_hops_col("hops_path").alias("trans_hops"),
    ).orderBy("doc_id")


# -------------------------------------------------- 8. scheduling directive

@register(
    "scheduling_directive",
    f"""
    with u as ({_DUCK_URLS}),
    h as (select doc_id, hops_path,
            length(regexp_extract(regexp_replace(hops_path, '^[0-9]+\\+', ''),
                                  '([^L]*)$', 1)) as th
          from u)
    select cast(doc_id as bigint) as doc_id,
      cast(case when length(hops_path) > 0
                 and substring(hops_path, length(hops_path), 1) = 'R' then 2
                when th > 0 and th <= 1 then 2
                else 3 end as int) as directive
    from h order by doc_id
    """,
)
def q_directive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.operators.prepare import scheduling_directive_col

    u = _docs_urls(spark, sf_dir)
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        scheduling_directive_col(F.col("hops_path"), F.lit(3).cast("int"))
        .cast("int")
        .alias("directive"),
    ).orderBy("doc_id")


# -------------------------------------------------- 9. disposition classification

@register(
    "disposition",
    f"""
    with u as ({_DUCK_URLS})
    select cast(doc_id as bigint) as doc_id, fetch_status,
      case when fetch_status > 0 then 'success'
           when fetch_status in (-9998, -5002, -5000, -5001, -4002, -4001, -6000)
             then 'disregard'
           when fetch_status in (-50, -2, -3, -1) and attempts < 30 then 'retry'
           else 'failure' end as disposition
    from u order by doc_id
    """,
)
def q_disposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.operators.budget import disposition_col

    u = _docs_urls(spark, sf_dir)
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "fetch_status",
        disposition_col(F.col("fetch_status"), F.col("attempts")).alias("disposition"),
    ).orderBy("doc_id")


# -------------------------------------------------- 10. frontier counters (reports)

@register(
    "frontier_counters",
    f"""
    with u as ({_DUCK_URLS}),
    d as (select {class_key_sql(canonicalize_sql('url'))} as class_key,
           case when fetch_status > 0 then 'success'
                when fetch_status in (-9998, -5002, -5000, -5001, -4002, -4001, -6000)
                  then 'disregard'
                when fetch_status in (-50, -2, -3, -1) and attempts < 30 then 'retry'
                else 'failure' end as disposition,
           n_chars from u)
    select class_key,
      cast(count(*) as bigint) as emitted,
      cast(sum(case when disposition = 'success' then 1 else 0 end) as bigint)
        as succeeded,
      cast(sum(case when disposition = 'failure' then 1 else 0 end) as bigint)
        as failed,
      cast(sum(case when disposition = 'disregard' then 1 else 0 end) as bigint)
        as disregarded,
      cast(sum(case when disposition = 'retry' then 1 else 0 end) as bigint)
        as retried,
      cast(sum(case when disposition = 'success' then n_chars else 0 end) as bigint)
        as success_bytes
    from d group by class_key order by class_key
    """,
)
def q_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.operators.budget import disposition_col

    u = _docs_urls(spark, sf_dir).select(
        class_key_col(canonicalize_col("url")).alias("class_key"),
        disposition_col(F.col("fetch_status"), F.col("attempts")).alias("disposition"),
        "n_chars",
    )
    return (
        u.groupBy("class_key")
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
            F.sum(
                F.when(F.col("disposition") == "success", F.col("n_chars")).otherwise(0)
            )
            .cast("long")
            .alias("success_bytes"),
        )
        .orderBy("class_key")
    )


# -------------------------------------------------- 11. top-N largest queues

@register(
    "top_queues",
    f"""
    with u as ({_DUCK_URLS}),
    k as (select {class_key_sql(canonicalize_sql('url'))} as class_key from u)
    select class_key, cast(count(*) as bigint) as queue_size
    from k group by class_key
    order by queue_size desc, class_key limit 20
    """,
)
def q_top_queues(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _docs_urls(spark, sf_dir)
    return (
        u.select(class_key_col(canonicalize_col("url")).alias("class_key"))
        .groupBy("class_key")
        .agg(F.count("*").cast("long").alias("queue_size"))
        .orderBy(F.desc("queue_size"), F.asc("class_key"))
        .limit(20)
    )


# -------------------------------------------------- 12. budget / retirement

@register(
    "budget_retirement",
    f"""
    with u as ({_DUCK_URLS}),
    d as (select {class_key_sql(canonicalize_sql('url'))} as class_key,
           case when fetch_status > 0 then 1
                when fetch_status in (-9998, -5002, -5000, -5001, -4002, -4001, -6000)
                  then 0
                when fetch_status = -50 and attempts < 30 then 0
                when fetch_status in (-2, -3, -1) and attempts < 30 then 1
                else 101 end as expend
          from u)
    select class_key, cast(sum(expend) as bigint) as total_expenditure,
      sum(expend) > 300 as retired
    from d group by class_key order by class_key
    """,
)
def q_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.operators.budget import disposition_col, expenditure_col

    cfg = PolitenessConfig(total_budget=300)
    u = _docs_urls(spark, sf_dir).select(
        class_key_col(canonicalize_col("url")).alias("class_key"),
        expenditure_col(
            disposition_col(F.col("fetch_status"), F.col("attempts"), cfg),
            F.lit(1),
            F.col("fetch_status"),
            cfg,
        ).alias("expend"),
    )
    return (
        u.groupBy("class_key")
        .agg(F.sum("expend").cast("long").alias("total_expenditure"))
        .withColumn("retired", F.col("total_expenditure") > cfg.total_budget)
        .orderBy("class_key")
    )


# ===========================================================================
# Training-data pipeline queries (documents / embeddings / events)
# ===========================================================================

# -------------------------------------------------- 13. exact dedup (digest)

@register(
    "exact_dedup_docs",
    """
    select md5(text) as digest, cast(min(doc_id) as bigint) as keep_id,
           cast(count(*) as bigint) as n_copies
    from documents group by 1 order by digest
    """,
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select("doc_id", F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .orderBy("digest")
    )


# -------------------------------------------------- 14. minhash LSH near-dup pairs

_DUCK_SHINGLES = r"""
    select doc_id,
      list_distinct(list_transform(
        generate_series(1, greatest(len(words) - 2, 1)),
        i -> array_to_string(words[i:i+2], ' '))) as sh
    from (select doc_id,
            list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '')
              as words
          from documents)
"""


def _duck_mh(seed: int) -> str:
    # twin of pipeline.dedup.minhash_col: affine permutation of the
    # single md5_60 base hash, exact signed-64 arithmetic (< 2^62)
    from heritrix_spark.pipeline.dedup import MINHASH_P, _mix_a, _mix_b

    return (
        "list_aggregate(list_transform(hsh, h -> "
        f"((h & 2147483647) * {_mix_a(seed)} + {_mix_b(seed)}) % {MINHASH_P}"
        "), 'min')"
    )


_DUCK_MINHASH_PAIRS = f"""
    with sh as ({_DUCK_SHINGLES}),
    hsh_t as (select doc_id,
      list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) as hsh
      from sh),
    sig as (select doc_id,
      {", ".join(f"{_duck_mh(i)} as mh{i}" for i in range(8))}
      from hsh_t),
    bands as (
      select doc_id, 0 as band, mh0::varchar || ',' || mh1::varchar as band_sig from sig
      union all
      select doc_id, 1, mh2::varchar || ',' || mh3::varchar from sig
      union all
      select doc_id, 2, mh4::varchar || ',' || mh5::varchar from sig
      union all
      select doc_id, 3, mh6::varchar || ',' || mh7::varchar from sig
    ),
    -- hot-bucket cap twin (pipeline.dedup.minhash_lsh_dedup max_bucket=64):
    -- over-cap buckets emit star pairs around the bucket min instead of
    -- the quadratic self-join
    counted as (
      select doc_id, band, band_sig,
             count(*) over (partition by band, band_sig) as c,
             min(doc_id) over (partition by band, band_sig) as hub
      from bands
    ),
    allpairs as (
      select a.doc_id as a_raw, b.doc_id as b_raw
      from counted a join counted b
        on a.band = b.band and a.band_sig = b.band_sig
      where a.c <= 64 and a.doc_id < b.doc_id
      union all
      select hub, doc_id from counted where c > 64 and doc_id <> hub
    )
    select distinct cast(a_raw as bigint) as a_id, cast(b_raw as bigint) as b_id
    from allpairs
    order by a_id, b_id
"""


@register("minhash_lsh_pairs", _DUCK_MINHASH_PAIRS)
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.pipeline.dedup import minhash_lsh_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_dedup(docs, n_hashes=8, bands=4, shingle_k=3)
    return pairs.select(
        F.col("a_id").cast("long"), F.col("b_id").cast("long")
    ).orderBy("a_id", "b_id")


# -------------------------------------------------- 15. n-gram jaccard over blocked pairs

@register(
    "ngram_jaccard",
    f"""
    with pairs as ({_DUCK_MINHASH_PAIRS}),
    sh as ({_DUCK_SHINGLES})
    select p.a_id, p.b_id,
      round(case when len(list_distinct(list_concat(a.sh, b.sh))) > 0
        then len(list_intersect(a.sh, b.sh))::double
             / len(list_distinct(list_concat(a.sh, b.sh)))::double
        else 0.0 end, 6) as jaccard
    from pairs p
    join sh a on a.doc_id = p.a_id
    join sh b on b.doc_id = p.b_id
    where case when len(list_distinct(list_concat(a.sh, b.sh))) > 0
        then len(list_intersect(a.sh, b.sh))::double
             / len(list_distinct(list_concat(a.sh, b.sh)))::double
        else 0.0 end >= 0.2
    order by a_id, b_id
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.pipeline.dedup import minhash_lsh_dedup, ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_dedup(docs, n_hashes=8, bands=4, shingle_k=3)
    out = ngram_jaccard_pairs(docs, pairs, k=3, threshold=0.2)
    return out.select(
        F.col("a_id").cast("long"), F.col("b_id").cast("long"), "jaccard"
    ).orderBy("a_id", "b_id")


# ------------------------------------------ 15b. near-dup clusters + survivors

@register(
    "neardup_components",
    f"""
    with recursive pairs as ({_DUCK_MINHASH_PAIRS}),
    edges as (select a_id as s, b_id as d from pairs
              union all
              select b_id, a_id from pairs),
    walk as (
      select s as node, s as comp from edges
      union
      select e.d, w.comp from walk w join edges e on e.s = w.node
    ),
    cc as (select node, min(comp) as component from walk group by node)
    select cast(d.doc_id as bigint) as doc_id,
           cast(coalesce(cc.component, d.doc_id) as bigint) as component,
           coalesce(cc.component, d.doc_id) = d.doc_id as is_kept
    from documents d left join cc on cc.node = d.doc_id
    order by doc_id
    """,
)
def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters from the MinHash-LSH pair table: transitive
    closure via alternating large-star/small-star contraction
    (pipeline/components.py — O(log^2 n) iterations, one hash shuffle
    each), then one canonical survivor (min doc_id) per cluster;
    documents in no pair are singleton survivors.  The DuckDB twin is a
    recursive min-label walk over the symmetrized edges — exact at
    fixture scale, while the Spark side runs the contraction that holds
    at 10^10 pairs."""
    from heritrix_spark.pipeline.components import (
        connected_components,
        keep_canonical,
    )
    from heritrix_spark.pipeline.dedup import minhash_lsh_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_dedup(docs, n_hashes=8, bands=4, shingle_k=3)
    cc = connected_components(pairs)
    return (
        keep_canonical(docs.select("doc_id"), cc)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("component").cast("long").alias("component"),
            "is_kept",
        )
        .orderBy("doc_id")
    )


# ------------------------------------------ 15c. PageRank over the link graph

_PR_M = 500          # target-id modulus (edge law below)
_PR_ITERS = 3


def _duck_pagerank_sql(iters: int = _PR_ITERS) -> str:
    """Unrolled fixed-point PageRank (pipeline/pagerank.py law) as one
    DuckDB CTE chain — integer micro-rank math, so the engines agree
    bit-for-bit regardless of summation order."""
    head = f"""
    with e as (
      select doc_id as src, (doc_id * 7 + 1) % {_PR_M} as dst
        from documents where doc_id % 13 != 0
      union all
      select doc_id, (doc_id * 3 + 2) % {_PR_M}
        from documents where doc_id % 13 != 0
      union all
      select doc_id, (doc_id * 7 + 1) % {_PR_M}
        from documents where doc_id % 13 != 0 and doc_id % 5 = 0
    ),
    nodes as (select src as node from e union select dst from e),
    deg as (select src, count(*) as outdeg from e group by src),
    r0 as (select node, cast(1000000 as bigint) as rank_micro from nodes)
    """
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
    , s{i} as (
      select e.dst as node,
             sum(r.rank_micro // d.outdeg) as s
      from e
      join r{i - 1} r on r.node = e.src
      join deg d on d.src = e.src
      group by e.dst
    ),
    r{i} as (
      select n.node,
             cast(case when d.outdeg is null then 150000
                  else 150000 + (850000 * coalesce(s{i}.s, 0)) // 1000000
                  end as bigint) as rank_micro
      from nodes n
      left join deg d on d.src = n.node
      left join s{i} on s{i}.node = n.node
    )
        """)
    return (
        head
        + "".join(steps)
        + f"""
    select cast(node as bigint) as node, rank_micro
    from r{iters} order by node
    """
    )


@register("pagerank", _duck_pagerank_sql())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference repo's own post-crawl analytics job — a Hadoop
    MapReduce PageRank over crawl-extracted links
    (heritrix3/dist/src/main/extras/pagerank/PageRank.java) —
    re-expressed as an iterative DataFrame loop (pipeline/pagerank.py),
    keeping the reference's sink law (:126-130: empty-adjacency nodes
    reset to the flat 0.15 jump) and duplicate-target weighting, in
    deterministic fixed-point micro-rank units.  Edge fixture: each
    non-%13 document links to (id*7+1)%500 and (id*3+2)%500, %5
    documents repeat the first target (comma-list duplicate), %13
    documents are pure sinks/targets."""
    from heritrix_spark.pipeline.pagerank import pagerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    srcs = docs.filter(F.col("doc_id") % 13 != 0)
    e1 = srcs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % _PR_M).alias("dst"),
    )
    e2 = srcs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 3 + 2) % _PR_M).alias("dst"),
    )
    e3 = srcs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % _PR_M).alias("dst"),
    )
    edges = e1.unionByName(e2).unionByName(e3)
    return (
        pagerank(edges, iterations=_PR_ITERS)
        .select(F.col("node").cast("long").alias("node"), "rank_micro")
        .orderBy("node")
    )


# -------------------------------------------------- 16. simhash clustering

def _duck_simhash(bits: int = 16) -> str:
    votes = []
    for i in range(bits):
        votes.append(
            "case when list_aggregate(list_transform(toks, t -> "
            f"case when (('0x' || substr(md5(t), 1, 15))::BIGINT >> {i}) & 1 = 1 "
            "then 1 else -1 end), 'sum') > 0 "
            f"then {1 << i} else 0 end"
        )
    return " + ".join(votes)


@register(
    "simhash_clusters",
    f"""
    with t as (select doc_id,
        string_split_regex(lower(text), '\\s+') as toks from documents),
    s as (select doc_id, cast({_duck_simhash(16)} as bigint) as simhash from t)
    select simhash, cast(min(doc_id) as bigint) as keep_id,
           cast(count(*) as bigint) as n_docs
    from s group by simhash having count(*) > 1 order by simhash
    """,
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.pipeline.dedup import simhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        simhash_dedup(docs, bits=16)
        .select("simhash", F.col("keep_id").cast("long"), "n_docs")
        .orderBy("simhash")
    )


# -------------------------------------------------- 17. brute-force cosine top-k

_DUCK_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)


@register(
    "cosine_topk",
    f"""
    with q as (select vec_id as query_id, embedding as qv
               from embeddings where vec_id < 5),
    c as (select vec_id as neighbor_id, embedding as cv from embeddings),
    p as (select query_id, neighbor_id,
            {_DUCK_DOT.format(a="qv", b="cv")} /
            (sqrt({_DUCK_DOT.format(a="qv", b="qv")}) *
             sqrt({_DUCK_DOT.format(a="cv", b="cv")})) as cosine
          from c, q where neighbor_id <> query_id),
    r as (select query_id, neighbor_id, cosine,
            row_number() over (partition by query_id
                               order by cosine desc, neighbor_id) as rnk
          from p)
    select cast(query_id as bigint) as query_id,
           cast(neighbor_id as bigint) as neighbor_id,
           cast(rnk as int) as rank
    from r where rnk <= 3 order by query_id, rank
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.pipeline.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    return out.select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "rank",
    ).orderBy("query_id", "rank")


# -------------------------------------------------- 18. text stats (lang/quality/tokens)

_DUCK_LANGS = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "una", "por"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"),
}


def _duck_votes(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _DUCK_LANGS[lang])
    return f"len(list_filter(toks, t -> list_contains([{words}], t)))"


@register(
    "text_stats",
    f"""
    with t as (select doc_id, text,
        list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') as toks
        from documents),
    v as (select doc_id, text, toks,
        {", ".join(f"{_duck_votes(lg)} as v{lg}" for lg in sorted(_DUCK_LANGS))}
        from t)
    select cast(doc_id as bigint) as doc_id,
      cast(len(toks) as int) as n_tokens,
      cast(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
        as int) as n_bpe_tokens,
      case when greatest(vde, ven, ves, vfr) = 0 then 'und'
           when vde = greatest(vde, ven, ves, vfr) then 'de'
           when ven = greatest(vde, ven, ves, vfr) then 'en'
           when ves = greatest(vde, ven, ves, vfr) then 'es'
           else 'fr' end as lang_guess,
      round(0.4 * least(len(toks)::double / 100.0, 1.0)
        + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::double
                 / greatest(length(text)::double, 1.0))
        + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::double
                 / greatest(length(text)::double, 1.0)), 6) as quality
    from v order by doc_id
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.pipeline.textstats import (
        bpe_ish_token_count_col,
        lang_id_from_tokens_col,
        quality_score_from_tokens_col,
        tokens_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # tokenize ONCE in a prior projection and thread the array through —
    # the naive form re-splits the text per stat (6 regex splits/row) and
    # codegen's subexpression elimination does not fully collapse them
    # (measured 1.6x: 2.72s -> 1.69s warm at sf0.1 on 8 cores)
    base = docs.select(
        "doc_id", "text", tokens_col(F.col("text")).alias("toks")
    )
    return base.select(
        F.col("doc_id").cast("long"),
        F.size("toks").cast("int").alias("n_tokens"),
        bpe_ish_token_count_col(F.col("text")).alias("n_bpe_tokens"),
        lang_id_from_tokens_col(F.col("toks")).alias("lang_guess"),
        quality_score_from_tokens_col(F.col("toks"), F.col("text")).alias(
            "quality"
        ),
    ).orderBy("doc_id")


# -------------------------------------------------- 19. document fingerprint

@register(
    "doc_fingerprint",
    """
    select cast(doc_id as bigint) as doc_id,
      ('0x' || substr(md5(concat_ws('|', cast(length(text) as varchar),
          substr(text, 1, 64),
          substr(text, greatest(length(text) - 63, 1), 64))), 1, 15))::BIGINT
        as fingerprint
    from documents order by doc_id
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = F.concat_ws(
        "|",
        F.length("text").cast("string"),
        F.expr("substring(text, 1, 64)"),
        F.expr("substring(text, greatest(length(text) - 63, 1), 64)"),
    )
    return docs.select(
        F.col("doc_id").cast("long"),
        F.conv(F.substring(F.md5(packed), 1, 15), 16, 10)
        .cast("long")
        .alias("fingerprint"),
    ).orderBy("doc_id")


# ------------------------------------ 19b. deterministic sampling / splitting

_SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _duck_split_case(key_sql: str, weights: dict[str, float], salt: str) -> str:
    """DuckDB twin of sampling.hash_split_col — same sorted-boundary
    construction so the CASE thresholds are bit-identical."""
    from heritrix_spark.pipeline.sampling import _SPACE, duck_sample_hash

    h = duck_sample_hash(key_sql, salt)
    total = sum(weights.values())
    items = sorted(weights.items())
    acc = 0.0
    whens = []
    for name, w in items[:-1]:
        acc += w / total
        whens.append(f"when {h} < {int(acc * _SPACE)} then '{name}'")
    return "case " + " ".join(whens) + f" else '{items[-1][0]}' end"


@register(
    "corpus_split",
    f"""
    select cast(doc_id as bigint) as doc_id,
           {_duck_split_case("doc_id", _SPLIT_WEIGHTS, "split")} as split
    from documents order by doc_id
    """,
)
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: a portable md5-60 hash
    of the salted doc key against cumulative weight boundaries — a
    stateless projection (zero shuffle), stable across reruns, engines,
    and partitionings (pipeline/sampling.py hash_split_col)."""
    from heritrix_spark.pipeline.sampling import hash_split_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        hash_split_col(F.col("doc_id"), _SPLIT_WEIGHTS, "split").alias("split"),
    ).orderBy("doc_id")


@register(
    "corpus_sample_fixed",
    """
    select cast(doc_id as bigint) as doc_id, lang, source
    from (
      select *,
        ('0x' || substr(md5('fixedn' || cast(doc_id as varchar)), 1, 15))::BIGINT
          as sh
      from documents order by sh limit 50
    ) order by doc_id
    """,
)
def q_corpus_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N deterministic uniform sample (eval-set carving): the 50
    smallest salted md5-60 hashes.  Executes as per-partition TakeOrdered
    + a 50-row driver merge — no global sort (pipeline/sampling.py
    sample_fixed_n)."""
    from heritrix_spark.pipeline.sampling import sample_fixed_n

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        sample_fixed_n(docs, F.col("doc_id"), 50, "fixedn")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "source_cap_sample",
    """
    select cast(doc_id as bigint) as doc_id, source
    from (
      select doc_id, source,
        row_number() over (
          partition by source
          order by ('0x' || substr(md5('cap' || cast(doc_id as varchar)),
                                   1, 15))::BIGINT,
                   cast(doc_id as varchar)) as rk
      from documents
    ) where rk <= 8 order by doc_id
    """,
)
def q_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: at most 8 documents per source,
    selected uniformly within the source by hash order (not crawl
    order) — one window shuffle on the source key (pipeline/sampling.py
    cap_per_group)."""
    from heritrix_spark.pipeline.sampling import cap_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        cap_per_group(docs, F.col("source"), F.col("doc_id"), 8, "cap")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "source")
        .orderBy("doc_id")
    )


# ------------------------------------------------ 19c. vocabulary heavy hitters

@register(
    "token_topk",
    r"""
    with toks as (
      select doc_id, unnest(list_filter(
        string_split_regex(lower(text), '\s+'), w -> w <> '')) as token
      from documents
    )
    select token, cast(count(*) as bigint) as term_freq,
           cast(count(distinct doc_id) as bigint) as doc_freq
    from toks group by token
    order by term_freq desc, token asc limit 50
    """,
)
def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-k: explode → map-side-combinable hash
    aggregate → TakeOrdered(k).  Hot tokens reach the reducer as one
    partial row per map task, not one per occurrence
    (pipeline/textstats.py token_topk)."""
    from heritrix_spark.pipeline.textstats import token_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_topk(docs, k=50)


# ------------------------------ 19d. end-to-end training-corpus composition

@register(
    "training_corpus",
    f"""
    with recursive pairs as ({_DUCK_MINHASH_PAIRS}),
    edges as (select a_id as s, b_id as d from pairs
              union all
              select b_id, a_id from pairs),
    walk as (
      select s as node, s as comp from edges
      union
      select e.d, w.comp from walk w join edges e on e.s = w.node
    ),
    cc as (select node, min(comp) as component from walk group by node),
    t as (select doc_id, text,
        list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') as toks
        from documents),
    q as (select doc_id, len(toks) as n_tokens,
        round(0.4 * least(len(toks)::double / 100.0, 1.0)
          + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::double
                   / greatest(length(text)::double, 1.0))
          + 0.3 * (1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::double
                   / greatest(length(text)::double, 1.0)), 6) as quality
        from t)
    select cast(q.doc_id as bigint) as doc_id,
           {_duck_split_case("q.doc_id", _SPLIT_WEIGHTS, "split")} as split
    from q left join cc on cc.node = q.doc_id
    where coalesce(cc.component, q.doc_id) = q.doc_id
      and q.quality >= 0.75 and q.n_tokens >= 20
    order by doc_id
    """,
)
def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE composed plan:
    documents → MinHash-LSH near-dup pairs → connected-component
    clusters → canonical survivors → quality/length filter →
    deterministic train/val/test split.  Everything upstream of the
    contraction loop is a single Catalyst plan (scan shared across the
    signature and stats branches); the contraction adds its O(log^2 n)
    shuffle rounds; the filter and the split are stateless projections
    that Catalyst pushes below the survivor join's probe side."""
    from heritrix_spark.pipeline.components import (
        connected_components,
        keep_canonical,
    )
    from heritrix_spark.pipeline.dedup import minhash_lsh_dedup
    from heritrix_spark.pipeline.sampling import hash_split_col
    from heritrix_spark.pipeline.textstats import (
        quality_score_from_tokens_col,
        tokens_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_dedup(docs, n_hashes=8, bands=4, shingle_k=3)
    cc = connected_components(pairs)
    base = docs.select(
        "doc_id", "text", tokens_col(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.size("toks").cast("int").alias("n_tokens"),
        quality_score_from_tokens_col(F.col("toks"), F.col("text")).alias(
            "quality"
        ),
    )
    kept = keep_canonical(base, cc).where(
        F.col("is_kept") & (F.col("quality") >= 0.75) & (F.col("n_tokens") >= 20)
    )
    return kept.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        hash_split_col(F.col("doc_id"), _SPLIT_WEIGHTS, "split").alias("split"),
    ).orderBy("doc_id")


# -------------------------------------------------- 20. windowed event aggregation

@register(
    "events_windowed",
    """
    select date_trunc('minute', ts) as window_start, event_type,
      cast(count(*) as bigint) as n_events,
      cast(sum(cast(floor(value * 100 + 0.5) as bigint)) as bigint)
        as total_value_cents
    from events group by 1, 2 order by window_start, event_type
    """,
)
def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed aggregation over the events stream.

    Money math is done in integer cents (floor(v*100+0.5) on the IEEE
    double, identically in Spark and DuckDB) so the cross-engine hash
    compare is exact: per-row double->decimal casts round differently
    between engines (Spark BigDecimal HALF_UP on the binary value vs
    DuckDB's decimal-string rounding).
    """
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(cents).cast("long").alias("total_value_cents"),
        )
        .orderBy("window_start", "event_type")
    )


# -------------------------------------------------- 21. sessionization (streaming analog)

@register(
    "events_sessionized",
    """
    with e as (select user_id, event_id, ts,
        lag(ts) over (partition by user_id order by ts, event_id) as prev
        from events),
    s as (select user_id, event_id, ts,
        case when prev is null
               or epoch_us(ts) - epoch_us(prev) > 1800000000
             then 1 else 0 end as is_new
        from e),
    n as (select user_id, ts, event_id,
        sum(is_new) over (partition by user_id order by ts, event_id
                          rows between unbounded preceding and current row)
          as session_no
        from s)
    select cast(user_id as bigint) as user_id,
      cast(session_no as bigint) as session_no,
      cast(count(*) as bigint) as n_events,
      min(ts) as session_start, max(ts) as session_end
    from n group by user_id, session_no order by user_id, session_no
    """,
)
def q_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = events.withColumn("prev", F.lag("ts").over(w))
    # Gap test in exact integer microseconds on both sides: Spark's
    # timestampdiff(SECOND, ...) truncates elapsed seconds while DuckDB's
    # date_diff counts boundary crossings — same-unit integer math avoids
    # the dialect divergence entirely.
    s = e.withColumn(
        "is_new",
        F.when(
            F.col("prev").isNull()
            | (
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("prev").cast("timestamp"))
                )
                > F.lit(1800000000).cast("long")
            ),
            1,
        ).otherwise(0),
    )
    n = s.withColumn(
        "session_no",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        n.groupBy(F.col("user_id").cast("long").alias("user_id"), "session_no")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_no").cast("long"),
            "n_events",
            "session_start",
            "session_end",
        )
        .orderBy("user_id", "session_no")
    )


# -------------------------------------------------- 22. full crawl rounds

_CRAWL_FIXTURE = dict(
    hosts=4, docs_per_host=4, links_per_doc=3, seed=7, seed_redirect=True
)


# the fixture crawl runs with seed source-tagging ON so the fetch log
# carries the heritable seed-of-origin column the report rows tally
# (SeedModule.sourceTagSeeds; SeedsReport / SourceTagsReport), and with
# seedsRedirectNewSeeds ON (the reference's default) so the fixture's
# redirecting seed promotes its target and dynamically widens the scope
# (CandidatesProcessor :183-199) — both pinned by the oracle hash.
_CRAWL_CFG = PolitenessConfig(source_tag_seeds=True, seeds_redirect_new_seeds=True)
_CRAWL_CACHE: dict = {}


def _fixture_crawl_log(spark: SparkSession) -> DataFrame:
    """Run the deterministic fixture crawl ONCE per process and detach
    its fetch log from the temp store; `crawl_rounds`, `seeds_report`
    and `source_host_tally` all read this one crawl (the reference
    likewise writes all its reports from one StatisticsTracker)."""
    if "rows" not in _CRAWL_CACHE:
        import tempfile

        from heritrix_spark.fixtures.gen import generate, write_parquet
        from heritrix_spark.plans.crawl import crawl

        fx = generate(**_CRAWL_FIXTURE)
        with tempfile.TemporaryDirectory(prefix="hxq_") as tmp:
            paths = write_parquet(fx, tmp)
            docs = spark.read.parquet(paths["docs"])
            seeds = spark.read.parquet(paths["seeds"])
            robots = spark.read.parquet(paths["robots"])
            # row-local shuffle sizing (same law as the streaming rows):
            # the fixture crawl's explicit repartitions (ordinal buckets
            # = shuffle conf) are not AQE-coalesced, so a 64-partition
            # session schedules 64 tasks per exchange over a ~51-row
            # crawl; ordinal determinism is bucket-count-independent
            # (proven at 2/8/31-way in tests/test_ordering.py)
            with _fixture_shuffle(spark):
                result = crawl(
                    spark, f"{tmp}/store", docs, seeds, robots, _CRAWL_CFG
                )
            log = result.fetch_log().orderBy("round", "class_key", "ordinal")
            _CRAWL_CACHE["rows"] = log.collect()  # detach from tmp store
            _CRAWL_CACHE["schema"] = log.schema
            lin = result.store.read("lineage").drop("partition_id")
            _CRAWL_CACHE["lineage_rows"] = lin.collect()
            _CRAWL_CACHE["lineage_schema"] = lin.schema
    return spark.createDataFrame(_CRAWL_CACHE["rows"], _CRAWL_CACHE["schema"])


def _fixture_crawl_lineage(spark: SparkSession) -> DataFrame:
    """The same fixture crawl's journal/lineage table (F+/Fe/Fs/Ff/Fd/Fr
    tag rows the loop commits per round)."""
    if "lineage_rows" not in _CRAWL_CACHE:
        _fixture_crawl_log(spark)
    return spark.createDataFrame(
        _CRAWL_CACHE["lineage_rows"], _CRAWL_CACHE["lineage_schema"]
    )


def q_crawl_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end operator: run a complete crawl on the
    deterministic synthetic fixture and return the fetch log. The oracle
    is the pure-Python reference simulator (an independent implementation
    of the same Heritrix semantics, oracle/simulator.py) whose fetch log
    is exported to parquet and read back by DuckDB — the driver-gate form
    of the tests/test_end_to_end.py equality."""
    return _fixture_crawl_log(spark)


def _crawl_rounds_oracle() -> str:
    """Run the pure-Python oracle simulator on the same fixture, export
    its fetch log to parquet, and return SQL reading it back. The
    simulator is the independent twin (no Spark, no shared code with the
    engine's plans), so hash-equality here is a genuine cross-check."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from heritrix_spark.constants import PolitenessConfig
    from heritrix_spark.fixtures.gen import generate
    from heritrix_spark.oracle.simulator import simulate

    path = os.path.join(
        tempfile.gettempdir(),
        "hx_crawl_rounds_oracle_srs_h{hosts}d{docs_per_host}l{links_per_doc}"
        "s{seed}.parquet".format(**_CRAWL_FIXTURE),
    )
    if not os.path.exists(path):
        fx = generate(**_CRAWL_FIXTURE)
        sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), _CRAWL_CFG)
        # exact engine fetch_log schema (plans/crawl.py empty_log)
        i32 = ("round", "directive", "precedence", "fetch_status", "cost")
        i64 = ("now_ms", "ordinal", "politeness_delay_ms")
        boolean = ("is_seed",)
        cols = [
            "round", "now_ms", "class_key", "url", "canon_url", "ordinal",
            "directive", "precedence", "fetch_status", "disposition", "cost",
            "politeness_delay_ms", "hops_path", "via", "source", "is_seed",
        ]
        schema = pa.schema(
            [
                (
                    c,
                    pa.int32() if c in i32
                    else pa.int64() if c in i64
                    else pa.bool_() if c in boolean
                    else pa.string(),
                )
                for c in cols
            ]
        )
        table = pa.Table.from_pylist(
            [{c: r[c] for c in cols} for r in sim.fetch_log], schema=schema
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return (
        f"select * from read_parquet('{path}') "
        "order by round, class_key, ordinal"
    )


QUERIES["crawl_rounds"] = q_crawl_rounds
ORACLE_SQL["crawl_rounds"] = _crawl_rounds_oracle()


def q_frontier_journal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FrontierJournal export equivalence (FrontierJournal.java:54-116):
    the engine's committed lineage table — F+ on novel schedule, Fe on
    emit, Fs/Ff/Fd/Fr on finish, per round — against the independent
    simulator's journal of the same fixture crawl, full-row equality."""
    return _fixture_crawl_lineage(spark).orderBy(
        "round", "tag", "class_key", "canon_url"
    )


def _frontier_journal_oracle() -> str:
    """Export the simulator's journal (recorded at the same write points
    the reference's FrontierJournal hooks: schedule, emit, finish)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from heritrix_spark.fixtures.gen import generate
    from heritrix_spark.oracle.simulator import simulate

    path = os.path.join(
        tempfile.gettempdir(),
        "hx_frontier_journal_oracle_h{hosts}d{docs_per_host}l{links_per_doc}"
        "s{seed}.parquet".format(**_CRAWL_FIXTURE),
    )
    if not os.path.exists(path):
        fx = generate(**_CRAWL_FIXTURE)
        sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), _CRAWL_CFG)
        schema = pa.schema(
            [
                ("round", pa.int32()),
                ("tag", pa.string()),
                ("canon_url", pa.string()),
                ("class_key", pa.string()),
            ]
        )
        table = pa.Table.from_pylist(sim.journal, schema=schema)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return (
        f"select * from read_parquet('{path}') "
        "order by round, tag, class_key, canon_url"
    )


QUERIES["frontier_journal"] = q_frontier_journal
ORACLE_SQL["frontier_journal"] = _frontier_journal_oracle()


# --------------------------- 22a. seeds report + source-tag host tally
#
# Both report rows read the SAME memoized fixture crawl as crawl_rounds
# (one crawl per process, like the reference's single StatisticsTracker
# feeding every report writer). Their oracles are computed by DuckDB SQL
# over the simulator's INDEPENDENT fetch log, so each row cross-checks
# the crawl (incl. heritable source propagation) AND the report law.


def _fixture_redirects_path() -> str:
    """Export the fixture's (doc_id → redirect Location) map — the
    docs-table half of SeedRecord.fillWith :108-118 — once per machine."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from heritrix_spark.fixtures.gen import generate

    path = os.path.join(
        tempfile.gettempdir(),
        "hx_crawl_redirects_srs_h{hosts}d{docs_per_host}l{links_per_doc}"
        "s{seed}.parquet".format(**_CRAWL_FIXTURE),
    )
    if not os.path.exists(path):
        fx = generate(**_CRAWL_FIXTURE)
        rows = [
            {"doc_id": doc_id, "redirect": spans[0]["media_ref"]}
            for doc_id, spans in fx.doc_map().items()
            if spans and spans[0]["kind"] == "redirect"
        ]
        schema = pa.schema([("doc_id", pa.string()), ("redirect", pa.string())])
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
        os.replace(tmp, path)
    return path


def q_seeds_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "[code] [status] [seed] [redirect]" seeds report
    (SeedsReport.java:38-70, SeedRecord most-recent-processing law) over
    the fixture crawl's fetch log."""
    from heritrix_spark.fixtures.gen import generate
    from heritrix_spark.operators.reports import seeds_report

    fx = generate(**_CRAWL_FIXTURE)
    docs = spark.createDataFrame(
        [(d, s) for d, s in fx.doc_map().items()],
        schema="doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    return seeds_report(_fixture_crawl_log(spark), docs)


def _seeds_report_oracle() -> str:
    log = "'" + _ORACLE_LOG_PATH + "'"
    red = "'" + _fixture_redirects_path() + "'"
    return f"""
with seed_rows as (
  select *, row_number() over (partition by canon_url order by round desc) as rn
  from read_parquet({log}) where is_seed
)
select fetch_status as status_code,
       case when fetch_status > 0 then 'CRAWLED' else 'NOTCRAWLED' end as status,
       url as seed,
       disposition,
       case when fetch_status in (301, 302) then r.redirect end as redirect
from seed_rows s left join read_parquet({red}) r on s.canon_url = r.doc_id
where rn = 1
order by status_code desc, seed asc
"""


def q_source_host_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "[source] [host] [#urls]" source report
    (SourceTagsReport.java:35-65; StatisticsTracker.saveSourceStats
    :765-780 tallies successful fetches per (seed source tag, host)) —
    pins the heritable source-tag propagation through every hop kind."""
    from heritrix_spark.operators.reports import source_tags_report

    return source_tags_report(_fixture_crawl_log(spark))


def _source_host_tally_oracle() -> str:
    return f"""
select source,
       regexp_extract(canon_url, '^\\w+://([^/:]+)', 1) as host,
       cast(count(*) as bigint) as n_urls
from read_parquet('{_ORACLE_LOG_PATH}')
where disposition = 'success' and source is not null
group by 1, 2
order by source asc, n_urls desc, host asc
"""


_ORACLE_LOG_PATH: str  # assigned below from the crawl_rounds exporter
_ORACLE_LOG_PATH = ORACLE_SQL["crawl_rounds"].split("'")[1]

QUERIES["seeds_report"] = q_seeds_report
ORACLE_SQL["seeds_report"] = _seeds_report_oracle()
QUERIES["source_host_tally"] = q_source_host_tally
ORACLE_SQL["source_host_tally"] = _source_host_tally_oracle()


# ------------------------------------------- 22b. span outlink extraction

# richer than _CRAWL_FIXTURE (more links per doc) and capped low so the
# outlink cap + discarded count are exercised on both sides
_EXTRACT_FIXTURE = dict(hosts=8, docs_per_host=6, links_per_doc=9, seed=11)
_EXTRACT_CAP = 7


def q_extract_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint's per-row invariant, as a driver row: span-sequence
    equality (kind, text, media_ref, order) of extracted outlinks.
    One row per surviving outlink of every fixture document —
    link_seq = span_pos * 2^20 + pos-in-span encodes the order law
    (ExtractorHTML.java processLink :600 / processEmbed :628; cap:
    AbstractFrontier.java:138, CrawlURI.incrementDiscardedOutLinks
    :1705). The oracle is an independent pure-Python twin of the same
    law exported to parquet (no shared extraction code: Catalyst
    posexplode/regexp_extract_all vs re.findall loop)."""
    from heritrix_spark.fixtures.gen import generate
    from heritrix_spark.operators.extract import extract_outlinks

    fx = generate(**_EXTRACT_FIXTURE)
    rows = []
    for i, (doc_id, spans) in enumerate(sorted(fx.doc_map().items()), start=1):
        rows.append(
            (
                doc_id,
                i,
                200,
                "",
                [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans],
            )
        )
    fetched = spark.createDataFrame(
        rows,
        schema=(
            "url string, ordinal long, fetch_status int, hops_path string, "
            "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        ),
    )
    links = extract_outlinks(fetched, max_outlinks=_EXTRACT_CAP)
    return links.select(
        "via",
        F.col("link_seq").cast("long").alias("link_seq"),
        "target",
        "hop_char",
        F.col("discarded_outlinks").cast("int").alias("discarded_outlinks"),
    ).orderBy("via", "link_seq")


def _extract_outlinks_oracle() -> str:
    """Pure-Python extraction twin (same law as oracle/simulator.py's
    inline extraction), exported once to parquet for DuckDB."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from heritrix_spark.fixtures.gen import generate
    from heritrix_spark.oracle.simulator import _URL_RE

    path = os.path.join(
        tempfile.gettempdir(),
        "hx_extract_outlinks_oracle_h{hosts}d{docs_per_host}"
        "l{links_per_doc}s{seed}c".format(**_EXTRACT_FIXTURE)
        + str(_EXTRACT_CAP)
        + ".parquet",
    )
    if not os.path.exists(path):
        fx = generate(**_EXTRACT_FIXTURE)
        out = []
        for doc_id, spans in sorted(fx.doc_map().items()):
            links: list[tuple[int, str, str]] = []
            for span_pos, sp in enumerate(spans):
                if sp["kind"] == "text":
                    for j, u in enumerate(_URL_RE.findall(sp["text"] or "")):
                        links.append((span_pos * (1 << 20) + j, u, "L"))
                elif sp["kind"] == "script":
                    for j, u in enumerate(_URL_RE.findall(sp["text"] or "")):
                        links.append((span_pos * (1 << 20) + j, u, "X"))
                elif sp["kind"] == "redirect":
                    if sp["media_ref"]:
                        links.append((span_pos * (1 << 20), sp["media_ref"], "R"))
                else:
                    if sp["media_ref"]:
                        links.append((span_pos * (1 << 20), sp["media_ref"], "E"))
            discarded = max(len(links) - _EXTRACT_CAP, 0)
            for seq, target, hop in links[:_EXTRACT_CAP]:
                out.append(
                    {
                        "via": doc_id,
                        "link_seq": seq,
                        "target": target,
                        "hop_char": hop,
                        "discarded_outlinks": discarded,
                    }
                )
        schema = pa.schema(
            [
                ("via", pa.string()),
                ("link_seq", pa.int64()),
                ("target", pa.string()),
                ("hop_char", pa.string()),
                ("discarded_outlinks", pa.int32()),
            ]
        )
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pylist(out, schema=schema), tmp)
        os.replace(tmp, path)
    return (
        "select via, link_seq, target, hop_char, discarded_outlinks "
        f"from read_parquet('{path}') order by via, link_seq"
    )


QUERIES["extract_outlinks"] = q_extract_outlinks
ORACLE_SQL["extract_outlinks"] = _extract_outlinks_oracle()


# -------------------------------------------------- 23. queue precedence policies

@register(
    "queue_precedence",
    f"""
    with u as ({_DUCK_URLS}),
    k as (select {class_key_sql(canonicalize_sql('url'))} as class_key,
                 precedence,
                 case when fetch_status > 0 then 1 else 0 end as succ
          from u),
    agg as (select class_key, min(precedence) as min_prec,
                   sum(succ) as successes
            from k group by class_key)
    select class_key,
      cast(3 as int) as base_precedence,
      cast(3 + min_prec as int) as highest_uri_precedence,
      cast(2 + case when successes <= 0 then 0
                    when successes <= 100 then 1
                    else 1 + cast(ceil((successes - 100)::double / 1000) as int)
               end as int) as success_counts_precedence
    from agg order by class_key
    """,
)
def q_queue_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.operators.prepare import (
        base_queue_precedence_col,
        highest_uri_queue_precedence_col,
        success_counts_queue_precedence_col,
    )

    u = _docs_urls(spark, sf_dir).select(
        class_key_col(canonicalize_col("url")).alias("class_key"),
        "precedence",
        F.when(F.col("fetch_status") > 0, 1).otherwise(0).alias("succ"),
    )
    agg = u.groupBy("class_key").agg(
        F.min("precedence").alias("min_prec"),
        F.sum("succ").alias("successes"),
    )
    return agg.select(
        "class_key",
        base_queue_precedence_col().cast("int").alias("base_precedence"),
        highest_uri_queue_precedence_col(F.col("min_prec"))
        .cast("int")
        .alias("highest_uri_precedence"),
        success_counts_queue_precedence_col(F.col("successes"))
        .cast("int")
        .alias("success_counts_precedence"),
    ).orderBy("class_key")


# -------------------------------------------------- 24. fixup + full canonicalization

@register(
    "uuri_fixup",
    None,  # placeholder replaced below (needs fixup_sql import)
)
def q_uuri_fixup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from heritrix_spark.functions.fixup import fixup_col, full_canonicalize_col

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    messy = spark.sql(
        "select doc_id, "
        "case when doc_id % 7 = 0 then ' HTTP://Host' || cast(doc_id % 9 as string)"
        "  || '.Example.COM:80/A B/' || cast(doc_id as string) || '#frag ' "
        "when doc_id % 7 = 1 then 'https://H' || cast(doc_id % 9 as string)"
        "  || '.example:443/x/' || cast(doc_id as string) "
        "when doc_id % 7 = 2 then 'http://h' || cast(doc_id % 9 as string)"
        "  || '.example.' "
        "when doc_id % 7 = 3 then 'http://h' || cast(doc_id % 9 as string)"
        "  || '.example/a/b/../c/./' || cast(doc_id as string) || '/../d' "
        "when doc_id % 7 = 4 then 'http://h' || cast(doc_id % 9 as string)"
        "  || '.example' || chr(92) || 'p' || cast(doc_id as string)"
        "  || '/q?x' || chr(92) || 'y' "
        "when doc_id % 7 = 5 then 'http:///h' || cast(doc_id % 9 as string)"
        "  || '.example/%2 ' || chr(160) || 'z\"<>' "
        "else 'http://h' || cast(doc_id % 9 as string) || '.example' end as raw_url "
        "from documents"
    )
    return messy.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        fixup_col("raw_url").alias("fixed_url"),
        full_canonicalize_col(F.col("raw_url")).alias("canon_url"),
    ).orderBy("doc_id")


def _uuri_fixup_oracle() -> str:
    from heritrix_spark.functions.fixup import fixup_sql, full_canonicalize_sql

    messy = (
        "select doc_id, "
        "case when doc_id % 7 = 0 then ' HTTP://Host' || cast(doc_id % 9 as string)"
        "  || '.Example.COM:80/A B/' || cast(doc_id as string) || '#frag ' "
        "when doc_id % 7 = 1 then 'https://H' || cast(doc_id % 9 as string)"
        "  || '.example:443/x/' || cast(doc_id as string) "
        "when doc_id % 7 = 2 then 'http://h' || cast(doc_id % 9 as string)"
        "  || '.example.' "
        "when doc_id % 7 = 3 then 'http://h' || cast(doc_id % 9 as string)"
        "  || '.example/a/b/../c/./' || cast(doc_id as string) || '/../d' "
        "when doc_id % 7 = 4 then 'http://h' || cast(doc_id % 9 as string)"
        "  || '.example' || chr(92) || 'p' || cast(doc_id as string)"
        "  || '/q?x' || chr(92) || 'y' "
        "when doc_id % 7 = 5 then 'http:///h' || cast(doc_id % 9 as string)"
        "  || '.example/%2 ' || chr(160) || 'z\"<>' "
        "else 'http://h' || cast(doc_id % 9 as string) || '.example' end as raw_url "
        "from documents"
    )
    return (
        f"with m as ({messy}) "
        f"select cast(doc_id as bigint) as doc_id, "
        f"{fixup_sql('raw_url')} as fixed_url, "
        f"{full_canonicalize_sql('raw_url')} as canon_url "
        f"from m order by doc_id"
    )


ORACLE_SQL["uuri_fixup"] = _uuri_fixup_oracle()


# IDN punycode goldens (UURIFactoryTest.testIdn :896-911 + ASCII controls).
# DuckDB cannot punycode, so the twin carries the reference's EXPECTED
# outputs as literals — the row is a golden-value equality check of the
# vectorized Arrow IDN pass, driven over the documents table.
_IDN_CASES = [
    ("http://räksmörgås.josefßon.org/pg", "http://xn--rksmrgs-5wao1o.josefsson.org/pg"),
    ("http://www.pølse.dk/pg", "http://www.xn--plse-gra.dk/pg"),
    ("http://例子.測試/pg", "http://xn--fsqu00a.xn--g6w251d/pg"),
    ("HTTP://Ascii.Example.COM:80/pg", "http://ascii.example.com/pg"),
    ("http://mixed.pølse.example/pg", "http://mixed.xn--plse-gra.example/pg"),
]


def _uuri_fixup_idn_oracle() -> str:
    rows = ", ".join(
        f"({i}, '{out}')" for i, (_, out) in enumerate(_IDN_CASES)
    )
    return (
        "select cast(doc_id as bigint) as doc_id, "
        "g.fixed_url as fixed_url "
        f"from documents join (values {rows}) g(k, fixed_url) "
        f"on doc_id % {len(_IDN_CASES)} = g.k order by doc_id"
    )


# Rabin createKey goldens. The first two rows ARE the reference's pinned
# values (BdbUriUniqFilterTest.java:89-97); the rest extend coverage
# (host-prefix locality: the two archive.org rows share top-24 bits).
_RABIN_CASES = [
    ("dns:archive.org", 8812917769287344085),
    ("http://archive.org/index.html", 6613237167064754714),
    ("http://archive.org/", 6613237824548237978),
    ("http://www.example.com/path?query", -7722286901541459949),
    ("https://h1.example:8443/a/b", 6889880003418391114),
    ("http://xn--rksmrgs-5wao1o.josefsson.org/", -3277284127019727556),
]


def _rabin_fp_oracle() -> str:
    rows = ", ".join(
        f"({i}, '{u}', cast({k} as bigint))"
        for i, (u, k) in enumerate(_RABIN_CASES)
    )
    return (
        "select cast(doc_id as bigint) as doc_id, g.url as url, "
        "g.rabin_key as rabin_key "
        f"from documents join (values {rows}) g(k, url, rabin_key) "
        f"on doc_id % {len(_RABIN_CASES)} = g.k order by doc_id"
    )


@register("rabin_fp", _rabin_fp_oracle())
def q_rabin_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BdbUriUniqFilter.createKey Rabin fingerprints (FPGenerator
    std24/std40 GF(2^d) law, st/ata/util/FPGenerator.java; createKey
    BdbUriUniqFilter.java:303-312) as ONE vectorized Arrow pass — the
    oracle carries the reference's golden key values as literals."""
    from heritrix_spark.functions.rabin import rabin_key_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.element_at(
        F.array(*[F.lit(u) for u, _ in _RABIN_CASES]),
        (F.col("doc_id") % len(_RABIN_CASES)).cast("int") + 1,
    )
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            url.alias("url"),
            rabin_key_col(url).alias("rabin_key"),
        )
        .orderBy("doc_id")
    )


@register("uuri_fixup_idn", _uuri_fixup_idn_oracle())
def q_uuri_fixup_idn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN-punycode fixup (fixupDomainlabel, UURIFactory.java:586-611;
    gnu.inet.encoding.IDNA goldens UURIFactoryTest.java:896-911) as the
    Arrow-vectorized :func:`fixup_idn_col` pass — the oracle holds the
    reference's expected punycode outputs as literals."""
    from heritrix_spark.functions.fixup import fixup_idn_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = F.element_at(
        F.array(*[F.lit(u) for u, _ in _IDN_CASES]),
        (F.col("doc_id") % len(_IDN_CASES)).cast("int") + 1,
    )
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            fixup_idn_col(raw).alias("fixed_url"),
        )
        .orderBy("doc_id")
    )


# -------------------------------------------------- 25. assignment-level queue keys

def _assignment_oracle() -> str:
    from heritrix_spark.functions.psl import psl_rules_cte, reduce_surt_sql

    ck = class_key_sql(canonicalize_sql("url"))
    return f"""
    with {psl_rules_cte()},
    u as ({_DUCK_URLS}),
    k as (select {reduce_surt_sql(ck)} as assign_key from u)
    select assign_key, cast(count(*) as bigint) as n
    from k group by assign_key order by assign_key
    """


@register("assignment_level_key", _assignment_oracle())
def q_assignment_level_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AssignmentLevelSurtQueueAssignmentPolicy + PublicSuffixes.reduce
    (heritrix3/engine/.../AssignmentLevelSurtQueueAssignmentPolicy.java:30-40,
    commons/.../net/PublicSuffixes.java:291-299): queue keys reduced to
    registered-domain level."""
    from heritrix_spark.functions.psl import reduce_surt_authority_col

    u = _docs_urls(spark, sf_dir).select(
        reduce_surt_authority_col(class_key_col(canonicalize_col("url"))).alias(
            "assign_key"
        )
    )
    return (
        u.groupBy("assign_key")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("assign_key")
    )


# -------------------------------------------------- 26. tri-level substats tally

_DISPO_SQL = """
    case when fetch_status > 0 then 'success'
         when fetch_status in (-9998, -5002, -5000, -5001, -4002, -4001, -6000)
           then 'disregard'
         when fetch_status in (-50, -2, -3, -1) and attempts < 30 then 'retry'
         else 'failure' end
""".strip()


def _substats_oracle() -> str:
    from heritrix_spark.functions.psl import psl_rules_cte, reduce_surt_sql

    ck = class_key_sql(canonicalize_sql("url"))
    hostkey = "regexp_replace(key, '#[0-9]+$', '')"
    return f"""
    with {psl_rules_cte()},
    u as ({_DUCK_URLS}),
    d as (select {ck} as key, {_DISPO_SQL} as disposition from u),
    lev as (
      select 'server' as level, key, disposition from d
      union all
      select 'host', {hostkey}, disposition from d
      union all
      select 'group', {reduce_surt_sql(hostkey)}, disposition from d
    )
    select level, key,
      cast(count(*) as bigint) as emitted,
      cast(sum(case when disposition = 'success' then 1 else 0 end) as bigint)
        as fetch_successes,
      cast(sum(case when disposition = 'failure' then 1 else 0 end) as bigint)
        as fetch_failures,
      cast(sum(case when disposition = 'disregard' then 1 else 0 end) as bigint)
        as fetch_disregards,
      cast(sum(case when disposition = 'retry' then 1 else 0 end) as bigint)
        as fetch_retries
    from lev group by level, key order by level, key
    """


@register("substats_tally", _substats_oracle())
def q_substats_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tri-level FetchStats tally (AbstractFrontier.tally :615-630):
    server / host / frontier-group rollup, one shuffle via membership
    explode (operators/reports.py substats_tally)."""
    from heritrix_spark.operators.budget import disposition_col
    from heritrix_spark.operators.reports import substats_tally

    log = _docs_urls(spark, sf_dir).select(
        class_key_col(canonicalize_col("url")).alias("class_key"),
        disposition_col(F.col("fetch_status"), F.col("attempts")).alias("disposition"),
    )
    return substats_tally(log)


# ------------------------------------ 26b. crawled-bytes histotable + display


def _duck_format_bytes(b: str) -> str:
    """ArchiveUtils.formatBytesForDisplay as DuckDB SQL (twin of
    reports.format_bytes_col): round_even = NumberFormat HALF_EVEN,
    printf('%,d') = the US grouping commas."""
    arms = []
    for p, unit in enumerate([" B", " KiB", " MiB", " GiB", " TiB"]):
        disp = f"(({b})::double / {float(1024 ** p)})"
        rend = (
            f"case when {disp} < 10 then printf('%.1f', round_even({disp}, 1)) "
            f"else printf('%,d', cast(round_even({disp}, 0) as bigint)) end"
            f" || '{unit}'"
        )
        if p == 0:
            cond = f"({b}) > 0 and ({b}) < 1024"
        elif p < 4:
            cond = f"({b}) >= {1024 ** p} and ({b}) < {1024 ** (p + 1)}"
        else:
            cond = f"({b}) >= {1024 ** 4}"
        arms.append(f"when {cond} then {rend}")
    return "case " + " ".join(arms) + " else '0 B' end"


@register(
    "crawled_bytes",
    f"""
    with fl as (
      select case when doc_id % 7 = 2 then 304 else 200 end as fetch_status,
             n_chars as content_size,
             doc_id % 4 = 1 as identical_digest
      from documents),
    t as (
      select case when fetch_status = 304 then 'notModified'
                  when identical_digest then 'dupByHash'
                  else 'novel' end as class,
             content_size from fl)
    select class, cast(sum(content_size) as bigint) as bytes,
           cast(count(*) as bigint) as urls,
           {_duck_format_bytes('cast(sum(content_size) as bigint)')} as display
    from t group by class order by class
    """,
)
def q_crawled_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CrawledBytesHistotable (CrawledBytesHistotable.java:45-56):
    novel / dupByHash / notModified byte+URL tallies with the
    reference's precedence (304 beats identical-digest), plus each
    class's byte total rendered with the ArchiveUtils display law the
    reference's summary() uses (ArchiveUtils.java:579-598 — HALF_EVEN,
    grouping commas, <10 gets one fraction digit)."""
    from heritrix_spark.operators.reports import crawled_bytes_histotable

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fl = docs.select(
        F.when(F.col("doc_id") % 7 == 2, 304).otherwise(200).alias("fetch_status"),
        F.col("n_chars").alias("content_size"),
        (F.col("doc_id") % 4 == 1).alias("identical_digest"),
    )
    return crawled_bytes_histotable(fl)


# -------------------------------------------------- 27. cost assignment policies

@register(
    "cost_policies",
    f"""
    with u as ({_DUCK_URLS}),
    c as (select doc_id, {canonicalize_sql('url')} as canon_url from u)
    select cast(doc_id as bigint) as doc_id,
      cast(1 + case when contains(canon_url, '?') then 1 else 0 end as int)
        as wag_cost,
      cast(1 + case when regexp_matches(canon_url,
        '(?i)(calendar)|(\\bdate\\b)|(\\byear\\b)|(\\bmonth\\b)|(\\bday\\b)')
        then 1 else 0 end as int) as anti_calendar_cost,
      cast(1 as int) as unit_cost
    from c order by doc_id
    """,
)
def q_cost_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost assignment policies (WagCostAssignmentPolicy.java:41-64,
    AntiCalendarCostAssignmentPolicy.java:41-58, UnitCost default)."""
    from heritrix_spark.operators.prepare import (
        anti_calendar_cost_col,
        unit_cost_col,
        wag_cost_col,
    )

    u = _docs_urls(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        canonicalize_col("url").alias("canon_url"),
    )
    return u.select(
        "doc_id",
        wag_cost_col(F.col("canon_url")).cast("int").alias("wag_cost"),
        anti_calendar_cost_col(F.col("canon_url")).cast("int").alias(
            "anti_calendar_cost"
        ),
        unit_cost_col().cast("int").alias("unit_cost"),
    ).orderBy("doc_id")


# -------------------------------------------------- 28. implied URIs ('I' hops)

_IMG_URL = (
    "'http://host' || cast(doc_id % 40 as string) || '.example/dir'"
    " || cast(doc_id % 5 as string) || '/pic' || cast(doc_id % 17 as string)"
    " || '.jpg'"
)

_IMPLIED_PATTERN = r"^(https?://[^?]+/)[^/?]+\.(?:jpg|png|gif)$"


@register(
    "implied_uris",
    f"""
    with links as (select {_IMG_URL} as target from documents)
    select distinct regexp_replace(target, '{_IMPLIED_PATTERN}', '\\1') as implied,
      'I' as hop_char
    from links
    where regexp_matches(target, '{_IMPLIED_PATTERN}')
    order by implied
    """,
)
def q_implied_uris(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorImpliedURI analog (modules/.../extractor/ExtractorImpliedURI.java):
    infer the containing directory of image URLs, hop char 'I'."""
    from heritrix_spark.operators.extract import implied_uris

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    links = spark.sql(f"select {_IMG_URL} as target from documents").select(
        "target", F.lit(0).cast("long").alias("link_seq")
    )
    inferred = implied_uris(links)
    return (
        inferred.select(F.col("target").alias("implied"), "hop_char")
        .distinct()
        .orderBy("implied")
    )


# -------------------------------------------------- 29. content digest (Base32)

def _b32_sql(hex_expr: str) -> str:
    """DuckDB twin of pipeline.dedup.base32_of_hex160_col."""
    alph = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    parts = []
    for j in range(4):
        chunk = f"('0x' || substr({hex_expr}, {j * 10 + 1}, 10))::BIGINT"
        for k in range(7, -1, -1):
            parts.append(f"substr('{alph}', cast((({chunk}) >> {5 * k}) & 31 as int) + 1, 1)")
    return " || ".join(parts)


@register(
    "content_digest",
    f"""
    select cast(doc_id as bigint) as doc_id,
           {_b32_sql("substr(sha256(text), 1, 40)")} as digest_b32
    from documents order by doc_id
    """,
)
def q_content_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base32 digest formatting (CrawlURI.java:983-1014 uses SHA1+Base32;
    the oracle pair uses sha256's first 160 bits because DuckDB lacks
    sha1 — the Base32 column math under test is identical, and
    pipeline.dedup.content_digest_col applies it to sha1 in the engine)."""
    from heritrix_spark.pipeline.dedup import base32_of_hex160_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        base32_of_hex160_col(
            F.substring(F.sha2(F.col("text"), 256), 1, 40)
        ).alias("digest_b32"),
    ).orderBy("doc_id")


# -------------------------------------------------- 31. scope-rule fold decisions

# Derived URL/hops mixture exercising every rule of the default scope
# chain (DecideRuleSequence.java:78-95 last-non-NONE-wins fold):
# out-of-set schemes, non-authority URIs, pathological repeats (marked
# with a literal '/x/x/x/' so the DuckDB twin needs no backrefs),
# 25-segment-deep paths, and hops mixes covering transclusion's
# R-doesn't-count / X-capped semantics plus the overflow-count form.
SCOPE_URL_DERIVATION = """
  case when doc_id % 13 = 0 then 'gopher://host1.example/a.html'
       when doc_id % 13 = 1 then 'mailto:crawler@example.org'
       when doc_id % 31 = 0 then
         'http://host' || cast(doc_id % 40 as string) || '.example/x/x/x/page.html'
       when doc_id % 29 = 0 then
         'http://host' || cast(doc_id % 40 as string) || '.example' || repeat('/s', 25) || '/p.html'
       else 'http://host' || cast(doc_id % 40 as string) || '.example/p/page' || cast(doc_id % 13 as string) || '.html'
  end
""".strip()

SCOPE_HOPS_DERIVATION = """
  case cast(doc_id % 8 as int)
       when 0 then ''
       when 1 then 'LLL'
       when 2 then 'LLE'
       when 3 then 'LLRRE'
       when 4 then 'LXX'
       when 5 then 'LLEEE'
       when 6 then 'LLP'
       else '25+' || repeat('L', 49)
  end
""".strip()

_SCOPE_PREFIXES = [
    "http://(example,host1",
    "http://(example,host2",
    "http://(example,host3",
]


def _scope_oracle() -> str:
    surt = surt_sql("url")
    prefix_pred = " or ".join(
        f"starts_with({surt}, '{p}')" for p in _SCOPE_PREFIXES
    )
    tail = "regexp_extract(hops, '^(?:[0-9]+\\+)?(.*)$', 1)"
    trailing = f"regexp_extract({tail}, '([^L]*)$', 1)"
    hopn = (
        "cast(coalesce(nullif(regexp_extract(hops, '^([0-9]+)\\+', 1), ''), '0') as int)"
        f" + length({tail})"
    )
    nonref = f"length(replace({trailing}, 'R', ''))"
    spec = f"(length({trailing}) - length(replace({trailing}, 'X', '')))"
    pathpart = "regexp_replace(url, '^[a-z]+://[^/]*', '')"
    segs = f"(length({pathpart}) - length(replace({pathpart}, '/', '')))"
    scheme = "lower(regexp_extract(url, '^([a-zA-Z0-9]+):', 1))"
    return f"""
    with u as (select doc_id, {SCOPE_URL_DERIVATION} as url,
                      {SCOPE_HOPS_DERIVATION} as hops from documents),
    folded as (
      select doc_id,
        case
          when {scheme} not in ('http', 'https', 'ftp') then false
          when {tail} like '%P' then true
          when {segs} > 20 then false
          when url like '%/x/x/x/%' then false
          when length({trailing}) > 0 and {spec} <= 1 and {nonref} <= 2 then true
          when {hopn} > 20 then false
          when {prefix_pred} then true
          else false
        end as in_scope
      from u)
    select cast(doc_id as bigint) as doc_id, in_scope
    from folded order by doc_id
    """


@register("scope_decisions", _scope_oracle())
def q_scope_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecideRuleSequence fold over the default scope chain
    (DecideRuleSequence.java:78-95; rules per operators/scope.py). The
    oracle expresses the same fold as a reversed-priority CASE (the
    last-written rule is the first CASE arm)."""
    from heritrix_spark.operators.scope import default_scope

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    u = spark.sql(
        f"select doc_id, {SCOPE_URL_DERIVATION} as url, "
        f"{SCOPE_HOPS_DERIVATION} as hops from documents"
    )
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        default_scope(F.col("url"), F.col("hops"), _SCOPE_PREFIXES).alias(
            "in_scope"
        ),
    ).orderBy("doc_id")


# -------------------------------------------------- 32. recover-journal import

_JOURNAL_LINES = """
  select (case cast(doc_id % 5 as int)
          when 0 then 'F+' when 1 then 'F+' when 2 then 'Fs'
          when 3 then 'Ff' else 'Fe' end)
         || ' http://host' || cast(doc_id % 40 as string)
         || '.example/p' || cast(doc_id % 211 as string) || '.html' as line
  from documents
""".strip()


@register(
    "journal_import",
    f"""
    with j as ({_JOURNAL_LINES}),
    parsed as (select regexp_extract(line, '^(\\S+) ', 1) as tag,
                      regexp_extract(line, '^\\S+ (\\S+)', 1) as canon_url
               from j),
    added as (select distinct canon_url from parsed where tag = 'F+'),
    finished as (select distinct canon_url from parsed
                 where tag in ('Fs', 'Ff', 'Fd'))
    select canon_url from added
    where canon_url not in (select canon_url from finished)
    order by canon_url
    """,
)
def q_journal_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recover-log replay (FrontierJournal.importRecoverLog :166+,
    AbstractFrontier.importRecoverFormat :894-952): F+ URIs re-schedule
    unless already finished (Fs/Ff/Fd)."""
    from heritrix_spark.operators.journal import (
        import_recover_log,
        parse_recover_log,
    )

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    lines = spark.sql(_JOURNAL_LINES)
    journal = parse_recover_log(spark, lines)
    to_schedule, _ = import_recover_log(journal)
    return to_schedule.orderBy("canon_url")


# ------------------------------ 32g. action-directory hot-folder import

@register(
    "action_directory",
    """
    with d as (select cast(doc_id as bigint) as id from documents),
    n as (
      select 'note' as op, 'http://u' || id || '/' as canon_url,
             '' as hops_path, cast(null as varchar) as via,
             false as force_fetch
      from d where id % 2 = 0
      union all
      select 'note', 'http://q' || id || '/', '', cast(null as varchar),
             false
      from d where id % 5 = 0
    ),
    s as (
      select 'schedule' as op, 'http://u' || id || '/' as canon_url,
             'L' as hops_path, 'http://u' || (id // 3) || '/' as via,
             false as force_fetch
      from d
    )
    select op, canon_url, hops_path, via, force_fetch
    from (select * from n union all select * from s)
    order by op, canon_url
    """,
)
def q_action_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ActionDirectory ``.recover`` routing (ActionDirectory.java
    :205-258 → AbstractFrontier.importRecoverFormat :894-952): the
    two-pass law — ``F[si]`` lines noted as included, then every
    ``F+`` line re-scheduled with its via, short vias nulled.  The
    fixture synthesizes the recover log from documents (one F+ line
    per doc, Fs for evens, Fi for id%5) and the DuckDB twin re-derives
    both passes' output from the same parameters."""
    from heritrix_spark.operators.actions import act_on_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("id")
    )
    u = F.concat(F.lit("http://u"), F.col("id"), F.lit("/"))
    via = F.concat(F.lit("http://u"), F.expr("id div 3"), F.lit("/"))
    lines = docs.select(
        F.explode(
            F.array_compact(
                F.array(
                    F.concat(F.lit("F+ "), u, F.lit(" L "), via),
                    F.when(F.col("id") % 2 == 0, F.concat(F.lit("Fs "), u)),
                    F.when(
                        F.col("id") % 5 == 0,
                        F.concat(
                            F.lit("Fi http://q"), F.col("id"), F.lit("/")
                        ),
                    ),
                )
            )
        ).alias("line")
    )
    return act_on_lines("frontier.recover.gz", lines).orderBy(
        "op", "canon_url"
    )


# ------------------------------------ 32b. recovery-log seed attribution

@register(
    "recovery_seed_map",
    """
    with recursive ids as (select cast(doc_id as bigint) as id from documents),
    r as (
      select id, id // 3 as anc from ids where id >= 10
      union all
      select id, anc // 3 from r where anc >= 10
    )
    select 'http://u' || id || '/' as canon_url,
           'http://u' || anc || '/' as seed,
           true as seed_found,
           id % 2 = 0 as crawled
    from r where anc < 10
    order by canon_url
    """,
)
def q_recovery_seed_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RecoveryLogMapper (RecoveryLogMapper.java:120-199): every
    discovered URL in a recover log collapsed to its seed through the
    chain of F+ vias (pointer doubling — O(log depth) self-joins), with
    the Fs crawled mark.  Fixture: doc i's via is doc i//3, docs 0-9
    are 2-word seed lines; the DuckDB twin is a recursive-CTE chain
    walk over the same ids."""
    from heritrix_spark.operators.journal import (
        parse_recover_log,
        recovery_log_mapper,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("id")
    )
    url = F.concat(F.lit("http://u"), F.col("id"), F.lit("/"))
    via = F.concat(F.lit("http://u"), F.expr("id div 3"), F.lit("/"))
    adds = docs.select(
        F.when(
            F.col("id") < 10, F.concat(F.lit("F+ "), url)
        ).otherwise(
            F.concat(F.lit("F+ "), url, F.lit(" L "), via)
        ).alias("line")
    )
    fs = docs.filter(F.col("id") % 2 == 0).select(
        F.concat(F.lit("Fs "), url).alias("line")
    )
    journal = parse_recover_log(spark, adds.unionByName(fs))
    return recovery_log_mapper(journal).orderBy("canon_url")


# -------------------------------------------------- 33. salted per-host counts

_CK_DERIVATION = (
    "'example,host' || cast(doc_id % 40 as string) || ',' "
)


@register(
    "salted_counts",
    f"""
    select {_CK_DERIVATION} as class_key,
           cast(count(*) as bigint) as n_urls
    from documents group by 1 order by class_key
    """,
)
def q_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-host salted sub-queueing (parallelQueues analog,
    URIAuthorityBasedQueueAssignmentPolicy.getSubqueue): per-host counts
    via salted partials + desalted combine MUST equal the plain
    group-by — the oracle is that plain group-by, so any salt/desalt
    asymmetry fails the row hash."""
    from heritrix_spark.operators.salt import salted_counts

    u = _docs_urls(spark, sf_dir).withColumn(
        "class_key", F.expr(_CK_DERIVATION)
    )
    return salted_counts(u).orderBy("class_key")


# ------------------------------------ 32e. DOC hyperlink extraction

@register(
    "doc_extract",
    """
    with d as (select cast(doc_id as bigint) as id from documents),
    g as (select id, 'http://u' || id || '/dir/f.doc' as base,
                 case when id % 4 = 1 then 'text/plain'
                      else 'application/msword' end as ct
          from d),
    l as (
      select id, base,
             'http://u' || id || '/dir/p' || (id % 7) || '.html' as dest
      from g where ct = 'application/msword'
      union all
      select id, base, 'http://abs' || (id % 5) || '/q'
      from g where ct = 'application/msword' and id % 3 = 0
    )
    select base, dest, 'L' as hop from l order by base, dest
    """,
)
def q_doc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorDOC (ExtractorDOC.java:47,75-121): reluctant
    HYPERLINK-field scan over the decoded word97 text, each match a
    NAVLINK resolved against the base URI — relative refs resolve,
    mimetype-gated on application/msword.  The binary Doc.getText
    decode is the stubbed codec; the fixture plants the decoded text
    deterministically and the DuckDB twin re-derives the expected link
    set from the same parameters."""
    from heritrix_spark.operators.content_extract import doc_links

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("id")
    )
    base = F.concat(F.lit("http://u"), F.col("id"), F.lit("/dir/f.doc"))
    text = F.concat(
        F.lit('a HYPERLINK "p'),
        F.col("id") % 7,
        F.lit('.html" b'),
        F.when(
            F.col("id") % 3 == 0,
            F.concat(F.lit(' HYPERLINK "http://abs'), F.col("id") % 5, F.lit('/q"')),
        ).otherwise(F.lit("")),
    )
    ct = F.when(F.col("id") % 4 == 1, F.lit("text/plain")).otherwise(
        F.lit("application/msword")
    )
    df = docs.select(
        base.alias("url"), text.alias("doc_text"), ct.alias("content_type")
    )
    return doc_links(df).orderBy("base", "dest")


# ------------------------------------ 32f. SWF link mining

@register(
    "swf_extract",
    """
    with d as (select cast(doc_id as bigint) as id from documents),
    g as (select id,
            'http://u' || id ||
              (case when id % 4 = 1 then '/m.swf' else '/m.bin' end) as base,
            'http://v' || id || '/dir/' as via
          from d where id % 4 < 2),
    l as (
      select base, via || 'img/e' || (id % 7) || '.gif' as dest, 'E' as hop
      from g
      union all
      select base, 'http://s' || (id % 5) || '/t', 'X' from g
      union all
      select base, 'http://u' || id || '/pop' || (id % 3) || '.html', 'X'
      from g
    )
    select base, dest, hop from l order by base, dest, hop
    """,
)
def q_swf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorSWF (ExtractorSWF.java:66-76 gate, CrawlUriSWFAction
    :289-360 link law): decoded flash tag/action events → EMBED links
    resolved against the via, push/lookupTable strings through the
    isLikelyUri gate → SPECULATIVE, javascript: getURLs through the
    ExtractorJS string scan against the base.  The javaswf binary
    decode is the stubbed codec; the fixture plants the decoded event
    stream deterministically (one relative embed, one likely push
    string, one javascript: pseudo-URL per doc; mimetype/suffix gate
    cycled over id%4 — null content-type and non-flash rows must
    vanish) and the DuckDB twin re-derives the expected links from the
    same parameters."""
    from heritrix_spark.operators.content_extract import swf_links

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("id")
    )
    base = F.concat(
        F.lit("http://u"),
        F.col("id"),
        F.when(F.col("id") % 4 == 1, F.lit("/m.swf")).otherwise(F.lit("/m.bin")),
    )
    via = F.concat(F.lit("http://v"), F.col("id"), F.lit("/dir/"))
    ct = (
        F.when(
            F.col("id") % 4 == 0, F.lit("application/x-shockwave-flash")
        )
        .when(F.col("id") % 4 == 1, F.lit("text/plain"))  # .swf suffix rescues
        .when(F.col("id") % 4 == 3, F.lit("text/html"))   # gated out
        # id % 4 == 2 -> null content-type: never extracts (:66-70)
    )
    ev = lambda kind, value: F.struct(  # noqa: E731
        F.lit(kind).alias("kind"), value.alias("value")
    )
    events = F.array(
        ev("url", F.concat(F.lit("img/e"), F.col("id") % 7, F.lit(".gif"))),
        ev("url", F.concat(
            F.lit('javascript:f("pop'), F.col("id") % 3, F.lit('.html")')
        )),
        ev("string", F.concat(F.lit("http://s"), F.col("id") % 5, F.lit("/t"))),
        ev("string", F.lit("not a uri")),  # fails isLikelyUri, dropped
    )
    df = docs.select(
        base.alias("url"),
        via.alias("via"),
        events.alias("swf_events"),
        ct.alias("content_type"),
    )
    return swf_links(df).orderBy("base", "dest", "hop")


# ------------------------------------ 32d. mirror-writer path mapping

@register(
    "mirror_paths",
    f"""
    with u as ({_DUCK_URLS}),
    c as (select doc_id, {canonicalize_sql('url')} as cu from u),
    p as (select doc_id, cu,
            regexp_extract(cu, '^https?://([^/?#]+)', 1) as host,
            regexp_extract(cu, '^https?://[^/?#]+(/[^?#]*)', 1) as path,
            case when contains(cu, '?')
                 then regexp_extract(cu, '\\?([^#]*)', 1) else '' end as query
          from c),
    e as (select *,
            regexp_extract(path, '/([^/]+)/[^/]*$', 1) as seg1,
            regexp_extract(path, '/([^/.]+)\\.html$', 1) as main
          from p),
    s as (select *,
            row_number() over (
              partition by lower(host || '/' || seg1 || '/' || main
                                 || query || '.html')
              order by doc_id) - 1 as seq
          from e)
    select cast(doc_id as bigint) as doc_id,
           host || '/' || seg1 || '/' || main
             || (case when seq > 0 then cast(seq as varchar) else '' end)
             || query || '.html' as mirror_path
    from s order by doc_id
    """,
)
def q_mirror_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MirrorWriterProcessor uriToFile (MirrorWriterProcessor.java
    :485-713): canonicalized URI → site-mirror file path — host dir,
    per-path-segment LumpyString mapping, query-concatenated filename
    with the suffix at the end, and batch collision numbering (the
    EndSegment uniqueness loop restated over the dataset).  The DuckDB
    twin re-derives the expected concatenation from the same canonical
    URLs (fixture segments are short, so no trim/too-long arms fire —
    those are pinned by tests/test_mirror.py goldens)."""
    from heritrix_spark.operators.mirror import mirror_paths

    u = _docs_urls(spark, sf_dir).withColumn("cu", canonicalize_col("url"))
    out = mirror_paths(u, url_col="cu", order_col="doc_id")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "mirror_path"
    ).orderBy("doc_id")


# ------------------------------ 32c. resource-size / class-key / geo rules

@register(
    "resource_rules",
    f"""
    with u as ({_DUCK_URLS}),
    k as (select doc_id, n_chars,
                 {class_key_sql(canonicalize_sql('url'))} as class_key,
                 case cast(doc_id % 5 as int)
                   when 1 then '' when 2 then 'xyz'
                   when 3 then null
                   else cast(n_chars as varchar) end as cl_header,
                 case cast(doc_id % 4 as int)
                   when 0 then 'us' when 1 then 'de' when 2 then 'fr'
                   else null end as country
          from u),
    p as (select *, coalesce(case when cl_header is not null
                                   and len(cl_header) > 0
                              then try_cast(cl_header as int) end, -1) as hlen
          from k)
    select cast(doc_id as bigint) as doc_id,
           hlen != -1 and hlen < 800 as no_longer_800,
           hlen != -1 and hlen > 800 as longer_800,
           n_chars < 800 as content_accept_800,
           regexp_matches(class_key, '^(?:.*host1.*)$') as ck_host1,
           coalesce(country in ('us', 'de'), false) as geo_allowed
    from p order by doc_id
    """,
)
def q_resource_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-fetch / midfetch rule family: ResourceNoLongerThan /
    ResourceLongerThan (header-parse law incl. empty/unparseable/missing
    → let pass, ResourceNoLongerThanDecideRule.java:80-128),
    ContentLengthDecideRule's binary accept (:52-57),
    ClassKeyMatchesRegexDecideRule (:56-59), and
    ExternalGeoLocationDecideRule membership with unknown-host false
    (:103-141)."""
    from heritrix_spark.operators.scope import (
        class_key_matches_regex_predicate,
        content_length_accept_predicate,
        external_geo_predicate,
        header_content_length_col,
        resource_longer_than_predicate,
        resource_no_longer_than_predicate,
    )

    u = _docs_urls(spark, sf_dir).withColumn(
        "class_key", class_key_col(canonicalize_col("url"))
    )
    header = (
        F.when(F.col("doc_id") % 5 == 1, F.lit(""))
        .when(F.col("doc_id") % 5 == 2, F.lit("xyz"))
        .when(F.col("doc_id") % 5 == 3, F.lit(None))
        .otherwise(F.col("n_chars").cast("string"))
    )
    country = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("us"))
        .when(F.col("doc_id") % 4 == 1, F.lit("de"))
        .when(F.col("doc_id") % 4 == 2, F.lit("fr"))
        .otherwise(F.lit(None))
    )
    hlen = header_content_length_col(header)
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        resource_no_longer_than_predicate(hlen, 800).alias("no_longer_800"),
        resource_longer_than_predicate(hlen, 800).alias("longer_800"),
        content_length_accept_predicate(F.col("n_chars"), 800).alias(
            "content_accept_800"
        ),
        class_key_matches_regex_predicate(F.col("class_key"), ".*host1.*").alias(
            "ck_host1"
        ),
        external_geo_predicate(country, ["us", "de"]).alias("geo_allowed"),
    ).orderBy("doc_id")


# ------------------------------------ 33b. consistent-hash parallel subqueues


def _duck_conhash_sql(up_to: int = 4, replicas: int = 8) -> str:
    from heritrix_spark.operators.conhash import circle_points, fp60_sql

    pts = circle_points(up_to, replicas)
    values = ", ".join(f"({loc}, {b})" for loc, b in pts)
    wrap_bucket = pts[0][1]
    return f"""
    with u as ({_DUCK_URLS}),
    circle(loc, bucket) as (values {values}),
    k as (select doc_id, {class_key_sql(canonicalize_sql('url'))} as class_key,
                 regexp_extract(url, '^\\w+://[^/]+/([^/?#]*)', 1) as seg
          from u),
    h as (select *, {fp60_sql('seg')} as hh from k),
    m as (select h.*,
                 (select min(loc) from circle where loc >= h.hh) as mloc
          from h),
    s as (select m.*,
                 coalesce((select bucket from circle where loc = m.mloc),
                          {wrap_bucket}) as sub
          from m)
    select cast(doc_id as bigint) as doc_id,
           case when seg is null or seg = '' or sub = 0 then class_key
                else class_key || '+' || sub end as subqueue_key
    from s order by doc_id
    """


@register("consistent_subqueues", _duck_conhash_sql())
def q_consistent_subqueues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact parallelQueues subqueue law: LongToIntConsistentHash
    replica circle + TreeMap-tailMap lookup with wraparound
    (LongToIntConsistentHash.java:84-109), first-path-segment basis and
    the bare-key quirks for empty segments / subqueue 0
    (URIAuthorityBasedQueueAssignmentPolicy.java:96-111).  The DuckDB
    twin replays the same circle as a VALUES table; the Spark side is a
    zero-shuffle literal-array scan (operators/conhash.py)."""
    from heritrix_spark.operators.conhash import parallel_class_key_col

    u = _docs_urls(spark, sf_dir).withColumn(
        "class_key", class_key_col(canonicalize_col("url"))
    )
    return u.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        parallel_class_key_col(
            F.col("class_key"), F.col("url"), 4, replicas=8
        ).alias("subqueue_key"),
    ).orderBy("doc_id")


# -------------------------------------------------- 34. quota enforcement

@register(
    "host_quotas",
    f"""
    with stats as (
      select {_CK_DERIVATION} as class_key,
             cast(sum(case when doc_id % 9 not in (0,2,3) then 1 else 0 end)
                  as bigint) as succeeded,
             cast(sum(case when doc_id % 9 not in (0,2,3) then n_chars
                  else 0 end) as bigint) as success_bytes
      from documents group by 1)
    select class_key, succeeded from stats
    where succeeded < 120 and success_bytes / 1024 < 900
    order by class_key
    """,
)
def q_host_quotas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuotaEnforcer (QuotaEnforcer.java:55-95): hosts over a success or
    novel-KB quota stop emitting; the query returns the still-eligible
    hosts with their success counts."""
    from heritrix_spark.operators.quota import Quotas, apply_quotas

    u = _docs_urls(spark, sf_dir).withColumn(
        "class_key", F.expr(_CK_DERIVATION)
    )
    is_succ = (F.col("fetch_status") > 0).cast("long")
    stats = u.groupBy("class_key").agg(
        F.sum(is_succ).alias("succeeded"),
        F.sum(F.when(F.col("fetch_status") > 0, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("success_bytes"),
    )
    ready = stats.select("class_key")
    within = apply_quotas(
        ready,
        stats,
        Quotas(max_successes_per_host=120, max_success_kb_per_host=900),
    )
    return (
        within.join(stats.select("class_key", "succeeded"), on="class_key")
        .select("class_key", F.col("succeeded").cast("long"))
        .orderBy("class_key")
    )


# -------------------------------------------------- 35. congestion ratio

_HOST_STATE_DERIVATION = f"""
  select class_key,
         cast((hid % 7) * 500 as bigint) as wake_time,
         hid % 13 = 0 as retired
  from (select distinct {_CK_DERIVATION} as class_key,
               cast(doc_id % 40 as int) as hid from documents)
""".strip()


@register(
    "congestion_report",
    f"""
    with hs as ({_HOST_STATE_DERIVATION}),
    nonempty as (select distinct {_CK_DERIVATION} as class_key from documents),
    j as (select h.wake_time from nonempty n
          join hs h on h.class_key = n.class_key
          where not h.retired)
    select cast(count(*) as bigint) as nonempty_queues,
           cast(sum(case when wake_time <= 1500 then 1 else 0 end) as bigint)
             as ready_queues,
           count(*) / greatest(sum(case when wake_time <= 1500 then 1 else 0 end), 1)
             as congestion_ratio
    from j
    """,
)
def q_congestion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """congestionRatio (WorkQueueFrontier.java:1564-1574): queues wanting
    attention per queue getting it, from derived frontier + host_state."""
    from heritrix_spark.operators.reports import congestion_ratio

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    frontier = spark.sql(
        f"select {_CK_DERIVATION} as class_key, doc_id as ordinal from documents"
    )
    host_state = spark.sql(_HOST_STATE_DERIVATION)
    return congestion_ratio(frontier, host_state, 1500)


# -------------------------------------------------- 36. queue depth report

@register(
    "queue_depths",
    f"""
    with d as (select {_CK_DERIVATION} as class_key, count(*) as c
               from documents group by 1)
    select avg(c) as average_depth,
           cast(max(c) as bigint) as deepest,
           cast(count(*) as bigint) as n_queues
    from d
    """,
)
def q_queue_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """averageDepth / deepestUri (WorkQueueFrontier :1547-1575)."""
    from heritrix_spark.operators.reports import average_queue_depth

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    frontier = spark.sql(
        f"select {_CK_DERIVATION} as class_key, doc_id as ordinal from documents"
    )
    return average_queue_depth(frontier)


# -------------------------------------------------- 37. named DecideRules fold

# URL/via/hops mixture exercising the named SURT-family and regex-family
# rules: host1/2/3 plus sub.* subdomains, media extensions for the file-
# pattern presets, link-depth hops, and null-via seeds.
NAMED_URL_DERIVATION = """
  'http://' ||
  case when doc_id % 4 = 0 then 'sub.' else '' end ||
  'host' || cast(doc_id % 3 + 1 as string) || '.example/p' ||
  cast(doc_id % 7 as string) || '/file' || cast(doc_id % 5 as string) ||
  case cast(doc_id % 6 as int)
       when 0 then '.jpg' when 1 then '.mp3' when 2 then '.pdf'
       when 3 then '.swf' else '.html' end
""".strip()

NAMED_HOPS_DERIVATION = """
  case cast(doc_id % 4 as int) when 0 then '' when 1 then 'LL'
       when 2 then 'LLLL' else 'LE' end
""".strip()

NAMED_VIA_DERIVATION = """
  case when doc_id % 5 = 0 then cast(null as string)
       else 'http://host1.example/index.html' end
""".strip()

_LIST_REGEXES = [r".*/p[0-2]/.*", r".*file[0-1]\..*"]  # AND logic


def _named_rules_oracle() -> str:
    from heritrix_spark.operators.scope import FILE_PATTERN_PRESETS

    surt = surt_sql("url")
    allpat = FILE_PATTERN_PRESETS["ALL"].replace("'", "''")
    r_and = " and ".join(
        f"regexp_full_match(url, '{r}')" for r in _LIST_REGEXES
    )
    # reversed-priority CASE = the engine's last-write-wins fold
    return f"""
    with u as (select doc_id, {NAMED_URL_DERIVATION} as url,
                      {NAMED_HOPS_DERIVATION} as hops,
                      {NAMED_VIA_DERIVATION} as via from documents),
    s as (select doc_id, url, hops, via, {surt} as surt from u),
    folded as (
      select doc_id,
        case
          when not (starts_with(surt, 'http://(example,host1,')
                    or starts_with(surt, 'http://(example,host2,')) then false
          when regexp_full_match(hops, 'L{{3,}}') then false
          when {r_and} then true
          when regexp_full_match(url, '{allpat}') then false
          when starts_with(surt, 'http://(example,host2,)') then true
          when not starts_with(surt, 'http://(example,host1,') then false
          when via is not null then true
          else false
        end as in_scope
      from s)
    select cast(doc_id as bigint) as doc_id, in_scope
    from folded order by doc_id
    """


@register("scope_named_rules", _named_rules_oracle())
def q_scope_named_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named DecideRule implementations folded through
    DecideRuleSequence semantics: HasViaDecideRule → NotOnDomains →
    OnHosts (host-enforcing prefix) → MatchesFilePattern(ALL) →
    MatchesListRegex (AND logic) → HopsPathMatchesRegex →
    NotSurtPrefixed (surt/*.java, MatchesListRegexDecideRule.java:84-108,
    MatchesFilePatternDecideRule.java:34-47, HasViaDecideRule.java:45-47)."""
    from heritrix_spark.functions.surt import surt_col
    from heritrix_spark.operators.scope import (
        Rule,
        apply_rules,
        has_via_predicate,
        hops_path_matches_regex_predicate,
        matches_file_pattern_predicate,
        matches_list_regex_predicate,
        not_on_domains_predicate,
        not_surt_prefixed_predicate,
        on_hosts_predicate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    u = spark.sql(
        f"select doc_id, {NAMED_URL_DERIVATION} as url, "
        f"{NAMED_HOPS_DERIVATION} as hops, {NAMED_VIA_DERIVATION} as via "
        "from documents"
    ).withColumn("surt", surt_col(F.col("url")))
    url, hops, via, surt = (F.col(c) for c in ("url", "hops", "via", "surt"))
    h1, h2 = "http://(example,host1,", "http://(example,host2,"
    rules = [
        Rule("has_via", has_via_predicate(via), True),
        Rule("not_on_domains", not_on_domains_predicate(url, [h1], surt=surt), False),
        Rule("on_hosts", on_hosts_predicate(url, [h2], surt=surt), True),
        Rule("file_pattern", matches_file_pattern_predicate(url, "ALL"), False),
        Rule(
            "list_regex",
            matches_list_regex_predicate(url, _LIST_REGEXES, logical_or=False),
            True,
        ),
        Rule("deep_hops", hops_path_matches_regex_predicate(hops, "L{3,}"), False),
        Rule(
            "not_surt_prefixed",
            not_surt_prefixed_predicate(url, [h1, h2], surt=surt),
            False,
        ),
    ]
    return (
        u.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            apply_rules(rules, start=False).alias("in_scope"),
        ).orderBy("doc_id")
    )


# -------------------------------------------------- 38. precedence Histotable

@register(
    "precedence_histogram",
    f"""
    with u as ({_DUCK_URLS}),
    k as (select {class_key_sql(canonicalize_sql('url'))} as class_key,
                 precedence from u),
    h as (select class_key, precedence, cast(count(*) as bigint) as n
          from k group by class_key, precedence)
    select class_key, cast(precedence as int) as precedence, n,
           cast(3 + min(precedence) over (partition by class_key) as int)
             as queue_precedence
    from h order by class_key, precedence
    """,
)
def q_precedence_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-queue precedence Histotable + derived queue precedence
    (HighestUriQueuePrecedencePolicy.java:33-60, Histotable.java)."""
    from heritrix_spark.operators.reports import precedence_histogram

    frontier = _docs_urls(spark, sf_dir).select(
        class_key_col(canonicalize_col("url")).alias("class_key"),
        F.col("precedence").cast("int").alias("precedence"),
    )
    return precedence_histogram(frontier).orderBy("class_key", "precedence")


# -------------------------------------------------- 39. crawl mappers

_LEX_BOUNDARIES = [
    ("example,host15,z", "crawlerA"),
    ("example,host3,z", "crawlerB"),
]


@register(
    "lexical_mapper",
    f"""
    with k as (select distinct {_CK_DERIVATION} as class_key from documents)
    select class_key,
      case when class_key <= 'example,host15,z' then 'crawlerA'
           when class_key <= 'example,host3,z' then 'crawlerB'
           else 'crawlerA' end as crawler_node
    from k order by class_key
    """,
)
def q_lexical_mapper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LexicalCrawlMapper: nearest equal-or-subsequent boundary key wins,
    wrapping to the first entry (LexicalCrawlMapper.java:144-153)."""
    from heritrix_spark.operators.mapper import lexical_map_col

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    k = spark.sql(f"select distinct {_CK_DERIVATION} as class_key from documents")
    return k.select(
        "class_key",
        lexical_map_col(F.col("class_key"), _LEX_BOUNDARIES).alias(
            "crawler_node"
        ),
    ).orderBy("class_key")


@register(
    "hash_mapper",
    f"""
    with k as (select distinct {_CK_DERIVATION} as class_key from documents),
    r as (select class_key,
                 regexp_extract(class_key, '(example,host[0-9])', 1) as reduced
          from k)
    select class_key,
      cast(('0x' || substr(md5(reduced), 1, 15))::BIGINT % 7 as varchar)
        as crawler_node
    from r order by class_key
    """,
)
def q_hash_mapper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashCrawlMapper: regex-reduce the key (find-first), fingerprint,
    abs(fp % crawlerCount) (HashCrawlMapper.java:121-134; md5-60
    fingerprint backend so the DuckDB twin computes the identical
    walk)."""
    from heritrix_spark.operators.mapper import hash_map_col

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    k = spark.sql(f"select distinct {_CK_DERIVATION} as class_key from documents")
    return k.select(
        "class_key",
        hash_map_col(
            F.col("class_key"),
            7,
            reduce_regex="example,host[0-9]",
            fp="md5_60",
        ).alias("crawler_node"),
    ).orderBy("class_key")


# -------------------------------------------------- 40. WARC record assembly

# Deterministic fetch mixture over documents: URL with host+path, fixed
# epoch-anchored fetch times, via/hops present on non-seeds, duplicate
# payloads (documents shares texts across doc_ids) exercising the
# revisit path.
_WARC_FETCH_SPARK = """
  select cast(doc_id as bigint) as doc_id, text,
    'http://host' || cast(doc_id % 40 + 1 as string) || '.example/w/p'
      || cast(doc_id as string) as url,
    1600000000000 + doc_id * 1000 as fetch_time_ms,
    case when doc_id % 5 = 0 then cast(null as string)
         else 'http://host1.example/seed' end as via,
    case when doc_id % 5 = 0 then ''
         else repeat('L', cast(1 + doc_id % 3 as int)) end as hops,
    doc_id % 997 as dur
  from documents
""".strip()


def _warc_oracle() -> str:
    b32 = _b32_sql("substr(sha256(content), 1, 40)")
    b32_block = _b32_sql("substr(sha256(block), 1, 40)")
    crlf = "chr(13) || chr(10)"
    return f"""
    with u as (
      select cast(doc_id as bigint) as doc_id, text,
        'http://host' || cast(doc_id % 40 + 1 as varchar) || '.example/w/p'
          || cast(doc_id as varchar) as url,
        1600000000000 + doc_id * 1000 as t_ms,
        case when doc_id % 5 = 0 then null
             else 'http://host1.example/seed' end as via,
        case when doc_id % 5 = 0 then ''
             else repeat('L', cast(1 + doc_id % 3 as int)) end as hops,
        doc_id % 997 as dur
      from documents),
    b as (
      select *,
        strftime(make_timestamp(t_ms * 1000), '%Y-%m-%dT%H:%M:%SZ') as wdate,
        coalesce(text, '') as content
      from u),
    c as (
      select *, 'sha256-160:' || {b32} as pdig,
        md5(url || cast(t_ms as varchar) || 'response') as m,
        'HTTP/1.1 200 OK' || {crlf} || 'Content-Type: text/html' || {crlf}
          || 'Content-Length: ' || cast(octet_length(encode(content)) as varchar)
          || {crlf} || {crlf} as http_hdr,
        regexp_extract(url, '^https?://([^/]+)', 1) as host,
        regexp_extract(url, '^https?://[^/]+(/.*)$', 1) as path
      from b),
    d as (
      select *,
        'urn:uuid:' || substr(m, 1, 8) || '-' || substr(m, 9, 4) || '-'
          || substr(m, 13, 4) || '-' || substr(m, 17, 4) || '-'
          || substr(m, 21, 12) as base_id,
        row_number() over (partition by pdig order by t_ms, url) as rnk
      from c),
    resp as (
      select base_id as record_id,
        case when rnk = 1 then 'response' else 'revisit' end as warc_type,
        url as target_uri, wdate as warc_date,
        'application/http; msgtype=response' as content_type,
        case when rnk = 1 then http_hdr || content else http_hdr end as block,
        pdig as payload_digest, cast(null as varchar) as concurrent_to
      from d),
    req as (
      select base_id || '?type=request' as record_id,
        'request' as warc_type, url as target_uri, wdate as warc_date,
        'application/http; msgtype=request' as content_type,
        'GET ' || path || ' HTTP/1.1' || {crlf} || 'Host: ' || host || {crlf}
          || 'User-Agent: heritrix-spark' || {crlf} || {crlf} as block,
        cast(null as varchar) as payload_digest, base_id as concurrent_to
      from d),
    meta as (
      select base_id || '?type=metadata' as record_id,
        'metadata' as warc_type, url as target_uri, wdate as warc_date,
        'application/warc-fields' as content_type,
        concat_ws({crlf},
          case when via is not null then 'via: ' || via end,
          case when coalesce(hops, '') <> '' then 'hopsFromSeed: ' || hops end,
          'fetchTimeMs: ' || cast(dur as varchar)) || {crlf} as block,
        cast(null as varchar) as payload_digest, base_id as concurrent_to
      from d),
    allrec as (
      select * from resp union all select * from req
      union all select * from meta)
    select record_id, warc_type, target_uri, warc_date, content_type,
      cast(octet_length(encode(block)) as bigint) as content_length,
      payload_digest, 'sha256-160:' || {b32_block} as block_digest,
      concurrent_to
    from allrec order by target_uri, warc_type
    """


@register("warc_records", _warc_oracle())
def q_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARCWriterProcessor record transactions (response-or-revisit +
    request + metadata per fetched URI; WARCWriterProcessor.java:246-260,
    319-470; header layout WARCWriter.java:176-206) as pure column
    expressions, digest backend sha256-160 so DuckDB computes the
    identical walk."""
    from heritrix_spark.operators.warc import warc_records

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    fetches = spark.sql(_WARC_FETCH_SPARK).withColumn(
        "content", F.coalesce(F.col("text"), F.lit(""))
    )
    recs = warc_records(
        fetches,
        url_col="url",
        time_ms_col="fetch_time_ms",
        content_col="content",
        via_col="via",
        hops_col="hops",
        duration_ms_col="dur",
        digest="sha256_160",
    )
    return recs.drop("record_text").orderBy("target_uri", "warc_type")


# -------------------------------------------------- 41. banded 64-bit simhash near-dup

def _duck_simhash_band(offset: int, bits: int = 16) -> str:
    """Per-band DuckDB simhash: bit i of the band = majority vote on
    global bit (offset + i) of the md5_60 token hashes."""
    votes = []
    for i in range(bits):
        votes.append(
            "case when list_aggregate(list_transform(toks, t -> "
            f"case when (('0x' || substr(md5(t), 1, 15))::BIGINT >> {offset + i})"
            " & 1 = 1 then 1 else -1 end), 'sum') > 0 "
            f"then {1 << i} else 0 end"
        )
    return " + ".join(votes)


def _simhash_neardup_oracle() -> str:
    band_sql = ",\n        ".join(
        f"cast({_duck_simhash_band(16 * j)} as bigint) as b{j}" for j in range(4)
    )
    hd = " + ".join(f"bit_count(xor(a.b{j}, b.b{j}))" for j in range(4))
    return f"""
    with t as (select doc_id,
        string_split_regex(lower(text), '\\s+') as toks from documents),
    s as (select doc_id,
        {band_sql}
      from t)
    select cast(a.doc_id as bigint) as a_id, cast(b.doc_id as bigint) as b_id,
           cast({hd} as int) as hamming_distance
    from s a join s b on a.doc_id < b.doc_id
    where {hd} <= 3
    order by a_id, b_id
    """


@register("simhash_neardup_pairs", _simhash_neardup_oracle())
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded wide simhash near-dup join (4 x 16-bit bands, hd<=3):
    by pigeonhole the band-equality self-join finds exactly the
    brute-force hd<=3 pairs — the oracle IS the brute force, the engine
    never compares all pairs."""
    from heritrix_spark.pipeline.dedup import simhash_neardup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        simhash_neardup_pairs(docs, bands=4, band_bits=16, max_hd=3)
        .select(
            F.col("a_id").cast("long"),
            F.col("b_id").cast("long"),
            "hamming_distance",
        )
        .orderBy("a_id", "b_id")
    )


# -------------------------------------------------- 42. IP queue assignment

# URL mix exercising the fallback chain: resolved hosts get their cached
# IP, unresolved fall to the hostname key (https gains '#443', explicit
# ports translate ':' -> '#').
_IPQ_URL_SPARK = """
  select cast(doc_id as bigint) as doc_id,
    case cast(doc_id % 4 as int)
      when 0 then 'http://host' || cast(doc_id % 30 as string) || '.example/p'
      when 1 then 'https://host' || cast(doc_id % 30 as string) || '.example/p'
      when 2 then 'http://host' || cast(doc_id % 30 as string) || '.example:8080/p'
      else 'http://user@host' || cast(doc_id % 30 as string) || '.example/p'
    end as url
  from documents
""".strip()

# ServerCache dimension: hosts 0..29, every third host unresolved
_IPQ_DNS_SPARK = """
  select 'host' || cast(h as string) || '.example' as host,
         '10.0.' || cast(h % 250 as string) || '.' || cast(h % 200 + 1 as string) as ip
  from (select explode(sequence(0, 29)) as h) where h % 3 <> 0
""".strip()


def _ipq_oracle() -> str:
    return """
    with u as (
      select cast(doc_id as bigint) as doc_id,
        case cast(doc_id % 4 as int)
          when 0 then 'http://host' || cast(doc_id % 30 as varchar) || '.example/p'
          when 1 then 'https://host' || cast(doc_id % 30 as varchar) || '.example/p'
          when 2 then 'http://host' || cast(doc_id % 30 as varchar) || '.example:8080/p'
          else 'http://user@host' || cast(doc_id % 30 as varchar) || '.example/p'
        end as url
      from documents),
    dns as (
      select 'host' || cast(h as varchar) || '.example' as host,
             '10.0.' || cast(h % 250 as varchar) || '.'
               || cast(h % 200 + 1 as varchar) as ip
      from (select unnest(generate_series(0, 29)) as h) where h % 3 <> 0),
    k as (
      select u.doc_id, u.url,
        lower(regexp_extract(u.url, '^\\w+://(?:[^/@]+@)?([^/?#:]+)', 1)) as hst,
        lower(regexp_extract(u.url, '^(\\w+)://', 1)) as scheme,
        lower(regexp_extract(u.url, '^\\w+://(?:[^/@]+@)?([^/?#]+)', 1)) as auth
      from u)
    select k.doc_id, k.url,
      coalesce(dns.ip,
        replace(
          case when k.scheme = 'https' and not regexp_matches(k.auth, '.+:[0-9]+$')
               then k.auth || ':443' else k.auth end,
          ':', '#')) as class_key
    from k left join dns on k.hst = dns.host
    order by doc_id
    """


@register("ip_queue_assignment", _ipq_oracle())
def q_ip_queue_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPQueueAssignmentPolicy over a provided ServerCache dimension
    (IPQueueAssignmentPolicy.java:46-55): dotted-decimal IP when
    resolved, HostnameQueueAssignmentPolicy fallback otherwise."""
    from heritrix_spark.operators.mapper import ip_queue_assignment

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    u = spark.sql(_IPQ_URL_SPARK)
    dns = spark.sql(_IPQ_DNS_SPARK)
    return ip_queue_assignment(u, dns).orderBy("doc_id")


# -------------------------------------------------- 43. IVF approximate top-k

def _ivf_oracle(n_centroids: int = 8, nprobe: int = 3, k: int = 3) -> str:
    dot_qc = _DUCK_DOT.format(a="qv", b="cv")
    n_q = "sqrt(" + _DUCK_DOT.format(a="qv", b="qv") + ")"
    n_c = "sqrt(" + _DUCK_DOT.format(a="cv", b="cv") + ")"
    dot_ce = _DUCK_DOT.format(a="cv", b="ev")
    n_e = "sqrt(" + _DUCK_DOT.format(a="ev", b="ev") + ")"
    dot_qe = _DUCK_DOT.format(a="qv", b="ev")
    return f"""
    with cent as (
      select row_number() over (order by md5(cast(vec_id as varchar)), vec_id)
               - 1 as centroid_id,
             embedding as ev
      from embeddings
      qualify row_number() over (order by md5(cast(vec_id as varchar)), vec_id)
               <= {n_centroids}),
    asg as (
      select neighbor_id, cv, centroid_id from (
        select c.vec_id as neighbor_id, c.embedding as cv, ct.centroid_id,
          row_number() over (partition by c.vec_id
            order by {dot_ce} / ({n_c} * {n_e}) desc, ct.centroid_id) as rnk
        from embeddings c, cent ct) where rnk = 1),
    probes as (
      select query_id, qv, centroid_id from (
        select q.vec_id as query_id, q.embedding as qv, ct.centroid_id,
          row_number() over (partition by q.vec_id
            order by {dot_qe} / ({n_q} * {n_e}) desc, ct.centroid_id) as rnk
        from embeddings q, cent ct where q.vec_id < 5) where rnk <= {nprobe}),
    scored as (
      select p.query_id, a.neighbor_id,
        {dot_qc} / ({n_q} * {n_c}) as cosine
      from asg a join probes p on a.centroid_id = p.centroid_id
      where a.neighbor_id <> p.query_id),
    r as (
      select query_id, neighbor_id,
        row_number() over (partition by query_id
                           order by cosine desc, neighbor_id) as rnk
      from scored)
    select cast(query_id as bigint) as query_id,
           cast(neighbor_id as bigint) as neighbor_id,
           cast(rnk as int) as rank
    from r where rnk <= {k} order by query_id, rank
    """


@register("ivf_topk", _ivf_oracle())
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors: deterministic pivot coarse
    quantizer, inverted-list assignment, nprobe-bounded probing —
    the ANN scale path where the corpus shuffles once by centroid_id
    and never all-pairs."""
    from heritrix_spark.pipeline.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3, n_centroids=8, nprobe=3
    )
    return out.select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "rank",
    ).orderBy("query_id", "rank")


# -------------------------------------------------- 44. embedding-cosine near-dup

def _plane_literal_sql(plane: int, dim: int = 64) -> str:
    """The md5-derived ±1 hyperplane as a SQL literal array — the exact
    values pipeline.similarity._plane_component computes in Spark
    (int(md5(f'plane{p}|{i}')[:15], 16) % 2)."""
    import hashlib

    comps = []
    for i in range(dim):
        h = int(hashlib.md5(f"plane{plane}|{i}".encode()).hexdigest()[:15], 16)
        comps.append("1.0" if h % 2 == 0 else "-1.0")
    return "[" + ",".join(comps) + "]"


def _duck_lsh_bucket(table: int, vec: str = "embedding", n_planes: int = 8) -> str:
    terms = []
    for p in range(n_planes):
        d = _DUCK_DOT.format(a=vec, b=_plane_literal_sql(table * 1000 + p))
        terms.append(f"case when ({d}) >= 0 then {1 << p} else 0 end")
    return "(" + " + ".join(terms) + ")"


def _embedding_neardup_oracle(threshold: float = 0.3) -> str:
    dot_ab = _DUCK_DOT.format(a="ea", b="eb")
    na = "sqrt(" + _DUCK_DOT.format(a="ea", b="ea") + ")"
    nb = "sqrt(" + _DUCK_DOT.format(a="eb", b="eb") + ")"
    return f"""
    with b as (select vec_id, embedding,
        {_duck_lsh_bucket(0)} as b0, {_duck_lsh_bucket(1)} as b1
      from embeddings),
    cand as (
      select distinct a.vec_id as a_id, b.vec_id as b_id,
             a.embedding as ea, b.embedding as eb
      from b a join b b
        on a.vec_id < b.vec_id and (a.b0 = b.b0 or a.b1 = b.b1)),
    sc as (select a_id, b_id, {dot_ab} / ({na} * {nb}) as cosine from cand)
    select cast(a_id as bigint) as a_id, cast(b_id as bigint) as b_id,
           cast(floor(cosine * 1e6) as bigint) as cosine_micro
    from sc where cosine >= {threshold} order by a_id, b_id
    """


@register("embedding_neardup_pairs", _embedding_neardup_oracle())
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via deterministic hyperplane-LSH
    candidate buckets + exact cosine filter (pipeline/similarity.py
    lsh_neardup_pairs); the oracle replays the identical md5-derived
    planes as SQL literals, so bucket membership and the survivor set
    are bit-equal across engines."""
    from heritrix_spark.pipeline.similarity import lsh_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        lsh_neardup_pairs(emb, dim=64, threshold=0.3, n_planes=8, n_tables=2)
        .select(
            F.col("a_id").cast("long"),
            F.col("b_id").cast("long"),
            "cosine_micro",
        )
        .orderBy("a_id", "b_id")
    )


# -------------------------------------------------- 48. WARC write -> read roundtrip


@register("warc_roundtrip", _warc_oracle())
def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full WARC sink+source loop: assemble records (operators/warc.py),
    write real .warc part files, parse them back with read_warc
    (binaryFile → mapInPandas content-length-framed parser), and
    recompute the digest/linkage columns FROM THE PARSED BYTES. The
    oracle is the same SQL as `warc_records`, so a green row proves the
    on-disk bytes round-trip to the exact record set the reference's
    WARCWriter layout implies (WARCWriter.java:176-206,265-274)."""
    import tempfile

    from heritrix_spark.operators.warc import read_warc, warc_records, write_warc
    from heritrix_spark.pipeline.dedup import base32_of_hex160_col

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    fetches = spark.sql(_WARC_FETCH_SPARK).withColumn(
        "content", F.coalesce(F.col("text"), F.lit(""))
    )
    recs = warc_records(
        fetches,
        url_col="url",
        time_ms_col="fetch_time_ms",
        content_col="content",
        via_col="via",
        hops_col="hops",
        duration_ms_col="dur",
        digest="sha256_160",
    )
    with tempfile.TemporaryDirectory(prefix="hxwarc_") as tmp:
        write_warc(recs, f"{tmp}/warc", num_files=4)
        parsed = read_warc(spark, f"{tmp}/warc").select(
            "record_id",
            "warc_type",
            "target_uri",
            "warc_date",
            "content_type",
            F.col("content_length").cast("long").alias("content_length"),
            F.element_at(F.col("headers"), "WARC-Payload-Digest").alias(
                "payload_digest"
            ),
            F.concat(
                F.lit("sha256-160:"),
                base32_of_hex160_col(
                    F.substring(F.sha2(F.col("block"), 256), 1, 40)
                ),
            ).alias("block_digest"),
            F.regexp_replace(
                F.coalesce(
                    F.element_at(F.col("headers"), "WARC-Concurrent-To"),
                    F.lit(""),
                ),
                r"[<>]",
                "",
            ).alias("concurrent_to"),
            # match the oracle's null (vs empty) linkage semantics
        ).withColumn(
            "concurrent_to",
            F.when(F.col("concurrent_to") == "", F.lit(None)).otherwise(
                F.col("concurrent_to")
            ),
        )
        out = parsed.orderBy("target_uri", "warc_type")
        # detach from the tempdir before it vanishes
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


# -------------------------------------------------- 49. multimodal features


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table in pipeline.multimodal.MEDIA_SCHEMA
    shape, derived from the documents fixture (payload = the doc text's
    UTF-8 bytes as an opaque binary column; kind/duration keyed off
    doc_id so DuckDB can rebuild the identical rows)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias(
            "payload"
        ),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("doc_id") % 7 * 160 + 320).cast("int").alias("width"),
        (F.col("doc_id") % 7 * 90 + 180).cast("int").alias("height"),
        (F.col("doc_id") % 9 * 1000 + 500).cast("long").alias("duration_ms"),
    )


def _multimodal_oracle() -> str:
    fcols = ",\n      ".join(
        f"round((('0x' || substr(m, {2 * i + 1}, 2))::int) / 255.0, 6)"
        f" as f{i}"
        for i in range(8)
    )
    return f"""
    with media as (
      select cast(doc_id as varchar) as media_id,
        ['image','audio','video'][cast(doc_id % 3 + 1 as int)] as kind,
        coalesce(text, '') as content
      from documents)
    select media_id, kind,
      cast(octet_length(encode(content)) as bigint) as n_bytes,
      {fcols}
    from (select *, md5(content) as m from media)
    order by media_id
    """


@register("multimodal_features", _multimodal_oracle())
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + feature-extract plumbing as a driver row: the
    Arrow-batched mapInPandas path (pipeline/multimodal.extract_features)
    runs the deterministic fake decoder (md5-seeded — the honest stub
    for PIL/ffmpeg, which this container lacks), and DuckDB recomputes
    the identical features from the same bytes, proving the distributed
    batch shape delivers exactly the payload bytes to the codec. Feature
    floats are re-rounded at double precision so both engines emit the
    same 6-decimal values (float32 storage would drift the comparison)."""
    from heritrix_spark.pipeline.multimodal import extract_features

    feats = extract_features(_media_df(spark, sf_dir), fake=True, dim=8)
    fcols = [
        F.round(F.element_at(F.col("feature"), i + 1).cast("double"), 6).alias(
            f"f{i}"
        )
        for i in range(8)
    ]
    return feats.select("media_id", "kind", "n_bytes", *fcols).orderBy(
        "media_id"
    )


# -------------------------------------------------- 50. video frame sampling


@register(
    "video_frame_sample",
    """
    with media as (
      select cast(doc_id as varchar) as media_id,
        cast(doc_id % 3 + 1 as int) as kind_ix,
        cast(doc_id % 9 * 1000 + 500 as bigint) as duration_ms
      from documents)
    select media_id,
      cast(unnest(generate_series(0, greatest(duration_ms - 1, 0), 1000))
           as bigint) as frame_ts_ms
    from media where kind_ix = 3
    order by media_id, frame_ts_ms
    """,
)
def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (pipeline/multimodal.sample_video_frames):
    frame timestamps come from metadata, so sampling is a native
    sequence+explode — whole videos never materialize; the (stubbed)
    codec would be applied per sampled frame afterwards."""
    from heritrix_spark.pipeline.multimodal import sample_video_frames

    frames = sample_video_frames(_media_df(spark, sf_dir), every_ms=1000)
    return frames.select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    ).orderBy("media_id", "frame_ts_ms")


# -------------------------------------------------- 51. streaming candidate ingest

# Candidate feed derivation shared by both streaming queries (Spark SQL
# ∩ DuckDB dialect). parent_ordinal == doc_id is STRICTLY INCREASING,
# and the feed is split into files along doc_id ranges, so every
# micro-batch covers a disjoint, increasing parent_ordinal range: the
# stream's first-discovery-wins outcome is then exactly the global
# first-wins along (parent_ordinal, link_seq) — SQL-expressible as one
# row_number window regardless of how the source lumps files into
# micro-batches (file order is mtime-deterministic). The URL space is
# deliberately COARSE (~260 canonical URLs from 20 hosts × 13 pages,
# www/query mess on top): at 500+ docs roughly half the candidates are
# duplicates, so both in-batch collapse and cross-batch state dedup
# filter real rows — a no-op dedup would fail the oracle.
_STREAM_CAND_SQL = """
  select cast(doc_id as bigint) as parent_ordinal,
         cast(doc_id % 5 as bigint) as link_seq,
         'http://' ||
         case when doc_id % 11 = 0 then 'WWW.' when doc_id % 11 = 1 then 'www3.'
              else '' end ||
         'host' || cast(doc_id % 20 as string) || '.example' ||
         '/page' || cast(doc_id % 13 as string) || '.html' ||
         case when doc_id % 7 = 0 then '?'
              when doc_id % 7 = 3 then '?jsessionid=' || repeat('ab12', 8)
              else '' end as url,
         repeat('L', cast(1 + doc_id % 3 as int)) as hops_path,
         doc_id
  from documents
""".strip()


from contextlib import contextmanager


@contextmanager
def _fixture_shuffle(spark: SparkSession, n: int = 8):
    """Row-local shuffle/state-partition sizing for the streaming
    fixture rows: a Structured Streaming state store lays out
    ``spark.sql.shuffle.partitions`` state partitions at FIRST
    checkpoint and every micro-batch schedules a task per partition —
    64 state tasks over a ~17k-event fixture is pure scheduling
    overhead (the same partitions-fit-the-data law the batch plans
    follow; a production stream sizes this to its executor count
    before the first start). Restores the session value on exit."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _write_stream_feed_file(
    rows, feed_dir: str, k: int, n_files: int, n_docs: int, base_t: float
) -> str:
    """Write feed file ``k`` of ``n_files``: the doc_id-range slice
    ``[n_docs*k/n_files, n_docs*(k+1)/n_files)`` as json-lines, mtime
    ``base_t + 60k`` so the Structured Streaming file source processes
    the files in slice order (strictly increasing parent_ordinal)."""
    import json as _json
    import os as _os

    _os.makedirs(feed_dir, exist_ok=True)
    lo, hi = n_docs * k // n_files, n_docs * (k + 1) // n_files
    fn = _os.path.join(feed_dir, f"feed-{k:04d}.json")
    with open(fn, "w") as f:
        for r in rows:
            if lo <= r["doc_id"] < hi:
                f.write(
                    _json.dumps(
                        {
                            "url": r["url"],
                            "parent_ordinal": r["parent_ordinal"],
                            "link_seq": r["link_seq"],
                            "hops_path": r["hops_path"],
                        }
                    )
                    + "\n"
                )
    _os.utime(fn, (base_t + 60 * k, base_t + 60 * k))
    return fn


def _streaming_ingest_oracle() -> str:
    return f"""
    with u as ({_STREAM_CAND_SQL}),
    c as (select *, {canonicalize_sql('url')} as canon_url from u),
    w as (select *, row_number() over (partition by canon_url
                                       order by parent_ordinal, link_seq) as rn
          from c),
    n as (select * from w where rn = 1)
    select url, canon_url, {class_key_sql('canon_url')} as class_key,
           cast(3 as int) as directive, cast(1 as int) as precedence,
           cast(1 as int) as cost, hops_path,
           cast(row_number() over (order by parent_ordinal, link_seq, canon_url)
                as bigint) as ordinal
    from n order by ordinal
    """


@register("streaming_ingest", _streaming_ingest_oracle())
def q_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming candidate ingestion as a driver row:
    three sequential availableNow micro-batch rounds (streaming/
    ingest.start_candidate_ingest — readStream json → foreachBatch
    running the full schedule+dedup pipeline against the persistent
    SnapStore url_seen/frontier state, ordinals continuing from the
    committed max). The continuous-push analog of ToeThreads feeding
    the frontier (WorkQueueFrontier.schedule, WorkQueueFrontier.java:360-392;
    UriUniqFilter add() batches, BdbUriUniqFilter.java:234-263). Because
    the feed files carry disjoint increasing parent_ordinal ranges, the
    final frontier equals the one-shot batch result, which DuckDB
    recomputes as a single windowed query — a green row proves the
    streaming path's cross-batch dedup + ordinal continuation are
    exactly the batch law."""
    import tempfile

    from heritrix_spark.store.snapstore import SnapStore
    from heritrix_spark.streaming.ingest import start_candidate_ingest

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    rows = spark.sql(_STREAM_CAND_SQL).collect()
    n_docs = max(r["doc_id"] for r in rows) + 1
    with tempfile.TemporaryDirectory(prefix="hxingest_") as tmp:
        import time as _time

        feed = f"{tmp}/feed"
        base_t = _time.time() - 3600
        with _fixture_shuffle(spark):
            for k in range(3):
                # arrival round k: ONE new feed file lands, then a fresh
                # availableNow query drains it against the same checkpoint
                # + store (restart-with-state each round)
                _write_stream_feed_file(rows, feed, k, 3, n_docs, base_t)
                q = start_candidate_ingest(
                    spark, feed, f"{tmp}/store", f"{tmp}/ckpt"
                )
                q.awaitTermination(600)
        store = SnapStore(f"{tmp}/store", spark)
        out = (
            store.read("frontier")
            .select(
                "url",
                "canon_url",
                "class_key",
                F.col("directive").cast("int").alias("directive"),
                F.col("precedence").cast("int").alias("precedence"),
                F.col("cost").cast("int").alias("cost"),
                "hops_path",
                F.col("ordinal").cast("long").alias("ordinal"),
            )
            .orderBy("ordinal")
        )
        # detach from the tempdir before it vanishes
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


# -------------------------------------------------- 52. stateful streaming seen filter


def _stateful_seen_oracle() -> str:
    return f"""
    with u as ({_STREAM_CAND_SQL}),
    c as (select *, {canonicalize_sql('url')} as canon_url from u),
    w as (select *, row_number() over (partition by canon_url
                                       order by parent_ordinal, link_seq) as rn
          from c)
    select url, canon_url,
           cast(parent_ordinal as bigint) as parent_ordinal,
           cast(link_seq as bigint) as link_seq
    from w where rn = 1 order by canon_url
    """


@register("stateful_seen_dedup", _stateful_seen_oracle())
def q_stateful_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The push-model UriUniqFilter (streaming/stateful.dedup_stream —
    applyInPandasWithState holding per-shard 64-bit fingerprint sets,
    the MemFPMergeUriUniqFilter analog, FPMergeUriUniqFilter.java:43-46)
    as a driver row: one availableNow query, maxFilesPerTrigger=1 so
    each feed file is a genuine micro-batch, memory-sink collecting the
    novel rows of every batch. Disjoint increasing parent_ordinal
    ranges per file make the union of per-batch novel outputs equal
    global first-discovery-wins along (parent_ordinal, link_seq), which
    is the DuckDB twin's single window — the same add()-batch semantics
    the batch path (operators/seen.py) proves via anti-join."""
    import tempfile

    from heritrix_spark.streaming.stateful import dedup_stream

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    rows = spark.sql(_STREAM_CAND_SQL).collect()
    n_docs = max(r["doc_id"] for r in rows) + 1
    with tempfile.TemporaryDirectory(prefix="hxstate_") as tmp:
        import time as _time

        feed = f"{tmp}/feed"
        base_t = _time.time() - 3600
        for k in range(4):
            _write_stream_feed_file(rows, feed, k, 4, n_docs, base_t)
        stream = (
            spark.readStream.schema(
                "url string, parent_ordinal long, link_seq long"
            )
            .option("maxFilesPerTrigger", 1)  # one file == one micro-batch
            .json(feed)
        )
        prepared = stream.select(
            "url",
            canonicalize_col("url").alias("canon_url"),
            "parent_ordinal",
            "link_seq",
        )
        novel = dedup_stream(prepared, key="canon_url", n_shards=16)
        with _fixture_shuffle(spark):
            q = (
                novel.writeStream.format("memory")
                .queryName("stateful_seen_out")
                .outputMode("update")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
        out = (
            spark.table("stateful_seen_out")
            .select(
                "url",
                "canon_url",
                F.col("parent_ordinal").cast("long").alias("parent_ordinal"),
                F.col("link_seq").cast("long").alias("link_seq"),
            )
            .orderBy("canon_url")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


# -------------------------------------------------- adaptive revisit (AR frontier)

# Deterministic per-doc fetch-history derivation: 1-5 visits per doc, a
# status mix (isSuccess = status > 0, CrawlURI.java:999-1009), digests
# that advance through versions at a per-doc cadence, and periodic null
# digests to exercise ChangeEvaluator's null branches
# (ChangeEvaluator.java:95-139).
_REVISIT_V_SPARK = """
  select doc_id,
         concat('http://h', cast(doc_id % 23 as string), '.example/',
                cast(doc_id as string)) as url,
         cast(k as int) as seq,
         cast(1600000000000 + doc_id*131 + k*7200000 as bigint) as ts_ms,
         cast(case when (doc_id + 3*k) % 7 = 3 then -2 else 200 end as int)
           as fetch_status,
         case when (doc_id + k) % 11 = 5 then null
              else md5(concat(cast(doc_id as string), '/',
                       cast(cast(floor(k/(1+doc_id%3)) as int) as string))) end
           as digest
  from documents lateral view explode(sequence(0, cast(doc_id % 5 as int))) t as k
""".strip()

_REVISIT_V_DUCK = """
  select doc_id,
         concat('http://h', cast(doc_id % 23 as varchar), '.example/',
                cast(doc_id as varchar)) as url,
         cast(k as int) as seq,
         cast(1600000000000 + doc_id*131 + k*7200000 as bigint) as ts_ms,
         cast(case when (doc_id + 3*k) % 7 = 3 then -2 else 200 end as int)
           as fetch_status,
         case when (doc_id + k) % 11 = 5 then null
              else md5(concat(cast(doc_id as varchar), '/',
                       cast(cast(floor(k/(1+doc_id%3)) as int) as varchar))) end
           as digest
  from documents, unnest(range(1 + doc_id % 5)) as t(k)
""".strip()


def _revisit_rec_sql() -> str:
    """The WaitEvaluator/ChangeEvaluator fold as a DuckDB recursive CTE
    (one recursion step per visit; lateral alias references carry the
    intermediate predicates).  Yields table ``fin``: final state per doc."""
    return f"""
    with recursive v as ({_REVISIT_V_DUCK}),
    n as (select doc_id, max(seq) as mk from v group by doc_id),
    rec as (
      select doc_id, -1 as seq, cast(null as varchar) as last_digest,
             cast(null as bigint) as wait_ms, 0 as visits, 0 as versions,
             cast(null as bigint) as next_ms
      from n
      union all
      select doc_id, seq, new_digest, new_wait, new_visits, new_versions,
             new_next
      from (
        select r.doc_id as doc_id, vv.seq as seq,
          (vv.fetch_status > 0) as succ,
          (vv.digest is null and r.last_digest is null) as bothnull,
          (vv.digest is not null and r.last_digest is not null
             and vv.digest = r.last_digest) as unch,
          (succ and not bothnull) as known,
          (known and not unch) as chg,
          case when chg then vv.digest else r.last_digest end as new_digest,
          case when not succ then r.wait_ms
               when not known then cast(259200000 as bigint)
               when r.wait_ms is null then cast(86400000 as bigint)
               when chg then cast(floor(r.wait_ms / 1.5) as bigint)
               else cast(floor(r.wait_ms * 1.5) as bigint) end as raw_w,
          case when succ
               then least(greatest(raw_w, 3600000), 2419200000)
               else r.wait_ms end as new_wait,
          cast(r.visits + case when known then 1 else 0 end as int)
            as new_visits,
          cast(r.versions + case when chg then 1 else 0 end as int)
            as new_versions,
          case when succ then vv.ts_ms + new_wait else r.next_ms end as new_next
        from rec r join v vv on vv.doc_id = r.doc_id and vv.seq = r.seq + 1
      )
    ),
    fin as (
      select r.doc_id as doc_id, r.visits, r.versions, r.last_digest,
             r.wait_ms, r.next_ms
      from rec r join n on r.doc_id = n.doc_id and r.seq = n.mk
    )
    """


@register(
    "adaptive_revisit",
    _revisit_rec_sql()
    + """
    select cast(doc_id as bigint) as doc_id, visits, versions, last_digest,
           wait_ms, next_ms
    from fin order by doc_id
    """,
)
def q_adaptive_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaptiveRevisitFrontier per-URI state: fold each URI's fetch
    history through ChangeEvaluator (digest comparison, visit/version
    counters — ChangeEvaluator.java:69-163) and WaitEvaluator (adaptive
    wait interval, WaitEvaluator.java:169-292), then schedule
    time-of-next-processing (AdaptiveRevisitFrontier.java:736-737).
    One JVM-side F.aggregate per URI — single shuffle, no Python."""
    from heritrix_spark.operators.revisit import adaptive_revisit

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    v = spark.sql(_REVISIT_V_SPARK)
    return (
        adaptive_revisit(v, key_cols=("doc_id",))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "visits",
            "versions",
            "last_digest",
            "wait_ms",
            "next_ms",
        )
        .orderBy("doc_id")
    )


@register(
    "revisit_peek",
    _revisit_rec_sql()
    + """
    , st as (
      select concat('http://h', cast(doc_id % 23 as varchar), '.example/',
                    cast(doc_id as varchar)) as url,
             concat('h', cast(doc_id % 23 as varchar), '.example') as class_key,
             coalesce(next_ms, 9223372036854775807) as ready
      from fin
    )
    select class_key, url as peek_url, ready as next_ready_ms
    from (select *, row_number() over (partition by class_key
                                       order by ready, url) as rk from st)
    where rk = 1 order by class_key
    """,
)
def q_revisit_peek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaptiveRevisitHostQueue peek: per host the ready URI is the one
    with the smallest time-of-next-processing; never-scheduled URIs sort
    as Long.MAX_VALUE (AdaptiveRevisitHostQueueTest.java:50-140)."""
    from heritrix_spark.operators.revisit import adaptive_revisit, revisit_peek

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    v = spark.sql(_REVISIT_V_SPARK)
    state = adaptive_revisit(v, key_cols=("doc_id", "url")).withColumn(
        "class_key",
        F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string"), F.lit(".example")),
    )
    return revisit_peek(state).orderBy("class_key")


# -------------------------------------------------- DomainSensitiveFrontier

_DSF_SCOPE_DUCK = """
  case when regexp_extract(host, '([^.]+\\.[^.]+)$', 1) <> ''
       then regexp_extract(host, '([^.]+\\.[^.]+)$', 1) else host end
""".strip()


@register(
    "domain_max_docs",
    f"""
    with u as ({_DUCK_URLS}),
    h as (select doc_id, fetch_status, ordinal,
                 lower(regexp_extract(url, '^\\w+://([^/]+)', 1)) as host
          from u),
    s as (select *, {_DSF_SCOPE_DUCK} as dsf_scope from h),
    c as (select *,
            coalesce(sum(case when fetch_status > 0 then 1 else 0 end)
                       over (partition by dsf_scope order by ordinal
                             rows between unbounded preceding
                                      and 1 preceding), 0) as prior
          from s)
    select cast(doc_id as bigint) as doc_id, dsf_scope,
           (prior >= 5) as dsf_blocked
    from c order by doc_id
    """,
)
def q_domain_max_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DomainSensitiveFrontier max-docs enforcement: after a domain
    (host's last two dot-labels) accumulates max_docs=5 successful
    downloads, later URIs in that domain are discarded
    (DomainSensitiveFrontier.java:159-226 checkDownloadLimits; domain
    scope extraction :173-182)."""
    from heritrix_spark.operators.quota import domain_max_docs

    u = _docs_urls(spark, sf_dir).withColumn(
        "host", F.lower(F.regexp_extract("url", r"^\w+://([^/]+)", 1))
    )
    return (
        domain_max_docs(u, max_docs=5, mode="domain")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "dsf_scope",
            "dsf_blocked",
        )
        .orderBy("doc_id")
    )


# -------------------------------------------------- watermarked windowed metrics

# Event derivation: 3 arrival files (k = doc_id % 3), each shifted
# +900 s, except stragglers (doc_id % 13 = 7) stuck in the file-0 era —
# guaranteed late arrivals.  All event times even, delay 121 s odd, so
# no watermark ever ties a window boundary.
_WMM_BASE = 1_600_000_200  # multiple of 600: windows align at base + i*600
_WMM_DELAY = 121
_WMM_EVENTS = f"""
  select doc_id,
         cast(doc_id % 3 as int) as k,
         cast({_WMM_BASE}
              + case when doc_id % 13 = 7 then 0
                     else (doc_id % 3) * 900 end
              + 2 * ((doc_id * 19) % 400) as bigint) as ts,
         'h' || cast(doc_id % 6 as string) as host,
         cast(doc_id % 1000 as bigint) as bytes
  from documents
""".strip()


def _wmm_oracle() -> str:
    return f"""
    with e as ({_WMM_EVENTS}),
    m as (select k, max(ts) as mx from e group by k),
    w as (select k, max(mx) over (order by k rows between unbounded preceding
                                  and current row) - {_WMM_DELAY} as wm
          from m),
    inc as (
      select e.*, cast(floor(e.ts / 600) * 600 as bigint) as window_start,
             cast(floor(e.ts / 600) * 600 + 600 as bigint) as window_end
      from e left join w pw on pw.k = e.k - 1
      where e.k = 0 or window_end > pw.wm
    ),
    fin as (select max(wm) as fwm from w)
    select window_start, window_end, host,
           cast(count(*) as bigint) as n_fetches,
           cast(sum(bytes) as bigint) as total_bytes
    from inc, fin
    where window_end <= fwm
    group by window_start, window_end, host
    order by window_start, host
    """


@register("streaming_windowed_metrics", _wmm_oracle())
def q_streaming_windowed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time windowed fetch metrics as a true
    Structured Streaming driver row: three sequential availableNow
    rounds (one new feed file per round, one checkpoint — watermark
    state carried across restarts), tumbling 600 s windows with a 121 s
    lateness bound in append mode (streaming/windowed.py; the
    CrawlStatSnapshot rates report, CrawlStatSnapshot.java:39-107,
    re-expressed on event time).  The DuckDB twin replays the
    documented watermark law row-for-row: wm_k = max(event time through
    file k) − delay; a file-k row is admitted iff its window end
    exceeds wm_(k−1); a window is emitted iff the final watermark
    passed its end.  A green row pins drop-too-late,
    merge-late-but-open, and never-emit-open-windows simultaneously."""
    import json as _json
    import os as _os
    import tempfile
    import time as _time

    from heritrix_spark.streaming.windowed import windowed_fetch_metrics

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    rows = spark.sql(_WMM_EVENTS).collect()
    with tempfile.TemporaryDirectory(prefix="hxwmm_") as tmp:
        feed = f"{tmp}/feed"
        out_dir = f"{tmp}/out"
        _os.makedirs(feed)
        t0 = _time.time() - 3600

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        with _fixture_shuffle(spark):
            for k in range(3):
                fn = f"{feed}/f{k:02d}.json"
                with open(fn, "w") as f:
                    for r in rows:
                        if r["k"] == k:
                            f.write(
                                _json.dumps(
                                    {"ts": r["ts"], "host": r["host"],
                                     "bytes": r["bytes"]}
                                )
                                + "\n"
                            )
                _os.utime(fn, (t0 + 60 * k, t0 + 60 * k))
                stream = (
                    spark.readStream.schema("ts long, host string, bytes long")
                    .json(feed)
                    .withColumn("ts", F.timestamp_seconds("ts"))
                )
                agg = windowed_fetch_metrics(
                    stream, window_s=600, delay_s=_WMM_DELAY
                )
                q = (
                    agg.writeStream.foreachBatch(sink)
                    .outputMode("append")
                    .option("checkpointLocation", f"{tmp}/ckpt")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(600)
        out = (
            spark.read.parquet(out_dir)
            .orderBy("window_start", "host")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    return out


# -------------------------------------------------- fetch history / revisits

# Multi-fetch log with 304s, missing digests, and optional validator
# headers — the recrawl package's input shape (statuses 200/304/404;
# digest null on 304s and sporadically elsewhere; version steps every
# 1+doc_id%3 fetches so identical-digest revisits actually occur).
_FHIST_V_SPARK = """
  select doc_id,
         concat('http://h', cast(doc_id % 23 as string), '.example/',
                cast(doc_id as string)) as url,
         cast(k as int) as seq,
         cast(1600000000000 + doc_id*131 + k*7200000 as bigint) as ts_ms,
         cast(case when (doc_id + 3*k) % 7 = 3 then 404
                   when (doc_id + 2*k) % 5 = 2 then 304
                   else 200 end as int) as fetch_status,
         case when (doc_id + 2*k) % 5 = 2 or (doc_id + k) % 11 = 5 then null
              else md5(concat(cast(doc_id as string), '/',
                       cast(cast(floor(k/(1+doc_id%3)) as int) as string))) end
           as content_digest,
         case when (doc_id + k) % 3 = 0
              then concat('"e', cast(cast(floor(k/(1+doc_id%3)) as int)
                                     as string), '"')
              else null end as etag,
         case when (doc_id + k) % 4 = 1
              then concat('Mon, 0', cast(k % 9 + 1 as string), ' Jan 2024')
              else null end as last_modified,
         cast(case when (doc_id + 2*k) % 5 = 2 then 0
                   else 1000 + (doc_id*37 + k*101) % 9000 end as bigint)
           as content_length
  from documents lateral view explode(sequence(0, cast(doc_id % 5 as int))) t as k
""".strip()

_FHIST_V_DUCK = """
  select doc_id,
         concat('http://h', cast(doc_id % 23 as varchar), '.example/',
                cast(doc_id as varchar)) as url,
         cast(k as int) as seq,
         cast(1600000000000 + doc_id*131 + k*7200000 as bigint) as ts_ms,
         cast(case when (doc_id + 3*k) % 7 = 3 then 404
                   when (doc_id + 2*k) % 5 = 2 then 304
                   else 200 end as int) as fetch_status,
         case when (doc_id + 2*k) % 5 = 2 or (doc_id + k) % 11 = 5 then null
              else md5(concat(cast(doc_id as varchar), '/',
                       cast(cast(floor(k/(1+doc_id%3)) as int) as varchar))) end
           as content_digest,
         case when (doc_id + k) % 3 = 0
              then concat('"e', cast(cast(floor(k/(1+doc_id%3)) as int)
                                     as varchar), '"')
              else null end as etag,
         case when (doc_id + k) % 4 = 1
              then concat('Mon, 0', cast(k % 9 + 1 as varchar), ' Jan 2024')
              else null end as last_modified,
         cast(case when (doc_id + 2*k) % 5 = 2 then 0
                   else 1000 + (doc_id*37 + k*101) % 9000 end as bigint)
           as content_length
  from documents, unnest(range(1 + doc_id % 5)) as t(k)
""".strip()

_FHIST_IDENT = (
    "(hlen = 2 and content_digest is not null and prev_digest is not null "
    "and content_digest = prev_digest)"
)


def _fhist_oracle(extra_where: str = "") -> str:
    """Shared fetch-history oracle (reference-length carry-forward +
    lag-based history CTEs) — used by both fetch_history_revisits and
    persist_continuation so the recurrence can never silently diverge
    between the two rows."""
    return f"""
    with v as ({_FHIST_V_DUCK}),
    r as (
      select *,
        coalesce(
          last_value(case when fetch_status <> 304 then content_length end
                     ignore nulls)
            over (partition by doc_id order by seq
                  rows between unbounded preceding and current row),
          first_value(content_length)
            over (partition by doc_id order by seq)) as reference_length
      from v),
    h as (
      select *,
        lag(fetch_status) over w as prev_status,
        lag(content_digest) over w as prev_digest,
        count(*) over (partition by doc_id order by seq
                       rows between 1 preceding and current row) as hlen
      from r window w as (partition by doc_id order by seq))
    select cast(doc_id as bigint) as doc_id, seq, fetch_status,
           reference_length,
           cast(prev_status as varchar) as prev_status, prev_digest,
           {_FHIST_IDENT} as identical_digest,
           case when {_FHIST_IDENT} then 'warcRevisit:digest'
                when fetch_status = 304 then 'warcRevisit:notModified'
                else 'response' end as record_type
    from h {extra_where} order by doc_id, seq
    """


def _fhist_select(h: DataFrame) -> DataFrame:
    """Shared Spark projection: previous entry read OUT OF the rotated
    history array (cross-checking the array construction against the
    oracle's lag())."""
    from heritrix_spark.operators.recrawl import (
        has_identical_digest_col,
        warc_record_type_col,
    )

    prev = F.get(F.col("history"), 1)
    ident = has_identical_digest_col(F.col("history"))
    return h.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "seq",
        "fetch_status",
        "reference_length",
        prev["fetch_status"].cast("string").alias("prev_status"),
        prev["content_digest"].alias("prev_digest"),
        ident.alias("identical_digest"),
        warc_record_type_col(ident, F.col("fetch_status")).alias(
            "record_type"
        ),
    ).orderBy("doc_id", "seq")




@register("fetch_history_revisits", _fhist_oracle())
def q_fetch_history_revisits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FetchHistoryProcessor + IdenticalDigestDecideRule + WARC revisit
    selection (recrawl/FetchHistoryProcessor.java:62-117,
    fetcher/FetchHTTP.java setSizes :747-766,
    deciderules/recrawl/IdenticalDigestDecideRule.java:62-80,
    writer/WARCWriterProcessor.java:350-358): per fetch, the rotated
    last-2 history array, the 304 reference-length carry-forward, and
    the revisit-record decision.  The oracle recomputes the history via
    lag() while Spark reads the previous entry OUT OF the rotated
    array, cross-checking the array construction itself.  Pure window
    plan: one hash shuffle on the URI key."""
    from heritrix_spark.operators.recrawl import fetch_history

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    v = spark.sql(_FHIST_V_SPARK)
    h = fetch_history(
        v,
        k=2,
        key_cols=("url",),
        order_cols=("seq",),
        etag="etag",
        last_modified="last_modified",
        content_length="content_length",
    )
    return _fhist_select(h)


# -------------------------------------------------- decontamination / repetition

_DECON_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)


@register(
    "decontaminate_ngram",
    f"""
    with t as (select doc_id, {_DECON_TOKS} as toks from documents),
    bench as (select distinct array_to_string(toks[4:16], ' ') as ng
              from t where doc_id % 29 = 0 and len(toks) >= 16),
    corpus as (select doc_id from t where doc_id % 29 <> 0),
    cg as (select doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, len(toks) - 11),
                    i -> array_to_string(toks[i:i+12], ' ')))) as ng
           from t where doc_id % 29 <> 0 and len(toks) >= 13),
    m as (select doc_id, cast(count(*) as int) as n_overlap
          from cg join bench using (ng) group by doc_id)
    select cast(c.doc_id as bigint) as doc_id,
           coalesce(m.n_overlap, 0) as n_overlap,
           coalesce(m.n_overlap, 0) > 0 as contaminated
    from corpus c left join m using (doc_id) order by doc_id
    """,
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/Pile-style 13-gram benchmark decontamination: the eval set
    is a 13-token slice of every 29th document; every other document is
    flagged when it shares any exact 13-gram.  Plan: eval n-grams
    broadcast (they are MBs next to a TB corpus), corpus n-grams explode
    and inner-join shuffle-free, one hash agg on doc_id counts hits —
    the corpus text never crosses the wire."""
    from heritrix_spark.pipeline.decontam import decontaminate
    from heritrix_spark.pipeline.textstats import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens_col(F.col("text"))
    bench = (
        docs.filter(F.col("doc_id") % 29 == 0)
        .filter(F.size(toks) >= 16)
        .select(F.array_join(F.slice(toks, 4, 13), " ").alias("text"))
    )
    corpus = docs.filter(F.col("doc_id") % 29 != 0)
    return (
        decontaminate(corpus, bench, n=13)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_overlap",
            "contaminated",
        )
        .orderBy("doc_id")
    )


@register(
    "gopher_repetition",
    f"""
    with t as (select doc_id, {_DECON_TOKS} as toks from documents),
    rl as (select doc_id, cast(len(toks) as int) as total_tokens,
             cast(greatest(len(toks) - 4, 0)
                  - case when len(toks) >= 5
                         then len(list_distinct(list_transform(
                                range(1, len(toks) - 3),
                                i -> array_to_string(toks[i:i+4], ' '))))
                         else 0 end as int) as dup5_tokens
           from t),
    bg as (select doc_id,
                  unnest(list_transform(range(1, len(toks)),
                         i -> array_to_string(toks[i:i+1], ' '))) as bg
           from t where len(toks) >= 2),
    top2 as (select doc_id, cast(max(c) as int) as top2_count
             from (select doc_id, bg, count(*) as c from bg group by 1, 2)
             group by 1)
    select cast(t.doc_id as bigint) as doc_id, rl.total_tokens,
           coalesce(top2.top2_count, 0) as top2_count, rl.dup5_tokens
    from t join rl using (doc_id) left join top2 using (doc_id)
    order by doc_id
    """,
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 App. A1) as
    exact integers: total tokens, occurrences of the most frequent word
    bigram (explode → count → max: linear and shuffle-bounded, never a
    per-row O(L²) walk), and duplicate-5-gram occurrences (row-local
    array_distinct, no shuffle)."""
    from heritrix_spark.pipeline.decontam import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        repetition_stats(docs)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "total_tokens",
            "top2_count",
            "dup5_tokens",
        )
        .orderBy("doc_id")
    )


@register("persist_continuation", _fhist_oracle("where seq >= 2"))
def q_persist_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PersistStore/PersistLoad round-trip across a crawl boundary
    (recrawl/PersistProcessor.java persistKeyFor :106-113 = the
    case-sensitive SURT; PersistLoadProcessor.java:83-92 merge-in;
    PersistStoreProcessor store-at-end): crawl #1 = each URI's fetches
    seq<2, its final history arrays stored under the persist key;
    crawl #2 = the remaining fetches, seeded from the store.  The
    ORACLE is the unbroken full-log computation filtered to crawl #2 —
    the persistence round-trip must be bit-equal to never having split
    the crawl, including the 304 reference-length carry across the
    boundary."""
    from heritrix_spark.operators.persist import (
        continue_fetch_history,
        persist_key_col,
        persist_store,
    )
    from heritrix_spark.operators.recrawl import fetch_history

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    v = spark.sql(_FHIST_V_SPARK).withColumn(
        "persist_key", persist_key_col(F.col("url"))
    )
    h1 = fetch_history(
        v.filter(F.col("seq") < 2),
        k=2,
        key_cols=("persist_key",),
        order_cols=("seq",),
        etag="etag",
        last_modified="last_modified",
        content_length="content_length",
    )
    store = persist_store(h1)
    h2 = continue_fetch_history(v.filter(F.col("seq") >= 2), store, k=2)
    return _fhist_select(h2)


@register(
    "pack_sequences",
    f"""
    with t0 as (select doc_id, {_DECON_TOKS} as toks from documents),
    t as (select doc_id, cast(len(toks) as bigint) as n from t0
          where len(toks) > 0),
    s as (select doc_id, n,
            cast(coalesce(sum(n) over (order by doc_id
                     rows between unbounded preceding and 1 preceding),
                     0) as bigint) as start_offset
          from t),
    p as (select doc_id, n, start_offset,
                 unnest(range(start_offset // 512,
                              (start_offset + n - 1) // 512 + 1)) as ex
          from s)
    select cast(doc_id as bigint) as doc_id,
           cast(n as int) as n_tokens,
           start_offset,
           cast(ex as bigint) as example_id,
           cast(greatest(start_offset, ex*512) - ex*512 as int)
             as example_offset,
           cast(greatest(start_offset, ex*512) - start_offset as int)
             as doc_offset,
           cast(least(start_offset + n, (ex+1)*512)
                - greatest(start_offset, ex*512) as int) as piece_len
    from p order by doc_id, example_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-pretraining sequence packing: the corpus token stream laid
    into fixed 512-token examples in doc_id order, documents split
    across example boundaries.  The global offset is a two-phase
    prefix sum (monotone buckets + lazy per-bucket offsets — never a
    single-partition window over corpus rows); the oracle recomputes it
    with DuckDB's global window, pinning the distributed decomposition
    against the sequential definition."""
    from heritrix_spark.pipeline.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, block=512).orderBy("doc_id", "example_id")


_DELETE_Q_RE = "example,host1[0-9],.*"
_DELETE_U_RE = ".*(CFID|jsessionid).*"


@register(
    "delete_uris",
    f"""
    with u as ({_DUCK_URLS}),
    f as (select url, {class_key_sql('url')} as class_key from u),
    m as (select class_key, url,
                 (regexp_full_match(class_key, '{_DELETE_Q_RE}')
                  and regexp_full_match(url, '{_DELETE_U_RE}')) as doomed
          from f)
    select class_key,
           cast(sum(case when doomed then 1 else 0 end) as int) as deleted,
           cast(sum(case when doomed then 0 else 1 end) as int) as remaining
    from m group by class_key order by class_key
    """,
)
def q_delete_uris(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WorkQueueFrontier.deleteURIs (engine operator tool,
    WorkQueueFrontier.java:1064-1078): full-match queue+URI regex purge
    of pending URIs with per-queue deleted/remaining tallies.  One
    filter (pipelined, no shuffle) + one hash agg on the queue key."""
    from heritrix_spark.operators.frontier_tools import delete_uris

    u = _docs_urls(spark, sf_dir).select(
        "url", class_key_col("url").alias("class_key")
    )
    kept, counts = delete_uris(u, _DELETE_Q_RE, _DELETE_U_RE)
    return counts.orderBy("class_key")


# -------------------------------------------------- unigram LM scoring

_LM_VOCAB_K = 4096


@register(
    "unigram_logprob",
    f"""
    with t as (select doc_id, {_DECON_TOKS} as toks from documents),
    tok as (select doc_id, unnest(toks) as token from t),
    vocab as (select token, cast(count(*) as double) as c from tok
              group by token order by c desc, token limit {_LM_VOCAB_K}),
    tot as (select cast(count(*) as double) as tt from tok),
    sc as (select tk.doc_id,
                  sum(ln(coalesce(v.c, 1.0)) - ln(tot.tt)) as s,
                  count(*) as n,
                  sum(case when v.c is null then 1 else 0 end) as oov
           from tok tk left join vocab v using (token), tot
           group by tk.doc_id)
    select cast(t.doc_id as bigint) as doc_id,
           cast(len(t.toks) as int) as n_tokens,
           cast(coalesce(sc.oov, 0) as int) as oov_tokens,
           round(coalesce(sc.s / sc.n, 0.0), 6) as avg_logprob
    from t left join sc using (doc_id) order by doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM quality score: mean per-token
    ln(count/total) under the corpus's own heavy-hitter vocabulary
    (add-one OOV floor).  Fit = one map-side-combinable hash agg +
    TakeOrdered (bounded driver rows); score = a row-local JVM fold
    over each token array in array order — zero shuffles, no Python,
    deterministic float accumulation the oracle replays exactly."""
    from heritrix_spark.pipeline.lm import fit_unigram_lm, unigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab, total = fit_unigram_lm(docs, vocab_k=_LM_VOCAB_K)
    return (
        unigram_logprob(docs, vocab, total)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_tokens",
            "oov_tokens",
            "avg_logprob",
        )
        .orderBy("doc_id")
    )


# -------------------------------------------------- cross-doc n-gram dup

@register(
    "cross_doc_ngram_dup",
    f"""
    with t0 as (select doc_id, {_DECON_TOKS} as toks from documents),
    corpus as (
      select cast(doc_id as bigint) as doc_id, toks from t0
      union all
      select cast(doc_id + 1000000 as bigint) as doc_id, toks[3:30] as toks
      from t0 where doc_id % 17 = 0 and len(toks) >= 30
    ),
    g0 as (select doc_id, list_distinct(list_transform(
             range(1, len(toks) - 11),
             i -> array_to_string(toks[i:i+12], ' '))) as gs
           from corpus where len(toks) >= 13),
    g as (select doc_id,
                 ('0x' || substr(md5(unnest(gs)), 1, 15))::bigint as gh
          from g0),
    c as (select doc_id, count(*) over (partition by gh) as ndocs from g),
    s as (select doc_id, cast(count(*) as int) as shared_grams
          from c where ndocs > 1 group by doc_id)
    select c2.doc_id,
           cast(coalesce(len(g0.gs), 0) as int) as n_grams,
           coalesce(s.shared_grams, 0) as shared_grams,
           case when coalesce(len(g0.gs), 0) > 0
                then round(cast(coalesce(s.shared_grams, 0) as double)
                           / len(g0.gs), 6)
                else 0.0 end as dup_frac
    from corpus c2
    left join g0 using (doc_id) left join s using (doc_id)
    order by doc_id
    """,
)
def q_cross_doc_ngram_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal (Lee et al. 2022 reduced to bounded
    13-gram membership): per document, the count/fraction of its
    distinct 13-grams appearing in any OTHER document.  The fixture
    plants real overlap — every 17th document re-emits a 28-token slice
    of itself as a new doc.  Grams hash to md5-60 before the exchange
    (gram text never shuffles); sharing is one count-only window on the
    gram hash + one doc-keyed hash agg."""
    from heritrix_spark.pipeline.decontam import cross_doc_ngram_overlap
    from heritrix_spark.pipeline.textstats import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens_col(F.col("text"))
    planted = (
        docs.where((F.col("doc_id") % 17 == 0) & (F.size(toks) >= 30))
        .select(
            (F.col("doc_id") + 1000000).cast("long").alias("doc_id"),
            F.array_join(F.slice(toks, 3, 28), " ").alias("text"),
        )
    )
    corpus = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).unionByName(planted)
    return cross_doc_ngram_overlap(corpus, n=13).orderBy("doc_id")


# -------------------------------------------------- PII redaction

_PII_AUG = (
    "text || ' reach user' || cast(doc_id as string) || '@mail' || "
    "cast(doc_id % 7 as string) || '.example or 555-' || "
    "lpad(cast(doc_id % 1000 as string), 3, '0') || '-' || "
    "lpad(cast(doc_id % 10000 as string), 4, '0') || "
    "case when doc_id % 5 = 0 then ' ip 10.0.' || cast(doc_id % 256 as string) "
    "|| '.' || cast(1 + doc_id % 254 as string) else '' end || "
    "case when doc_id % 11 = 3 then ' ssn 987-65-' || "
    "lpad(cast(doc_id % 10000 as string), 4, '0') else '' end"
)


def _pii_oracle() -> str:
    from heritrix_spark.pipeline.pii import pii_count_sql, redact_pii_sql

    return f"""
    with a as (select doc_id, {_PII_AUG} as text from documents)
    select cast(doc_id as bigint) as doc_id,
           {pii_count_sql('text', 'email')} as n_email,
           {pii_count_sql('text', 'ipv4')} as n_ipv4,
           {pii_count_sql('text', 'ssn')} as n_ssn,
           {pii_count_sql('text', 'phone')} as n_phone,
           md5({redact_pii_sql('text')}) as redacted_hash
    from a order by doc_id
    """


@register("pii_redaction", _pii_oracle())
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: per-document match counts for each pattern
    (email / IPv4 / SSN-shaped / phone-shaped) plus the md5 of the
    redacted text (the redaction receipt).  The fixture deterministically
    plants PII derived from doc_id so the patterns fire at every scale.
    Pure JVM-regex projection — no shuffle, no Python; patterns live in
    the Java-regex ∩ RE2 subset so the oracle matches byte-for-byte."""
    from heritrix_spark.pipeline.pii import pii_stats

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(f"select doc_id, {_PII_AUG} as text from documents")
    return (
        pii_stats(aug)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_email",
            "n_ipv4",
            "n_ssn",
            "n_phone",
            "redacted_hash",
        )
        .orderBy("doc_id")
    )


# -------------------------------------------------- source mixture

_MIX_WEIGHTS = {"src0": 0.4, "src1": 0.2, "src3": 0.2, "src7": 0.2}
_MIX_TOTAL_N = 60


def _mixture_oracle() -> str:
    from heritrix_spark.pipeline.sampling import duck_sample_hash, mix_quotas

    quotas = mix_quotas(_MIX_WEIGHTS, _MIX_TOTAL_N)
    quota_case = " ".join(
        f"when '{g}' then {q}" for g, q in sorted(quotas.items())
    )
    return f"""
    with h as (select doc_id, source,
                      {duck_sample_hash('doc_id', 'mix')} as sh
               from documents),
    r as (select doc_id, source,
                 row_number() over (partition by source
                     order by sh asc, cast(doc_id as string) asc) as rk
          from h)
    select cast(doc_id as bigint) as doc_id, source from r
    where rk <= case source {quota_case} else 0 end
    order by doc_id
    """


@register("source_mixture", _mixture_oracle())
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-mixture composition: draw a corpus whose source proportions
    follow target weights — floor(total·w) rows per source, chosen by
    salted-hash order (deterministic under reruns/repartitioning; a
    source smaller than its quota contributes everything).  One window
    shuffle on the source key."""
    from heritrix_spark.pipeline.sampling import mix_by_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        mix_by_weights(
            docs, F.col("source"), F.col("doc_id"), _MIX_WEIGHTS, _MIX_TOTAL_N
        )
        .select(F.col("doc_id").cast("long").alias("doc_id"), "source")
        .orderBy("doc_id")
    )


# -------------------------------------------------- line-level dedup (C4)

# multi-line corpus derived from `documents` (SQL ∩ dialect subset):
# a per-doc unique line, a corpus-wide boilerplate line, a bucket-shared
# promo line (~N/17 repeats → always removed), and a long-tail line
# whose count straddles the min_count=3 threshold at small sf —
# exercising both sides of the boundary deterministically.
_LINE_AUG = (
    "'u' || cast(doc_id as string) || ' ' || substr(text, 1, 40) || chr(10) || "
    "'subscribe to our newsletter' || chr(10) || "
    "'promo block ' || cast(doc_id % 17 as string) || chr(10) || "
    "'rare line ' || cast(doc_id % 211 as string)"
)


def _line_dedup_oracle() -> str:
    return f"""
with aug as (select doc_id, {_LINE_AUG} as text from documents),
lines as (
  select doc_id,
         unnest(string_split(text, chr(10))) as line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) as pos
  from aug
),
freq as (select line from lines group by line having count(*) >= 3),
kept as (select l.* from lines l anti join freq f using (line)),
rebuilt as (
  select doc_id, string_agg(line, chr(10) order by pos) as clean_text,
         count(*) as n_kept
  from kept group by doc_id
)
select cast(a.doc_id as bigint) as doc_id,
       coalesce(r.clean_text, '') as clean_text,
       cast(len(string_split(a.text, chr(10))) - coalesce(r.n_kept, 0) as int)
         as n_removed
from aug a left join rebuilt r using (doc_id)
order by doc_id
"""


@register("line_dedup", _line_dedup_oracle())
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide duplicate-line removal (Raffel et al. 2020
    §2.2 at line granularity, as in RefinedWeb §3.3): any line occurring
    >= 3 times across the corpus is stripped from every document.  Line
    counting shuffles only md5 hashes (map-side combined); line text
    moves once, in the per-document reassembly."""
    from heritrix_spark.pipeline.linededup import line_dedup

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(f"select doc_id, {_LINE_AUG} as text from documents")
    return (
        line_dedup(aug, min_count=3)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "clean_text",
            "n_removed",
        )
        .orderBy("doc_id")
    )


# ----------------------------------------------- Gopher quality rules

# plant line structure, bullets, symbol runs and ellipses so every rule
# fires on both sides of its threshold (the raw fixture text is a
# single line of plain words)
_GQ_AUG = (
    "text || chr(10) || "
    "case when doc_id % 4 = 0 then '# # # # # # # #' "
    "else 'the data and that to be of have with more words here' end "
    "|| chr(10) || '- bullet item ' || cast(doc_id % 5 as string) "
    "|| case when doc_id % 6 = 0 then ' ...' else '' end "
    "|| chr(10) || 'closing line' "
    "|| case when doc_id % 3 = 0 then '...' else '' end"
)

_GQ_STOPS = "['the','be','to','of','and','that','have','with']"


def _gopher_quality_oracle() -> str:
    return f"""
with aug as (select doc_id, {_GQ_AUG} as text from documents),
t as (select doc_id, text,
  list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') as toks,
  string_split(text, chr(10)) as lines
  from aug),
s as (select doc_id,
  cast(len(toks) as int) as n_words,
  cast(coalesce(list_sum(list_transform(toks, w -> length(w))), 0) as int)
    as word_chars,
  cast(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) as int)
    as n_alpha_words,
  cast((length(text) - length(replace(text, '#', '')))
       + (length(text) - length(replace(text, '...', ''))) / 3 as int)
    as n_symbols,
  cast(len(list_filter({_GQ_STOPS}, sw -> list_contains(toks, sw))) as int)
    as n_stop_hits,
  cast(len(lines) as int) as n_lines,
  cast(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-•*]'))) as int)
    as n_bullet_lines,
  cast(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) as int)
    as n_ellipsis_lines
  from t)
select cast(doc_id as bigint) as doc_id,
  n_words, word_chars, n_alpha_words, n_symbols, n_stop_hits,
  n_lines, n_bullet_lines, n_ellipsis_lines,
  (n_words >= 50 and n_words <= 100000) as pass_word_count,
  (word_chars >= 3 * n_words and word_chars <= 10 * n_words)
    as pass_mean_word_len,
  (10 * n_symbols <= n_words) as pass_symbol_ratio,
  (5 * n_alpha_words >= 4 * n_words) as pass_alpha_words,
  (n_stop_hits >= 2) as pass_stop_words,
  (10 * n_bullet_lines <= 9 * n_lines) as pass_bullet_lines,
  (10 * n_ellipsis_lines <= 3 * n_lines) as pass_ellipsis_lines,
  ((n_words >= 50 and n_words <= 100000)
   and (word_chars >= 3 * n_words and word_chars <= 10 * n_words)
   and (10 * n_symbols <= n_words)
   and (5 * n_alpha_words >= 4 * n_words)
   and (n_stop_hits >= 2)
   and (10 * n_bullet_lines <= 9 * n_lines)
   and (10 * n_ellipsis_lines <= 3 * n_lines)) as pass_gopher
from s order by doc_id
"""


@register("gopher_quality", _gopher_quality_oracle())
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rule outcomes (Rae et al. 2021 Appendix A):
    word-count bounds, mean word length, symbol-to-word ratio, alpha-word
    fraction, stop-word floor, bullet/ellipsis line fractions — all as
    exact-integer comparisons, fully row-local codegen (no shuffle)."""
    from heritrix_spark.pipeline.textstats import gopher_quality_signals

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(f"select doc_id, {_GQ_AUG} as text from documents")
    return (
        gopher_quality_signals(aug)
        .withColumn("doc_id", F.col("doc_id").cast("long"))
        .orderBy("doc_id")
    )


# ------------------------------------- content extractors (CSS / JS / XML)

from heritrix_spark.operators.content_extract import (  # noqa: E402
    AUDIO_VIDEO_IMAGE_MIMETYPES as _CEX_MIMES,
    TLDS as _CEX_TLDS,
)

# Planted per-doc corpora: pure literals + doc_id, identical text built
# by both Spark SQL and DuckDB (quotes/backslashes via chr() so neither
# dialect's string-literal escaping is involved). The raw fixture text
# is NOT used — extraction laws are exercised on controlled content so
# the RE2 oracle twin is exact (the engine keeps the reference's Java
# patterns, which RE2 cannot express verbatim: backreferences in
# ExtractorCSS/ExtractorJS, closing-delimiter reuse in ExtractorJS —
# tests/test_content_extract.py pins those edge laws against the
# reference's own test vectors).

_CSS_AUG = (
    "'body { background: url(\"http://img.example/a' || cast(doc_id as string) || '.png\") } ' "
    "|| '@import url(style' || cast(doc_id % 7 as string) || '.css); ' "
    "|| case when doc_id % 3 = 0 then "
    "'div { cursor: url(' || chr(39) || 'http://cdn.example/b' || cast(doc_id as string) || '.gif' || chr(39) || ') } ' "
    "else '' end "
    "|| case when doc_id % 4 = 0 then "
    "'@import \"imp' || cast(doc_id as string) || '.css\"; span { mask: url( sprites/s' || cast(doc_id as string) || '.png ) } ' "
    "else '' end "
    "|| case when doc_id % 5 = 0 then "
    "'a { b: url(esc' || chr(92) || ' m' || chr(92) || ',' || cast(doc_id as string) || '.css) } "
    "li { c: url(x&ampz' || cast(doc_id as string) || '.css) } ' "
    "else '' end "
    "|| 'p { d: url(\"  http://pad.example/sp' || cast(doc_id as string) || '.css  \") }'"
)

# RE2 twin of ExtractorCSS.CSS_URI_EXTRACTOR: the Java original uses a
# backreference for the optional quote; the twin expands the three
# quote cases as alternation branches (mutually exclusive on the first
# content character), preserving match order. Single quotes doubled for
# SQL embedding.
_CSS_PAT_DUCK = (
    '(?i)(?:@import (?:url\\(|)|url\\()\\s*'
    '(?:"([^"\'\'][^"]*?)"|\'\'([^"\'\'][^\'\']*?)\'\'|([^"\'\'\\s);][^);]*?))\\s*[);]'
)


def _css_extract_oracle() -> str:
    p = _CSS_PAT_DUCK
    return f"""
with aug as (select doc_id, {_CSS_AUG} as css from documents),
m as (select doc_id, list_transform(
    list_zip(regexp_extract_all(css, '{p}', 1),
             regexp_extract_all(css, '{p}', 2),
             regexp_extract_all(css, '{p}', 3)),
    x -> regexp_replace(regexp_replace(coalesce(x[1], x[2], x[3]),
                                       '&amp', '&', 'g'),
                        '\\\\([,''"()\\s])', '\\1', 'g')) as us from aug)
select cast(doc_id as bigint) as doc_id,
       cast(unnest(range(len(us))) as int) as seq,
       unnest(us) as uri
from m order by doc_id, seq
"""


@register("css_extract", _css_extract_oracle())
def q_css_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorCSS url()/@import URI mining (ExtractorCSS.java:69-80,
    121-150) over planted per-doc stylesheet text: the reference's Java
    pattern verbatim (Spark's JVM regex dialect), CSS backslash-escape
    unescape, literal &amp fixup. Pure Catalyst row-local projection —
    no shuffle, no Python."""
    from heritrix_spark.operators.content_extract import css_uris

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(f"select doc_id, {_CSS_AUG} as css from documents")
    return (
        aug.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(css_uris(F.col("css"))).alias("seq", "uri"),
        )
        .withColumn("seq", F.col("seq").cast("int"))
        .orderBy("doc_id", "seq")
    )


_JS_AUG = (
    "'var a = \"//cdn.example/lib' || cast(doc_id as string) || '.js\"; ' "
    "|| 'load(' || chr(39) || 'www.h' || cast(doc_id % 9 as string) || '.example.com/app.js' || chr(39) || '); ' "
    "|| 'fetch(\"http%3A%2F%2Fapi.example%2Fv' || cast(doc_id % 3 as string) || '\"); ' "
    "|| 'x = \"text/html\"; y = \"5.25\"; z = \"img' || cast(doc_id as string) || '.png\"; ' "
    "|| case when doc_id % 6 = 0 then 'u = \"a.example/p?q=1&amp;r=2\"; ' else '' end "
    "|| 'end()'"
)

# RE2 twin of ExtractorJS.JAVASCRIPT_STRING_EXTRACTOR for the planted
# corpus (no backslash-quoted delimiters, no adjacent strings — the
# closing-delimiter-reuse and recursion laws are pinned in pytest).
_JS_PAT_DUCK = '"([^\\s"]*?)"|\'\'([^\\s\'\']*?)\'\''

_MIME_IN = ", ".join("'%s'" % m for m in _CEX_MIMES)
_TLD_IN = ", ".join("'%s'" % t for t in _CEX_TLDS)


def _likely_sql(v: str) -> str:
    """UriUtils.isLikelyUri (:92-100,245-290) as a DuckDB predicate —
    the same lookbehind-free decomposition the engine Column uses."""
    return (
        f"regexp_matches({v}, '^[^<>\\s]*[./][^<>\\s]*$') "
        f"and not regexp_matches({v}, '\\.$') "
        f"and not regexp_matches({v}, '^(?:text|application)/[^/]+$') "
        f"and {v} not in ({_MIME_IN}) "
        f"and not regexp_matches({v}, '^\\d+\\.\\d+$') "
        f"and not regexp_matches({v}, '[$()''\"\\[\\]{{}}|]') "
        f"and not ({v} like '+%' or {v} like '%+')"
    )


def _fixup_sql(v: str) -> str:
    """UriUtils.speculativeFixup (:296-337) twin: &amp; unescape,
    percent-decode of encoded-scheme strings (the planted corpus uses
    %3A/%2F only, so a replace chain equals the engine's url_decode),
    http:// prefix for dotted-domain strings ending in a TLD."""
    u2 = f"replace({v}, '&amp;', '&')"
    u3 = (
        f"case when regexp_matches({u2}, '(?i)^https?%3a') "
        f"then replace(replace({u2}, '%3A', ':'), '%2F', '/') "
        f"else {u2} end"
    )
    dd = "'^[^./:\\s%]+\\.[^/:\\s%]+\\.([^./:\\s%]+)(/.*|)$'"
    return (
        f"case when regexp_matches({u3}, {dd}) "
        f"and lower(regexp_extract({u3}, {dd}, 1)) in ({_TLD_IN}) "
        f"then 'http://' || {u3} else {u3} end"
    )


def _js_extract_oracle() -> str:
    p = _JS_PAT_DUCK
    return f"""
with aug as (select doc_id, {_JS_AUG} as js from documents),
m as (select doc_id, list_transform(
    list_zip(regexp_extract_all(js, '{p}', 1),
             regexp_extract_all(js, '{p}', 2)),
    x -> coalesce(x[1], x[2])) as ss from aug),
e as (select doc_id, unnest(ss) as s,
             cast(unnest(range(len(ss))) as int) as pos from m),
f as (select doc_id, pos, {_fixup_sql('s')} as uri from e
      where {_likely_sql('s')})
select cast(doc_id as bigint) as doc_id,
       cast(row_number() over (partition by doc_id order by pos) - 1 as int)
         as seq,
       uri
from f order by doc_id, seq
"""


@register("js_extract", _js_extract_oracle())
def q_js_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorJS speculative-link mining (ExtractorJS.java:68-73,
    152-193 + UriUtils.isLikelyUri/speculativeFixup) over planted
    per-doc script text: quoted whitespace-free strings, likely-URI
    filter, JS unescape + speculative fixup. The scan loop's
    overlapping matches are inexpressible in regexp_extract_all, so
    this is the one Arrow-batched pandas-UDF kernel (vectorized, text
    column only — the sanctioned slow path)."""
    from heritrix_spark.operators.content_extract import js_string_uris

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(f"select doc_id, {_JS_AUG} as js from documents")
    return (
        aug.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(js_string_uris(F.col("js"))).alias("seq", "uri"),
        )
        .withColumn("seq", F.col("seq").cast("int"))
        .orderBy("doc_id", "seq")
    )


_XML_AUG = (
    "'<?xml version=\"1.0\"?><rss><channel><link>http://feed.example/d' || cast(doc_id as string) || '</link>' "
    "|| '<enclosure url=\"http://media.example/ep' || cast(doc_id % 11 as string) || '.mp3\" type=\"audio/mpeg\"/>' "
    "|| '<author>user' || cast(doc_id as string) || '@mail.example</author>' "
    "|| '<guid>tag' || cast(doc_id as string) || '.item/' || cast(doc_id as string) || '</guid>' "
    "|| case when doc_id % 2 = 0 then "
    "'<page>http://www.example.org/p?x=' || cast(doc_id as string) || '&amp;y=2</page>' else '' end "
    "|| '</channel></rss>'"
)


def _xml_extract_oracle() -> str:
    return f"""
with aug as (select doc_id, {_XML_AUG} as xml from documents),
m as (select doc_id, list_transform(
    regexp_extract_all(xml, '["''>]\\s*([^<>\\s''"@]+)\\s*["''<]', 1),
    x -> replace(replace(replace(replace(replace(x,
         '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         '&apos;', ''''), '&amp;', '&')) as us from aug),
e as (select doc_id, unnest(us) as u,
             cast(unnest(range(len(us))) as int) as pos from m)
select cast(doc_id as bigint) as doc_id,
       cast(row_number() over (partition by doc_id order by pos) - 1 as int)
         as seq,
       u as uri
from e where {_likely_sql('u')}
order by doc_id, seq
"""


@register("xml_extract", _xml_extract_oracle())
def q_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorXML URI mining (ExtractorXML.java:57-58,148-166) over
    planted per-doc RSS-ish text: delimiter-bounded candidates, XML
    entity unescape, UriUtils.isLikelyUri filter (no fixup — the
    reference adds XML candidates as-is). The find loop consumes whole
    matches, so non-overlapping regexp_extract_all is exact on both
    engines. Pure Catalyst, row-local."""
    from heritrix_spark.operators.content_extract import (
        is_likely_uri,
        xml_candidates,
    )

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(f"select doc_id, {_XML_AUG} as xml from documents")
    kept = F.filter(xml_candidates(F.col("xml")), lambda u: is_likely_uri(u))
    return (
        aug.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(kept).alias("seq", "uri"),
        )
        .withColumn("seq", F.col("seq").cast("int"))
        .orderBy("doc_id", "seq")
    )


_URI_AUG = (
    "case when doc_id % 5 = 0 then "
    "'http://noq.example/page' || cast(doc_id as string) "
    "when doc_id % 4 = 0 then "
    "'http://go.example/r?http://direct.example/d' || cast(doc_id as string) "
    "else "
    "'http://site.example/redir?u=http%3A%2F%2Ftarget.example%2Fp' || cast(doc_id as string) "
    "|| case when doc_id % 3 = 0 then "
    "'&v=https%3A%2F%2Fsec.example%2Fq' || cast(doc_id % 7 as string) "
    "else '&w=plain&x=1' end "
    "end"
)


def _uri_extract_oracle() -> str:
    return f"""
with aug as (select doc_id, {_URI_AUG} as url from documents),
q as (select doc_id, regexp_extract(url, '^[^?#]*\\?([^#]*)', 1) as rq
      from aug),
c as (select doc_id, list_filter(list_concat(
    [replace(replace(rq, '%3A', ':'), '%2F', '/')],
    list_transform(string_split(rq, '&'),
      p -> case when len(string_split(p, '=')) = 2
           then replace(replace(string_split(p, '=')[2], '%3A', ':'),
                        '%2F', '/')
           else null end)),
    u -> u is not null and regexp_matches(u, '^https?://[^\\s<>]*$')) as us
  from q)
select cast(doc_id as bigint) as doc_id,
       cast(unnest(range(len(us))) as int) as seq,
       unnest(us) as uri
from c order by doc_id, seq
"""


@register("uri_extract", _uri_extract_oracle())
def q_uri_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorURI query-string URI mining (ExtractorURI.java:56,
    126-168): the whole decoded query when it is itself an absolute
    http(s) URI, plus each key=value parameter whose decoded value is —
    SPECULATIVE hops in the reference. Pure Catalyst over planted
    per-doc URLs (the percent-escapes planted are %3A/%2F only so the
    oracle's replace-chain decode equals the engine's url_decode)."""
    from heritrix_spark.operators.content_extract import query_string_uris

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(f"select doc_id, {_URI_AUG} as url from documents")
    return (
        aug.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(query_string_uris(F.col("url"))).alias("seq", "uri"),
        )
        .withColumn("seq", F.col("seq").cast("int"))
        .orderBy("doc_id", "seq")
    )


# ------------------------------------------------------ ExtractorHTML

_HTML_PAGE_URL = (
    "'http://site' || cast(doc_id % 50 as string) || '.example/dir/page' "
    "|| cast(doc_id as string) || '.html'"
)

#: Planted per-doc HTML exercising the flagship ExtractorHTML law end
#: to end: a robots-nofollow meta on every 13th doc (aborts the whole
#: scan), <base href> mutation, meta refresh (R), a/link/img/iframe
#: (L/E), an inline STYLE attribute (CSS url() => =EMBED_MISC), the
#: HER-1280 form method law (post dropped, get/absent kept), a script
#: body with one likely-URI string and one decimal false positive
#: (HER-1526), and a HER-1728 flashvars param.
_HTML_AUG = (
    "case when doc_id % 13 = 0 then "
    "'<meta name=\"robots\" content=\"noindex,nofollow\">' else '' end "
    "|| '<base href=\"http://base' || cast(doc_id % 7 as string) || '.example/b/\">' "
    "|| case when doc_id % 4 = 1 then "
    "'<meta http-equiv=\"refresh\" content=\"3;url=fresh' || cast(doc_id as string) || '.html\">' "
    "else '' end "
    "|| '<a href=\"p' || cast(doc_id as string) || '.html\">x</a>' "
    "|| '<link rel=\"css\" href=\"s' || cast(doc_id % 5 as string) || '.css\">' "
    "|| '<img src=\"i' || cast(doc_id as string) || '.png\">' "
    "|| '<iframe src=\"f' || cast(doc_id as string) || '.html\">' "
    "|| '<div style=\"background: url(bg' || cast(doc_id % 3 as string) || '.gif)\">' "
    "|| case when doc_id % 3 = 0 then "
    "'<form method=\"post\" action=\"act' || cast(doc_id as string) || '.cgi\">' "
    "when doc_id % 3 = 1 then "
    "'<form method=\"get\" action=\"act' || cast(doc_id as string) || '.cgi\">' "
    "else '<form action=\"act' || cast(doc_id as string) || '.cgi\">' end "
    "|| '<script type=\"text/javascript\">u=\"http://js' || cast(doc_id % 9 as string) "
    "|| '.example/app.js\";v=\"5.25\";</script>' "
    "|| '<param name=\"flashvars\" value=\"path=fv' || cast(doc_id as string) || '.xml\">'"
)


def _html_extract_oracle() -> str:
    """Independent re-derivation: the twin computes the expected link
    table straight from the generator parameters (doc_id arithmetic)
    rather than re-parsing the HTML — every discovery-order position,
    context string, hop char, and base-resolved destination is restated
    from the ExtractorHTML law by hand."""
    return """
with d as (select doc_id,
    'http://base' || cast(doc_id % 7 as string) || '.example/b/' as b
  from documents where doc_id % 13 <> 0),
r as (
  select doc_id, 0 as ord, b as uri, 'base/@href' as context, 'L' as hop
    from d
  union all
  select doc_id, 1, b || 'fresh' || cast(doc_id as string) || '.html',
         'meta', 'R' from d where doc_id % 4 = 1
  union all
  select doc_id, 2, b || 'p' || cast(doc_id as string) || '.html',
         'a/@href', 'L' from d
  union all
  select doc_id, 3, b || 's' || cast(doc_id % 5 as string) || '.css',
         'link/@href', 'E' from d
  union all
  select doc_id, 4, b || 'i' || cast(doc_id as string) || '.png',
         'img/@src', 'E' from d
  union all
  select doc_id, 5, b || 'f' || cast(doc_id as string) || '.html',
         'iframe/@src', 'E' from d
  union all
  select doc_id, 6, b || 'bg' || cast(doc_id % 3 as string) || '.gif',
         '=EMBED_MISC', 'E' from d
  union all
  select doc_id, 7, b || 'act' || cast(doc_id as string) || '.cgi',
         'form/@action', 'L' from d where doc_id % 3 <> 0
  union all
  select doc_id, 8, 'http://js' || cast(doc_id % 9 as string)
         || '.example/app.js', '=JS_MISC', 'X' from d
  union all
  select doc_id, 9, b || 'fv' || cast(doc_id as string) || '.xml',
         'param/@value', 'X' from d)
select cast(doc_id as bigint) as doc_id,
       cast(row_number() over (partition by doc_id order by ord) - 1 as int)
         as seq,
       uri, context, hop
from r order by doc_id, seq
"""


@register("html_extract", _html_extract_oracle())
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorHTML — the reference's flagship tag-scan extractor
    (ExtractorHTML.java:113-174 patterns, :331-533 processGeneralTag,
    :757-816 extract, :871-921 processMeta) over planted per-doc HTML.
    The law is a stateful sequential scan (<base> mutation, form
    ACTION+METHOD coupling, robots-meta abort), so it runs as ONE
    Arrow-batched pandas UDF returning the ordered outlink array —
    row-local, no shuffle, one ArrowEvalPython stage; the DuckDB twin
    re-derives every expected row from the generator parameters."""
    from heritrix_spark.operators.html_extract import html_outlinks

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(
        f"select doc_id, {_HTML_PAGE_URL} as page_url, {_HTML_AUG} as body "
        "from documents"
    )
    return (
        aug.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(
                html_outlinks(F.col("page_url"), F.col("body"))
            ).alias("seq", "lk"),
        )
        .select(
            "doc_id",
            F.col("seq").cast("int").alias("seq"),
            F.col("lk.uri").alias("uri"),
            F.col("lk.context").alias("context"),
            F.col("lk.hop").alias("hop"),
        )
        .orderBy("doc_id", "seq")
    )


# ---------------------------------------------- JerichoExtractorHTML forms

_JF_BODY = (
    "'<form name=\"tf\" method=\"' "
    "|| case when doc_id % 3 = 0 then 'POST' else 'GET' end "
    "|| '\" action=\"act' || cast(doc_id as string) || '.cgi' "
    "|| case when doc_id % 3 = 1 then '?x=1' else '' end || '\">' "
    "|| '<input type=\"hidden\" name=\"h\" value=\"v' || cast(doc_id as string) || '\">' "
    "|| '<input type=\"checkbox\" name=\"cb\" value=\"1\"' "
    "|| case when doc_id % 2 = 0 then ' checked' else '' end || '>' "
    "|| '<select name=\"sel\">' "
    "|| '<option value=\"f' || cast(doc_id % 7 as string) || '\">a</option>' "
    "|| '<option value=\"s' || cast(doc_id % 5 as string) || '\"' "
    "|| case when doc_id % 5 <> 0 then ' selected' else '' end || '>b</option>' "
    "|| '</select>' "
    "|| '<input type=\"submit\" name=\"sub\" value=\"Go\"></form>'"
)


def _jericho_forms_oracle() -> str:
    """Twin re-derived from the generator arithmetic: the Jericho
    processForm law (action + default field values as a GET query;
    POST dropped; unchecked box empty; selected-else-first option)."""
    return """
select cast(doc_id as bigint) as doc_id,
  'http://pg' || cast(doc_id % 9 as string) || '.example/dir/act'
    || cast(doc_id as string) || '.cgi'
    || case when doc_id % 3 = 1 then '?x=1&' else '?' end
    || 'h=v' || cast(doc_id as string)
    || '&cb=' || case when doc_id % 2 = 0 then '1' else '' end
    || '&sel=' || case when doc_id % 5 <> 0
                       then 's' || cast(doc_id % 5 as string)
                       else 'f' || cast(doc_id % 7 as string) end
    || '&sub=Go' as uri,
  'form/@name=tf' as context, 'L' as hop
from documents where doc_id % 3 <> 0 order by doc_id
"""


@register("jericho_forms", _jericho_forms_oracle())
def q_jericho_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JerichoExtractorHTML differential (processForm,
    JerichoExtractorHTML.java:352-421; goldens
    JerichoExtractorHTMLTest.java:58-148): form links carry the default
    field values as a GET query string — checked boxes their value,
    unchecked an empty value, selects their selected-else-first option,
    submits their predefined value; POST forms drop under
    extractOnlyFormGets. One Arrow pass with jericho_forms=True."""
    from heritrix_spark.operators.html_extract import html_outlinks

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(
        "select doc_id, 'http://pg' || cast(doc_id % 9 as string)"
        " || '.example/dir/page.html' as page_url, "
        f"{_JF_BODY} as body from documents"
    )
    links = aug.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(
            html_outlinks(F.col("page_url"), F.col("body"), jericho_forms=True)
        ).alias("lk"),
    )
    return (
        links.select(
            "doc_id",
            F.col("lk.uri").alias("uri"),
            F.col("lk.context").alias("context"),
            F.col("lk.hop").alias("hop"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------ RobotsPolicy family

#: Per-doc planted policy dimension: primary UA "crawler" has a named
#: deny-all-but-images group on every 3rd doc; candidate "allowbot" a
#: named Disallow:/foo group on every 2nd; candidate "goodbot" a named
#: allow-all group on every 5th; the wildcard group disallows
#: /cgi-bin/ and /foo. Paths cycle through the four interesting cases.
_RP_PATH = (
    "case when doc_id % 4 = 0 then '/cgi-bin/q' || cast(doc_id as string) "
    "when doc_id % 4 = 1 then '/foo' "
    "when doc_id % 4 = 2 then '/images/i' || cast(doc_id as string) || '.gif' "
    "else '/ok/page' || cast(doc_id as string) end"
)

_RP_GROUPS = (
    "array("
    "named_struct('agent','crawler','named', doc_id % 3 = 0, "
    "'allows', case when doc_id % 3 = 0 then array('/images/') end, "
    "'disallows', case when doc_id % 3 = 0 then array('/') end), "
    "named_struct('agent','allowbot','named', doc_id % 2 = 0, "
    "'allows', cast(null as array<string>), "
    "'disallows', case when doc_id % 2 = 0 then array('/foo') end), "
    "named_struct('agent','goodbot','named', doc_id % 5 = 0, "
    "'allows', cast(null as array<string>), "
    "'disallows', case when doc_id % 5 = 0 then array('/zzz/') end))"
)


def _rp_law(al: str, dis: str) -> str:
    """RobotsDirectives.allows prefix law as DuckDB SQL over literal
    lists ('null' for an absent group side)."""
    return (
        f"not (coalesce(list_max(list_transform(list_filter({dis}, "
        f"d -> starts_with(path, d)), d -> length(d))), 0) > "
        f"coalesce(list_max(list_transform(list_filter({al}, "
        f"a -> starts_with(path, a)), a -> length(a))), 0))"
    )


def _robots_policies_oracle() -> str:
    wc = _rp_law("null", "['/cgi-bin/','/foo']")
    crawler = _rp_law("['/images/']", "['/']")
    allowbot = _rp_law("null", "['/foo']")
    goodbot = _rp_law("null", "['/zzz/']")
    return f"""
with p as (select doc_id, {_RP_PATH} as path from documents),
law as (select doc_id, path,
    doc_id % 3 = 0 as c_named, doc_id % 2 = 0 as a_named,
    doc_id % 5 = 0 as g_named,
    {crawler} as c_ok, {allowbot} as a_ok, {goodbot} as g_ok,
    {wc} as w_ok from p),
pol as (select doc_id, path,
    case when c_named then c_ok else w_ok end as obey_allowed,
    case when c_named then c_ok when a_named then a_ok
         when g_named then g_ok else w_ok end as fn_allowed,
    case when not c_named and a_named then 'allowbot'
         when not c_named and g_named then 'goodbot' end as fn_masquerade,
    (case when c_named then c_ok else w_ok end)
      or (case when a_named then a_ok else w_ok end)
      or (case when g_named then g_ok else w_ok end) as mf_allowed,
    case when not (case when c_named then c_ok else w_ok end)
         and (case when a_named then a_ok else w_ok end) then 'allowbot'
         when not (case when c_named then c_ok else w_ok end)
         and (case when g_named then g_ok else w_ok end) then 'goodbot'
         end as mf_masquerade
  from law)
select cast(doc_id as bigint) as doc_id, path, obey_allowed, true as
  ignore_allowed, fn_allowed, fn_masquerade, mf_allowed, mf_masquerade
from pol order by doc_id
"""


@register("robots_policies", _robots_policies_oracle())
def q_robots_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RobotsPolicy family (ObeyRobotsPolicy/IgnoreRobotsPolicy/
    FirstNamedRobotsPolicy.java:60-78/MostFavoredRobotsPolicy.java:61-75)
    as pure Column folds over a broadcast per-host agent-group
    dimension: first-named tries the primary UA's named group, then
    each candidate's (masquerading), then the wildcard; most-favored
    allows if ANY agent's fallback lookup allows. The DuckDB twin
    re-derives every decision from the generator parameters."""
    from heritrix_spark.operators.politeness import robots_allows_col
    from heritrix_spark.operators.robots_policy import (
        first_named_allows_col,
        first_named_masquerade_col,
        most_favored_allows_col,
        most_favored_masquerade_col,
    )

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(
        f"select doc_id, {_RP_PATH} as path, {_RP_GROUPS} as groups, "
        "cast(null as array<string>) as wc_allows, "
        "array('/cgi-bin/','/foo') as wc_disallows from documents"
    )
    g, wa, wd, p = (F.col("groups"), F.col("wc_allows"),
                    F.col("wc_disallows"), F.col("path"))
    primary = F.element_at(g, 1)
    obey = F.when(
        primary["named"],
        robots_allows_col(primary["allows"], primary["disallows"], p),
    ).otherwise(robots_allows_col(wa, wd, p))
    return aug.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        p.alias("path"),
        obey.alias("obey_allowed"),
        F.lit(True).alias("ignore_allowed"),
        first_named_allows_col(g, wa, wd, p).alias("fn_allowed"),
        first_named_masquerade_col(g).alias("fn_masquerade"),
        most_favored_allows_col(g, wa, wd, p).alias("mf_allowed"),
        most_favored_masquerade_col(g, wa, wd, p).alias("mf_masquerade"),
    ).orderBy("doc_id")


# ------------------------------------------------------ ExtractorUniversal

_UNIV_AUG = (
    "case when doc_id % 3 = 0 then 'junk bad.com/x ' else '' end "
    "|| 'See http://u' || cast(doc_id as string) || '.example.com/a' "
    "|| ' and http://10.' || cast(doc_id % 200 as string) || '.0.1 end'"
)


def _universal_extract_oracle() -> str:
    return """
with d as (select doc_id from documents where doc_id % 3 <> 0),
r as (
  select doc_id, 0 as seq,
         'http://u' || cast(doc_id as string) || '.example.com/a' as uri
    from d
  union all
  select doc_id, 1,
         'http://10.' || cast(doc_id % 200 as string) || '.0.1' from d)
select cast(doc_id as bigint) as doc_id, cast(seq as int) as seq, uri
from r order by doc_id, seq
"""


@register("universal_extract", _universal_extract_oracle())
def q_universal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorUniversal (ExtractorUniversal.java:357-446): the
    URLable-char-run accumulator with the dot/TLD probe and
    http(s)://IP full-match, emitting SPECULATIVE hops. Planted text
    puts a scheme-less-but-TLD-passing token first on every 3rd doc,
    whose URIException faithfully aborts that doc's scan (zero rows).
    Arrow pandas UDF (sequential char-run state); the DuckDB twin
    re-derives the surviving tokens from the generator parameters."""
    from heritrix_spark.operators.content_extract import universal_uris

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(f"select doc_id, {_UNIV_AUG} as body from documents")
    return (
        aug.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(universal_uris(F.col("body"))).alias("seq", "uri"),
        )
        .withColumn("seq", F.col("seq").cast("int"))
        .orderBy("doc_id", "seq")
    )


# ------------------------------------------------------ ExtractorHTTP (full)

_HH_URL = (
    "'http://h' || cast(doc_id % 20 as string) || '.example/d/p' "
    "|| cast(doc_id as string) || '.html'"
)
_HH_LOC = (
    "case when doc_id % 3 = 0 then '/moved/m' || cast(doc_id as string) "
    "when doc_id % 3 = 1 then 'http://other.example/o' || cast(doc_id as string) "
    "end"
)
_HH_CLOC = (
    "case when doc_id % 2 = 0 then 'cl' || cast(doc_id as string) || '.html' end"
)


def _http_header_links_oracle() -> str:
    return """
with d as (select doc_id,
    'http://h' || cast(doc_id % 20 as string) || '.example' as origin
  from documents),
r as (
  select doc_id, 0 as ord,
         origin || '/moved/m' || cast(doc_id as string) as uri,
         'Location:' as context, 'R' as hop
    from d where doc_id % 3 = 0
  union all
  select doc_id, 0, 'http://other.example/o' || cast(doc_id as string),
         'Location:', 'R' from d where doc_id % 3 = 1
  union all
  select doc_id, 1, origin || '/d/cl' || cast(doc_id as string) || '.html',
         'Content-Location:', 'R' from d where doc_id % 2 = 0
  union all
  select doc_id, 2, origin || '/favicon.ico', '=INFERRED_MISC', 'I' from d)
select cast(doc_id as bigint) as doc_id,
       cast(row_number() over (partition by doc_id order by ord) - 1 as int)
         as seq,
       uri, context, hop
from r order by doc_id, seq
"""


@register("http_header_links", _http_header_links_oracle())
def q_http_header_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractorHTTP complete header law (ExtractorHTTP.java:40-76):
    Location + Content-Location => REFER links with '<Header>:'
    contexts, /favicon.ico => INFERRED — pure Catalyst (header values
    resolved against the fetched URI via the RFC 3986 Column chain).
    The DuckDB twin re-derives rows from the generator parameters."""
    from heritrix_spark.operators.extract import http_header_links

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    aug = spark.sql(
        f"select doc_id, {_HH_URL} as url, {_HH_LOC} as loc, "
        f"{_HH_CLOC} as cloc from documents"
    )
    links = http_header_links(F.col("url"), F.col("loc"), F.col("cloc"))
    return (
        aug.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(links).alias("seq", "lk"),
        )
        .select(
            "doc_id",
            F.col("seq").cast("int").alias("seq"),
            F.col("lk.uri").alias("uri"),
            F.col("lk.context").alias("context"),
            F.col("lk.hop").alias("hop"),
        )
        .orderBy("doc_id", "seq")
    )


# ------------------------------------------ 40. URL-level corpus filtering
#
# RefinedWeb §3.1 (Penedo et al. 2023): registered-domain blocklist +
# weighted badword scoring over the URL string, before any text is
# read. The blocklist joins on the frontier's own assignment-level
# (PSL-reduced) queue key, so one entry covers every subdomain/port.

_UF_SEGS = [
    "news", "sports", "casino", "poker-webcam",
    "mail", "free-bet", "crack-torrent", "wiki",
]
_UF_SEG_CASE = (
    "case "
    + " ".join(f"when doc_id % 8 = {i} then '{s}'" for i, s in enumerate(_UF_SEGS))
    + " end"
)
_UF_BLOCKED = ["host7.example", "host23.example"]


def _url_filter_oracle() -> str:
    from heritrix_spark.functions.psl import (
        assignment_level_class_key_py,
        psl_rules_cte,
        reduce_surt_sql,
    )
    from heritrix_spark.pipeline.urlfilter import (
        DEFAULT_THRESHOLD_MILLI,
        badword_score_sql,
    )

    keys = ", ".join(
        f"'{assignment_level_class_key_py(f'http://{d}/')}'" for d in _UF_BLOCKED
    )
    ck = class_key_sql(canonicalize_sql("url"))
    return f"""
    with {psl_rules_cte()},
    u as ({_DUCK_URLS}),
    u2 as (select doc_id, url || '#' || {_UF_SEG_CASE} as url from u),
    k as (select doc_id, url, {reduce_surt_sql(ck)} as domain_key,
                 {badword_score_sql('url')} as badword_score_milli
          from u2),
    v as (select *, domain_key in ({keys}) as blocked_domain from k)
    select cast(doc_id as bigint) as doc_id, url, domain_key,
           blocked_domain, badword_score_milli,
           case when blocked_domain then 'blocked_domain'
                when badword_score_milli >= {DEFAULT_THRESHOLD_MILLI}
                  then 'badword'
                else 'keep' end as url_verdict
    from v order by doc_id
    """


@register("url_filter", _url_filter_oracle())
def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level corpus filter (RefinedWeb §3.1 analog): registered-
    domain blocklist broadcast-joined on the PSL-reduced SURT key (the
    AssignmentLevelSurtQueueAssignmentPolicy queue key,
    heritrix3/engine/.../AssignmentLevelSurtQueueAssignmentPolicy.java:30-40)
    + pure-codegen weighted badword scoring of the URL string. The
    corpus side never shuffles; blocked documents' text columns are
    never scanned (pipeline/urlfilter.py)."""
    from heritrix_spark.pipeline.urlfilter import blocklist_df, url_filter

    u = _docs_urls(spark, sf_dir).selectExpr(
        "doc_id", f"url || '#' || {_UF_SEG_CASE} as url"
    )
    bl = blocklist_df(spark, _UF_BLOCKED)
    return (
        url_filter(u, bl)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "url",
            "domain_key",
            "blocked_domain",
            "badword_score_milli",
            "url_verdict",
        )
        .orderBy("doc_id")
    )


# --------------------------------- 41. hashed linear classifier scoring
#
# fastText-style quality-classifier scoring (Joulin et al. 2016;
# hashing trick per Weinberger et al. 2009): unigram+bigram features →
# md5-60 → bucket → literal weight array, folded row-locally in exact
# integer milli-units. Zero shuffles, zero Python.

_CLF_WEIGHTS_K = 256
_CLF_BIAS_MILLI = -1500


def _clf_oracle() -> str:
    from heritrix_spark.pipeline.classifier import (
        demo_weights_milli,
        hashed_linear_score_sql,
    )

    return (
        hashed_linear_score_sql(
            demo_weights_milli(_CLF_WEIGHTS_K), bias_milli=_CLF_BIAS_MILLI
        )
        + " order by doc_id"
    )


@register("hashed_classifier_score", _clf_oracle())
def q_hashed_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear classifier scoring (pipeline/classifier.py):
    the learned-quality-filter scoring pass as ONE whole-stage-codegen
    projection — tokens + word bigrams hashed to md5-60 buckets against
    a literal weight vector, integer-milli logit so the result is
    partitioning- and dialect-exact."""
    from heritrix_spark.pipeline.classifier import (
        demo_weights_milli,
        hashed_linear_score,
    )

    # the sf tables are single parquet files → a single scan partition
    # would serialize the per-feature md5 fold on one core; spread the
    # rows first (result is partitioning-exact — integer sums). At
    # production scale the input is already thousands of files and this
    # repartition disappears.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return hashed_linear_score(
        docs, demo_weights_milli(_CLF_WEIGHTS_K), bias_milli=_CLF_BIAS_MILLI
    ).orderBy("doc_id")


# ---------------------------------- 42. contaminated-span removal
#
# The removal variant of decontaminate_ngram (Lee et al. 2022 §4.2 cut
# matched substrings; C4 removes offending lines): tokens covered by
# any benchmark-matching 13-gram are cut, text rebuilt row-locally.

@register(
    "decontaminate_removal",
    f"""
    with t as (select doc_id, {_DECON_TOKS} as toks from documents),
    bench as (select distinct array_to_string(toks[4:16], ' ') as ng
              from t where doc_id % 29 = 0 and len(toks) >= 16),
    cg as (select doc_id,
                  unnest(range(1, len(toks) - 11)) as i,
                  unnest(list_transform(
                    range(1, len(toks) - 11),
                    i -> array_to_string(toks[i:i+12], ' '))) as ng
           from t where doc_id % 29 <> 0 and len(toks) >= 13),
    m as (select doc_id, list_sort(list(i)) as starts,
                 cast(count(*) as int) as matched_spans
          from cg join bench using (ng) group by doc_id),
    r as (select t.doc_id, t.toks,
                 coalesce(m.starts, []) as starts,
                 coalesce(m.matched_spans, 0) as matched_spans
          from t left join m using (doc_id) where t.doc_id % 29 <> 0),
    k as (select doc_id, toks, starts, matched_spans,
                 list_filter(
                   list_transform(range(1, len(toks) + 1),
                     j -> case when len(list_filter(starts,
                                 s -> j >= s and j < s + 13)) > 0
                               then null else toks[j] end),
                   x -> x is not null) as kept
          from r)
    select cast(doc_id as bigint) as doc_id,
           cast(len(toks) as int) as n_tokens,
           matched_spans,
           cast(len(toks) - len(kept) as int) as tokens_removed,
           array_to_string(kept, ' ') as clean_text
    from k order by doc_id
    """,
)
def q_decontaminate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated-span REMOVAL (pipeline/decontam.py
    remove_contaminated_spans): benchmark 13-grams broadcast, matched
    start positions aggregated per doc, coverage mask + text rebuild as
    row-local higher-order expressions — only (doc_id, start) pairs
    ever shuffle, never the text."""
    from heritrix_spark.pipeline.decontam import remove_contaminated_spans
    from heritrix_spark.pipeline.textstats import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokens_col(F.col("text"))
    bench = (
        docs.filter(F.col("doc_id") % 29 == 0)
        .filter(F.size(toks) >= 16)
        .select(F.array_join(F.slice(toks, 4, 13), " ").alias("text"))
    )
    corpus = docs.filter(F.col("doc_id") % 29 != 0)
    return (
        remove_contaminated_spans(corpus, bench, n=13)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_tokens",
            "matched_spans",
            "tokens_removed",
            "clean_text",
        )
        .orderBy("doc_id")
    )


# ---------------------------------- 43. C4 text-level badword filter
#
# Document-side sibling of url_filter (Raffel et al. 2020 §2.2): the
# same weighted list, word-boundary matched over the text. The fixture
# plants list words by appending the url_filter segment derivation.

def _text_badword_oracle() -> str:
    from heritrix_spark.pipeline.urlfilter import text_badword_filter_sql

    inner = text_badword_filter_sql(source="planted")
    return f"""
    with planted as (
      select doc_id, text || ' ' || {_UF_SEG_CASE} as text from documents
    )
    select cast(doc_id as bigint) as doc_id, badword_score_milli,
           text_verdict
    from ({inner}) t order by doc_id
    """


@register("text_badword_docs", _text_badword_oracle())
def q_text_badword_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style document badword filter (pipeline/urlfilter.py
    text_badword_filter): word-boundary RLIKE probes of the shared
    weighted list over the text column — one codegen projection, no
    shuffle, no Python; URL and content policy share one list."""
    from heritrix_spark.pipeline.urlfilter import text_badword_filter

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    planted = spark.sql(
        f"select doc_id, text || ' ' || {_UF_SEG_CASE} as text from documents"
    )
    return (
        text_badword_filter(planted)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "badword_score_milli",
            "text_verdict",
        )
        .orderBy("doc_id")
    )


# ---------------------------------- 44. crawl.log text-line rendering
#
# UriProcessingFormatter.format (engine/.../io/UriProcessingFormatter.java:69-158)
# — the reference's actual crawl.log line, rendered as one codegen
# projection (operators/logformat.py). The derivation exercises every
# branch: pad-no-truncate widths, -1/0 length fallbacks, null/comma/
# semicolon/leading-space mimetypes, >3-digit threads, missing
# completion time, empty/null via+digest+source, annotation joining.

_CLL_FIELDS = """
  cast(1405980721000 + doc_id * 1007 as bigint) as time_ms,
  cast(case when doc_id % 5 = 0 then -1 when doc_id % 5 = 1 then 0
            else (doc_id * 13) % 2000000000 end as bigint) as content_length,
  cast(case when doc_id % 7 = 0 then 0 else doc_id % 4096 end as bigint)
    as content_size,
  case when doc_id % 6 = 0 then 'text/html; charset=UTF-8'
       when doc_id % 6 = 1 then 'text/plain'
       when doc_id % 6 = 2 then cast(null as string)
       when doc_id % 6 = 3 then 'image/png,image/gif'
       when doc_id % 6 = 4 then ' text/css'
       else 'application/pdf' end as mime,
  cast(doc_id % 1100 as int) as thread_num,
  cast(1405980721000 + doc_id * 1007 - (doc_id % 5000) as bigint) as began_ms,
  cast(case when doc_id % 3 = 0 then null
            else 1405980721000 + doc_id * 1007 end as bigint) as completed_ms,
  case when doc_id % 4 = 0 then cast(null as string)
       when doc_id % 4 = 1 then ''
       else 'sha1:2JMJ7L5RSW0YVB' || cast(doc_id % 97 as string) end as digest,
  case when doc_id % 2 = 0 then cast(null as string)
       else 'seed' || cast(doc_id % 9 as string) end as source_tag,
  case when doc_id % 3 = 0 then cast(null as string)
       when doc_id % 3 = 1 then ''
       else 'http://host' || cast(doc_id % 40 as string) || '.example/' end
    as via
""".strip()


def _crawl_log_lines_oracle() -> str:
    from heritrix_spark.operators.logformat import (
        log17_date_sql,
        mimetype_truncate_sql,
        na_if_empty_sql,
        pad_to_sql,
        ts17_sql,
    )

    duck_fields = _CLL_FIELDS.replace("as string", "as varchar")
    len_str = (
        "case when content_length >= 0 then cast(content_length as varchar) "
        "when content_size > 0 then cast(content_size as varchar) "
        "else '-' end"
    )
    arc_time = (
        f"case when completed_ms is not null then {ts17_sql('began_ms')} || '+' "
        "|| cast(completed_ms - began_ms as varchar) else '-' end"
    )
    anno = (
        "case when doc_id % 4 = 0 then 'lenTrunc' "
        "when doc_id % 4 = 1 then '3t,dupBy:8' else '-' end"
    )
    line = (
        f"{log17_date_sql('time_ms')} || ' ' || "
        f"{pad_to_sql('cast(fetch_status as varchar)', 5)} || ' ' || "
        f"{pad_to_sql(len_str, 10)} || ' ' || url || ' ' || "
        f"{na_if_empty_sql('hops_path')} || ' ' || "
        f"{na_if_empty_sql('via')} || ' ' || "
        f"{mimetype_truncate_sql('mime')} || ' #' || "
        f"{pad_to_sql('cast(thread_num as varchar)', 3, '0')} || ' ' || "
        f"{arc_time} || ' ' || "
        f"{na_if_empty_sql('digest')} || ' ' || "
        f"{na_if_empty_sql('source_tag')} || ' ' || {anno}"
    )
    return f"""
    with u as ({_DUCK_URLS}),
    d as (select doc_id, url, fetch_status, hops_path, {duck_fields} from u)
    select cast(doc_id as bigint) as doc_id, {line} as log_line
    from d order by doc_id
    """


@register("crawl_log_lines", _crawl_log_lines_oracle())
def q_crawl_log_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's crawl.log text line, byte-exact
    (UriProcessingFormatter.java:69-158 + ArchiveUtils pad/date laws +
    MimetypeUtils.truncate full-match law) — a single
    whole-stage-codegen projection, so rendering 10^10 lines is a
    map-only job over fetch_log (operators/logformat.py)."""
    from heritrix_spark.operators.logformat import crawl_log_line_col

    u = _docs_urls(spark, sf_dir)
    aug = u.selectExpr(
        "doc_id",
        "url",
        "fetch_status",
        "hops_path",
        *[f.strip() for f in _CLL_FIELDS.split(",\n")],
        "case when doc_id % 4 = 0 then array('lenTrunc') "
        "when doc_id % 4 = 1 then array('3t','dupBy:8') "
        "when doc_id % 4 = 2 then array() "
        "else cast(null as array<string>) end as annotations",
    )
    line = crawl_log_line_col(
        F.col("time_ms"),
        F.col("fetch_status"),
        F.col("content_length"),
        F.col("content_size"),
        F.col("url"),
        F.col("hops_path"),
        F.col("via"),
        F.col("mime"),
        F.col("thread_num"),
        F.col("began_ms"),
        F.col("completed_ms"),
        F.col("digest"),
        F.col("source_tag"),
        F.col("annotations"),
    )
    return aug.select(
        F.col("doc_id").cast("long").alias("doc_id"), line.alias("log_line")
    ).orderBy("doc_id")


# ------------------------------------------------ 45. ARC record assembly
#
# The reference's original archive format (ARCWriterProcessor;
# ARCWriter.createMetaline :431-437, record framing :380-403) as pure
# column expressions — operators/arc.py. The oracle rebuilds the exact
# record strings and compares an md5 of each.

def _arc_oracle() -> str:
    from heritrix_spark.operators.logformat import mimetype_truncate_sql

    crlf = "chr(13) || chr(10)"
    return f"""
    with u as (
      select cast(doc_id as bigint) as doc_id,
        'http://host' || cast(doc_id % 40 + 1 as varchar) || '.example/a/p'
          || cast(doc_id as varchar) as url,
        1600000000000 + doc_id * 1000 as t_ms,
        '10.0.' || cast(doc_id % 250 as varchar) || '.'
          || cast(doc_id % 200 + 1 as varchar) as ip,
        case when doc_id % 4 = 0 then 'text/html; charset=UTF-8'
             when doc_id % 4 = 1 then cast(null as varchar)
             when doc_id % 4 = 2 then 'image/png,image/gif'
             else 'text/plain' end as mime,
        cast(case when doc_id % 3 = 0 then 404 else 200 end as int) as status,
        coalesce(text, '') as content
      from documents),
    b as (
      select *,
        strftime(epoch_ms(t_ms), '%Y%m%d%H%M%S') as arc_date,
        {mimetype_truncate_sql('mime')} as mime_t,
        'HTTP/1.1 ' || cast(status as varchar)
          || case when status = 200 then ' OK'
                  when status = 404 then ' Not Found' else '' end
          || {crlf} || 'Content-Type: text/html' || {crlf}
          || 'Content-Length: '
          || cast(octet_length(encode(content)) as varchar)
          || {crlf} || {crlf} || content as block
      from u),
    c as (
      select *, cast(octet_length(encode(block)) as bigint) as content_length
      from b)
    select url, ip, arc_date, mime_t as mime, content_length,
      md5(url || ' ' || ip || ' ' || arc_date || ' ' || mime_t || ' '
          || cast(content_length as varchar) || chr(10) || block || chr(10))
        as record_md5
    from c order by url
    """


@register("arc_metalines", _arc_oracle())
def q_arc_metalines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARC record assembly (operators/arc.py arc_records): metaline
    (uri ip date14 mime-truncated length) + recorded HTTP response +
    separator as ONE codegen string column per fetch; the twin rebuilds
    the exact bytes and hash-compares each record."""
    from heritrix_spark.operators.arc import arc_records

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    fetches = spark.sql(
        """
        select doc_id,
          'http://host' || cast(doc_id % 40 + 1 as string) || '.example/a/p'
            || cast(doc_id as string) as url,
          cast(1600000000000 + doc_id * 1000 as bigint) as fetch_time_ms,
          '10.0.' || cast(doc_id % 250 as string) || '.'
            || cast(doc_id % 200 + 1 as string) as ip,
          case when doc_id % 4 = 0 then 'text/html; charset=UTF-8'
               when doc_id % 4 = 1 then cast(null as string)
               when doc_id % 4 = 2 then 'image/png,image/gif'
               else 'text/plain' end as mime,
          cast(case when doc_id % 3 = 0 then 404 else 200 end as int) as status,
          coalesce(text, '') as content
        from documents
        """
    )
    recs = arc_records(
        fetches, status_col="status", ip_col="ip", mime_col="mime"
    )
    return recs.select(
        "url",
        "ip",
        "arc_date",
        "mime",
        "content_length",
        F.md5("record_text").alias("record_md5"),
    ).orderBy("url")


# ----------------------------------- 46. per-host sheet-overlay delays
#
# KeyedProperties sheet overlays (commons/.../spring/;
# profile-crawler-beans.cxml:218-383): per-SURT politeness settings
# override the globals, absent values fall through to the containing
# sheet. Rides the exact round-plan code path (plans/round._overlay +
# politeness_delay_col's overlay params).

def _overlay_fixture_keys() -> list[tuple[str, float | None, float | None, float | None]]:
    from heritrix_spark.functions.canonicalize import canonicalize_py
    from heritrix_spark.functions.surt import class_key_py

    k = lambda n: class_key_py(canonicalize_py(f"http://host{n}.example/x"))
    return [
        (k(3), 2.0, 500.0, 8000.0),       # all three overridden
        (k(17), 10.0, None, 60000.0),     # min falls through to global
    ]


def _host_overlay_oracle() -> str:
    ck = class_key_sql(canonicalize_sql("url"))
    vals = ", ".join(
        "('{}', {}, {}, {})".format(
            key,
            "cast(null as double)" if f is None else f,
            "cast(null as double)" if lo is None else lo,
            "cast(null as double)" if hi is None else hi,
        )
        for key, f, lo, hi in _overlay_fixture_keys()
    )
    delay = """
    case when d < 300000 and cd > d then cd else d end
    """.strip()
    return f"""
    with u as ({_DUCK_URLS}),
    keyed as (select doc_id, fetch_duration_ms, crawl_delay, {ck} as class_key
              from u),
    ov(class_key, o_f, o_lo, o_hi) as (select * from (values {vals}) t),
    j as (select k.*, o_f, o_lo, o_hi
          from keyed k left join ov using (class_key)),
    c as (select *,
            least(greatest(cast(coalesce(o_f, 5.0) * fetch_duration_ms
                                as bigint),
                           cast(coalesce(o_lo, 3000) as bigint)),
                  cast(coalesce(o_hi, 30000) as bigint)) as d,
            least(cast(case when crawl_delay > 0 then crawl_delay * 1000
                            else 0 end as bigint), 300000) as cd
          from j)
    select cast(doc_id as bigint) as doc_id, class_key,
           cast({delay} as bigint) as delay_ms
    from c order by doc_id
    """


@register("host_overlay_delay", _host_overlay_oracle())
def q_host_overlay_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host sheet overlays applied to the politeness delay: the
    host_config dimension broadcast-joins on the queue key
    (plans/round.py _overlay — the actual crawl-loop code path) and
    null overlay cells fall through to the global config inside
    politeness_delay_col, exactly like an absent sheet property."""
    from heritrix_spark.operators.politeness import politeness_delay_col
    from heritrix_spark.plans.round import _overlay

    u = _docs_urls(spark, sf_dir).withColumn(
        "class_key", class_key_col(canonicalize_col("url"))
    )
    host_config = spark.createDataFrame(
        _overlay_fixture_keys(),
        "class_key string, delay_factor double, min_delay_ms double, "
        "max_delay_ms double",
    )
    d = _overlay(u, host_config)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "class_key",
        politeness_delay_col(
            F.col("fetch_duration_ms"),
            F.col("crawl_delay"),
            delay_factor=F.col("__o_delay_factor"),
            min_delay_ms=F.col("__o_min_delay_ms"),
            max_delay_ms=F.col("__o_max_delay_ms"),
        )
        .cast("long")
        .alias("delay_ms"),
    ).orderBy("doc_id")


def _overlay_retry_fixture_keys() -> list[tuple[str, float | None, float | None]]:
    from heritrix_spark.functions.canonicalize import canonicalize_py
    from heritrix_spark.functions.surt import class_key_py

    k = lambda n: class_key_py(canonicalize_py(f"http://host{n}.example/x"))
    return [
        (k(3), 1.0, 2.0),      # 1 retry max, 2 s retry delay
        (k(17), None, 60.0),   # maxRetries falls through to global 30
        (k(22), 50.0, None),   # delay falls through to global 900 s
    ]


def _host_overlay_retry_oracle() -> str:
    from heritrix_spark.constants import (
        DISREGARD_STATUSES,
        RETRY_STATUSES,
        S_DEFERRED,
    )

    ck = class_key_sql(canonicalize_sql("url"))
    vals = ", ".join(
        "('{}', {}, {})".format(
            key,
            "cast(null as double)" if mr is None else mr,
            "cast(null as double)" if rd is None else rd,
        )
        for key, mr, rd in _overlay_retry_fixture_keys()
    )
    disregard = ", ".join(str(s) for s in DISREGARD_STATUSES)
    retryable = ", ".join(str(s) for s in RETRY_STATUSES)
    return f"""
    with u as ({_DUCK_URLS}),
    keyed as (select doc_id, fetch_status, attempts, {ck} as class_key
              from u),
    ov(class_key, o_mr, o_rd) as (select * from (values {vals}) t),
    j as (select k.*, o_mr, o_rd
          from keyed k left join ov using (class_key)),
    d as (select *,
            case when fetch_status > 0 then 'success'
                 when fetch_status in ({disregard}) then 'disregard'
                 when fetch_status in ({retryable})
                      and attempts < cast(coalesce(o_mr, 30) as int)
                      then 'retry'
                 else 'failure' end as disposition
          from j)
    select cast(doc_id as bigint) as doc_id, class_key, disposition,
           cast(case when disposition = 'retry' then
                  case when fetch_status = {S_DEFERRED} then 0
                       else cast(coalesce(o_rd, 900.0) * 1000 as bigint) end
                else 0 end as bigint) as retry_wait_ms
    from d order by doc_id
    """


@register("host_overlay_retry", _host_overlay_retry_oracle())
def q_host_overlay_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host sheet overlays applied to the RETRY policy — the
    KeyedProperties override of AbstractFrontier.retryDelaySeconds /
    maxRetries (AbstractFrontier.java:104,116): the host_config
    dimension broadcast-joins on the queue key (plans/round.py
    _overlay, the crawl-loop code path) and null cells fall through to
    the global config inside disposition_col / the retry-delay branch,
    exactly like an absent sheet property."""
    from heritrix_spark.constants import S_DEFERRED
    from heritrix_spark.operators.budget import disposition_col
    from heritrix_spark.plans.round import _overlay

    u = _docs_urls(spark, sf_dir).withColumn(
        "class_key", class_key_col(canonicalize_col("url"))
    )
    host_config = spark.createDataFrame(
        _overlay_retry_fixture_keys(),
        "class_key string, max_retries double, retry_delay_s double",
    )
    d = _overlay(u, host_config)
    cfg = PolitenessConfig()
    d = d.withColumn(
        "disposition",
        disposition_col(
            F.col("fetch_status"),
            F.col("attempts"),
            cfg,
            max_retries=F.col("__o_max_retries"),
        ),
    )
    retry_wait = (
        F.when(
            F.col("disposition") == "retry",
            F.when(F.col("fetch_status") == S_DEFERRED, F.lit(0)).otherwise(
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
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "class_key",
        "disposition",
        retry_wait.alias("retry_wait_ms"),
    ).orderBy("doc_id")


# ---------------------------------------- 47. corpus data-card accounting
#
# The "data card" every released corpus ships: per (split, source)
# document and token accounting over the FINAL composed assignment —
# the deterministic hash split (pipeline/sampling.py) x the source
# column x the whitespace token law (pipeline/textstats.py). One
# map-side-combinable hash aggregation; at 100 TB this is the cheapest
# full-corpus pass there is (two derived columns + partial aggs).

@register(
    "corpus_datacard",
    f"""
    with d as (
      select {_duck_split_case("doc_id", _SPLIT_WEIGHTS, "split")} as split,
             source,
             len(list_filter(string_split_regex(lower(coalesce(text, '')),
                 '\\s+'), t -> t <> '')) as n_toks
      from documents)
    select split, source,
           cast(count(*) as bigint) as n_docs,
           cast(sum(n_toks) as bigint) as n_tokens
    from d group by split, source order by split, source
    """,
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data-card: (split, source) -> docs + tokens over the
    deterministic split assignment. Composition row — the split law,
    source dimension, and token law all reused from their own
    oracle-green rows; plan is one partial-aggregated groupBy."""
    from heritrix_spark.pipeline.sampling import hash_split_col
    from heritrix_spark.pipeline.textstats import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            hash_split_col(F.col("doc_id"), _SPLIT_WEIGHTS, "split").alias(
                "split"
            ),
            "source",
            F.size(tokens_col(F.coalesce(F.col("text"), F.lit(""))))
            .cast("long")
            .alias("n_toks"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .orderBy("split", "source")
    )


# ------------------------------------------------- 48. Kulturarw3 writer
#
# Kw3WriterProcessor (modules/.../writer/Kw3WriterProcessor.java): the
# fourth and last writer the reference ships. Path + full MIME-file
# law as one codegen projection (operators/kw3.py); the twin rebuilds
# the exact bytes and compares an md5 per file.

def _kw3_oracle() -> str:
    lf = "chr(10)"
    crlf = "chr(13) || chr(10)"
    return f"""
    with u as (
      select cast(doc_id as bigint) as doc_id,
        'http://host' || cast(doc_id % 40 + 1 as varchar) || '.example'
          || case when doc_id % 5 = 0 then ':8080' else '' end
          || '/k/p' || cast(doc_id as varchar) as url,
        'host' || cast(doc_id % 40 + 1 as varchar) || '.example' as host,
        cast(case when doc_id % 5 = 0 then 8080 else 80 end as int) as port,
        1600000000000 + doc_id * 1000 as t_ms,
        '10.1.' || cast(doc_id % 250 as varchar) || '.'
          || cast(doc_id % 200 + 1 as varchar) as ip,
        case when doc_id % 3 = 0 then 'text/plain' else 'text/html' end as mime,
        cast(case when doc_id % 7 = 0 then 404 else 200 end as int) as status,
        case when doc_id % 11 = 0 then '' else coalesce(text, '') end as content
      from documents),
    b as (
      select *,
        case when port = 80 then host
             else host || ':' || cast(port as varchar) end as khost,
        'KulturArw3_' || md5(url) as bnd,
        'HTTP/1.1 ' || cast(status as varchar)
          || case when status = 200 then ' OK'
                  when status = 404 then ' Not Found' else '' end
          || {crlf} || 'Content-Type: text/html' || {crlf}
          || 'Content-Length: '
          || cast(octet_length(encode(content)) as varchar)
          || {crlf} || {crlf} as hdr
      from u),
    c as (
      select *,
        substr(md5(khost), 1, 2) || '/' || khost || '/current/' || md5(url)
          || '.' || cast(t_ms // 1000 as varchar) as path,
        'MIME-version: 1.1' || {lf}
          || 'Content-Type: multipart/mixed; boundary=' || bnd || {lf}
          || 'HTTP-Part: ArchiveInfo' || {lf}
          || 'HTTP-Collection: kw3' || {lf}
          || 'HTTP-Harvester: heritrix-spark' || {lf}
          || 'HTTP-URL: ' || url || {lf}
          || 'HTTP-IP-Address: ' || ip || {lf}
          || 'HTTP-Header-Length: '
          || cast(octet_length(encode(hdr)) as varchar) || {lf}
          || 'HTTP-Header-MD5: ' || md5(hdr) || {lf}
          || 'HTTP-Content-Length: '
          || cast(octet_length(encode(content)) as varchar) || {lf}
          || 'HTTP-Content-MD5: ' || md5(content) || {lf}
          || 'HTTP-Archive-Time: ' || cast(t_ms // 1000 as varchar) || {lf}
          || 'HTTP-Status-Code: ' || cast(status as varchar) || {lf} || {lf}
          || '--' || bnd || {lf}
          || 'Content-Type: text/plain; charset="US-ascii"' || {lf}
          || 'HTTP-Part: Header' || {lf} || {lf} || hdr
          || case when octet_length(encode(content)) > 0
                  then '--' || bnd || {lf} || 'Content-Type: ' || mime
                       || {lf} || 'HTTP-Part: Content' || {lf} || {lf}
                       || content
                  else '' end
          || {lf} || '--' || bnd || '--' || {lf} as file_text
      from b)
    select path, md5(file_text) as file_md5 from c order by path
    """


@register("kw3_files", _kw3_oracle())
def q_kw3_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kulturarw3 MIME files (operators/kw3.py): md5-bucketed path law
    + three-part MIME body with KulturArw3_ boundary, byte-exact vs the
    twin's reconstruction (md5 per file)."""
    from heritrix_spark.operators.kw3 import kw3_files

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    fetches = spark.sql(
        """
        select doc_id,
          'http://host' || cast(doc_id % 40 + 1 as string) || '.example'
            || case when doc_id % 5 = 0 then ':8080' else '' end
            || '/k/p' || cast(doc_id as string) as url,
          'host' || cast(doc_id % 40 + 1 as string) || '.example' as host,
          cast(case when doc_id % 5 = 0 then 8080 else 80 end as int) as port,
          cast(1600000000000 + doc_id * 1000 as bigint) as fetch_time_ms,
          '10.1.' || cast(doc_id % 250 as string) || '.'
            || cast(doc_id % 200 + 1 as string) as ip,
          case when doc_id % 3 = 0 then 'text/plain' else 'text/html' end as mime,
          cast(case when doc_id % 7 = 0 then 404 else 200 end as int) as status,
          case when doc_id % 11 = 0 then '' else coalesce(text, '') end as content
        from documents
        """
    )
    files = kw3_files(fetches)
    return files.select(
        "path", F.md5("file_text").alias("file_md5")
    ).orderBy("path")
