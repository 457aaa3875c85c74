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
                when fetch_status in (-50, -2, -3, -1) and attempts < 30 then 0
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
            cfg,
        ).alias("expend"),
    )
    return (
        u.groupBy("class_key")
        .agg(F.sum("expend").cast("long").alias("total_expenditure"))
        .withColumn("retired", F.col("total_expenditure") > cfg.total_budget)
        .orderBy("class_key")
    )
