"""Benchmark building blocks: synthetic frontier generation + the
measured schedule/dedup pipeline (the BASELINE.json headline metric:
URLs scheduled+deduped per second through one frontier scheduling round).

The synthetic candidate stream is generated entirely with Spark range +
column expressions (codegen, no Python, no driver data) so generation
never bottlenecks measurement; it is materialized to parquet first so
the measured job reads columnar input like production.

Shape knobs mirror the 10^10 design concerns:
- ``n_hosts`` controls queue-key cardinality,
- a deliberately hot host receives ~20% of all candidates (skew —
  handled by hashing the seen-set on canon_url, not class_key, plus AQE
  skew-join),
- ~25% in-batch duplicate rate and a pre-populated seen set exercise
  both dedup layers.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heritrix_spark.constants import NORMAL
from heritrix_spark.functions.canonicalize import canonicalize_col
from heritrix_spark.functions.surt import class_key_col
from heritrix_spark.operators.prepare import (
    assign_ordinals,
    cost_uri_precedence_col,
    scheduling_directive_col,
    unit_cost_col,
)
from heritrix_spark.operators.seen import (
    collapse_batch_duplicates,
    dedup_candidates,
    shard_col,
)


def synth_candidates(spark: SparkSession, n: int, n_hosts: int = 10_000) -> DataFrame:
    """n candidate URLs: hot-host skew, www/query mess, ~25% duplicates."""
    base = spark.range(n)
    host_id = (
        F.when(F.pmod(F.col("id"), 5) == 0, F.lit(0))  # hot host: 20% of rows
        .otherwise(F.pmod(F.xxhash64(F.col("id")), F.lit(n_hosts)))
        .cast("long")
    )
    page_id = F.pmod(F.col("id"), F.lit(max(1, (n * 3) // 4)))  # ~25% dups
    www = F.when(F.pmod(F.col("id"), 13) == 0, F.lit("www.")).otherwise(F.lit(""))
    query = (
        F.when(F.pmod(F.col("id"), 7) == 0, F.lit("?"))
        .when(
            F.pmod(F.col("id"), 7) == 1,
            F.concat(F.lit("?x="), page_id.cast("string"), F.lit("&")),
        )
        .otherwise(F.lit(""))
    )
    return base.select(
        F.col("id").alias("parent_ordinal"),
        F.pmod(F.col("id"), 64).cast("long").alias("link_seq"),
        F.concat(
            F.lit("http://"),
            www,
            F.lit("host"),
            host_id.cast("string"),
            F.lit(".example/s"),
            F.pmod(page_id, 97).cast("string"),
            F.lit("/page"),
            page_id.cast("string"),
            F.lit(".html"),
            query,
        ).alias("url"),
        F.lit("LL").alias("hops_path"),
    )


def schedule_dedup_pipeline(
    candidates: DataFrame,
    url_seen: DataFrame,
    max_ordinal: int = 0,
    lead_bound: int | None = None,
    seen_blooms: DataFrame | None = None,
    bloom_bits: int = 0,
    seen_cuckoo: DataFrame | None = None,
    cuckoo_buckets: int = 0,
) -> DataFrame:
    """The measured job: prepare → collapse dups → anti-join seen →
    deterministic ordinals. Identical operator chain to plans/round.py
    steps 4-5 (scope omitted: the synthetic stream is all in scope)."""
    from heritrix_spark.functions.surt import url_prep_struct_col
    from heritrix_spark.operators.scope import default_scope

    prepped = candidates.withColumn("__prep", url_prep_struct_col("url"))
    cands = prepped.filter(
        default_scope(
            F.col("url"),
            F.col("hops_path"),
            ["http://(example,"],  # synthetic corpus is all .example
            surt=F.col("__prep.surt"),
        )
    )
    cands = (
        cands.withColumn("canon_url", F.col("__prep.canon_url"))
        .withColumn("class_key", F.col("__prep.class_key"))
        .drop("__prep")
        .withColumn(
            "directive",
            scheduling_directive_col(F.col("hops_path"), F.lit(NORMAL).cast("int"))
            .cast("int"),
        )
        .withColumn("cost", unit_cost_col().cast("int"))
        .withColumn("precedence", cost_uri_precedence_col(F.col("cost")).cast("int"))
    )
    uniq = collapse_batch_duplicates(
        cands, key="canon_url", order_cols=("parent_ordinal", "link_seq")
    )
    if seen_blooms is not None and bloom_bits > 0:
        from heritrix_spark.operators.bloomseen import dedup_candidates_bloom

        novel = dedup_candidates_bloom(
            uniq, url_seen, seen_blooms, n_shards=64, bits=bloom_bits
        )
    elif seen_cuckoo is not None and cuckoo_buckets > 0:
        from heritrix_spark.operators.cuckooseen import dedup_candidates_cuckoo

        novel = dedup_candidates_cuckoo(
            uniq, url_seen, seen_cuckoo, n_shards=64, buckets=cuckoo_buckets
        )
    else:
        novel = dedup_candidates(uniq, url_seen, n_shards=64)
    numbered, _ = assign_ordinals(
        novel,
        ["parent_ordinal", "link_seq", "canon_url"],
        base=max_ordinal,
        lead_bound=lead_bound,
    )
    return numbered


def run_schedule_dedup_bench(
    spark: SparkSession, n: int, workdir: str, n_hosts: int = 10_000
) -> dict:
    """Materialize inputs, run + time the pipeline, return metrics."""
    cand_path = f"{workdir}/candidates"
    seen_path = f"{workdir}/url_seen"
    cands = synth_candidates(spark, n, n_hosts)
    cands.write.mode("overwrite").parquet(cand_path)
    # seen set: canon of every 4th candidate → ~25% pre-seen hit rate
    seen = (
        cands.filter(F.pmod(F.col("parent_ordinal"), 4) == 0)
        .select(canonicalize_col("url").alias("canon_url"))
        .distinct()
        .select("canon_url", shard_col("canon_url", 64).alias("shard"))
    )
    seen.write.mode("overwrite").partitionBy("shard").parquet(seen_path)

    candidates = spark.read.parquet(cand_path)
    url_seen = spark.read.parquet(seen_path)

    # JIT/codegen warmup on a small slice — steady-state throughput is the
    # metric (a production frontier loop runs hundreds of warm rounds).
    warm = schedule_dedup_pipeline(
        candidates.limit(20_000), url_seen.limit(20_000), lead_bound=n
    )
    warm.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    t0 = time.monotonic()
    result = schedule_dedup_pipeline(candidates, url_seen, lead_bound=n)
    result.write.format("noop").mode("overwrite").save()
    elapsed = time.monotonic() - t0
    spark.catalog.clearCache()

    # bloom-prefilter variant (operators/bloomseen.py): same pipeline,
    # same ~25% pre-seen hit rate, bloom sidecar built from the seen set
    # beforehand (production appends bloom deltas at write time — build
    # cost amortizes across rounds, so it's excluded from the round time)
    from heritrix_spark.operators.bloomseen import DEFAULT_BITS, bloom_delta

    bloom_path = f"{workdir}/url_seen_bloom"
    bloom_delta(url_seen, bits=DEFAULT_BITS).write.mode("overwrite").parquet(
        bloom_path
    )
    blooms = spark.read.parquet(bloom_path)
    t0 = time.monotonic()
    result_b = schedule_dedup_pipeline(
        candidates, url_seen, lead_bound=n,
        seen_blooms=blooms, bloom_bits=DEFAULT_BITS,
    )
    result_b.write.format("noop").mode("overwrite").save()
    elapsed_bloom = time.monotonic() - t0
    spark.catalog.clearCache()

    # cuckoo-prefilter variant (operators/cuckooseen.py): the deletable
    # sidecar, same pre-built-at-write-time amortization as the bloom
    from heritrix_spark.operators.cuckooseen import (
        DEFAULT_BUCKETS,
        cuckoo_delta,
    )

    cuckoo_path = f"{workdir}/url_seen_cuckoo"
    cuckoo_delta(url_seen, buckets=DEFAULT_BUCKETS).write.mode(
        "overwrite"
    ).parquet(cuckoo_path)
    cuckoo = spark.read.parquet(cuckoo_path)
    t0 = time.monotonic()
    result_c = schedule_dedup_pipeline(
        candidates, url_seen, lead_bound=n,
        seen_cuckoo=cuckoo, cuckoo_buckets=DEFAULT_BUCKETS,
    )
    result_c.write.format("noop").mode("overwrite").save()
    elapsed_cuckoo = time.monotonic() - t0
    spark.catalog.clearCache()
    return {
        "n_candidates": n,
        "elapsed_sec": elapsed,
        "urls_per_sec": n / elapsed,
        "elapsed_bloom_sec": elapsed_bloom,
        "urls_per_sec_bloom": n / elapsed_bloom,
        "elapsed_cuckoo_sec": elapsed_cuckoo,
        "urls_per_sec_cuckoo": n / elapsed_cuckoo,
    }


# ---------------------------------------------------------------------------
# Training-data pipeline benchmark (documents -> dedup clusters -> corpus)
# ---------------------------------------------------------------------------


def synth_documents(
    spark: SparkSession,
    n: int,
    n_sources: int = 1_000,
    words: int = 40,
    dup_group: int = 5,
) -> DataFrame:
    """n documents with controlled near-dup structure, generated entirely
    with codegen column expressions (no Python, no driver data): groups of
    ``dup_group`` consecutive ids share a base word sequence; variant k>0
    mutates roughly one word in 13 — close enough for MinHash banding to
    pair them, far enough that the pairs aren't byte-identical."""
    base = spark.range(n)
    group = (F.col("id") / dup_group).cast("long")
    variant = F.pmod(F.col("id"), dup_group)
    words_arr = F.transform(
        F.sequence(F.lit(1), F.lit(words)),
        lambda i: F.when(
            (variant > 0) & (F.pmod(i * 7 + variant, 13) == 0),
            F.concat(
                F.lit("m"),
                F.pmod(F.xxhash64(group, i, variant), 50_000).cast("string"),
            ),
        ).otherwise(
            F.concat(
                F.lit("w"), F.pmod(F.xxhash64(group, i), 50_000).cast("string")
            )
        ),
    )
    return base.select(
        F.col("id").alias("doc_id"),
        F.array_join(words_arr, " ").alias("text"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64("id"), n_sources).cast("string")
        ).alias("source"),
    )


def training_pipeline(docs: DataFrame) -> DataFrame:
    """The measured training-corpus job — same OPERATOR composition as
    the ``training_corpus`` driver row (MinHash-LSH near-dup pairs →
    connected-component clusters → canonical survivors → quality/length
    filter → deterministic split), with relaxed thresholds (quality
    ≥0.3, ≥10 tokens vs the driver row's 0.75/20): synth_documents'
    'w12345'-style tokens score ~0.5 quality, so the driver row's
    thresholds would filter the whole synthetic corpus and the bench
    would time an empty survivor set."""
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
        F.col("is_kept") & (F.col("quality") >= 0.3) & (F.col("n_tokens") >= 10)
    )
    return kept.select(
        "doc_id",
        hash_split_col(
            F.col("doc_id"), {"train": 0.9, "val": 0.05, "test": 0.05}
        ).alias("split"),
    )


def synth_crawl_corpus(spark: SparkSession, out_dir: str, hosts: int,
                       children: int = 40) -> None:
    """The LOOP_SCALE soak corpus (input_hint shape), sized for
    candidates/round = hosts * children: per host a seed page plus
    ``children`` child pages, every page's one text span linking to the
    same ``children`` children — round 1 floods novel URLs, every later
    round is the steady state (all candidates already seen)."""
    from pyspark.sql import Window

    base = spark.range(hosts).select(
        F.concat(F.lit("http://h"), F.col("id"), F.lit(".example")).alias("base")
    )
    links = F.concat_ws(" ", F.array(*[
        F.concat(F.col("base"), F.lit(f"/c/{j}")) for j in range(children)
    ]))
    span = F.array(F.struct(
        F.lit("text").alias("kind"), links.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    ))
    seed_docs = base.select(
        F.concat(F.col("base"), F.lit("/")).alias("doc_id"), span.alias("spans")
    )
    child_docs = (
        base.crossJoin(spark.range(children).select(F.col("id").alias("j")))
        .select(
            F.concat(F.col("base"), F.lit("/c/"), F.col("j")).alias("doc_id"),
            span.alias("spans"),
        )
    )
    seed_docs.unionByName(child_docs).repartition(64).write.mode(
        "overwrite"
    ).parquet(out_dir + "/docs")
    base.select(F.concat(F.col("base"), F.lit("/")).alias("url")).withColumn(
        "seq", (F.row_number().over(Window.orderBy("url")) - 1).cast("int")
    ).write.mode("overwrite").parquet(out_dir + "/seeds")
    base.select(
        class_key_col(F.concat(F.col("base"), F.lit("/"))).alias("class_key")
    ).withColumn("allows", F.array(F.lit("/"))).withColumn(
        "disallows", F.array().cast("array<string>")
    ).withColumn("crawl_delay", F.lit(None).cast("double")).write.mode(
        "overwrite"
    ).parquet(out_dir + "/robots")


def run_crawl_loop_bench(spark: SparkSession, tmp: str, hosts: int,
                         children: int = 40, rounds: int = 3) -> dict:
    """The FULL multi-round crawl loop (plans/crawl.py — extraction,
    schedule+dedup, politeness, store commits) at hosts*children
    candidates/round; returns per-round walls from the loop's own
    metrics. This is the driver-visible form of BENCH/loop_scale.py."""
    from heritrix_spark.constants import PolitenessConfig
    from heritrix_spark.plans.crawl import crawl

    synth_crawl_corpus(spark, tmp, hosts, children)
    t0 = time.monotonic()
    res = crawl(
        spark,
        f"{tmp}/store",
        spark.read.parquet(f"{tmp}/docs"),
        spark.read.parquet(f"{tmp}/seeds"),
        spark.read.parquet(f"{tmp}/robots"),
        PolitenessConfig(),
        stop_after_round=rounds,
    )
    wall = time.monotonic() - t0
    meta = res.store.manifest()["meta"]
    timed = [m for m in meta["metrics_log"] if m.get("wall_ms")]
    per_round = [m["wall_ms"] for m in timed]
    steady = [m["wall_ms"] for m in timed if m["round"] >= 2]
    steady_s = (sum(steady) / 1000) if steady else None
    return {
        "elapsed_sec": wall,
        "rounds": res.rounds,
        "candidates_per_round": hosts * children,
        "per_round_wall_ms": per_round,
        "steady_candidates_per_sec": (
            round(len(steady) * hosts * children / steady_s, 1) if steady_s else None
        ),
    }
