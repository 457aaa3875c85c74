"""Benchmark decontamination and repetition-quality signals for
training-data pipelines over ``documents``.

- :func:`decontaminate` — exact word-n-gram overlap against an
  evaluation/benchmark set (the GPT-3/Pile-style 13-gram
  decontamination rule: a training document is contaminated when it
  shares any exact n-gram with the eval set).  Scale shape: the eval
  set is tiny next to the corpus (MBs vs TBs), so its distinct n-grams
  BROADCAST; the corpus side explodes its per-doc distinct n-grams and
  inner-joins without a shuffle, then one hash aggregation on doc_id
  counts the matches.  The corpus text itself never shuffles — only
  (doc_id, matched n-gram) pairs, which are rare by construction.
- :func:`repetition_stats` — Gopher-style repetition signals (Rae et
  al. 2021, App. A1) as exact integer counts so downstream thresholds
  (and cross-engine oracles) never touch float rounding:
  ``total_tokens``, ``top2_count`` (occurrences of the most frequent
  word bigram), ``dup5_tokens`` (5-gram occurrences minus distinct
  5-grams — the "duplicate n-gram" numerator).  The bigram mode is
  computed by explode → count → max (linear, one shuffle keyed on
  doc_id — NOT a per-row O(L²) higher-order walk, which would blow up
  on book-length documents); the 5-gram duplicate count is row-local
  (``array_distinct``), no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from heritrix_spark.pipeline.textstats import tokens_col


def ngrams_col(toks: Column, n: int) -> Column:
    """Word n-grams (space-joined) of a token array; [] when shorter
    than n.  The explicit when-guard matters: Spark's ``sequence(1, 0)``
    DESCENDS instead of returning empty."""
    count = F.size(toks) - (n - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngrams(
    benchmark: DataFrame, n: int, bench_text_col: str = "text"
) -> DataFrame:
    """Distinct word ``n``-grams of the eval/benchmark set — the
    broadcast side shared by :func:`decontaminate` and
    :func:`remove_contaminated_spans`, factored so both variants always
    agree on what counts as contaminated."""
    return (
        benchmark.select(
            F.explode(
                ngrams_col(tokens_col(F.col(bench_text_col)), n)
            ).alias("ng")
        )
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Flag corpus documents sharing any exact word ``n``-gram with the
    benchmark set.  Returns (id_col, n_overlap, contaminated) — one row
    per input document, ``n_overlap`` = distinct shared n-grams."""
    bench_ngrams = benchmark_ngrams(benchmark, n, bench_text_col)
    doc_ngrams = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(ngrams_col(tokens_col(F.col(text_col)), n))
        ).alias("ng"),
    )
    hits = (
        doc_ngrams.join(F.broadcast(bench_ngrams), on="ng", how="inner")
        .groupBy(id_col)
        .agg(F.count("*").cast("int").alias("n_overlap"))
    )
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def cross_doc_ngram_overlap(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring dedup signal (the bounded n-gram membership form
    of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): for each document, how many of its distinct word
    ``n``-grams also occur in at least one OTHER document.  Returns
    (id_col, n_grams, shared_grams, dup_frac) — one row per document,
    ``dup_frac`` = shared/total distinct n-grams (0.0 when the document
    is shorter than ``n`` tokens).

    Scale shape: per-doc distinct n-grams are hashed to md5-60 **before**
    the exchange so no gram text ever shuffles; cross-doc sharing is a
    count-only window keyed on the gram hash (a hot boilerplate gram is
    one skewed-but-trivial count partition, never a join fan-out), then
    one hash aggregation on doc_id.  Because each document contributes a
    gram at most once, the window count IS the number of documents
    containing that gram."""
    from heritrix_spark.pipeline.dedup import md5_60

    staged = docs.select(
        F.col(id_col),
        F.array_distinct(ngrams_col(tokens_col(F.col(text_col)), n)).alias(
            "__gs"
        ),
    )
    # single tokenization pass: carry the per-doc gram count through the
    # explode (explode_outer keeps short/empty docs as one null-gram row)
    # so the final per-doc row comes from ONE groupBy — no second
    # tokenize-and-ngram pass and no doc-side join. The gram text is
    # still hashed to md5-60 BEFORE the exchange.
    grams = staged.select(
        F.col(id_col),
        F.size("__gs").cast("int").alias("n_grams"),
        F.explode_outer("__gs").alias("__g"),
    ).select(id_col, "n_grams", md5_60(F.col("__g")).alias("__gh"))
    w = Window.partitionBy("__gh")
    per_doc = (
        grams.withColumn("__ndocs", F.count("*").over(w))
        .groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.sum(
                F.when(
                    F.col("__gh").isNotNull() & (F.col("__ndocs") > 1), 1
                ).otherwise(0)
            )
            .cast("int")
            .alias("shared_grams"),
        )
    )
    n_grams = F.col("n_grams")
    return per_doc.select(
        id_col,
        "n_grams",
        "shared_grams",
        F.when(
            n_grams > 0,
            F.round(
                F.col("shared_grams").cast("double") / n_grams.cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def _mode_count_col(arr: Column) -> Column:
    """Occurrence count of the most frequent array element — computed
    row-locally as the longest run in the SORTED array (JVM
    ``array_sort`` + one ``aggregate`` fold, O(L log L) per row).  The
    per-document mode never needs a shuffle: exploding to a
    (doc, element) groupBy would move every n-gram of the corpus
    through an exchange for a statistic each row can compute alone."""
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    ).cast("int")


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition counts: (id_col, total_tokens,
    top2_count, dup5_tokens).  Fractions are the caller's division —
    integers keep the engine/oracle compare exact.  Entirely row-local
    (zero exchanges): the bigram mode is a sorted-run maximum, the
    5-gram duplicate count an ``array_distinct`` difference."""
    base = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    )
    # materialize the 5-gram array ONCE in a prior projection: each
    # ngrams_col call mints fresh lambda variables, so Catalyst never
    # CSEs two structurally-distinct transform trees (same trap as the
    # minhash walk, pipeline/dedup.py) — referencing the named column
    # keeps the dominant per-row cost single-pass
    staged = base.select(
        id_col,
        F.size("toks").cast("int").alias("total_tokens"),
        ngrams_col(F.col("toks"), 2).alias("__bg"),
        ngrams_col(F.col("toks"), 5).alias("__f5"),
    )
    return staged.select(
        id_col,
        "total_tokens",
        _mode_count_col(F.col("__bg")).alias("top2_count"),
        (F.size("__f5") - F.size(F.array_distinct("__f5")))
        .cast("int")
        .alias("dup5_tokens"),
    )


def remove_contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Cut contaminated spans out instead of dropping whole documents —
    the removal variant of :func:`decontaminate` (Lee et al. 2022 §4.2
    remove matched substrings; C4 removes offending lines).  Every
    token covered by ANY benchmark-matching word ``n``-gram is removed;
    overlapping matches merge naturally through the coverage test.

    Returns (id_col, n_tokens, matched_spans, tokens_removed,
    clean_text): ``matched_spans`` counts matched gram START positions
    (a repeated contaminated gram counts each occurrence);
    ``clean_text`` is the kept tokens re-joined with single spaces
    (token-normalized, as in the reference implementations, which
    operate on token sequences).

    Scale shape: benchmark n-grams broadcast; the corpus side ships
    only (doc_id, matched start) pairs — rare by construction — back
    through one doc-keyed aggregation; the coverage mask and the text
    rebuild are row-local higher-order expressions (O(tokens x matched
    spans) per row), no Python anywhere."""
    bench_ngrams = benchmark_ngrams(benchmark, n, bench_text_col)
    staged = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    )
    # posexplode index k = 0-based token index of the gram's first token
    doc_grams = staged.select(
        F.col(id_col),
        F.posexplode(ngrams_col(F.col("__toks"), n)).alias("__pos", "ng"),
    )
    starts = (
        doc_grams.join(F.broadcast(bench_ngrams), on="ng", how="inner")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__pos")).alias("__starts"))
    )
    out = staged.join(starts, on=id_col, how="left").withColumn(
        "__starts", F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, j: ~F.exists(
            F.col("__starts"), lambda s: (j >= s) & (j < s + F.lit(n))
        ),
    )
    n_toks = F.size("__toks").cast("int")
    return out.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        F.size("__starts").cast("int").alias("matched_spans"),
        (n_toks - F.size(kept)).cast("int").alias("tokens_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )
