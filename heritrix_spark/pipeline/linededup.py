"""Corpus-wide duplicate-line removal (C4-style boilerplate dedup).

The C4 pipeline (Raffel et al., "Exploring the Limits of Transfer
Learning with a Unified Text-to-Text Transformer", JMLR 2020, §2.2)
discards any three-sentence span occurring more than once in the
corpus; RefinedWeb (Penedo et al. 2023, §3.3) and CCNet apply the same
idea at line granularity to strip navigation chrome, cookie banners
and share buttons that repeat across millions of pages. The operator
here is the line-granularity form: a line whose corpus-wide occurrence
count reaches ``min_count`` is removed from every document.

Scale shape (the 100 TB plan):

- lines never shuffle for COUNTING — each line is md5-hashed row-local
  and only the 16-byte hash crosses the exchange, with map-side partial
  aggregation collapsing per-partition repeats first;
- the frequent-hash table (post-filter) is orders of magnitude smaller
  than the corpus and AQE broadcast-joins it back in practice; the
  anti-join stays correct under a plain shuffle join when it is not;
- line TEXT moves exactly once: the per-document reassembly exchange
  keyed on doc_id — the same key the table is usually already
  partitioned by, and unavoidable for any rewrite of the document.

Nothing leaves the JVM; every step is codegen'd column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINE_SEP = "\n"


def line_dedup(
    docs: DataFrame,
    min_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every line occurring >= ``min_count`` times corpus-wide.

    Returns one row per input document: ``(id_col, clean_text,
    n_removed)`` — ``clean_text`` preserves the document's surviving
    lines in their original order (empty string when every line was
    boilerplate, mirroring C4's treatment of fully-deduplicated pages).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), LINE_SEP)).alias("pos", "line"),
    ).withColumn("line_h", F.md5(F.col("line")))

    # corpus-wide counts: only the md5 hash is shuffled (map-side
    # combine collapses per-partition repeats before the exchange)
    frequent = (
        lines.groupBy("line_h")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("line_h")
    )

    kept = lines.join(frequent, on="line_h", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            LINE_SEP,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )

    # per-doc line totals are row-local (no aggregation over the
    # exploded rows) — size(split(...)) on the un-exploded table
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), LINE_SEP)).alias("n_lines"),
    )
    return (
        totals.join(rebuilt, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def line_dedup_py(
    docs: list[tuple[object, str]], min_count: int = 3
) -> list[tuple[object, str, int]]:
    """Pure-Python twin of :func:`line_dedup` for pytest oracles."""
    from collections import Counter

    counts: Counter[str] = Counter()
    for _, text in docs:
        counts.update(text.split(LINE_SEP))
    out = []
    for doc_id, text in docs:
        lines = text.split(LINE_SEP)
        kept = [ln for ln in lines if counts[ln] < min_count]
        out.append((doc_id, LINE_SEP.join(kept), len(lines) - len(kept)))
    return out
