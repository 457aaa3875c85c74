"""URL-level corpus filtering for training-data pipelines.

The RefinedWeb-style (Penedo et al. 2023, §3.1) URL filter applied
before any document text is read: (1) a blocklist of registered
domains (the public UT1-category-list shape), (2) a weighted badword
score over the URL string itself, (3) a keep/block verdict.  C4
(Raffel et al. 2020) applies the same family of word filters; doing it
at the URL level means a blocked document's *text column is never
scanned* — at 100 TB the filter runs on the URL column alone and
Parquet column pruning skips the payload bytes entirely.

Crawl-native domain keying: the blocklist is joined on the frontier's
own registered-domain queue key — the SURT authority reduced to
public-suffix+1 (``functions/psl.py``, the full Mozilla PSL), exactly
the key ``AssignmentLevelSurtQueueAssignmentPolicy`` partitions queues
by (heritrix3/engine/.../AssignmentLevelSurtQueueAssignmentPolicy.java:30-40).
A domain blocklist entry therefore covers every subdomain and port of
that registered domain with ONE equi-join key — no suffix-match scan.

Scale shape:
- registered-domain key: the sanctioned Arrow kernel (one vectorized
  UDF pass shared with queue assignment — at crawl time the key
  already exists on the row and the UDF disappears).
- blocklist: a broadcast hash join (blocklists are 10^4..10^6 rows —
  always the small side).  The corpus never shuffles.
- badword score: a pure codegen conjunction of ``contains`` probes —
  no Python, no shuffle, whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# (substring, weight in milli-units) — demo subset of the public
# badword/URL-scoring lists; a real deployment ships its own table.
# Weights follow the RefinedWeb soft-scoring idea: hard terms alone
# cross the block threshold (1000 milli), soft terms only in
# combination.
BADWORDS_MILLI: tuple[tuple[str, int], ...] = (
    ("casino", 1000),
    ("poker", 800),
    ("xxx", 1000),
    ("viagra", 1000),
    ("pills", 600),
    ("warez", 1000),
    ("crack", 500),
    ("torrent", 500),
    ("webcam", 400),
    ("bet", 300),
)

DEFAULT_THRESHOLD_MILLI = 1000


def badword_score_col(url: Column, words: tuple[tuple[str, int], ...] = BADWORDS_MILLI) -> Column:
    """Weighted badword score of a URL (milli-units): the sum of the
    weights of every list entry contained in the lowercased URL.
    Pure codegen — one ``contains`` probe per list entry."""
    low = F.lower(url)
    score: Column = F.lit(0).cast("long")
    for w, wt in words:
        score = score + F.when(low.contains(w), F.lit(wt)).otherwise(F.lit(0)).cast("long")
    return score


def badword_score_sql(expr: str, words: tuple[tuple[str, int], ...] = BADWORDS_MILLI) -> str:
    """DuckDB twin of :func:`badword_score_col` (dialect-subset SQL)."""
    probes = " + ".join(
        f"case when contains(lower({expr}), '{w}') then {wt} else 0 end"
        for w, wt in words
    )
    return f"cast({probes} as bigint)"


def registered_domain_key_col(url: Column | str) -> Column:
    """The blocklist join key: SURT authority of the URL reduced to
    registered-domain level (public-suffix+1) via the full PSL — the
    same key the frontier assigns queues by, so at crawl time it is
    already materialized on every row."""
    from heritrix_spark.functions.canonicalize import canonicalize_col
    from heritrix_spark.functions.psl import reduce_surt_authority_col
    from heritrix_spark.functions.surt import class_key_col

    return reduce_surt_authority_col(class_key_col(canonicalize_col(url)))


def blocklist_df(spark: SparkSession, domains: list[str]) -> DataFrame:
    """Build the broadcast blocklist dimension from plain registered
    domains ('bad.example') — keys converted to the reduced-SURT form
    with the package's own Python twin so list authors never write
    SURT syntax."""
    from heritrix_spark.functions.psl import assignment_level_class_key_py

    keys = sorted({assignment_level_class_key_py(f"http://{d.strip().lower()}/") for d in domains if d.strip()})
    return spark.createDataFrame([(k,) for k in keys], "domain_key string")


def url_filter(
    df: DataFrame,
    blocklist: DataFrame | None = None,
    url_col: str = "url",
    words: tuple[tuple[str, int], ...] = BADWORDS_MILLI,
    threshold_milli: int = DEFAULT_THRESHOLD_MILLI,
) -> DataFrame:
    """Annotate every row with the URL-filter verdict.

    Adds: ``domain_key`` (registered-domain SURT key),
    ``blocked_domain`` (bool — key present in the blocklist),
    ``badword_score_milli`` (bigint), and ``url_verdict``
    ('blocked_domain' ≻ 'badword' ≻ 'keep' — domain block wins, as in
    the RefinedWeb order where the curated blocklist is authoritative).

    The blocklist side is explicitly broadcast; the corpus side never
    shuffles (verdict is a projection + one broadcast hash join)."""
    out = df.withColumn("domain_key", registered_domain_key_col(url_col)).withColumn(
        "badword_score_milli", badword_score_col(F.col(url_col), words)
    )
    if blocklist is not None:
        # blocklist keys must be unique (blocklist_df guarantees it) —
        # keeping the dimension pre-deduped keeps this whole plan
        # exchange-free on both sides.
        hits = F.broadcast(
            blocklist.select(
                F.col("domain_key").alias("__bl_key"), F.lit(True).alias("__bl_hit")
            )
        )
        out = out.join(hits, out["domain_key"] == hits["__bl_key"], "left").drop("__bl_key")
        out = out.withColumn("blocked_domain", F.coalesce(F.col("__bl_hit"), F.lit(False))).drop("__bl_hit")
    else:
        out = out.withColumn("blocked_domain", F.lit(False))
    return out.withColumn(
        "url_verdict",
        F.when(F.col("blocked_domain"), F.lit("blocked_domain"))
        .when(F.col("badword_score_milli") >= F.lit(threshold_milli), F.lit("badword"))
        .otherwise(F.lit("keep")),
    )


def _re_escape_word(w: str) -> str:
    """Literal-escape a list word for the Java ∩ RE2 regex subset:
    backslash every non-[a-z0-9] character (``\\Q..\\E`` is Java-only;
    escaping punctuation with a backslash is legal in both dialects,
    escaping letters is not — so only punctuation is escaped). Keeps
    the url_filter/text_filter shared-list contract for entries like
    'c++' or '.onion'. Non-ASCII characters pass through UNescaped:
    they are never regex metacharacters, and a backslash before a
    letter ('\\é') is itself illegal in the Java dialect — escaping
    them would make rlike throw PatternSyntaxException at execution
    time for any accented list word."""
    return "".join(
        c if (c.isalnum() or not c.isascii()) else "\\" + c for c in w
    )


def _word_pattern(w: str) -> str:
    """Word-boundary probe pattern in the Java ∩ RE2 subset: a boundary
    class is required only on alphanumeric word edges (like ``\\b``,
    which sits between \\w and \\W — a word edge that is itself
    punctuation, e.g. '.onion' or 'c++', needs no further boundary)."""
    pre = r"(^|[^a-z0-9])" if w[:1].isalnum() else ""
    post = r"([^a-z0-9]|$)" if w[-1:].isalnum() else ""
    return pre + _re_escape_word(w) + post


def text_badword_filter(
    docs: DataFrame,
    words: tuple[tuple[str, int], ...] = BADWORDS_MILLI,
    threshold_milli: int = DEFAULT_THRESHOLD_MILLI,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The C4-style document-level "bad words" drop (Raffel et al. 2020
    §2.2 drop any page containing a list word; RefinedWeb soft-scores
    instead) — the text-side sibling of :func:`url_filter`, sharing the
    weighted list so URL and content policy stay consistent.

    Word-boundary matching (C4 matches words, not substrings): each
    probe is an RLIKE on ``(^|non-alnum)word(non-alnum|$)`` over the
    lowercased text — still a pure codegen projection, no shuffle, no
    Python.  Returns (id_col, badword_score_milli, text_verdict
    'badword'|'keep')."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    score: Column = F.lit(0).cast("long")
    for w, wt in words:
        probe = low.rlike(_word_pattern(w))
        score = score + F.when(probe, F.lit(wt)).otherwise(F.lit(0)).cast("long")
    return docs.select(
        F.col(id_col),
        score.alias("badword_score_milli"),
        F.when(score >= F.lit(threshold_milli), F.lit("badword"))
        .otherwise(F.lit("keep"))
        .alias("text_verdict"),
    )


def text_badword_filter_sql(
    words: tuple[tuple[str, int], ...] = BADWORDS_MILLI,
    threshold_milli: int = DEFAULT_THRESHOLD_MILLI,
    id_col: str = "doc_id",
    text_col: str = "text",
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`text_badword_filter` (RE2 ∩ Java regex
    dialect subset — same boundary class both sides)."""
    probes = " + ".join(
        f"case when regexp_matches(lower(coalesce({text_col}, '')), "
        f"'{_word_pattern(w)}') then {wt} else 0 end"
        for w, wt in words
    )
    return f"""
    select {id_col},
           cast({probes} as bigint) as badword_score_milli,
           case when ({probes}) >= {threshold_milli} then 'badword'
                else 'keep' end as text_verdict
    from {source}
    """.strip()
