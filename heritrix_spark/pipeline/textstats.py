"""Text analysis for training-data pipelines over ``documents``:
language-ID heuristic, quality scoring, token counting, rolling-hash
document fingerprinting. All native column expressions with DuckDB SQL
twins in the driver registry.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "una", "por"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (lowercased), empty-safe."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("int")


def bpe_ish_token_count_col(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries (a cheap BPE stand-in: counts the
    regex pieces a byte-pair tokenizer would start from)."""
    pieces = F.regexp_extract_all(
        F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )
    return F.size(pieces).cast("int")


def lang_votes_from_tokens_col(toks: Column, lang: str) -> Column:
    """Count of profile-stopword hits for one language, over a
    pre-tokenized column (so multi-stat projections split once)."""
    profile = LANG_PROFILES[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*profile))).cast("int")


def lang_votes_col(text: Column, lang: str) -> Column:
    return lang_votes_from_tokens_col(tokens_col(text), lang)


def lang_id_from_tokens_col(toks: Column) -> Column:
    """argmax over language profiles; 'und' when no profile hits."""
    votes = [
        (lang, lang_votes_from_tokens_col(toks, lang))
        for lang in sorted(LANG_PROFILES)
    ]
    best_lang = F.lit("und")
    best_votes = F.lit(0)
    for lang, v in votes:  # ties break toward earlier alphabetical lang
        take = v > best_votes
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_votes = F.when(take, v).otherwise(best_votes)
    return best_lang


def lang_id_col(text: Column) -> Column:
    return lang_id_from_tokens_col(tokens_col(text))


def quality_score_from_tokens_col(toks: Column, text: Column) -> Column:
    """Composite quality heuristic in [0,1]:
    0.4·length_score + 0.3·alpha_ratio + 0.3·(1 - punct_ratio)

    length_score = min(n_tokens / 100, 1); alpha_ratio = alphabetic
    chars / total; punct_ratio = punctuation density. Deterministic,
    SQL-twinnable (driverq registry)."""
    n_tok = F.size(toks).cast("double")
    length_score = F.least(n_tok / 100.0, F.lit(1.0))
    total = F.greatest(F.length(text).cast("double"), F.lit(1.0))
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    score = 0.4 * length_score + 0.3 * (alpha / total) + 0.3 * (1.0 - punct / total)
    return F.round(score, 6)


def quality_score_col(text: Column) -> Column:
    return quality_score_from_tokens_col(tokens_col(text), text)


def fingerprint_col(text: Column, window: int = 64) -> Column:
    """Document fingerprint: 60-bit md5 of length-prefixed prefix+suffix
    windows — a cheap rolling-hash-style content stamp for shard-local
    incremental dedup (pairs with pipeline/dedup.py exact_dedup for the
    authoritative pass)."""
    head = F.substring(text, 1, window)
    tail = F.substring(text, -window, window)
    packed = F.concat_ws("|", F.length(text).cast("string"), head, tail)
    return F.conv(F.substring(F.md5(packed), 1, 15), 16, 10).cast("long")


def token_topk(docs, k: int = 100, text_col: str = "text"):
    """Corpus vocabulary heavy hitters: the k most frequent whitespace
    tokens with document frequency, ties broken lexicographically.

    Scale shape: explode → hash aggregate.  The token count is
    map-side-combinable (partial HashAggregate before the exchange), so
    a pathological hot token ("the" in half the corpus) arrives at the
    reducer as one partial row per map task, not one row per occurrence
    — the skew lives and dies map-side.  The top-k itself is
    ``orderBy().limit(k)`` = per-partition TakeOrdered + a k-row driver
    merge, never a global sort.
    """
    from pyspark.sql import DataFrame  # noqa: F401  (signature doc only)

    tok = docs.select(
        F.col("doc_id"), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("term_freq"),
            F.countDistinct("doc_id").cast("long").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), F.asc("token"))
        .limit(k)
    )


# ------------------------------------------------- Gopher quality rules

# the 8 "stop words" of Gopher's quality filter (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Appendix A Table A1): a page
# must contain at least 2 of them
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_signals(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Gopher quality-filter signals + rule outcomes
    (Rae et al. 2021 Appendix A; the same rule set DataTrove/Dolma
    reimplement as `GopherQualityFilter`).

    Every output is an exact integer or a boolean derived from integer
    comparisons — no float ratios, so engine and oracle agree bit-for-
    bit (e.g. mean word length in [3,10] is tested as
    ``3·n_words <= word_chars <= 10·n_words``).

    Entirely row-local codegen'd expressions: zero shuffles, zero
    Python — at 100 TB this pipelines into the parquet scan.
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_words = F.size(toks)
    word_chars = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipsis_count = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
    ).cast("int")
    n_symbols = (hash_count + ellipsis_count).cast("int")
    n_stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS]),
            lambda sw: F.array_contains(toks, sw),
        )
    )
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet_lines = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-•*]")))
    n_ellipsis_lines = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))

    sel = docs.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        word_chars.cast("int").alias("word_chars"),
        n_alpha_words.cast("int").alias("n_alpha_words"),
        n_symbols.alias("n_symbols"),
        n_stop_hits.cast("int").alias("n_stop_hits"),
        n_lines.cast("int").alias("n_lines"),
        n_bullet_lines.cast("int").alias("n_bullet_lines"),
        n_ellipsis_lines.cast("int").alias("n_ellipsis_lines"),
    )
    w = F.col("n_words")
    checks = {
        # 50 <= word count <= 100,000
        "pass_word_count": (w >= 50) & (w <= 100_000),
        # mean word length in [3, 10]
        "pass_mean_word_len": (F.col("word_chars") >= 3 * w)
        & (F.col("word_chars") <= 10 * w),
        # symbol-to-word ratio ('#' or '...') <= 0.1
        "pass_symbol_ratio": 10 * F.col("n_symbols") <= w,
        # >= 80% of words contain an alphabetic character
        "pass_alpha_words": 5 * F.col("n_alpha_words") >= 4 * w,
        # >= 2 of the 8 stop words present
        "pass_stop_words": F.col("n_stop_hits") >= 2,
        # <= 90% of lines start with a bullet
        "pass_bullet_lines": 10 * F.col("n_bullet_lines") <= 9 * F.col("n_lines"),
        # <= 30% of lines end with an ellipsis
        "pass_ellipsis_lines": 10 * F.col("n_ellipsis_lines")
        <= 3 * F.col("n_lines"),
    }
    out = sel
    all_pass = F.lit(True)
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
        all_pass = all_pass & cond
    return out.withColumn("pass_gopher", all_pass)
