"""Unigram language-model quality scoring for training-data pipelines.

The CCNet/RedPajama-style corpus-quality signal: score each document by
the mean per-token log-probability under a small unigram LM fit on the
corpus itself (or any reference corpus).  Documents far below the
corpus mean are gibberish / boilerplate candidates; far above are
degenerate repetition.  This is the shuffle-free stand-in for the
KenLM-perplexity filter (no model binaries exist in this sandbox; the
unigram model is the exactly-reproducible member of the family).

Scale shape:
- **Fit** (:func:`fit_unigram_lm`) is the heavy-hitter vocabulary from
  :func:`~heritrix_spark.pipeline.textstats.token_topk` — one map-side-
  combinable hash aggregation + a bounded TakeOrdered, so the model is
  O(vocab_k) rows on the driver no matter the corpus size.
- **Score** (:func:`unigram_logprob`) ships the fitted counts back as a
  literal map (the same driver-literal pattern as the LSH hyperplanes,
  pipeline/similarity.py) and folds over each document's token array
  **row-locally in array order** — zero shuffles, no Python, and a
  deterministic floating accumulation order that a SQL oracle can
  replay exactly.  For vocabularies too large to ship as a literal
  (>~50k entries) the same score is an exploded broadcast-join + one
  doc-keyed hash agg; that variant trades the deterministic fold order
  for size, so the oracle-pinned path here is the literal-map fold.

Out-of-vocabulary tokens take count 1 (the add-one floor), so
``p(t) = max(count(t), 1) / total_tokens``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heritrix_spark.pipeline.textstats import token_topk, tokens_col


def fit_unigram_lm(
    docs: DataFrame, vocab_k: int = 4096, text_col: str = "text"
) -> tuple[dict[str, int], int]:
    """Fit the model: (top-``vocab_k`` token → count, total token count).

    Two bounded driver results: the heavy-hitter vocabulary (TakeOrdered
    of ``vocab_k`` rows) and one scalar total.  Tokens outside the
    vocabulary are floored to count 1 at scoring time, so truncating the
    tail only ever *lowers* a rare token's probability — the standard
    heavy-hitter LM truncation."""
    rows = (
        token_topk(docs, k=vocab_k, text_col=text_col)
        .select("token", "term_freq")
        .collect()
    )
    total_row = docs.select(
        F.sum(F.size(tokens_col(F.col(text_col)))).cast("long").alias("t")
    ).first()
    total = int(total_row.t or 0)
    return {r.token: int(r.term_freq) for r in rows}, total


def _vocab_map(vocab: dict[str, int]) -> Column:
    pairs: list[Column] = []
    for tok, cnt in sorted(vocab.items()):
        pairs.append(F.lit(tok))
        pairs.append(F.lit(float(cnt)))
    return F.create_map(*pairs)


def unigram_logprob(
    docs: DataFrame,
    vocab: dict[str, int],
    total_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under the fitted unigram LM.

    Returns (``id_col``, ``n_tokens``, ``oov_tokens``, ``avg_logprob``)
    — ``avg_logprob`` is the mean of ``ln(max(count(t),1)) - ln(total)``
    over the document's tokens in order (rounded to 6 decimals; 0.0 for
    empty documents), computed as one JVM ``F.aggregate`` fold per row:
    no shuffle, no Python, deterministic accumulation order."""
    if total_tokens <= 0:
        raise ValueError("total_tokens must be positive (fit on a non-empty corpus)")
    m = _vocab_map(vocab)
    ln_t = math.log(float(total_tokens))
    staged = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    )
    nll_sum = F.aggregate(
        F.col("__toks"),
        F.lit(0.0).cast("double"),
        lambda acc, t: acc + (F.log(F.coalesce(m[t], F.lit(1.0))) - F.lit(ln_t)),
    )
    oov = F.size(F.filter(F.col("__toks"), lambda t: m[t].isNull())).cast("int")
    n = F.size("__toks")
    return staged.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        oov.alias("oov_tokens"),
        F.round(
            F.when(n > 0, nll_sum / n.cast("double")).otherwise(F.lit(0.0)), 6
        ).alias("avg_logprob"),
    )
