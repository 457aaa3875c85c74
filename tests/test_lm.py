"""Unigram-LM quality scoring vs a pure-Python twin (including the
OOV add-one floor and the heavy-hitter vocabulary truncation)."""

from __future__ import annotations

import math

import pytest

from heritrix_spark.pipeline.lm import fit_unigram_lm, unigram_logprob

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "zyzzyva qwerty"),  # rare tokens — OOV under a truncated vocab
    (4, ""),  # empty document
    (5, "the the the the"),
]


def _py_fit(texts: list[str], vocab_k: int) -> tuple[dict[str, int], int]:
    counts: dict[str, int] = {}
    total = 0
    for t in texts:
        for tok in t.lower().split():
            counts[tok] = counts.get(tok, 0) + 1
            total += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
    return dict(top), total


def _py_score(text: str, vocab: dict[str, int], total: int):
    toks = text.lower().split()
    if not toks:
        return 0, 0, 0.0
    s = 0.0
    oov = 0
    for t in toks:
        c = vocab.get(t)
        if c is None:
            oov += 1
            c = 1
        s += math.log(float(c)) - math.log(float(total))
    return len(toks), oov, round(s / len(toks), 6)


@pytest.mark.parametrize("vocab_k", [3, 100])
def test_unigram_logprob_matches_python(spark, vocab_k):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab, total = fit_unigram_lm(df, vocab_k=vocab_k)
    py_vocab, py_total = _py_fit([t for _, t in DOCS], vocab_k)
    assert vocab == py_vocab and total == py_total

    got = {
        r["doc_id"]: (r["n_tokens"], r["oov_tokens"], r["avg_logprob"])
        for r in unigram_logprob(df, vocab, total).collect()
    }
    exp = {i: _py_score(t, py_vocab, py_total) for i, t in DOCS}
    assert got == exp


def test_truncated_vocab_forces_oov(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab, total = fit_unigram_lm(df, vocab_k=3)
    out = {r["doc_id"]: r["oov_tokens"] for r in
           unigram_logprob(df, vocab, total).collect()}
    assert out[3] == 2  # both rare tokens fell out of the top-3 vocab
    assert out[5] == 0  # "the" is the top heavy hitter


def test_fit_rejects_empty_corpus(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    vocab, total = fit_unigram_lm(df)
    assert total == 0 and vocab == {}
    with pytest.raises(ValueError):
        unigram_logprob(df, vocab, total)
