"""Hashed linear classifier scoring (pipeline/classifier.py): pure-
Python twin of the md5-60 hashing-trick fold, bigram feature law, and
edge cases (empty/null text, unigram-only mode)."""

from __future__ import annotations

import hashlib

from heritrix_spark.pipeline.classifier import (
    demo_weights_milli,
    hashed_linear_score,
)

W = demo_weights_milli(64)
BIAS = -250


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_logit(text: str | None, weights, bias: int, bigrams: bool = True) -> tuple[int, int]:
    toks = [t for t in (text or "").lower().split() if t]
    feats = list(toks)
    if bigrams and len(toks) >= 2:
        feats += [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    k = len(weights)
    return len(feats), bias + sum(weights[_md5_60(f) % k] for f in feats)


DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "casino casino casino"),
    (2, "one"),
    (3, ""),
    (4, None),
    (5, "  spaced   out\ttokens \n here "),
]


def test_hashed_linear_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = {r.doc_id: r for r in hashed_linear_score(df, W, bias_milli=BIAS).collect()}
    for doc_id, text in DOCS:
        n, logit = _py_logit(text, W, BIAS)
        r = rows[doc_id]
        assert (r.n_features, r.logit_milli) == (n, logit), (doc_id, text)
        assert r.keep == (logit > 0)


def test_unigram_only_mode(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = {
        r.doc_id: r
        for r in hashed_linear_score(df, W, bias_milli=BIAS, bigrams=False).collect()
    }
    for doc_id, text in DOCS:
        n, logit = _py_logit(text, W, BIAS, bigrams=False)
        assert (rows[doc_id].n_features, rows[doc_id].logit_milli) == (n, logit)


def test_weight_vector_determinism():
    assert demo_weights_milli(8) == demo_weights_milli(8)
    assert all(-998 <= w <= 998 for w in demo_weights_milli(1024))


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    plan = (
        hashed_linear_score(df, W, bias_milli=BIAS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
