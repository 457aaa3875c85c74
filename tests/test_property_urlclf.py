"""Property-based expr-vs-Python-twin agreement for the URL filter and
hashed-classifier kernels on adversarial generated input (unicode
text, hostile URL strings). Each example ships one batched Spark job,
per the suite convention (tests/test_property_kernels.py)."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from heritrix_spark.pipeline.classifier import hashed_linear_score
from heritrix_spark.pipeline.urlfilter import BADWORDS_MILLI, badword_score_col

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Java \s and RE2 \s are ASCII-only — the twins must split the same way
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")

_URL_CHARS = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
    min_size=0,
    max_size=60,
)
_URLS = st.builds(
    lambda h, p: f"http://{h}.example/{p}",
    st.sampled_from(["a", "CaSiNo", "www.bet", "x-y", "0"]),
    _URL_CHARS,
)

_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Zs"),
        include_characters=" \t\n",
    ),
    min_size=0,
    max_size=120,
)

_W = [((i * 40503) % 401) - 200 for i in range(32)]


def _py_badword(url: str) -> int:
    low = url.lower()
    return sum(wt for w, wt in BADWORDS_MILLI if w in low)


def _py_logit(text: str, bias: int) -> tuple[int, int]:
    toks = [t for t in _ASCII_WS.split((text or "").lower()) if t]
    feats = toks + (
        [f"{a}_{b}" for a, b in zip(toks, toks[1:])] if len(toks) >= 2 else []
    )
    s = bias + sum(
        _W[int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % len(_W)]
        for f in feats
    )
    return len(feats), s


@settings(**_SETTINGS)
@given(st.lists(_URLS, min_size=1, max_size=25))
def test_badword_score_matches_py(spark, urls):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, url string"
    )
    got = {
        r.i: r.s
        for r in df.select("i", badword_score_col(F.col("url")).alias("s")).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _py_badword(u), u


@settings(**_SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=20))
def test_hashed_logit_matches_py(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in hashed_linear_score(df, _W, bias_milli=-7).collect()}
    for i, t in enumerate(texts):
        n, logit = _py_logit(t, -7)
        assert (rows[i].n_features, rows[i].logit_milli) == (n, logit), repr(t)
