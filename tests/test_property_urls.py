"""Property-based backend-agreement tests for the URL string kernels.

Every kernel ships multiple aligned backends — pure-Python twin (oracle
simulator / fixtures), Arrow/RE2 kernel (the hot path), Catalyst
expression (no-Python fallback), DuckDB SQL twin (the driver's oracle).
The driver compare and the unit goldens exercise them only on
fixture-shaped URLs; these properties pin agreement over adversarial
generated inputs.

Domain: printable ASCII without CR/LF. That is the engine's documented
input contract — fixup strips interior CR/LF/TAB before anything else
(functions/fixup.py; UURIFactory.java:336-470 does the same), and IDN
hosts are punycoded upstream (IDN declared out of subset). Outside that
domain the backends are allowed to differ (java/RE2/Python `$`-before-
trailing-newline semantics legitimately diverge), so generating raw
newlines would test the regex engines, not the engine contract.

The Arrow kernels and DuckDB twins run without Spark, so hypothesis can
afford hundreds of examples; the Catalyst-expression backend is pinned
separately in test_canonicalize.py/test_surt.py goldens and by the
driver rows (arrow vs DuckDB on 500 fixture URLs).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from heritrix_spark.functions.canonicalize import (
    _canonicalize_arrow,
    canonicalize_py,
    canonicalize_sql,
)
from heritrix_spark.functions.fixup import (
    fixup_py,
    fixup_sql,
    full_canonicalize_py,
    full_canonicalize_sql,
)
from heritrix_spark.functions.surt import (
    _class_key_arrow,
    _surt_arrow,
    class_key_py,
    class_key_sql,
    surt_py,
    surt_sql,
)

# ---------------------------------------------------------------- strategies

_LABEL = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789-_", min_size=1, max_size=8
)
_HOST = st.builds(".".join, st.lists(_LABEL, min_size=1, max_size=4))
_SCHEME = st.sampled_from(["http", "https", "ftp", "HTTP", "hTtps", "dns"])
_PORT = st.sampled_from(["", ":80", ":443", ":8080", ":0", ":65535"])
_USERINFO = st.sampled_from(["", "user@", "u:p@", "USER:pw@"])
_PATHTEXT = st.text(
    alphabet="abcdefXYZ0123456789/?&=._-%;,()!~*'$+@: ", max_size=30
)
# decorations the canonicalization rules actually target
_DECO = st.sampled_from(
    [
        "",
        ";jsessionid=0123456789abcdefghijklmnopqrstuv",
        "?CFID=123&CFTOKEN=abc",
        "?phpsessid=0123456789abcdefghijklmnopqrstuv&x=1",
        "?sid=9682993c8daa2c5497996114facdc805",
        "&aspsessionidabcdefgh=abcdefghijklmnopqrstuvwx&y=2",
        "?",
        "//",
        "/./index.html",
        "#frag",
        "\\win\\path",
        " trailing",
    ]
)
_URLISH = st.builds(
    lambda s, u, h, p, pth, d: f"{s}://{u}{h}{p}{pth}{d}",
    _SCHEME,
    _USERINFO,
    _HOST,
    _PORT,
    _PATHTEXT,
    _DECO,
)
# printable ASCII junk, no CR/LF (see module docstring); TAB allowed only
# where fixup runs first (it strips interior tabs).
_JUNK = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)
_WS = st.sampled_from(["", " ", "  ", " ", "   ", "\t"])
_RAW = st.builds(lambda a, u, b: a + u + b, _WS, st.one_of(_URLISH, _JUNK), _WS)

_BATCH = st.lists(st.one_of(_URLISH, _JUNK), min_size=1, max_size=25)
_RAW_BATCH = st.lists(_RAW, min_size=1, max_size=25)


def _duck(sql_expr: str, urls: list[str]) -> list[str]:
    con = duckdb.connect()
    try:
        con.register(
            "u", pd.DataFrame({"i": range(len(urls)), "url": urls})
        )
        rows = con.execute(f"SELECT {sql_expr} FROM u ORDER BY i").fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


# ---------------------------------------------------------------- properties


@settings(max_examples=150, deadline=None)
@given(_BATCH)
def test_canonicalize_arrow_matches_py(urls):
    got = _canonicalize_arrow(pa.array(urls, type=pa.string())).to_pylist()
    assert got == [canonicalize_py(u) for u in urls]


@settings(max_examples=60, deadline=None)
@given(_BATCH)
def test_canonicalize_duckdb_matches_py(urls):
    assert _duck(canonicalize_sql("url"), urls) == [
        canonicalize_py(u) for u in urls
    ]


@settings(max_examples=150, deadline=None)
@given(_BATCH)
def test_surt_arrow_matches_py(urls):
    got = _surt_arrow(pa.array(urls, type=pa.string())).to_pylist()
    assert got == [surt_py(u) for u in urls]


@settings(max_examples=150, deadline=None)
@given(_BATCH)
def test_class_key_arrow_matches_py(urls):
    got = _class_key_arrow(pa.array(urls, type=pa.string())).to_pylist()
    assert got == [class_key_py(u) for u in urls]


@settings(max_examples=60, deadline=None)
@given(_BATCH)
def test_surt_duckdb_matches_py(urls):
    assert _duck(surt_sql("url"), urls) == [surt_py(u) for u in urls]


@settings(max_examples=60, deadline=None)
@given(_BATCH)
def test_class_key_duckdb_matches_py(urls):
    assert _duck(class_key_sql("url"), urls) == [
        class_key_py(u) for u in urls
    ]


@settings(max_examples=60, deadline=None)
@given(_RAW_BATCH)
def test_fixup_duckdb_matches_py(urls):
    assert _duck(fixup_sql("url"), urls) == [fixup_py(u) for u in urls]


@settings(max_examples=40, deadline=None)
@given(_RAW_BATCH)
def test_full_canonicalize_duckdb_matches_py(urls):
    assert _duck(full_canonicalize_sql("url"), urls) == [
        full_canonicalize_py(u) for u in urls
    ]


# ------------------------------------------------- Catalyst expr backends
# One deterministic adversarial batch through Spark (a per-example Spark
# job would dominate the suite); the families mirror the strategies above
# plus every edge the properties or past goldens ever flagged.

_ADVERSARIAL = [
    "",
    "http://",
    "http:///",
    "http://a",
    "HTTP://WWW.Example.COM:80/Index.HTML#frag",
    "https://user:pw@www3.ex-ample.co.uk:443/a/b;jsessionid="
    "0123456789abcdefghijklmnopqrstuv?x=1&CFID=9&CFTOKEN=z",
    "ftp://Ftp.Example.org:21//double//slash/./x",
    "http://1.2.3.4:8080/ip?sid=9682993c8daa2c5497996114facdc805",
    "not a url at all",
    "   http://spaced.example.com/a b\\c   ",
    " http://nbsp.example.com/ ",
    "http://trailingdot.example.com./x",
    "http://www.example.com",
    "dns:example.com",
    "http://example.com/?",
    "http://example.com/index.html?&y=2",
    "http://(parens).example.com/(a)(b)",
    "http://example.com/%2525%20pct",
    "http://aspsession.example.com/x&aspsessionidqwertyui="
    "abcdefghijklmnopqrstuvwx&k=v",
    "http://example.com:65535/high-port",
]


@pytest.mark.usefixtures("spark")
def test_expr_backends_match_py_on_adversarial_batch(spark):
    from pyspark.sql import functions as F

    from heritrix_spark.functions.canonicalize import (
        canonicalize_col,
        canonicalize_expr_col,
    )
    from heritrix_spark.functions.fixup import fixup_col
    from heritrix_spark.functions.surt import (
        class_key_expr_col,
        surt_col,
        surt_expr_col,
    )

    df = spark.createDataFrame(
        [(u,) for u in _ADVERSARIAL] + [(None,)], "url string"
    ).select(
        "url",
        canonicalize_expr_col("url").alias("canon_expr"),
        canonicalize_col("url").alias("canon_arrow"),
        surt_expr_col("url").alias("surt_expr"),
        surt_col("url").alias("surt_arrow"),
        class_key_expr_col("url").alias("ck_expr"),
        fixup_col("url").alias("fixup"),
        F.lit(1).alias("one"),
    )
    for r in df.collect():
        if r["url"] is None:
            # null in → null out on every backend (the py twins only see
            # non-null rows; columnar null propagation is the contract)
            for c in ("canon_expr", "canon_arrow", "surt_expr",
                      "surt_arrow", "ck_expr", "fixup"):
                assert r[c] is None, c
            continue
        assert r["canon_expr"] == canonicalize_py(r["url"]), r["url"]
        assert r["canon_arrow"] == canonicalize_py(r["url"]), r["url"]
        assert r["surt_expr"] == surt_py(r["url"]), r["url"]
        assert r["surt_arrow"] == surt_py(r["url"]), r["url"]
        assert r["ck_expr"] == class_key_py(r["url"]), r["url"]
        assert r["fixup"] == fixup_py(r["url"]), r["url"]
