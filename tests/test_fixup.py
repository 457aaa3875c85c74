"""UURI fixup golden cases (UURIFactoryTest.java:915-990 subset)."""

from __future__ import annotations

import duckdb
import pytest

from heritrix_spark.functions.fixup import fixup_col, fixup_py, fixup_sql

GOLDEN = [
    (" http://foo.com/ ", "http://foo.com/"),
    ("HTTP://foo.com/", "http://foo.com/"),
    ("http://Foo.Com/index.html", "http://foo.com/index.html"),
    ("http://Foo.Com/InDeX.html", "http://foo.com/InDeX.html"),  # path case kept
    ("http://foo.com:80/index.html", "http://foo.com/index.html"),
    ("http://foo.com:81/", "http://foo.com:81/"),
    ("https://foo.com:443/x", "https://foo.com/x"),
    ("http://foo.com", "http://foo.com/"),
    ("http://foo.com/foo.html#ref", "http://foo.com/foo.html"),
    ("http://www.ar\rchive\n.org/i\n\n\r\rndex.html", "http://www.archive.org/index.html"),
    ("http://www.ar\tchive\t.org/i\t\r\n\tndex.html", "http://www.archive.org/index.html"),
    ("http://archive.org./", "http://archive.org/"),
    ("http://archive.org.:8080/x", "http://archive.org:8080/x"),
    ("http://archive.org/index%25 .html", "http://archive.org/index%25%20.html"),
    ("http://a.org/a\\b", "http://a.org/a%5Cb"),
    ("dns:archive.org", "dns:archive.org"),  # non-authority passthrough
]


@pytest.mark.parametrize("url,expected", GOLDEN)
def test_fixup_py(url, expected):
    assert fixup_py(url) == expected


def test_fixup_spark(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN], ["url"])
    got = {
        r["url"]: r["fixed"]
        for r in df.select("url", fixup_col("url").alias("fixed")).collect()
    }
    for url, expected in GOLDEN:
        assert got[url] == expected, f"{url!r}: {got[url]!r}"


def test_fixup_duckdb():
    con = duckdb.connect()
    expr = fixup_sql("url")
    for url, expected in GOLDEN:
        got = con.execute(f"select {expr} from (values (?)) t(url)", [url]).fetchone()[0]
        assert got == expected, f"{url!r}: {got!r}"
