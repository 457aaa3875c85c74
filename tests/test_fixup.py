"""UURI fixup golden cases (UURIFactoryTest.java:773-1180)."""

from __future__ import annotations

import duckdb
import pytest

from heritrix_spark.functions.fixup import (
    fixup_col,
    fixup_idn_col,
    fixup_idn_py,
    fixup_py,
    fixup_sql,
    idn_ascii_host,
)

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
    ("http://.archive.org/", "http://archive.org/"),  # stripPrefix DOT
    ("http://archive.org.:8080/x", "http://archive.org:8080/x"),
    ("http://archive.org/index%25 .html", "http://archive.org/index%25%20.html"),
    ("dns:archive.org", "dns:archive.org"),  # non-authority passthrough
    # interior NBSP -> space -> %20 (UURIFactory.java:352-355)
    ("http://a.org/x y", "http://a.org/x%20y"),
    # scheme-slash collapse (HTTP_SCHEME_SLASHES; [788219])
    ("http:///foo.com/a", "http://foo.com/a"),
    ("https:////foo.com/", "https://foo.com/"),
    # IE backslash law (testBackslashes): path \ -> /, query \ -> %5C
    ("http://a.org/a\\b", "http://a.org/a/b"),
    (
        "http:\\/www.example.com\\a/b\\c/d?q\\r\\|s/t\\v",
        "http://www.example.com/a/b/c/d?q%5Cr%5C|s/t%5Cv",
    ),
    # query escaping (testQueryEscaping: FF escapes only " < > )
    (
        "http://www.yahoo.com/foo?somechars!@$%^&*()_-+={[}]|'\";:/?.>,<",
        "http://www.yahoo.com/foo?somechars!@$%^&*()_-+={[}]|'%22;:/?.%3E,%3C",
    ),
    # stray % NEVER escaped (testTrailingPercents / testStrayPercents)
    ("http://www.example.com/path%", "http://www.example.com/path%"),
    ("http://www.example.com/pa%20th%", "http://www.example.com/pa%20th%"),
    ("http://www.example.com/path?q=foo%", "http://www.example.com/path?q=foo%"),
    ("http://www.example.com/pa%th", "http://www.example.com/pa%th"),
    ("http://www.example.com/pa%20th%way", "http://www.example.com/pa%20th%way"),
    ("http://www.example.com/pa%th%20way", "http://www.example.com/pa%th%20way"),
    # escapes unnecessary (testEscapingNotNecessary; fragment dropped)
    (
        "http://www.example.com/misc;reserved:chars@that&don't=need"
        "+escaping$even,though!you(might)initially?think#so",
        "http://www.example.com/misc;reserved:chars@that&don't=need"
        "+escaping$even,though!you(might)initially?think",
    ),
    # dot segments (testSameAsNutchURLFilterBasic :990-1028)
    ("http://foo.com/aa/../", "http://foo.com/"),
    ("http://foo.com/aa/bb/../", "http://foo.com/aa/"),
    ("http://foo.com/aa/..", "http://foo.com/"),  # ref comment: "we produce /"
    ("http://foo.com/aa/bb/cc/../../foo.html", "http://foo.com/aa/foo.html"),
    ("http://foo.com/aa/bb/../cc/dd/../ee/foo.html", "http://foo.com/aa/cc/ee/foo.html"),
    ("http://foo.com/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/../../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/../aa/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/aa/../../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/aa/../bb/../foo.html/../../", "http://foo.com/"),
    ("http://foo.com/../aa/foo.html", "http://foo.com/aa/foo.html"),
    ("http://foo.com/a..a/foo.html", "http://foo.com/a..a/foo.html"),
    ("http://foo.com/a..a/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/foo.foo/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/x/./y/./", "http://foo.com/x/y/"),
    ("http://foo.com/x/.", "http://foo.com/x/"),
    # dot segments in the QUERY are data, not path ops
    ("http://foo.com/a/../b?path=/x/../y", "http://foo.com/b?path=/x/../y"),
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


# ------------------------------------------------------------- IDN (law 12)

# UURIFactoryTest.testIdn :896-911 (gnu.inet.encoding.IDNA goldens,
# incl. nameprep ß -> ss)
IDN_GOLDEN = [
    (
        "http://räksmörgås.josefßon.org/",
        "http://xn--rksmrgs-5wao1o.josefsson.org/",
    ),
    ("http://www.pølse.dk/", "http://www.xn--plse-gra.dk/"),
    ("http://例子.測試", "http://xn--fsqu00a.xn--g6w251d/"),
    # ASCII URLs flow through the IDN path unchanged
    ("http://Foo.Com:80/A#f", "http://foo.com/A"),
]


def test_idn_ascii_host_goldens():
    assert (
        idn_ascii_host("räksmörgås.josefßon.org")
        == "xn--rksmrgs-5wao1o.josefsson.org"
    )
    assert idn_ascii_host("www.pølse.dk") == "www.xn--plse-gra.dk"
    assert idn_ascii_host("例子.測試") == "xn--fsqu00a.xn--g6w251d"
    assert idn_ascii_host("plain.ascii.org") == "plain.ascii.org"


@pytest.mark.parametrize("url,expected", IDN_GOLDEN)
def test_fixup_idn_py(url, expected):
    assert fixup_idn_py(url) == expected


def test_fixup_idn_spark(spark):
    df = spark.createDataFrame([(u,) for u, _ in IDN_GOLDEN], ["url"])
    got = {
        r["url"]: r["fixed"]
        for r in df.select("url", fixup_idn_col("url").alias("fixed")).collect()
    }
    for url, expected in IDN_GOLDEN:
        assert got[url] == expected, f"{url!r}: {got[url]!r}"


def test_fixup_idn_spark_all_ascii_short_circuit(spark):
    """An all-ASCII batch must round-trip the fast path bit-identically
    with plain fixup_col."""
    urls = [(f"http://Host{i}.Example:80/p{i} x",) for i in range(50)]
    df = spark.createDataFrame(urls, ["url"])
    a = [r.f for r in df.select(fixup_idn_col("url").alias("f")).collect()]
    b = [r.f for r in df.select(fixup_col("url").alias("f")).collect()]
    assert a == b
