"""Content-extractor kernels vs the reference's own test vectors.

CSS/JS vectors are re-derived from ExtractorCSSTest.VALID_TEST_DATA and
ExtractorJSTest.VALID_TEST_DATA (heritrix3/modules/src/test/java/org/
archive/modules/extractor/); ExtractorXMLTest is empty upstream
("TODO TESTME!"), so the XML vectors here exercise the documented law
directly (XML_URI_EXTRACTOR char class, unescapeXml, isLikelyUri).
"""

from __future__ import annotations

from urllib.parse import urljoin

import pytest
from pyspark.sql import functions as F

from heritrix_spark.operators.content_extract import (
    css_uris,
    is_likely_uri,
    is_likely_uri_py,
    js_string_uris,
    js_strings_py,
    resolve_relative,
    speculative_fixup,
    speculative_fixup_py,
    unescape_js_py,
    xml_candidates,
)

CSS_BASE = "http://www.archive.org/start/"

# (css content, expected resolved URI) — ExtractorCSSTest.VALID_TEST_DATA
CSS_VECTORS = [
    ("@import url(http://www.archive.org)", "http://www.archive.org"),
    ("@import url('http://www.archive.org')", "http://www.archive.org"),
    (
        '@import url(    "  http://www.archive.org  "   )',
        "http://www.archive.org",
    ),
    (
        "table { border: solid black 1px}\n@import url(style.css)",
        "http://www.archive.org/start/style.css",
    ),
]

# (js content, expected emitted URI) — ExtractorJSTest.VALID_TEST_DATA
JS_VECTORS = [
    (
        'var foo = "http://www.example.com/outlink";',
        "http://www.example.com/outlink",
    ),
    (
        'var foo = "<a href=\\"http://www.example.com/outlink\\">'
        'link in html in string</a>";',
        "http://www.example.com/outlink",
    ),
    (
        'var foo = "<a href=\\"http:\\/\\/www.example.com\\/outlink\\">'
        'link in html in string with gratuitous escaping</a>";',
        "http://www.example.com/outlink",
    ),
    (
        "'string with spaces','http://example.com/outlink'",
        "http://example.com/outlink",
    ),
]


def test_js_goldens_python_twin():
    for content, expected in JS_VECTORS:
        assert js_strings_py(content) == [expected], content


def test_js_closing_quote_reuse_law():
    # startIndex = strings.end(2): the closing quote of a non-likely
    # string opens the next one (ExtractorJS.java:188)
    out = js_strings_py("'a','b/c.html','d'")
    assert out == ["b/c.html"]


def test_js_recursion_into_non_likely_strings():
    # a whitespace-free outer string containing quotes fails the
    # unusual-characters rule, so the scan recurses INTO it and finds
    # the nested quoted string (considerStrings' else branch)
    nested = "\"'img/pix.gif'\""
    assert js_strings_py(nested) == ["img/pix.gif"]


def test_unescape_js():
    assert unescape_js_py(r"http:\/\/a.b\/c") == "http://a.b/c"
    assert unescape_js_py(r"a\"b\u0041") == 'a"bA'


def test_likely_uri_py_law():
    yes = ["photo.jpg", "/photos", "./photos", "photos/index.html",
           "http://a.b/c", "a.b/c?x=1"]
    no = [
        "rectangle.x.",        # ends with '.'
        "text/xml",            # mimetype shape
        "application/json",    # mimetype shape
        "image/png",           # known image mimetype
        "11.2",                # decimal
        "a(b).com/x",          # unusual chars
        "+a.com/x", "a.com/x+",  # '+' edges
        "nodotorslash",        # not possible
        "has space.com/x",     # whitespace
    ]
    for s in yes:
        assert is_likely_uri_py(s), s
    for s in no:
        assert not is_likely_uri_py(s), s


def test_speculative_fixup_py():
    # &amp; unescape
    assert speculative_fixup_py("x&amp;y.org/z") == "x&y.org/z"
    # encoded-scheme decode
    assert (
        speculative_fixup_py("http%3A%2F%2Fwww.a.com%2Fb")
        == "http://www.a.com/b"
    )
    # dotted-domain + TLD -> http:// prefix
    assert speculative_fixup_py("www.example.com/page") == \
        "http://www.example.com/page"
    # last label not a TLD -> untouched
    assert speculative_fixup_py("www.example.zzz/page") == "www.example.zzz/page"


# ----------------------------------------------------------- spark side

def _one_col(spark, rows, name="text"):
    return spark.createDataFrame([(r,) for r in rows], [name])


def test_css_goldens_spark(spark):
    df = _one_col(spark, [c for c, _ in CSS_VECTORS])
    out = df.select(
        F.explode(css_uris(F.col("text"))).alias("u")
    ).select(
        # UURIFactory strips surrounding whitespace and resolves
        # relative refs against the page base (Link.addRelativeToBase)
        resolve_relative(F.lit(CSS_BASE), F.trim(F.col("u"))).alias("u")
    )
    got = [r.u for r in out.collect()]
    assert got == [e for _, e in CSS_VECTORS]


def test_css_backslash_escape_and_amp(spark):
    df = _one_col(spark, [r"url(a\ b\,c.css);", "url(x&ampz.css)"])
    got = [r.u for r in
           df.select(F.explode(css_uris(F.col("text"))).alias("u")).collect()]
    assert got == ["a b,c.css", "x&z.css"]


def test_js_udf_matches_python_twin(spark):
    rows = [c for c, _ in JS_VECTORS] + [
        "'a','b/c.html','d'",
        "plain text no strings",
        'f("text/html", 1.5, "real/path.js")',
    ]
    df = _one_col(spark, rows)
    got = df.select(
        F.col("text"), js_string_uris(F.col("text")).alias("us")
    ).collect()
    for row in got:
        assert list(row.us) == js_strings_py(row.text), row.text


def test_xml_candidates_and_likely_filter(spark):
    xml = (
        '<?xml version="1.0"?><rss><channel>'
        "<link>http://example.com/feed</link>"
        '<enclosure url="http://example.com/ep.mp3" type="audio/mpeg"/>'
        "<author>someone@example.com</author>"
        "<title>plain words</title></channel></rss>"
    )
    df = _one_col(spark, [xml])
    cands = df.select(F.explode(xml_candidates(F.col("text"))).alias("u"))
    likely = [r.u for r in cands.filter(is_likely_uri(F.col("u"))).collect()]
    # the @ in the author email is excluded by the G1 char class; the
    # audio/mpeg mimetype is rejected by isLikelyFalsePositive
    assert "http://example.com/feed" in likely
    assert "http://example.com/ep.mp3" in likely
    assert all("@" not in u for u in likely)
    assert "audio/mpeg" not in likely
    got_all = [r.u for r in cands.collect()]
    assert "audio/mpeg" in got_all  # candidate mined, then filtered


def test_xml_unescape(spark):
    xml = '<link>http://a.b/c?x=1&amp;y=2</link>'
    df = _one_col(spark, [xml])
    got = [r.u for r in
           df.select(F.explode(xml_candidates(F.col("text"))).alias("u")).collect()]
    assert got == ["http://a.b/c?x=1&y=2"]


def test_is_likely_uri_column_agrees_with_python(spark):
    battery = [
        "photo.jpg", "/photos", "./photos", "photos/index.html",
        "http://a.b/c", "a.b/c?x=1", "rectangle.x.", "text/xml",
        "application/json", "image/png", "audio/mpeg", "11.2",
        "a(b).com/x", "+a.com/x", "a.com/x+", "nodotorslash",
        "x.y", "x/y", "a%2Fb.c", "a=b.c/d", "1.2.3", "v1.2.3/x",
    ]
    df = _one_col(spark, battery, name="u")
    got = {r.u: r.ok for r in
           df.select("u", is_likely_uri(F.col("u")).alias("ok")).collect()}
    for s in battery:
        assert got[s] == is_likely_uri_py(s), s


def test_speculative_fixup_column_agrees_with_python(spark):
    battery = [
        "x&amp;y.org/z", "http%3A%2F%2Fwww.a.com%2Fb", "HTTPS%3A%2F%2Fa.b%2F",
        "www.example.com/page", "www.example.com", "www.example.zzz/page",
        "a.b", "plain/path.html",
    ]
    df = _one_col(spark, battery, name="u")
    got = {r.u: r.f for r in
           df.select("u", speculative_fixup(F.col("u")).alias("f")).collect()}
    for s in battery:
        assert got[s] == speculative_fixup_py(s), s


RESOLVE_CASES = [
    ("http://h.com/a/b/c.html", "d.html"),
    ("http://h.com/a/b/c.html", "./d.html"),
    ("http://h.com/a/b/c.html", "../d.html"),
    ("http://h.com/a/b/c.html", "../../d.html"),
    ("http://h.com/a/b/c.html", "/root.html"),
    ("http://h.com/a/b/c.html", "//other.com/x"),
    ("http://h.com/a/b/c.html", "https://abs.com/y"),
    ("http://h.com", "style.css"),
    ("http://h.com/", "style.css"),
    ("http://www.archive.org/start/", "style.css"),
    ("http://h.com/a/", "b/../c/./d.html"),
]


def test_resolve_relative_vs_urljoin(spark):
    df = spark.createDataFrame(RESOLVE_CASES, ["base", "ref"])
    got = df.select(
        "base", "ref", resolve_relative(F.col("base"), F.col("ref")).alias("r")
    ).collect()
    for row in got:
        assert row.r == urljoin(row.base, row.ref), (row.base, row.ref)


# ---------------------------------------------------- UriUtilsTest goldens

# Re-derived from UriUtilsTest.java (commons/src/main/java/org/archive/
# util/UriUtilsTest.java): urisRelativeImages / urisAbsolute /
# urisRelative / urisPathAbsoluteImages expect isLikelyUri == True;
# notUrisNaiveFalsePositives / notUrisNaive /
# unusualCharacterFalsePositives / mimetypesFalsePositives /
# startsOrEndsWithPlusFalsePositives expect False.
URIUTILS_LIKELY = [
    "photo.jpg", "./photo.jpg", "../photo.jpg", "images/photo.jpg",
    "../../images/photo.jpg",
    "/photo.jpg", "/images/photo.jpg",
    "http://example.com", "http://example.com/", "http://www.example.com",
    "http://www.example.com/", "http://www.example.com/about",
    "http://www.example.com/about/",
    "http://www.example.com/about/index.html", "https://example.com",
    "https://example.com/", "https://www.example.com",
    "https://www.example.com/", "https://www.example.com/about",
    "https://www.example.com/about/",
    "https://www.example.com/about/index.html",
    "ftp://example.com/public/report.pdf",
    "http://a.example.com/combiner/c?js=analytics/sOmni.js,"
    "analytics/analytics.js,analytics/zf.js,analytics/externalnielsen.js",
    "http://l.example.com/jn/util/anysize/74*74c-86400,"
    "http%3A%2F%2Fl.example.com%2Fa%2Fi%2Fus%2Fshine%2Fmoreon%2F"
    "74.upallnight.jpg",
    "default.asp?type=1",
    "\\/add\\/page?.crumb=O2.eArRHJUUWRkVHN6L0Y.&frompg=p1",
    "/wiki/Ficheiro:Wikiversity-logo.svg",
    "cssp!gelui-1/overlay",
    "/wiki/%E0%B4%B8%E0%B4%B9%E0%B4%BE%E0%B4%AF%E0%B4%82:To_Read_in_Malayalam",
    "/wiki/Wikiversity:Why_create_an_account%3F",
    ";s.channel=d.channel?d.channel:",
]

URIUTILS_NOT_LIKELY = [
    "0.99", "3.14157", "text/javascript",
    "foo bar", "<script>foo=bar</script>", "item\t$0.99\tred",
    "),f=document.getElementsByTagName(",
    "window.location.href='/'",
    "location='http://example.com/blah/'",
    "http://example.com/intent/user?screen_name='+p.user+'",
    ").append(",
    "[\\x3cb\\x3e−\\x3c/b\\x3e]",
    'http://demo.example.net/panama.php?cgroup=ron728x90&pid="+pid+"'
    '&uid="+uid+"&rid="+rid+"&kw=10&cx=10&bh=10',
    "text/javascript", "text/css", "application/x-shockwave-flash",
    "text/javaScript", "text/html", "application/x-www-form-urlencoded",
    "text/xml", "text/plain", "application/x-mplayer2", "application/json",
    "image/jpeg", "image/x-icon", "audio/mpeg", "image/gif", "audio/ogg",
    "video/quicktime", "audio/x-pn-realaudio-plugin",
    "+resp.result+",
    ";overlay.style.width=viewport_dimensions.width+",
    "+_ti;bb.src=",
]


def test_uriutils_goldens_python():
    for s in URIUTILS_LIKELY:
        assert is_likely_uri_py(s), s
    for s in URIUTILS_NOT_LIKELY:
        assert not is_likely_uri_py(s), s


def test_uriutils_goldens_spark(spark):
    battery = URIUTILS_LIKELY + URIUTILS_NOT_LIKELY
    df = _one_col(spark, battery, name="u")
    got = {r.u: r.ok for r in
           df.select("u", is_likely_uri(F.col("u")).alias("ok")).collect()}
    for s in URIUTILS_LIKELY:
        assert got[s], s
    for s in URIUTILS_NOT_LIKELY:
        assert not got[s], s


# ------------------------------------------------- ExtractorURI kernel

from heritrix_spark.operators.content_extract import (  # noqa: E402
    query_string_uris,
    query_string_uris_py,
)

QS_CASES = [
    # param value is an encoded absolute URI
    ("http://site.example/redir?u=http%3A%2F%2Ftarget.example%2Fp", 
     ["http://target.example/p"]),
    # whole query is a bare absolute URI (no '=' params)
    ("http://go.example/r?http://direct.example/d",
     ["http://direct.example/d"]),
    # mixed: non-URI params skipped, multiple URI params in order
    ("http://x.example/?a=1&u=http%3A%2F%2Ft1.example%2F&b=plain"
     "&v=https%3A%2F%2Ft2.example%2Fz",
     ["http://t1.example/", "https://t2.example/z"]),
    # no query at all
    ("http://noq.example/page", []),
    # param with two '=' is skipped (keyVal.length==2 law)
    ("http://x.example/?u=http%3A%2F%2Ft.example=extra", []),
]


def test_query_string_uris_python_twin():
    for url, expected in QS_CASES:
        assert query_string_uris_py(url) == expected, url


def test_query_string_uris_spark(spark):
    df = _one_col(spark, [u for u, _ in QS_CASES], name="url")
    got = {r.url: list(r.us) for r in df.select(
        "url", query_string_uris(F.col("url")).alias("us")).collect()}
    for url, expected in QS_CASES:
        assert got[url] == expected, url


# --------------------------------------------- Column/Python twin laws

from heritrix_spark.operators.content_extract import (  # noqa: E402
    css_uris_py,
    xml_uris_py,
)

CORPUS = [
    "@import url(style.css); body{background:url(\"  http://a.b/i.png  \")}"
    " url('q.css'); url(x&ampz.css);",
    r"a { b: url(esc\ m\,7.css) }",
    '<?xml version="1.0"?><l>http://a.b/c?x=1&amp;y=2</l>'
    '<e url="http://m.e/x.mp3" type="audio/mpeg"/><a>u@e.com</a>',
    "no urls here at all",
    "",
]


def test_css_column_matches_python_twin(spark):
    df = _one_col(spark, CORPUS)
    got = df.select("text", css_uris(F.col("text")).alias("us")).collect()
    for row in got:
        assert list(row.us) == css_uris_py(row.text), row.text


def test_xml_column_matches_python_twin(spark):
    df = _one_col(spark, CORPUS)
    kept = F.filter(xml_candidates(F.col("text")), lambda u: is_likely_uri(u))
    got = df.select("text", kept.alias("us")).collect()
    for row in got:
        assert list(row.us) == xml_uris_py(row.text), row.text
