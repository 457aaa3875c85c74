"""ExtractorUniversal + AggressiveExtractorHTML laws.

ExtractorUniversal (ExtractorUniversal.java:357-446) has no reference
unit test (ExtractorUniversalTest.java is `// TODO TESTME!`), so these
cases are derived directly from the cited code paths: the URLable
char-run accumulator, the >3-chars+dot gate, the http(s)://IP
full-match, the dot→TLD probe (first <=6 chars), the interior-"http"
trim, trailing-dot strip, the unflushed tail quirk, and the
URIException abort on a scheme-less accepted token.

AggressiveExtractorHTML (AggressiveExtractorHTML.java:44-50) simply
re-scans the script body as general-tag innards.
"""

from __future__ import annotations

from heritrix_spark.operators.content_extract import (
    universal_uris_py,
)
from heritrix_spark.operators.html_extract import extract_html_py


def test_absolute_http_urls_extracted():
    text = "See http://u5.example.com/a and http://www.foo.org/b. end"
    assert universal_uris_py(text) == [
        "http://u5.example.com/a",
        "http://www.foo.org/b",  # trailing dot stripped
    ]


def test_ip_address_full_match():
    # IP_ADDRESS.matches() is a full-string test: bare http://quad only
    assert universal_uris_py("x http://10.1.2.3 y") == ["http://10.1.2.3"]
    # with a path it is not an IP match, but .3/z fails the TLD probe
    # and 10.1.2 labels aren't TLDs -> not a URL at all
    assert universal_uris_py("x http://10.1.2.3/z y") == []


def test_tld_probe_is_first_six_chars_after_any_dot():
    # "com/ab" (6 chars after the dot) matches com(/.*)?
    assert universal_uris_py("q http://site.com/ab q") == [
        "http://site.com/ab"]
    # unknown TLD-ish label: not a URL
    assert universal_uris_py("q http://site.zzz/ab q") == []


def test_scheme_less_token_aborts_scan():
    # "bad.com/x" passes looksLikeAnURL but UURIFactory.getInstance
    # needs an absolute URI -> URIException (an IOException) ends the
    # scan; the later absolute URL is never reached
    assert universal_uris_py("bad.com/x then http://ok.example.com/y") == []
    # ...but tokens before the abort survive
    assert universal_uris_py(
        "http://ok.example.com/y then bad.com/x http://never.example.com/"
    ) == ["http://ok.example.com/y"]


def test_interior_http_trim():
    # indexOf("http") > 0 -> token trimmed to the interior URL
    assert universal_uris_py("w url=http://t.example.net/p w") == [
        "http://t.example.net/p"]


def test_short_and_dotless_runs_ignored():
    assert universal_uris_py("and foo bar a.b xy") == []


def test_unflushed_tail_never_emitted():
    # stream ends while the run is still open -> no emit (:365-401 loop)
    assert universal_uris_py("see http://tail.example.com/x") == []


def test_aggressive_html_scans_script_body_as_tag_innards():
    page = "http://www.example.com/"
    cs = ("<script type=\"text/javascript\">document.write('<a href=\""
          "deep/page.html\">x</a>');</script>")
    # normal ExtractorHTML: the quoted strings are scanned as JS, the
    # href attribute inside the written markup is NOT mined
    links, _, _ = extract_html_py(page, cs)
    assert all(c != "a/@href" for _, c, _ in links)
    # aggressive subclass: the script body is re-scanned as general-tag
    # innards, so href= inside it is found (hop L, a/@href context)
    links, _, _ = extract_html_py(page, cs, aggressive=True)
    assert ("http://www.example.com/deep/page.html" in
            [u for u, _, _ in links])


def test_universal_udf_matches_twin(spark):
    from pyspark.sql import functions as F

    from heritrix_spark.operators.content_extract import universal_uris

    rows = [
        ("See http://u5.example.com/a and http://10.1.2.3 end",),
        ("bad.com/x then http://ok.example.com/y",),
        ("nothing here",),
    ]
    df = spark.createDataFrame(rows, ["body"])
    got = df.select("body", universal_uris(F.col("body")).alias("us")).collect()
    for r in got:
        assert list(r["us"]) == universal_uris_py(r["body"])
