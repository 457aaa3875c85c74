"""ExtractorDOC / ExtractorPDF laws: HYPERLINK reluctant scan +
relative resolution, PDF absolute-only dests, mimetype/size gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.content_extract import (
    swf_links,
    PDF_MAX_SIZE_TO_PARSE,
    doc_hyperlink_uris_col,
    doc_links,
    pdf_links,
)


def test_doc_hyperlink_reluctant_scan(spark):
    text = (
        'intro HYPERLINK "http://a.example/x" middle '
        'HYPERLINK  \\l "rel/path.html" end HYPERLINK "" tail'
    )
    df = spark.createDataFrame([(text,)], ["t"])
    (r,) = df.select(doc_hyperlink_uris_col(F.col("t")).alias("u")).collect()
    # reluctant .*? stops at the FIRST quote pair; empty match kept
    assert r["u"] == ["http://a.example/x", "rel/path.html", ""]


def test_doc_links_relative_resolution_and_gate(spark):
    rows = [
        ("http://h.example/dir/doc.doc", 'x HYPERLINK "sub/p.html" y',
         "application/msword"),
        ("http://h.example/skip.doc", 'x HYPERLINK "http://z/" y',
         "text/html"),  # gate: wrong mimetype
        ("http://h.example/skip2.doc", 'x HYPERLINK "a" y', None),
    ]
    df = spark.createDataFrame(rows, ["url", "doc_text", "content_type"])
    got = doc_links(df).collect()
    assert len(got) == 1
    assert got[0]["dest"] == "http://h.example/dir/sub/p.html"  # relative base
    assert got[0]["hop"] == "L"


def test_pdf_links_absolute_only_and_size_gate(spark):
    rows = [
        ("http://h/1.pdf", ["http://a/x", "rel/y", "https://b/z"],
         "application/pdf", 1000),
        ("http://h/2.pdf", ["http://c/"], "application/pdf",
         PDF_MAX_SIZE_TO_PARSE + 1),   # too big (:45-57)
        ("http://h/3.pdf", ["http://d/"], "text/plain", 10),
    ]
    df = spark.createDataFrame(
        rows, "url string, pdf_uris array<string>, content_type string, "
              "content_size long"
    )
    got = sorted(r["dest"] for r in pdf_links(df).collect())
    # relative 'rel/y' dropped (absolute-only, :115-123); big/wrong-type gated
    assert got == ["http://a/x", "https://b/z"]


def _swf_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, via string, "
        "swf_events array<struct<kind:string,value:string>>, "
        "content_type string",
    )


def test_swf_gate_null_ct_never_extracts(spark):
    # ExtractorSWF.shouldExtract :66-70 — the null check precedes the
    # .swf suffix disjunction, so a .swf URL with null type is skipped
    rows = [
        ("http://h/a.swf", "http://h/", [("url", "http://x/")], None),
        ("http://h/b.swf", "http://h/", [("url", "http://x/")], "text/plain"),
        ("http://h/c.bin", "http://h/", [("url", "http://x/")],
         "application/X-Shockwave-Flash"),  # case-insensitive contains
    ]
    got = swf_links(_swf_df(spark, rows)).collect()
    assert sorted(r["base"] for r in got) == [
        "http://h/b.swf",  # .swf suffix rescues the wrong mimetype
        "http://h/c.bin",  # flash mimetype rescues the wrong suffix
    ]


def test_swf_geturl_embeds_resolve_against_via(spark):
    # Link.addRelativeToVia :319-322 — EMBED dests resolve on the VIA,
    # not the SWF's own URL
    rows = [
        ("http://cdn/x.swf", "http://page.example/dir/index.html",
         [("url", "img/banner.gif"), ("url", "http://abs/q")],
         "application/x-shockwave-flash"),
    ]
    got = {(r["dest"], r["hop"]) for r in swf_links(_swf_df(spark, rows)).collect()}
    assert got == {
        ("http://page.example/dir/img/banner.gif", "E"),
        ("http://abs/q", "E"),
    }


def test_swf_push_strings_likely_uri_gate(spark):
    # considerStringAsUri :326-332 — isLikelyUri gate, hop X, via-relative,
    # no speculativeFixup (an 'example.com'-style candidate stays bare and
    # resolves as a relative path, unlike the JS branch)
    rows = [
        ("http://h/m.swf", "http://page/dir/",
         [("string", "next/scene.swf"), ("string", "not a uri"),
          ("string", "audio/mpeg")],  # mimetype false-positive rejected
         "application/x-shockwave-flash"),
    ]
    got = [(r["dest"], r["hop"]) for r in swf_links(_swf_df(spark, rows)).collect()]
    assert got == [("http://page/dir/next/scene.swf", "X")]


def test_swf_javascript_branch_scans_strings_against_base(spark):
    # getURL("javascript:...") :316-317 → ExtractorJS.considerStrings with
    # handlingJSFile=false → addRelativeToBase: X hops resolve on the SWF's
    # own URL, and speculativeFixup applies (dotted-domain gets http://)
    rows = [
        ("http://swfhost/p/m.swf", "http://page/",
         [("url", 'javascript:openWin("pop/win.html","w");'
                  ' go("www.example.com")')],
         "application/x-shockwave-flash"),
    ]
    got = {(r["dest"], r["hop"]) for r in swf_links(_swf_df(spark, rows)).collect()}
    assert got == {
        ("http://swfhost/p/pop/win.html", "X"),
        ("http://www.example.com", "X"),
    }
