"""ExtractorDOC / ExtractorPDF laws: HYPERLINK reluctant scan +
relative resolution, PDF absolute-only dests, mimetype/size gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.content_extract import (
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
