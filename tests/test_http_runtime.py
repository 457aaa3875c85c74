"""ExtractorHTTP full header law + RuntimeLimitEnforcer.

References: ExtractorHTTP.java:40-76 (Location/Content-Location =>
REFER with '<Header>:' context, favicon + optional root => INFERRED);
RuntimeLimitEnforcer.java:62-120 (PAUSE/TERMINATE => crawl state
request, BLOCK_URIS => S_BLOCKED_BY_RUNTIME_LIMIT on the URI).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.constants import S_BLOCKED_BY_RUNTIME_LIMIT


def _links(spark, url, loc, cloc, infer_root=False):
    from heritrix_spark.operators.extract import http_header_links

    df = spark.createDataFrame(
        [(url, loc, cloc)], "url string, loc string, cloc string")
    out = df.select(http_header_links(
        F.col("url"), F.col("loc"), F.col("cloc"),
        infer_root_page=infer_root).alias("ls")).collect()[0]["ls"]
    return [(e["uri"], e["context"], e["hop"]) for e in out]


def test_location_and_content_location(spark):
    got = _links(spark, "http://h.example/d/p.html", "/moved/x",
                 "alt.html")
    assert got == [
        ("http://h.example/moved/x", "Location:", "R"),
        ("http://h.example/d/alt.html", "Content-Location:", "R"),
        ("http://h.example/favicon.ico", "=INFERRED_MISC", "I"),
    ]


def test_absent_headers_drop_out_and_root_inference(spark):
    got = _links(spark, "http://h.example/d/p.html", None, None,
                 infer_root=True)
    assert got == [
        ("http://h.example/favicon.ico", "=INFERRED_MISC", "I"),
        ("http://h.example/", "=INFERRED_MISC", "I"),
    ]


def test_runtime_limit_operations(spark):
    from heritrix_spark.operators.quota import runtime_limit_status

    df = spark.createDataFrame(
        [(5_000,), (120_000,)], "elapsed_ms long")
    # PAUSE/TERMINATE: stop flag only, never a blocked status
    stop, blocked = runtime_limit_status(F.col("elapsed_ms"), 60, "PAUSE")
    rows = df.select(stop.alias("s"), blocked.alias("b")) \
             .orderBy("elapsed_ms").collect()
    assert [r["s"] for r in rows] == [False, True]
    assert [r["b"] for r in rows] == [None, None]
    # BLOCK_URIS: no stop, over-limit URIs stamped -5004
    stop, blocked = runtime_limit_status(
        F.col("elapsed_ms"), 60, "BLOCK_URIS")
    rows = df.select(stop.alias("s"), blocked.alias("b")) \
             .orderBy("elapsed_ms").collect()
    assert [r["s"] for r in rows] == [False, False]
    assert [r["b"] for r in rows] == [None, S_BLOCKED_BY_RUNTIME_LIMIT]
