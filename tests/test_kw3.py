"""Kulturarw3 writer (operators/kw3.py vs Kw3WriterProcessor.java):
the javadoc path example as a golden, the port law, and the MIME part
structure incl. empty-content omission."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.kw3 import kw3_files, kw3_path_col

SCHEMA = (
    "url string, host string, port int, fetch_time_ms long, "
    "content string, status int, ip string, mime string"
)


def test_javadoc_path_golden(spark):
    """Kw3WriterProcessor.java:68 example:
    '/53/www.kb.se/current/<md5>.<sec>' — md5('www.kb.se') really does
    start with '53'."""
    df = spark.createDataFrame(
        [("http://www.kb.se/", "www.kb.se", 80, 1_169_211_837_000)],
        "url string, host string, port int, t long",
    )
    p = df.select(
        kw3_path_col(F.col("url"), F.col("host"), F.col("port"), F.col("t")).alias("p")
    ).collect()[0].p
    assert p == (
        "53/www.kb.se/current/01598f14e59a3fc4bef99f070218ee1b.1169211837"
    )


def test_port_and_parts(spark):
    rows = [
        ("http://h.example:8080/x", "h.example", 8080, 1_600_000_000_000,
         "body", 200, "1.2.3.4", "text/html"),
        ("http://h.example/y", "h.example", 80, 1_600_000_001_000,
         "", 404, "1.2.3.4", "text/plain"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.path: r.file_text for r in kw3_files(df).collect()}
    with_port = next(p for p in got if "/h.example:8080/" in p)
    no_port = next(p for p in got if "/h.example/current/" in p)
    t = got[with_port]
    assert t.startswith("MIME-version: 1.1\n")
    assert "HTTP-Part: ArchiveInfo\n" in t
    assert "HTTP-Part: Header\n\n" in t
    assert "HTTP-Part: Content\n\nbody" in t
    # boundary appears in: multipart CT, header part, content part, terminator
    assert t.count("KulturArw3_") == 4
    assert t.endswith("--\n")
    assert "HTTP-Status-Code: 200\n" in t
    # empty content: the whole Content part is omitted (:345)
    t2 = got[no_port]
    assert "HTTP-Part: Content" not in t2
    assert "HTTP-Content-Length: 0\n" in t2
    assert "HTTP-Status-Code: 404\n" in t2
