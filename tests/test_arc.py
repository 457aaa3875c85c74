"""ARC writer/reader (operators/arc.py vs ARCWriter.java laws):
metaline goldens, filedesc header framing, write→read roundtrip."""

from __future__ import annotations

import glob

from heritrix_spark.operators.arc import (
    ARC_MAGIC,
    VERSION_LINES,
    arc_file_header_text,
    arc_records,
    parse_arc_bytes,
    read_arc,
    write_arc,
)

ROWS = [
    ("http://h1.example/", 1_600_000_000_000, "<html>alpha</html>", 200,
     "10.0.0.1", "text/html; charset=UTF-8"),
    ("http://h1.example/a", 1_600_000_001_000, "<html>beta</html>", 404,
     "10.0.0.2", None),
    ("http://h2.example/x", 1_600_000_002_000, "", 301,
     "10.0.0.3", "image/png,image/gif"),
]
SCHEMA = (
    "url string, fetch_time_ms long, content string, status int, "
    "ip string, mime string"
)


def _recs(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return arc_records(
        df, status_col="status", ip_col="ip", mime_col="mime"
    )


def test_metaline_golden(spark):
    r = {x.url: x for x in _recs(spark).collect()}
    a = r["http://h1.example/"]
    # 2020-09-13T12:26:40Z; block = http headers + 18-byte body
    first_line = a.record_text.split("\n", 1)[0]
    assert first_line == (
        f"http://h1.example/ 10.0.0.1 20200913122640 text/html "
        f"{a.content_length}"
    )
    assert a.mime == "text/html"  # ';' truncation
    assert r["http://h2.example/x"].mime == "image/png"  # ',' truncation
    assert r["http://h1.example/a"].mime == "no-type"  # null mime
    assert a.record_text.endswith("</html>\n")


def test_file_header_law():
    hdr = arc_file_header_text("part-00000.arc", 1_600_000_000_000)
    body_len = len(VERSION_LINES.encode())
    assert hdr == (
        f"{ARC_MAGIC}part-00000.arc 0.0.0.0 20200913122640 text/plain "
        f"{body_len}{VERSION_LINES}\n"
    )
    # parses as the first record with the version lines as its block
    recs = parse_arc_bytes(hdr.encode())
    assert len(recs) == 1
    assert recs[0]["url"].startswith(ARC_MAGIC)
    assert recs[0]["block"] == VERSION_LINES
    assert "1 0 InternetArchive" in recs[0]["block"]


def test_write_read_roundtrip(spark, tmp_path):
    recs = _recs(spark)
    out = str(tmp_path / "arc")
    write_arc(recs, out, num_files=2, file_time_ms=1_600_000_000_000)
    files = sorted(glob.glob(out + "/part-*.arc"))
    assert files
    got = read_arc(spark, out).collect()
    by_url = {r.url: r for r in got if not r.url.startswith(ARC_MAGIC)}
    headers = [r for r in got if r.url.startswith(ARC_MAGIC)]
    assert len(headers) == len(files)  # one filedesc per part file
    for h in headers:
        # WARC-Filename analog: filedesc names its own file
        assert h.url == ARC_MAGIC + h.source_file.rsplit("/", 1)[-1]
    want = {r.url: r for r in recs.collect()}
    assert set(by_url) == set(want)
    for url, w in want.items():
        g = by_url[url]
        assert (g.ip, g.arc_date, g.mime, g.content_length) == (
            w.ip, w.arc_date, w.mime, w.content_length
        )
        assert len(g.block.encode()) == w.content_length
        # content survives byte-exact inside the length-framed block
        assert g.block.encode() in w.record_text.encode()


def test_parse_rejects_garbage():
    import pytest

    with pytest.raises(ValueError, match="metaline"):
        parse_arc_bytes(b"not an arc file\nmore\n")
    good = arc_file_header_text("f.arc", 0).encode()
    with pytest.raises(ValueError, match="separator"):
        parse_arc_bytes(good[:-1] + b"X")


def test_null_ip_renders_literal_null(spark):
    """Java's + concatenation prints a null hostIP as 'null' and the
    5-field validateMetaLine accepts it — the metaline must not
    silently drop to 4 fields (which would corrupt framing at read)."""
    df = spark.createDataFrame(
        [("http://h/", 1_600_000_000_000, "x", 200, None, "text/plain")],
        SCHEMA,
    )
    rec = arc_records(df, status_col="status", ip_col="ip", mime_col="mime").collect()[0]
    first = rec.record_text.split("\n", 1)[0]
    assert len(first.split(" ")) == 5
    assert first.split(" ")[1] == "null"
    parsed = parse_arc_bytes(rec.record_text.encode())
    assert parsed[0]["ip"] == "null"
