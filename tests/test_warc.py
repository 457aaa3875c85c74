"""WARC record assembly + sink (operators/warc.py vs a strict
byte-level reparse; reference layout WARCWriter.java:176-206,274)."""

import glob

from heritrix_spark.operators.warc import (
    warc_from_fetch_log,
    warc_records,
    write_warc,
)


def _records(fetches, **kw):
    return warc_records(
        fetches,
        status_col="status",
        via_col="via",
        hops_col="hops",
        duration_ms_col="dur",
        **kw,
    )


def _parse_warc_bytes(data: bytes):
    """Strict mini-parser: version line, headers, exact Content-Length
    block, exactly CRLF CRLF after each block."""
    records = []
    i = 0
    while i < len(data):
        assert data[i:i + 10] == b"WARC/1.0\r\n", data[i:i + 20]
        j = data.index(b"\r\n\r\n", i)
        headers = {}
        order = []
        for line in data[i + 10:j].split(b"\r\n"):
            k, v = line.split(b": ", 1)
            headers[k.decode()] = v.decode()
            order.append(k.decode())
        n = int(headers["Content-Length"])
        block = data[j + 4:j + 4 + n]
        assert data[j + 4 + n:j + 4 + n + 4] == b"\r\n\r\n"
        # normative header order (createRecordHeader)
        assert order[0] == "WARC-Type"
        assert order[1] == "WARC-Target-URI"
        assert order[2] == "WARC-Date"
        assert order[-2:] == ["Content-Type", "Content-Length"]
        records.append((headers, block))
        i = j + 4 + n + 4
    return records


def test_record_roundtrip_bytes(spark, tmp_path):
    recs = _records(fetches=_fetches_cached(spark))
    out = str(tmp_path / "warc")
    write_warc(recs, out, num_files=1)
    files = glob.glob(out + "/part-*")
    data = b"".join(open(f, "rb").read() for f in sorted(files))
    parsed = _parse_warc_bytes(data)
    # 4 urls x (response|revisit, request, metadata)
    assert len(parsed) == 12
    by_type = {}
    for h, b in parsed:
        by_type.setdefault(h["WARC-Type"], []).append((h, b))
    assert len(by_type["response"]) == 3
    assert len(by_type["revisit"]) == 1
    assert len(by_type["request"]) == 4
    assert len(by_type["metadata"]) == 4


_FETCHES = {}


def _fetches_cached(spark):
    if "df" not in _FETCHES:
        rows = [
            ("http://h1.example/", 1_600_000_000_000, "<html>alpha</html>",
             200, None, "", 12),
            ("http://h1.example/a", 1_600_000_001_000, "<html>beta</html>",
             200, "http://h1.example/", "L", 9),
            ("http://h2.example/copy", 1_600_000_002_000,
             "<html>alpha</html>", 200, "http://h1.example/", "L", 7),
            ("http://h2.example/gone", 1_600_000_003_000, "", 404,
             "http://h1.example/a", "LL", 3),
        ]
        _FETCHES["df"] = spark.createDataFrame(
            rows,
            "url string, fetch_time_ms long, content string, status int, "
            "via string, hops string, dur long",
        )
    return _FETCHES["df"]


def test_revisit_semantics(spark):
    recs = _records(fetches=_fetches_cached(spark)).collect()
    resp = {r["target_uri"]: r for r in recs if r["warc_type"] == "response"}
    rev = [r for r in recs if r["warc_type"] == "revisit"]
    assert len(rev) == 1 and rev[0]["target_uri"] == "http://h2.example/copy"
    first = resp["http://h1.example/"]
    # same payload digest, refers to the first occurrence's record id
    assert rev[0]["payload_digest"] == first["payload_digest"]
    assert f"WARC-Refers-To: <{first['record_id']}>" in rev[0]["record_text"]
    # revisit block is headers-only: strictly shorter than the response
    assert rev[0]["content_length"] < first["content_length"]
    # disabled -> plain response
    recs2 = _records(
        fetches=_fetches_cached(spark), revisit_for_identical_digests=False
    ).collect()
    assert all(r["warc_type"] != "revisit" for r in recs2)


def test_transaction_linkage_and_date(spark):
    recs = _records(fetches=_fetches_cached(spark)).collect()
    base = [r for r in recs if r["target_uri"] == "http://h1.example/"]
    rid = {r["warc_type"]: r for r in base}
    assert rid["request"]["record_id"] == rid["response"]["record_id"] + "?type=request"
    assert rid["metadata"]["record_id"] == rid["response"]["record_id"] + "?type=metadata"
    assert rid["request"]["concurrent_to"] == rid["response"]["record_id"]
    assert rid["response"]["warc_date"] == "2020-09-13T12:26:40Z"
    assert rid["response"]["record_id"].startswith("urn:uuid:")
    # metadata ANVL: seed has no via/hops lines, but has fetchTimeMs
    assert "fetchTimeMs: 12" in rid["metadata"]["record_text"]
    assert "via: " not in rid["metadata"]["record_text"]
    child = {
        r["warc_type"]: r for r in recs if r["target_uri"] == "http://h1.example/a"
    }
    assert "via: http://h1.example/" in child["metadata"]["record_text"]
    assert "hopsFromSeed: L" in child["metadata"]["record_text"]


def test_content_length_is_bytes_not_chars(spark):
    df = spark.createDataFrame(
        [("http://u.example/é", 0, "café ☃", 200, None, "", 1)],
        "url string, fetch_time_ms long, content string, status int, "
        "via string, hops string, dur long",
    )
    r = {x["warc_type"]: x for x in _records(fetches=df).collect()}
    body = "café ☃".encode()
    http = r["response"]["record_text"].split("\r\n\r\n", 1)[1]
    assert http.encode().endswith(body + b"\r\n\r\n")
    assert r["response"]["content_length"] == len(
        http.encode()[: -4]
    )


def test_warc_from_fetch_log(spark):
    fetch_log = spark.createDataFrame(
        [
            (1, 0, "k", "http://h1.example/", "http://h1.example/", 1, 0, 1,
             200, "success", 1, 0, "", None),
            (1, 0, "k", "http://h1.example/miss", "http://h1.example/miss",
             2, 0, 1, 404, "failure", 1, 0, "L", "http://h1.example/"),
        ],
        "round int, now_ms long, class_key string, url string, "
        "canon_url string, ordinal long, directive int, precedence int, "
        "fetch_status int, disposition string, cost int, "
        "politeness_delay_ms long, hops_path string, via string",
    )
    docs = spark.createDataFrame(
        [("http://h1.example/", [{"kind": "link", "text": "hello",
                                  "media_ref": None}])],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string>>",
    )
    recs = warc_from_fetch_log(fetch_log, docs).collect()
    # only the 200 row is written (shouldWrite skips failures)
    assert {r["target_uri"] for r in recs} == {"http://h1.example/"}
    resp = [r for r in recs if r["warc_type"] == "response"][0]
    assert resp["record_text"].endswith("hello\r\n\r\n")


def test_read_warc_roundtrip(spark, tmp_path):
    """write_warc → read_warc returns exactly the records that went in
    (field-by-field incl. block framed by Content-Length octets)."""
    from heritrix_spark.operators.warc import read_warc

    recs = _records(fetches=_fetches_cached(spark))
    out = str(tmp_path / "warc")
    write_warc(recs, out, num_files=2)

    got = read_warc(spark, out)
    want_rows = recs.collect()
    got_rows = got.collect()
    assert len(got_rows) == len(want_rows) == 12

    def key(r):
        return (r["record_id"], r["warc_type"])

    want_by = {key(r): r for r in want_rows}
    for g in got_rows:
        w = want_by[key(g)]
        assert g["target_uri"] == w["target_uri"]
        assert g["warc_date"] == w["warc_date"]
        assert g["content_type"] == w["content_type"]
        assert g["content_length"] == w["content_length"]
        # byte-exact block: Content-Length octets survived the sink trip
        assert len(g["block"].encode("utf-8")) == w["content_length"]
        # optional linkage headers round-trip through the headers map
        if w["concurrent_to"]:
            assert g["headers"]["WARC-Concurrent-To"].strip("<>") == w[
                "concurrent_to"
            ]


def test_read_warc_block_digest_verifies(spark, tmp_path):
    """Recomputing each parsed block's digest reproduces the stored
    block_digest — byte-exact framing proof, file by file."""
    import base64
    import hashlib

    from heritrix_spark.operators.warc import read_warc

    recs = _records(fetches=_fetches_cached(spark), digest="sha256_160")
    out = str(tmp_path / "warc")
    write_warc(recs, out, num_files=1)

    stored = {r["record_id"]: r["block_digest"] for r in recs.collect()}
    for r in read_warc(spark, out).collect():
        raw = hashlib.sha256(r["block"].encode("utf-8")).digest()[:20]
        b32 = base64.b32encode(raw).decode()
        assert f"sha256-160:{b32}" == stored[r["record_id"]]


def test_parse_warc_bytes_rejects_garbage():
    import pytest as _pytest

    from heritrix_spark.operators.warc import parse_warc_bytes

    with _pytest.raises(ValueError, match="bad record magic"):
        parse_warc_bytes(b"NOT A WARC\r\n\r\n", source="x")
    assert parse_warc_bytes(b"") == []
