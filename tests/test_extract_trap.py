"""TrapSuppressExtractor analog: trap-suspected pages fetch + log but
mine no outlinks (modules/.../extractor/TrapSuppressExtractor.java)."""

from __future__ import annotations

from heritrix_spark.operators.extract import TRAP_PATTERN, extract_outlinks


def _fetched(spark):
    rows = [
        {
            "url": "http://h.example/a/b/a/b/a/b/x.html",  # pathological
            "ordinal": 1,
            "fetch_status": 200,
            "hops_path": "L",
            "spans": [
                {"kind": "text", "text": "see http://h.example/ok.html",
                 "media_ref": None, "offset": 0}
            ],
        },
        {
            "url": "http://h.example/fine.html",
            "ordinal": 2,
            "fetch_status": 200,
            "hops_path": "L",
            "spans": [
                {"kind": "text", "text": "see http://h.example/other.html",
                 "media_ref": None, "offset": 0}
            ],
        },
    ]
    return spark.createDataFrame(
        rows,
        schema="url string, ordinal long, fetch_status int, hops_path string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_trap_suppression(spark):
    fetched = _fetched(spark)
    plain = extract_outlinks(fetched)
    assert {r["via"] for r in plain.collect()} == {
        "http://h.example/a/b/a/b/a/b/x.html",
        "http://h.example/fine.html",
    }
    suppressed = extract_outlinks(fetched, suppress_trap_pattern=TRAP_PATTERN)
    assert {r["via"] for r in suppressed.collect()} == {"http://h.example/fine.html"}
