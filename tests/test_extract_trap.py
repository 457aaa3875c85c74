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


def test_meta_robots_nofollow_suppression(spark):
    """ExtractorHTML obeyMetaRobotsNofollow (ExtractorHTML.java:894-906):
    'nofollow' or 'none' in the robots meta content (case-insensitive)
    ends extraction for the page; other directives (noindex) don't."""
    from heritrix_spark.operators.extract import extract_outlinks

    spans = [{"kind": "text", "text": "see http://x.example/a",
              "media_ref": None, "offset": 0}]
    rows = [
        ("http://p1.example/", 1, 200, "", spans, "NOFOLLOW"),
        ("http://p2.example/", 2, 200, "", spans, "noindex,nofollow"),
        ("http://p3.example/", 3, 200, "", spans, "NONE"),
        ("http://p4.example/", 4, 200, "", spans, "noindex"),
        ("http://p5.example/", 5, 200, "", spans, None),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, ordinal long, fetch_status int, hops_path string, "
        "spans array<struct<kind:string,text:string,media_ref:string,"
        "offset:int>>, meta_robots string",
    )
    out = extract_outlinks(df, meta_robots_col="meta_robots")
    assert sorted(r["via"] for r in out.collect()) == [
        "http://p4.example/", "http://p5.example/",
    ]
    # without the column binding, nothing is suppressed
    assert extract_outlinks(df).count() == 5


def test_meta_refresh_emits_refer_link(spark):
    """<meta http-equiv=refresh content=';url=X'> → one 'R' outlink
    (ExtractorHTML.java:907-918, Hop.REFER)."""
    from heritrix_spark.operators.extract import extract_outlinks

    rows = [
        ("http://p.example/", 1, 200, "", [
            {"kind": "refresh", "text": None,
             "media_ref": "http://p.example/next", "offset": 0},
            {"kind": "text", "text": "see http://x.example/a",
             "media_ref": None, "offset": 1},
        ]),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, ordinal long, fetch_status int, hops_path string, "
        "spans array<struct<kind:string,text:string,media_ref:string,"
        "offset:int>>",
    )
    got = sorted(
        (r["target"], r["hop_char"])
        for r in extract_outlinks(df).collect()
    )
    assert got == [
        ("http://p.example/next", "R"),
        ("http://x.example/a", "L"),
    ]
