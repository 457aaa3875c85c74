"""Full-PSL reduction / assignment-level keys, quotas, crawl limits,
preloaded precedence, implied URIs, cross-domain rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.functions.psl import (
    assignment_level_class_key_col,
    assignment_level_class_key_py,
    reduce_surt_authority_col,
    reduce_surt_authority_py,
)
from heritrix_spark.operators.quota import (
    CrawlLimits,
    Quotas,
    apply_quotas,
    crawl_limits_reached,
    preloaded_uri_precedence,
)

REDUCE_CASES = [
    ("uk,co,bbc,www,", "uk,co,bbc,"),
    ("uk,co,bbc,", "uk,co,bbc,"),
    ("org,archive,www,", "org,archive,"),
    ("org,archive,", "org,archive,"),
    ("com,example,a,b,c,", "com,example,"),
    ("au,com,smh,www,", "au,com,smh,"),
    ("org,", "org,"),  # bare TLD: unreducible
    ("org,archive,www,#8080", "org,archive,"),
    # goldens from the reference PublicSuffixesTest.java:37-95
    ("com,example,www,", "com,example,"),
    ("com,example,", "com,example,"),
    ("fr,yahoo,www,", "fr,yahoo,"),
    ("au,com,foobar,www,", "au,com,foobar,"),
    ("au,com,foobar,", "au,com,foobar,"),
    ("uk,co,virgin,www,", "uk,co,virgin,"),
    ("uk,co,virgin,", "uk,co,virgin,"),
    # *.tokyo.jp wildcard rule
    ("jp,tokyo,public,assigned,www,", "jp,tokyo,public,assigned,"),
    ("jp,tokyo,public,assigned,", "jp,tokyo,public,assigned,"),
    # !metro.tokyo.jp exception rule
    ("jp,tokyo,metro,subdomain,", "jp,tokyo,metro,"),
    ("jp,tokyo,metro,", "jp,tokyo,metro,"),
    ("uk,bl,www,", "uk,bl,"),  # !bl.uk exception
    ("uk,bl,", "uk,bl,"),
    ("de,bad-site,www", "de,bad-site,"),  # testDomainWithDash
    ("de,archive4u,www", "de,archive4u,"),  # testDomainWithNumbers
    ("1.2.3.4", "1.2.3.4"),  # testIPV4: no match -> unchanged
    (
        "[2001:0db8:85a3:08d3:1319:8a2e:0370:7344]",
        "[2001:0db8:85a3:08d3:1319:8a2e:0370:7344]",
    ),  # testIPV6
    ("zzz,example,www,", "zzz,example,"),  # testFakeTLD: unknown TLD -> 2-level
    ("example", "example"),  # testUnsegmentedHostname: regex find() fails
    # backtracking: wildcard/exact rule can't consume its +1 label ->
    # next shorter rule applies / input unchanged
    ("jp,tokyo,public,", "jp,tokyo,"),
    ("uk,co", "uk,co"),
]


@pytest.mark.parametrize("surt,expected", REDUCE_CASES)
def test_reduce_py(surt, expected):
    assert reduce_surt_authority_py(surt) == expected


def test_reduce_spark_matches_py(spark):
    df = spark.createDataFrame([(s,) for s, _ in REDUCE_CASES], ["surt"])
    got = {
        r["surt"]: r["red"]
        for r in df.select(
            "surt", reduce_surt_authority_col(F.col("surt")).alias("red")
        ).collect()
    }
    for surt, expected in REDUCE_CASES:
        assert got[surt] == expected, f"{surt!r}: {got[surt]!r}"


def test_assignment_level_class_key(spark):
    cases = [
        ("http://www.bbc.co.uk/news", "uk,co,bbc,"),
        ("http://a.b.archive.org/x", "org,archive,"),
        ("http://example.com/", "com,example,"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = {
        r["url"]: r["ck"]
        for r in df.select(
            "url", assignment_level_class_key_col("url").alias("ck")
        ).collect()
    }
    for url, expected in cases:
        assert got[url] == expected
        assert assignment_level_class_key_py(url) == expected


def test_quotas(spark):
    ready = spark.createDataFrame([("a,",), ("b,",), ("c,",)], ["class_key"])
    stats = spark.createDataFrame(
        [("a,", 5, 10_000), ("b,", 50, 9_000_000), ("c,", 2, 100)],
        ["class_key", "succeeded", "success_bytes"],
    )
    out = apply_quotas(ready, stats, Quotas(max_successes_per_host=10))
    assert sorted(r["class_key"] for r in out.collect()) == ["a,", "c,"]
    out2 = apply_quotas(ready, stats, Quotas(max_success_kb_per_host=1000))
    assert sorted(r["class_key"] for r in out2.collect()) == ["a,", "c,"]
    out3 = apply_quotas(ready, stats, Quotas())
    assert out3.count() == 3


def test_crawl_limits():
    assert not crawl_limits_reached(10, 1000, 5000, CrawlLimits())
    assert crawl_limits_reached(10, 0, 0, CrawlLimits(max_documents=10))
    assert crawl_limits_reached(0, 2048, 0, CrawlLimits(max_bytes=2048))
    assert crawl_limits_reached(0, 0, 60_000, CrawlLimits(max_logical_ms=60_000))


def test_preloaded_precedence(spark):
    cands = spark.createDataFrame(
        [("http://a/x", 1), ("http://a/y", 1)], ["canon_url", "precedence"]
    )
    ranks = spark.createDataFrame(
        [("http://a/x", 7)], ["canon_url", "preloaded_precedence"]
    )
    got = {
        r["canon_url"]: r["precedence"]
        for r in preloaded_uri_precedence(cands, ranks).collect()
    }
    assert got == {"http://a/x": 7, "http://a/y": 1}


def test_implied_uris(spark):
    from heritrix_spark.operators.extract import implied_uris

    links = spark.createDataFrame(
        [
            ("http://h/img/photo.jpg", "E", 100, 5, "h", "L"),
            ("http://h/page.html", "L", 101, 5, "h", "L"),
        ],
        ["target", "hop_char", "link_seq", "parent_ordinal", "via", "via_hops_path"],
    )
    out = implied_uris(links).collect()
    assert len(out) == 1
    assert out[0]["target"] == "http://h/img/"
    assert out[0]["hop_char"] == "I"
    assert out[0]["link_seq"] == 100 + (1 << 19)


def test_cross_domain_predicate(spark):
    from heritrix_spark.operators.scope import hop_crosses_assignment_domain_predicate

    df = spark.createDataFrame(
        [
            ("http://a.example.com/x", "http://b.example.com/y"),  # same domain
            ("http://a.example.com/x", "http://other.org/y"),  # crosses
            ("http://a.example.com/x", None),  # no via
        ],
        ["url", "via"],
    )
    got = [
        r["x"]
        for r in df.select(
            hop_crosses_assignment_domain_predicate(F.col("url"), F.col("via")).alias(
                "x"
            )
        ).collect()
    ]
    assert got == [False, True, False]
