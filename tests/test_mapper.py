"""Crawl mappers (LexicalCrawlMapper/HashCrawlMapper analogs) and the
named SURT-prefix conversions (SurtPrefixSet.java:269-330)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.mapper import (
    divert,
    hash_map_col,
    lexical_map_col,
    write_diversion_logs,
)
from heritrix_spark.operators.scope import (
    convert_prefix_to_domain,
    convert_prefix_to_host,
)


def test_convert_prefix_to_host():
    # SurtPrefixSet.convertPrefixToHost: close open authority prefixes
    assert convert_prefix_to_host("http://(example,host2,") == "http://(example,host2,)"
    assert convert_prefix_to_host("http://(example,host2") == "http://(example,host2,)"
    # already host-enforcing: unchanged
    assert convert_prefix_to_host("http://(example,host2,)") == "http://(example,host2,)"
    # excess path info truncated at ')'
    assert (
        convert_prefix_to_host("http://(example,host2,)/p/")
        == "http://(example,host2,)"
    )


def test_convert_prefix_to_domain():
    assert (
        convert_prefix_to_domain("http://(example,host2,)/p/")
        == "http://(example,host2,"
    )
    # trailing 'www,' label stripped
    assert convert_prefix_to_domain("http://(example,www,)") == "http://(example,"
    # open-ended prefix unchanged
    assert convert_prefix_to_domain("http://(example,host2,") == "http://(example,host2,"


def test_lexical_map_treemap_semantics(spark):
    # map file:  d -> crawlerA, ~ -> crawlerB  (the javadoc example:
    # 'com,' keys find 'd' as nearest subsequent key)
    boundaries = [("d", "crawlerA"), ("~", "crawlerB")]
    df = spark.createDataFrame(
        [("com,example,",), ("org,archive,",), ("d",), ("\x7f~after",)],
        ["class_key"],
    )
    got = {
        r["class_key"]: r["node"]
        for r in df.select(
            "class_key", lexical_map_col(F.col("class_key"), boundaries).alias("node")
        ).collect()
    }
    assert got["com,example,"] == "crawlerA"
    assert got["d"] == "crawlerA"  # tailMap is inclusive
    assert got["org,archive,"] == "crawlerB"
    assert got["\x7f~after"] == "crawlerA"  # wraparound to first entry


def test_hash_map_reduce_and_bucket(spark):
    df = spark.createDataFrame(
        [("example,host1,/deep/path",), ("example,host1,/other",)], ["class_key"]
    )
    nodes = (
        df.select(
            hash_map_col(
                F.col("class_key"), 5, reduce_regex="example,host[0-9]"
            ).alias("node")
        )
        .distinct()
        .collect()
    )
    # regex-reduced keys are identical -> same bucket for both rows
    assert len(nodes) == 1
    assert nodes[0]["node"] in {str(i) for i in range(5)}


def test_divert_and_diversion_logs(spark, tmp_path):
    df = spark.createDataFrame(
        [("u1", "local"), ("u2", "remoteA"), ("u3", "remoteB"), ("u4", "local")],
        ["url", "node"],
    )
    local, diverted = divert(df, "node", "local")
    assert {r["url"] for r in local.collect()} == {"u1", "u4"}
    out = str(tmp_path / "divert")
    write_diversion_logs(diverted, "node", out)
    back = spark.read.parquet(out)
    assert {r["node"] for r in back.select("node").distinct().collect()} == {
        "remoteA",
        "remoteB",
    }
    assert back.count() == 2


def test_ip_queue_assignment_fallback(spark):
    """Resolved hosts key by dotted-decimal IP; unresolved (absent or
    null-ip) hosts fall back to the hostname policy, including the
    https '#443' and port ':'->'#' forms
    (IPQueueAssignmentPolicy.java:46-55)."""
    from heritrix_spark.operators.mapper import ip_queue_assignment

    df = spark.createDataFrame(
        [
            ("http://a.example/x",),
            ("https://b.example/x",),
            ("http://c.example:8080/x",),
            ("http://user:pw@a.example/y",),
            ("https://A.EXAMPLE/z",),
        ],
        "url string",
    )
    dns = spark.createDataFrame(
        [("a.example", "10.0.0.1"), ("c.example", None)],
        "host string, ip string",
    )
    got = {
        r["url"]: r["class_key"]
        for r in ip_queue_assignment(df, dns).collect()
    }
    assert got["http://a.example/x"] == "10.0.0.1"
    assert got["http://user:pw@a.example/y"] == "10.0.0.1"  # userinfo stripped
    assert got["https://A.EXAMPLE/z"] == "10.0.0.1"  # case-folded host
    assert got["https://b.example/x"] == "b.example#443"  # unresolved https
    assert got["http://c.example:8080/x"] == "c.example#8080"  # null ip
