"""DomainSensitiveFrontier max-docs law (DomainSensitiveFrontier.java
:159-226): scope extraction, blocking after max_docs successes, dns
exemption, host vs domain counter modes."""

from __future__ import annotations

from pyspark.sql import types as T

from heritrix_spark.operators.quota import domain_max_docs

SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("ordinal", T.LongType()),
        T.StructField("fetch_status", T.IntegerType()),
    ]
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, schema=SCHEMA)
    return {
        (r["host"], r["ordinal"]): (r["dsf_scope"], r["dsf_blocked"])
        for r in domain_max_docs(df, **kw).collect()
    }


def test_domain_mode_pools_subdomains(spark):
    rows = [
        ("www.ex.com", 1, 200),
        ("ex.com", 2, 200),
        ("a.b.ex.com", 3, 200),  # third success: prior = 2 -> blocked at max 2
        ("other.net", 4, 200),
    ]
    got = _run(spark, rows, max_docs=2, mode="domain")
    assert got[("www.ex.com", 1)] == ("ex.com", False)
    assert got[("ex.com", 2)] == ("ex.com", False)
    assert got[("a.b.ex.com", 3)] == ("ex.com", True)
    assert got[("other.net", 4)] == ("other.net", False)


def test_host_mode_counts_separately(spark):
    rows = [
        ("www.ex.com", 1, 200),
        ("www.ex.com", 2, 200),
        ("www.ex.com", 3, 200),
        ("ex.com", 4, 200),
    ]
    got = _run(spark, rows, max_docs=2, mode="host")
    assert got[("www.ex.com", 3)] == ("www.ex.com", True)
    assert got[("ex.com", 4)] == ("ex.com", False)


def test_failures_do_not_count(spark):
    rows = [
        ("ex.com", 1, -2),
        ("ex.com", 2, 404),  # 404 > 0: IS a success by isSuccess (status>0)
        ("ex.com", 3, 200),
        ("ex.com", 4, 200),
    ]
    got = _run(spark, rows, max_docs=2, mode="domain")
    # prior counts: 0 (fail), 0, 1, 2 -> only the last is blocked
    assert [got[("ex.com", k)][1] for k in (1, 2, 3, 4)] == [
        False,
        False,
        False,
        True,
    ]


def test_dns_exempt(spark):
    rows = [("dns:ex.com", k, 200) for k in range(1, 5)]
    got = _run(spark, rows, max_docs=1, mode="domain")
    assert all(not v[1] for v in got.values())


def test_unlimited_when_nonpositive(spark):
    rows = [("ex.com", k, 200) for k in range(1, 6)]
    got = _run(spark, rows, max_docs=0, mode="domain")
    assert all(not v[1] for v in got.values())
