"""RecoveryLogMapper: seed attribution through via chains (pointer
doubling == hand walk), dns: skip, seed-not-found, crawled filter,
and via-aware recover-log parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.journal import (
    parse_recover_log,
    recovery_log_mapper,
)

LINES = [
    "F+ http://seed.a/",                                  # seed A
    "F+ http://seed.b/",                                  # seed B
    "F+ http://a/1 L http://seed.a/",
    "F+ http://a/2 LL http://a/1",
    "F+ http://a/3 LLL http://a/2",                       # depth-3 chain
    "F+ http://b/1 L http://seed.b/",
    "F+ http://orphan/x L http://never.seeded/",          # seed-not-found
    "F+ dns:seed.a E http://seed.a/",                     # dns: skipped
    "Fs http://a/1",
    "Fs http://a/3",
    "Fs http://b/1",
    "Fe http://a/2",
]


def _mapped(spark):
    lines = spark.createDataFrame([(ln,) for ln in LINES], ["line"])
    journal = parse_recover_log(spark, lines)
    return {
        r["canon_url"]: (r["seed"], r["seed_found"], r["crawled"])
        for r in recovery_log_mapper(journal).collect()
    }


def test_parse_extracts_last_word_via(spark):
    lines = spark.createDataFrame(
        [("F+ http://u/ L P X http://via/",), ("F+ http://s/",)], ["line"]
    )
    got = {r["canon_url"]: r["via"] for r in parse_recover_log(spark, lines).collect()}
    assert got["http://u/"] == "http://via/"  # args[len-1], :149-152
    assert got["http://s/"] is None


def test_chain_attribution_and_crawled(spark):
    got = _mapped(spark)
    assert got["http://a/1"] == ("http://seed.a/", True, True)
    assert got["http://a/2"] == ("http://seed.a/", True, False)
    assert got["http://a/3"] == ("http://seed.a/", True, True)
    assert got["http://b/1"] == ("http://seed.b/", True, True)


def test_seed_not_found_is_flagged_not_dropped(spark):
    got = _mapped(spark)
    assert got["http://orphan/x"] == ("http://never.seeded/", False, False)


def test_dns_lines_skipped_and_seeds_not_rows(spark):
    got = _mapped(spark)
    assert "dns:seed.a" not in got
    assert "http://seed.a/" not in got  # seeds are keys, not rows


def test_long_chain_pointer_doubling(spark):
    n = 40  # needs only ~6 doubling rounds
    lines = ["F+ http://s/"] + [
        f"F+ http://c/{i} L " + ("http://s/" if i == 0 else f"http://c/{i-1}")
        for i in range(n)
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], ["line"])
    out = recovery_log_mapper(parse_recover_log(spark, df)).collect()
    assert len(out) == n
    assert all(r["seed"] == "http://s/" and r["seed_found"] for r in out)
