"""Small rule family: resource-length midfetch rules (header-parse
quirks), ContentLengthDecideRule binary accept, class-key regex,
external-geo membership, ZeroCostAssignmentPolicy."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.prepare import zero_cost_col
from heritrix_spark.operators.scope import (
    HEADER_PREDICTS_MISSING,
    class_key_matches_regex_predicate,
    content_length_accept_predicate,
    external_geo_predicate,
    header_content_length_col,
    resource_longer_than_predicate,
    resource_no_longer_than_predicate,
)


def test_header_parse_law(spark):
    rows = [("500",), ("",), ("xyz",), (None,), ("0",), ("12x",)]
    df = spark.createDataFrame(rows, ["h"])
    got = [
        r["n"]
        for r in df.select(header_content_length_col(F.col("h")).alias("n")).collect()
    ]
    # empty / unparseable / missing all -> -1 (:100-117)
    assert got == [500, HEADER_PREDICTS_MISSING, HEADER_PREDICTS_MISSING,
                   HEADER_PREDICTS_MISSING, 0, HEADER_PREDICTS_MISSING]


def test_resource_thresholds_strict_and_missing_pass(spark):
    rows = [(-1,), (799,), (800,), (801,)]
    df = spark.createDataFrame(rows, ["n"])
    out = df.select(
        "n",
        resource_no_longer_than_predicate(F.col("n"), 800).alias("no_longer"),
        resource_longer_than_predicate(F.col("n"), 800).alias("longer"),
    ).collect()
    got = {r["n"]: (r["no_longer"], r["longer"]) for r in out}
    assert got[-1] == (False, False)   # missing never matches
    assert got[799] == (True, False)   # strict <
    assert got[800] == (False, False)  # equal matches neither (:38-40,:126-128)
    assert got[801] == (False, True)   # strict >


def test_content_length_binary_default_accepts_all(spark):
    df = spark.createDataFrame([(0,), (2**62,)], ["n"])
    got = [
        r["a"]
        for r in df.select(
            content_length_accept_predicate(F.col("n")).alias("a")
        ).collect()
    ]
    assert got == [True, True]  # default threshold 2^63-1 (:40-44)


def test_class_key_regex_full_match(spark):
    df = spark.createDataFrame([("com,example,",), ("org,example,",)], ["ck"])
    got = [
        r["m"]
        for r in df.select(
            class_key_matches_regex_predicate(F.col("ck"), "com,.*").alias("m")
        ).collect()
    ]
    assert got == [True, False]


def test_geo_membership_null_and_empty(spark):
    df = spark.createDataFrame([("us",), ("fr",), (None,)], ["cc"])
    got = [
        r["g"]
        for r in df.select(
            external_geo_predicate(F.col("cc"), ["us", "de"]).alias("g")
        ).collect()
    ]
    assert got == [True, False, False]
    got0 = df.select(external_geo_predicate(F.col("cc"), []).alias("g")).collect()
    assert all(not r["g"] for r in got0)


def test_zero_cost(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    (r,) = df.select(zero_cost_col().alias("c")).collect()
    assert r["c"] == 0


def test_seed_accept_and_fetch_status_rules(spark):
    from heritrix_spark.operators.scope import (
        fetch_status_in_set_predicate,
        fetch_status_matches_regex_predicate,
        seed_accept_predicate,
    )

    df = spark.createDataFrame(
        [(True, 200), (False, 404), (None, 301)],
        "is_seed boolean, status int",
    )
    got = df.select(
        seed_accept_predicate(F.col("is_seed")).alias("seed"),
        fetch_status_in_set_predicate(F.col("status"), [200, 301]).alias("inset"),
        fetch_status_in_set_predicate(F.col("status"), []).alias("empty"),
        fetch_status_matches_regex_predicate(F.col("status"), r"3\d\d").alias("rx"),
    ).collect()
    assert [(r["seed"], r["inset"], r["empty"], r["rx"]) for r in got] == [
        (True, True, False, False),
        (False, False, False, False),
        (False, True, False, True),  # null is_seed -> False
    ]


def test_content_type_matches_regex_null_safe(spark):
    from heritrix_spark.operators.scope import content_type_matches_regex_predicate

    df = spark.createDataFrame(
        [("text/html",), ("text/html; charset=utf-8",), (None,)], ["ct"]
    )
    got = [
        r[0]
        for r in df.select(
            content_type_matches_regex_predicate(F.col("ct"), r"text/html\b.*")
        ).collect()
    ]
    assert got == [True, True, False]


def test_add_redirect_from_root_server(spark):
    from heritrix_spark.operators.scope import (
        add_redirect_from_root_server_predicate,
    )

    rows = [
        # root-server redirect, same basename (www-stripped) -> ACCEPT
        ("http://www.a.example/landing", "http://a.example/", "LR", True),
        # via path not exactly '/'
        ("http://a.example/landing", "http://a.example/x/", "LR", False),
        # not a redirect hop
        ("http://a.example/landing", "http://a.example/", "LL", False),
        # different host
        ("http://b.example/landing", "http://a.example/", "R", True and False),
        # no via
        ("http://a.example/landing", None, "R", False),
        # www2 also strips (MASSAGEHOST_PATTERN ^www\d*\.)
        ("http://www2.a.example/p", "http://www.a.example/", "R", True),
    ]
    df = spark.createDataFrame(
        [(u, v, h) for u, v, h, _ in rows], ["url", "via", "hops"]
    )
    got = [
        r[0]
        for r in df.select(
            add_redirect_from_root_server_predicate(
                F.col("url"), F.col("via"), F.col("hops")
            )
        ).collect()
    ]
    assert got == [want for *_, want in rows]
