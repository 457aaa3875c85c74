"""RobotsPolicy family — FirstNamedRobotsPolicyTest re-expressed, plus
backend agreement between the Column fold and the Python twins.

Golden source: FirstNamedRobotsPolicyTest.java:12-76 (sampleRobots1 +
testDecisionsByListedCandidates), RobotstxtTest sample semantics.
"""

from __future__ import annotations

import pytest

from heritrix_spark.functions.robots_parse import parse_robots
from heritrix_spark.operators.robots_policy import (
    custom_allows_py,
    first_named_allows_py,
    ignore_allows_py,
    most_favored_allows_py,
    obey_allows_py,
    obeys_meta_nofollow,
    policy_group_rows,
)

SAMPLE_ROBOTS1 = (
    "User-agent: *\n"
    "Disallow: /cgi-bin/\n"
    "Disallow: /details/software\n"
    "\n"
    "User-agent: denybot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: allowbot1\n"
    "Disallow: \n"
    "\n"
    "User-agent: allowbot2\n"
    "Disallow: /foo\n"
    "\n"
    "User-agent: delaybot\n"
    "Disallow: /\n"
    "Crawl-Delay: 20\n"
    "Allow: /images/\n"
)


@pytest.fixture(scope="module")
def robots():
    return parse_robots(SAMPLE_ROBOTS1)


def test_decisions_by_listed_candidates(robots):
    # FirstNamedRobotsPolicyTest.testDecisionsByListedCandidates
    candidates = ["unnamedBot", "allowbot2"]
    path = "/cgi-bin/whatever"
    # disallowed by immediate match on primary user-agent disallow-all
    allowed, masq = first_named_allows_py(robots, "denybot", path, candidates)
    assert not allowed and masq is None
    # allowed by immediate match on primary user-agent allow-all
    allowed, masq = first_named_allows_py(
        robots, "allowbot1", path, candidates)
    assert allowed and masq is None  # no custom user-agent assigned
    # allowed by specific allowbot2 rules tried 3rd, UA adopted
    allowed, masq = first_named_allows_py(robots, "goodbot", path, candidates)
    assert allowed and masq == "allowbot2"
    # disallowed by specific allowbot2 directive tried 3rd
    allowed, masq = first_named_allows_py(robots, "goodbot", "/foo",
                                          candidates)
    assert not allowed and masq == "allowbot2"
    # shouldMasquerade=false never adopts
    allowed, masq = first_named_allows_py(
        robots, "goodbot", path, candidates, should_masquerade=False)
    assert allowed and masq is None


def test_first_named_wildcard_fallback(robots):
    # no named group for UA or candidates -> primary fallback (wildcard)
    allowed, masq = first_named_allows_py(
        robots, "nobody", "/cgi-bin/x", ["alsonobody"])
    assert not allowed and masq is None
    allowed, _ = first_named_allows_py(
        robots, "nobody", "/public/x", ["alsonobody"])
    assert allowed


def test_obey_and_ignore(robots):
    assert not obey_allows_py(robots, "denybot", "/anything")
    assert obey_allows_py(robots, "allowbot1", "/anything")
    # unnamed UA falls to wildcard
    assert not obey_allows_py(robots, "somebot", "/cgi-bin/x")
    assert obey_allows_py(robots, "somebot", "/ok.html")
    assert ignore_allows_py(robots, "denybot", "/anything")
    assert obeys_meta_nofollow("obey")
    assert not obeys_meta_nofollow("ignore")


def test_most_favored(robots):
    candidates = ["denybot", "allowbot2"]
    # primary allowed immediately -> no masquerade
    allowed, masq = most_favored_allows_py(
        robots, "allowbot1", "/cgi-bin/x", candidates)
    assert allowed and masq is None
    # primary (wildcard) refused; allowbot2 allows -> masquerade
    allowed, masq = most_favored_allows_py(
        robots, "somebot", "/cgi-bin/x", candidates)
    assert allowed and masq == "allowbot2"
    # nobody allows /foo for denybot primary + denybot candidate
    allowed, masq = most_favored_allows_py(
        robots, "denybot", "/foo", ["delaybot"])
    assert not allowed and masq is None
    # delaybot's Allow: /images/ outweighs its Disallow: /
    allowed, masq = most_favored_allows_py(
        robots, "denybot", "/images/x.gif", ["delaybot"])
    assert allowed and masq == "delaybot"


def test_custom_policy(robots):
    custom = parse_robots("User-agent: *\nDisallow: /private/\n")
    # the server's deny-all for denybot is ignored; custom rules decide
    assert custom_allows_py(custom, "denybot", "/anything")
    assert not custom_allows_py(custom, "denybot", "/private/x")


def test_column_fold_matches_python_twins(spark, robots):
    from pyspark.sql import functions as F

    from heritrix_spark.operators.robots_policy import (
        first_named_allows_col,
        first_named_masquerade_col,
        most_favored_allows_col,
        most_favored_masquerade_col,
    )

    candidates = ["unnamedBot", "allowbot2"]
    agents = ["denybot", "allowbot1", "goodbot", "somebot", "delaybot"]
    paths = ["/cgi-bin/whatever", "/foo", "/images/x.gif", "/ok.html"]

    dim = {ua: policy_group_rows({"h": SAMPLE_ROBOTS1}, ua, candidates)[0]
           for ua in agents}
    rows = [
        {"ua": ua, "path": p, "groups": dim[ua]["groups"],
         "wc_allows": dim[ua]["wc_allows"],
         "wc_disallows": dim[ua]["wc_disallows"]}
        for ua in agents for p in paths
    ]
    schema = (
        "ua string, path string, "
        "groups array<struct<agent:string,named:boolean,"
        "allows:array<string>,disallows:array<string>>>, "
        "wc_allows array<string>, wc_disallows array<string>"
    )
    df = spark.createDataFrame(rows, schema)
    g, wa, wd, p = (F.col("groups"), F.col("wc_allows"),
                    F.col("wc_disallows"), F.col("path"))
    got = {
        (r["ua"], r["path"]): r
        for r in df.select(
            "ua", "path",
            first_named_allows_col(g, wa, wd, p).alias("fn"),
            first_named_masquerade_col(g).alias("fn_masq"),
            most_favored_allows_col(g, wa, wd, p).alias("mf"),
            most_favored_masquerade_col(g, wa, wd, p).alias("mf_masq"),
        ).collect()
    }
    for ua in agents:
        for path in paths:
            r = got[(ua, path)]
            fn, fn_masq = first_named_allows_py(robots, ua, path, candidates)
            mf, mf_masq = most_favored_allows_py(robots, ua, path, candidates)
            assert r["fn"] == fn, (ua, path)
            assert r["fn_masq"] == fn_masq, (ua, path)
            assert r["mf"] == mf, (ua, path)
            assert r["mf_masq"] == mf_masq, (ua, path)
