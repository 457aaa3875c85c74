"""robots.txt parser goldens (RobotstxtTest.java:31-170)."""

from __future__ import annotations

from heritrix_spark.functions.robots_parse import parse_robots
from heritrix_spark.operators.politeness import robots_allows_py

SAMPLE1 = """User-agent: *
Disallow: /cgi-bin/
Disallow: /details/software

User-agent: denybot
Disallow: /

User-agent: allowbot1
Disallow:

User-agent: allowbot2
Disallow: /foo
Allow: /

User-agent: delaybot
Disallow: /
Crawl-Delay: 20
Allow: /images/
"""

WHITESPACE_FLAWED = "\n".join(
    " " + line if line else line for line in SAMPLE1.splitlines()
)


def _allows(r, ua, path):
    d = r.directives_for(ua)
    return robots_allows_py(d.allows, d.disallows, path)


def test_parse_basic():
    r = parse_robots("BLAH")
    assert not r.has_errors and r.named == []

    r = parse_robots("User-agent: archive.org_bot\nDisallow: /cgi-bin/\nDisallow: /details/software\n")
    assert r.named == ["archive.org_bot"]
    assert not r.has_errors

    r = parse_robots("User-agent: *\nDisallow: /cgi-bin/\n")
    assert r.named == [] and r.wildcard is not None


def _eval(r):
    # (RobotstxtTest.evalRobots)
    assert _allows(r, "Mozilla allowbot1 99.9", "/path")
    assert _allows(r, "Mozilla allowbot1 99.9", "/")
    assert _allows(r, "Mozilla allowbot2 99.9", "/path")
    assert _allows(r, "Mozilla allowbot2 99.9", "/")
    assert not _allows(r, "Mozilla allowbot2 99.9", "/foo")
    assert not _allows(r, "Mozilla denybot 99.9", "/path")
    assert not _allows(r, "Mozilla denybot 99.9", "/")
    assert _allows(r, "Mozilla anonbot 99.9", "/path")
    assert not _allows(r, "Mozilla anonbot 99.9", "/cgi-bin/foo.pl")
    assert r.directives_for("Mozilla denybot 99.9").crawl_delay == -1.0
    assert r.directives_for("Mozilla delaybot 99.9").crawl_delay == 20.0


def test_valid_robots():
    _eval(parse_robots(SAMPLE1))


def test_whitespace_flawed_robots():
    _eval(parse_robots(WHITESPACE_FLAWED))


def test_html_markup_and_comments():
    r = parse_robots(
        "<HTML><HEAD>\n"
        "User-agent: * # catchall\n"
        "Disallow: /cgi/\n"
        "</HEAD></HTML>\n"
    )
    assert not _allows(r, "anybot", "/cgi/x")
    assert _allows(r, "anybot", "/ok")


def test_trailing_star_tolerated():
    r = parse_robots("User-agent: *\nDisallow: /private*\n")
    assert not _allows(r, "bot", "/private/x")
    assert _allows(r, "bot", "/public")


def test_agent_substring_match_order():
    r = parse_robots(
        "User-agent: aaa\nDisallow: /a\n\nUser-agent: bot\nDisallow: /b\n"
    )
    # 'bot' matches 'mybot 1.0' by substring; 'aaa' declared first but no match
    d = r.directives_for("mybot 1.0")
    assert d.disallows == ["/b"]


def test_shared_groups():
    r = parse_robots(
        "User-agent: one\nUser-agent: two\nDisallow: /shared\n"
    )
    assert r.directives_for("one").disallows == ["/shared"]
    assert r.directives_for("two").disallows == ["/shared"]
    assert r.directives_for("one") is r.directives_for("two")
