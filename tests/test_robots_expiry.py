"""Robots expiry: engine vs oracle equality when robots.txt goes stale.

Reference semantics under test (SURVEY.md §3.2 FetchChain):
- CrawlServer.isRobotsExpired (modules/.../net/CrawlServer.java:308-323):
  never-fetched counts as expired; validity 0 = valid forever; otherwise
  expired iff robotsFetched + validityDuration < now (strict);
- PreconditionEnforcer.considerRobotsPreconditions (:219-236): an
  emission whose host's robots stamp is expired is DEFERRED and the
  robots URI is re-force-scheduled "even though its already crawled"
  (markPrerequisite + addForce bypassing the seen set);
- CrawlServer.updateRobots (:138): any completed robots fetch re-stamps
  the host, so directives gate fetches again until the next expiry.
"""

from __future__ import annotations

from heritrix_spark.constants import S_DEFERRED, PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.oracle.simulator import simulate
from heritrix_spark.plans.crawl import crawl

# Small enough that hosts' robots stamps lapse mid-crawl, but larger
# than the fixture's largest politeness snooze (crawl_delay up to 20 s):
# a validity below the politeness delay livelocks the host — robots is
# already re-expired at every wake, so the blocked URI re-defers forever.
# The reference has the same pathology (no deferral cap anywhere:
# CrawlURI.getDeferrals() is never consulted by heritrix3); the guard in
# both is the crawl-level round/activity bound.
VALIDITY_MS = 30000


def test_oracle_expiry_semantics():
    """The oracle alone: stale robots re-defers and re-fetches per host."""
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=11)
    cfg = PolitenessConfig(robots_prereq=True, robots_validity_ms=VALIDITY_MS)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)

    robots_rows = [
        r for r in sim.fetch_log if r["canon_url"].endswith("/robots.txt")
    ]
    by_host: dict[str, list] = {}
    for r in robots_rows:
        by_host.setdefault(r["class_key"], []).append(r)
    # at least one host re-fetched its robots after expiry
    assert any(len(v) > 1 for v in by_host.values()), {
        k: len(v) for k, v in by_host.items()
    }

    # deferrals happen AFTER a host's first robots fetch (i.e. expiry
    # deferrals, not just the never-fetched kind)
    first_robots_round = {
        ck: min(r["round"] for r in v) for ck, v in by_host.items()
    }
    late_defers = [
        r
        for r in sim.fetch_log
        if r["fetch_status"] == S_DEFERRED
        and r["round"] > first_robots_round.get(r["class_key"], 10**9)
    ]
    assert late_defers

    # re-forced robots rows keep hop 'P' and never appear twice in
    # url_seen (set semantics — membership, not multiset)
    assert all(r["hops_path"].endswith("P") for r in robots_rows if r["hops_path"])
    robots_canon = {r["canon_url"] for r in robots_rows}
    assert robots_canon <= sim.url_seen

    # validity 0 = valid forever: no late defers at all
    sim0 = simulate(
        fx.doc_map(), fx.seeds, fx.robots_map(),
        PolitenessConfig(robots_prereq=True, robots_validity_ms=0),
    )
    robots0 = [
        r for r in sim0.fetch_log if r["canon_url"].endswith("/robots.txt")
    ]
    per_host0: dict[str, int] = {}
    for r in robots0:
        per_host0[r["class_key"]] = per_host0.get(r["class_key"], 0) + 1
    assert all(n == 1 for n in per_host0.values())


def test_engine_matches_oracle_with_expiry(spark, tmp_path):
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=11)
    cfg = PolitenessConfig(robots_prereq=True, robots_validity_ms=VALIDITY_MS)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)
    # the fixture must actually exercise expiry, not just first-fetch
    robots_fetches = sum(
        1 for r in sim.fetch_log if r["canon_url"].endswith("/robots.txt")
    )
    robots_hosts = len(
        {r["class_key"] for r in sim.fetch_log
         if r["canon_url"].endswith("/robots.txt")}
    )
    assert robots_fetches > robots_hosts

    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store"), docs, seeds, robots, cfg)

    got_seen = {r["canon_url"] for r in result.url_seen().collect()}
    assert got_seen == sim.url_seen
    # re-forced robots scheduling must not duplicate seen rows
    assert result.url_seen().count() == len(sim.url_seen)

    got_log = [
        r.asDict()
        for r in result.fetch_log().orderBy("round", "class_key", "ordinal").collect()
    ]
    exp_log = sorted(
        sim.fetch_log, key=lambda r: (r["round"], r["class_key"], r["ordinal"])
    )
    assert len(got_log) == len(exp_log), (
        f"fetch count: engine {len(got_log)} vs oracle {len(exp_log)}"
    )
    for g, e in zip(got_log, exp_log):
        assert g == e, f"fetch_log row mismatch:\n engine {g}\n oracle {e}"

    assert result.frontier().count() == 0
