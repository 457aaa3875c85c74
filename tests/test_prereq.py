"""Robots prerequisite chain: engine vs oracle equality.

Reference semantics under test (SURVEY.md §3.2 FetchChain):
- PreconditionEnforcer.considerRobotsPreconditions
  (engine/.../prefetch/PreconditionEnforcer.java:203-245): a host's
  first emission before its robots.txt has been fetched is deferred
  (S_DEFERRED) and http://host/robots.txt is force-scheduled;
- CrawlURI.markPrerequisite (:1875-1896): prereq hop 'P', directive =
  max(parent-1, HIGHEST), forceFetch (addForce bypasses the seen set);
- deferral re-enqueues without snoozing (retryDelayFor :836-841 → 0)
  and without charging cost (processFinish :976 "unless DEFERRED"),
  counting deferrals separately from attempts (CrawlURI.java:173-174);
- any completed robots fetch stamps the host (CrawlServer.updateRobots
  :138; 404 = allow-all) and only then do directives gate fetches.
"""

from __future__ import annotations

from heritrix_spark.constants import S_DEFERRED, PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.oracle.simulator import simulate
from heritrix_spark.plans.crawl import crawl


def test_oracle_prereq_semantics():
    """The oracle alone: robots.txt precedes every real fetch per host."""
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=11)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(),
                   PolitenessConfig(robots_prereq=True))

    deferred = [r for r in sim.fetch_log if r["fetch_status"] == S_DEFERRED]
    robots_rows = [r for r in sim.fetch_log if r["canon_url"].endswith("/robots.txt")]
    assert deferred and robots_rows

    # per host: first non-deferred fetch is the robots.txt prereq
    first_real: dict[str, dict] = {}
    for r in sim.fetch_log:
        if r["fetch_status"] == S_DEFERRED:
            continue
        first_real.setdefault(r["class_key"], r)
    for ck, r in first_real.items():
        assert r["canon_url"].endswith("/robots.txt"), (ck, r)
        assert r["hops_path"].endswith("P")

    # prereq directive = parent directive - 1 (parent seeds are NORMAL=3)
    seed_prereqs = [r for r in robots_rows if r["hops_path"] == "P"]
    assert seed_prereqs and all(r["directive"] == 2 for r in seed_prereqs)

    # deferral charges nothing and does not snooze
    assert all(r["politeness_delay_ms"] == 0 for r in deferred)
    assert all(r["disposition"] == "retry" for r in deferred)


def test_engine_matches_oracle_with_prereq(spark, tmp_path):
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=11)
    cfg = PolitenessConfig(robots_prereq=True)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)
    assert any(r["fetch_status"] == S_DEFERRED for r in sim.fetch_log)

    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store"), docs, seeds, robots, cfg)

    got_seen = {r["canon_url"] for r in result.url_seen().collect()}
    assert got_seen == sim.url_seen
    # forced prereq scheduling must not duplicate seen rows
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
