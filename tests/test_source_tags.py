"""Seed source-tag attribution + the two reports that consume it.

Reference semantics under test:
- SeedModule.sourceTagSeeds (modules/.../seeds/SeedModule.java:40-46)
  with TextSeedModule.announceSeeds :181 setting each seed's own URI
  string as its tag;
- CrawlURI.setSourceTag :1503-1505 makeHeritable — the tag is copied to
  every child candidate (L/E/X/R/I outlinks and 'P' prerequisites);
- SourceTagsReport.java:35-65 / StatisticsTracker.saveSourceStats
  :765-780 — (source, host) tallies of successful fetches;
- SeedsReport.java:38-70 / SeedRecord — most-recent processing status,
  CRAWLED iff code > 0, redirect on 301/302.
"""

from __future__ import annotations

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.oracle.simulator import simulate
from heritrix_spark.operators.reports import seeds_report, source_tags_report
from heritrix_spark.plans.crawl import crawl


def test_oracle_source_inheritance():
    """Every fetched URI carries the seed URL it transitively came from;
    disabled ⇒ all-null."""
    fx = generate(hosts=5, docs_per_host=4, links_per_doc=3, seed=3)
    sim = simulate(
        fx.doc_map(), fx.seeds, fx.robots_map(),
        PolitenessConfig(source_tag_seeds=True),
    )
    seed_urls = {s["url"] for s in fx.seeds}
    assert all(r["source"] in seed_urls for r in sim.fetch_log)
    # seeds tag themselves
    for r in sim.fetch_log:
        if r["hops_path"] == "":
            assert r["source"] == r["url"]
    # at least one multi-hop discovery inherited a tag
    assert any(len(r["hops_path"]) >= 2 for r in sim.fetch_log)

    sim_off = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), PolitenessConfig())
    assert all(r["source"] is None for r in sim_off.fetch_log)


def test_oracle_source_inheritance_through_prereq():
    """'P' prerequisite rows (robots.txt) inherit the deferring URI's
    source — makeHeritable applies to markPrerequisite children too."""
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=5)
    sim = simulate(
        fx.doc_map(), fx.seeds, fx.robots_map(),
        PolitenessConfig(source_tag_seeds=True, robots_prereq=True),
    )
    robots_rows = [r for r in sim.fetch_log if r["hops_path"].endswith("P")]
    assert robots_rows
    seed_urls = {s["url"] for s in fx.seeds}
    assert all(r["source"] in seed_urls for r in robots_rows)


def test_engine_matches_oracle_with_source_tags(spark, tmp_path):
    fx = generate(hosts=5, docs_per_host=4, links_per_doc=3, seed=3)
    cfg = PolitenessConfig(source_tag_seeds=True)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)

    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store"), docs, seeds, robots, cfg)

    got = [
        r.asDict()
        for r in result.fetch_log().orderBy("round", "class_key", "ordinal").collect()
    ]
    exp = sorted(sim.fetch_log, key=lambda r: (r["round"], r["class_key"], r["ordinal"]))
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g == e, f"fetch_log row mismatch:\n engine {g}\n oracle {e}"

    # ---- source_tags_report law vs a hand tally of the oracle log
    import re

    tally: dict[tuple[str, str], int] = {}
    for r in sim.fetch_log:
        if r["disposition"] == "success" and r["source"] is not None:
            host = re.match(r"^\w+://([^/:]+)", r["canon_url"]).group(1)
            tally[(r["source"], host)] = tally.get((r["source"], host), 0) + 1
    got_tally = {
        (r["source"], r["host"]): r["n_urls"]
        for r in source_tags_report(result.fetch_log()).collect()
    }
    assert got_tally == tally


def test_seeds_report_redirect_and_notcrawled(spark, tmp_path):
    """A seed pointing at a redirect doc reports its Location; a seed
    with no doc reports 404 CRAWLED; code ordering is descending."""
    fx = generate(hosts=6, docs_per_host=4, links_per_doc=2, seed=9)
    # replace the generated seeds: one regular page, one redirect doc,
    # one URL with no doc behind it (404)
    redirect_doc = next(
        d for d, spans in fx.doc_map().items()
        if spans and spans[0]["kind"] == "redirect"
    )
    regular_doc = next(
        d for d, spans in fx.doc_map().items()
        if spans and spans[0]["kind"] != "redirect"
    )
    host = regular_doc.split("/")[2]
    fx.seeds = [
        {"url": regular_doc, "seq": 0},
        {"url": redirect_doc, "seq": 1},
        {"url": f"http://{host}/definitely-missing.html", "seq": 2},
    ]
    cfg = PolitenessConfig(source_tag_seeds=True)
    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store"), docs, seeds, robots, cfg)

    rows = seeds_report(result.fetch_log(), docs).collect()
    by_seed = {r["seed"]: r for r in rows}
    assert len(rows) == 3

    rd = by_seed[redirect_doc]
    assert rd["status_code"] == 301 and rd["status"] == "CRAWLED"
    assert rd["redirect"] == fx.doc_map()[redirect_doc][0]["media_ref"]

    ok = by_seed[regular_doc]
    assert ok["status_code"] == 200 and ok["redirect"] is None

    missing = by_seed[f"http://{host}/definitely-missing.html"]
    assert missing["status_code"] == 404 and missing["status"] == "CRAWLED"
    assert missing["redirect"] is None

    # report order: status code descending (SeedRecord.sortShiftStatusCode)
    codes = [r["status_code"] for r in rows]
    assert codes == sorted(codes, reverse=True)
