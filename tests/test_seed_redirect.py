"""seedsRedirectNewSeeds: redirect targets of seeds become seeds.

Reference semantics under test (CandidatesProcessor.java):
- :183-188 — a candidate discovered from a seed via a REFER ('R') hop
  with hop count < SEEDS_REDIRECT_NEW_SEEDS_MAX_HOPS (5) is marked a
  seed (the reference defaults this ON);
- checkForSeedPromotion :218-237 — the promoted candidate's
  schedulingDirective bumps NORMAL→MEDIUM, it is force-fetched past the
  seen set (HER-1891: "guarantee crawling of seed version ... even if
  same url has already been enqueued"), and SeedModule.addSeed fires;
- SeedListener.addedSeed → SurtPrefixedDecideRule.java:236-240 — the
  new seed's implied-domain SURT prefix joins the crawl scope (here:
  effective from the next round, the round-discretized listener).
"""

from __future__ import annotations

from heritrix_spark.constants import MEDIUM, PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.oracle.simulator import simulate
from heritrix_spark.plans.crawl import crawl

CFG_ON = PolitenessConfig(seeds_redirect_new_seeds=True, source_tag_seeds=True)


def test_oracle_promotion_widens_scope():
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=7,
                  seed_redirect=True)
    sim_on = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), CFG_ON)
    sim_off = simulate(
        fx.doc_map(), fx.seeds, fx.robots_map(),
        PolitenessConfig(source_tag_seeds=True),
    )

    target = "http://redirtarget.example/t0.html"
    deep = "http://redirtarget.example/t1.html"

    # both crawls reach the redirect target itself (trailing-'R'
    # transclusion admits it regardless of promotion)...
    assert target in sim_on.url_seen and target in sim_off.url_seen
    # ...but only the promoted crawl follows its 'RL' children
    assert deep in sim_on.url_seen
    assert deep not in sim_off.url_seen

    # the promoted row is a seed with MEDIUM directive and hop path 'R'
    promoted = [
        r for r in sim_on.fetch_log
        if r["canon_url"] == target and r["is_seed"]
    ]
    assert promoted and all(r["directive"] == MEDIUM for r in promoted)
    assert all(r["hops_path"] == "R" for r in promoted)
    # heritable source survives promotion (tag = the ORIGINAL seed)
    seedr = f"http://host000.example/seedr.html"
    assert all(r["source"] == seedr for r in promoted)

    # off: the target row exists but is not a seed
    off_rows = [r for r in sim_off.fetch_log if r["canon_url"] == target]
    assert off_rows and not any(r["is_seed"] for r in off_rows)


def test_oracle_force_refetch_of_already_seen_target():
    """HER-1891: the promoted seed is force-fetched even when its URL
    was already crawled — two fetch rows, one url_seen member."""
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=7,
                  seed_redirect=True)
    # schedule the redirect TARGET as an ordinary seed first, so it is
    # crawled (and seen) before the redirecting seed 301s to it
    target = "http://redirtarget.example/t0.html"
    fx.seeds = [{"url": target, "seq": 0}] + [
        {"url": s["url"], "seq": i + 1} for i, s in enumerate(fx.seeds)
    ]
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), CFG_ON)
    target_rows = [r for r in sim.fetch_log if r["canon_url"] == target]
    assert len(target_rows) >= 2  # original seed fetch + forced re-fetch
    assert sum(1 for u in sim.url_seen if u == target) == 1


def test_engine_matches_oracle_with_seed_redirect(spark, tmp_path):
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=7,
                  seed_redirect=True)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), CFG_ON)
    deep = "http://redirtarget.example/t1.html"
    assert deep in sim.url_seen  # fixture really exercises scope widening

    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store"), docs, seeds, robots, CFG_ON)

    got_seen = {r["canon_url"] for r in result.url_seen().collect()}
    assert got_seen == sim.url_seen

    got = [
        r.asDict()
        for r in result.fetch_log().orderBy("round", "class_key", "ordinal").collect()
    ]
    exp = sorted(sim.fetch_log, key=lambda r: (r["round"], r["class_key"], r["ordinal"]))
    assert len(got) == len(exp), f"engine {len(got)} vs oracle {len(exp)}"
    for g, e in zip(got, exp):
        assert g == e, f"fetch_log row mismatch:\n engine {g}\n oracle {e}"
    assert result.frontier().count() == 0


def test_engine_resume_preserves_widened_scope(spark, tmp_path):
    """Kill after the promotion round and resume: the widened scope is
    read back from the manifest and the final state is bit-identical."""
    fx = generate(hosts=4, docs_per_host=3, links_per_doc=2, seed=7,
                  seed_redirect=True)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), CFG_ON)

    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    store = str(tmp_path / "store")
    crawl(spark, store, docs, seeds, robots, CFG_ON, stop_after_round=3)
    result = crawl(spark, store, docs, seeds, robots, CFG_ON)  # resume

    got_seen = {r["canon_url"] for r in result.url_seen().collect()}
    assert got_seen == sim.url_seen
    got = [
        r.asDict()
        for r in result.fetch_log().orderBy("round", "class_key", "ordinal").collect()
    ]
    exp = sorted(sim.fetch_log, key=lambda r: (r["round"], r["class_key"], r["ordinal"]))
    assert [
        (g["round"], g["canon_url"], g["fetch_status"]) for g in got
    ] == [(e["round"], e["canon_url"], e["fetch_status"]) for e in exp]
