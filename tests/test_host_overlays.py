"""Per-host sheet overlays (KeyedProperties analog): a host_config
dimension overrides politeness/budget settings for individual queues;
engine and oracle must stay row-identical under overlays."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.oracle.simulator import simulate
from heritrix_spark.plans.crawl import crawl

OVERLAYS = {
    # host000: 4x the global min delay and a tiny total budget
    "example,host000,": {"min_delay_ms": 12_000, "total_budget": 6},
    # host001: lower delay factor
    "example,host001,": {"delay_factor": 1.0},
}


def _fetch_log_rows(result):
    return sorted(
        (
            r["round"], r["now_ms"], r["class_key"], r["canon_url"],
            r["ordinal"], r["directive"], r["precedence"], r["fetch_status"],
            r["disposition"], r["cost"], r["politeness_delay_ms"], r["hops_path"],
        )
        for r in result.fetch_log().collect()
    )


def _oracle_rows(sim):
    return sorted(
        (
            e["round"], e["now_ms"], e["class_key"], e["canon_url"],
            e["ordinal"], e["directive"], e["precedence"], e["fetch_status"],
            e["disposition"], e["cost"], e["politeness_delay_ms"], e["hops_path"],
        )
        for e in sim.fetch_log
    )


def test_engine_matches_oracle_with_overlays(spark, tmp_path):
    fx = generate(hosts=4, docs_per_host=5, links_per_doc=3, seed=57)
    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    cfg = PolitenessConfig()

    host_config = spark.createDataFrame(
        [
            ("example,host000,", None, 12_000, None, 6, None),
            ("example,host001,", 1.0, None, None, None, None),
        ],
        "class_key string, delay_factor double, min_delay_ms int, "
        "max_delay_ms int, total_budget int, session_budget int",
    )

    result = crawl(
        spark,
        str(tmp_path / "store"),
        docs,
        seeds,
        robots,
        cfg,
        host_config=host_config,
    )
    sim = simulate(
        fx.doc_map(), fx.seeds, fx.robots_map(), cfg, host_config=OVERLAYS
    )

    assert _fetch_log_rows(result) == _oracle_rows(sim)
    engine_seen = sorted(r["canon_url"] for r in result.url_seen().collect())
    assert engine_seen == sorted(sim.url_seen)

    # the overlay had a visible effect: host000 retired under its tiny
    # budget while the global config would not have retired anyone
    hs = result.store.read("host_state")
    retired = {r["class_key"] for r in hs.filter(F.col("retired")).collect()}
    assert "example,host000," in retired
    # and host000's successful fetches waited at least its 12 s floor
    d = result.fetch_log().filter(
        (F.col("class_key") == "example,host000,")
        & (F.col("disposition") == "success")
    )
    assert d.filter(F.col("politeness_delay_ms") < 12_000).count() == 0
    assert d.count() > 0


def test_engine_matches_oracle_with_retry_scope_overlays(spark, tmp_path):
    """Round-5 widened sheet surface: per-host maxRetries /
    retryDelaySeconds (AbstractFrontier.java:104,116), per-host outlink
    cap (maxOutlinks :138) and per-SURT scope hop cap (TooManyHops
    maxHops) — engine and simulator must stay row-identical under a
    mixed-override fixture, with null cells falling through."""
    fx = generate(hosts=5, docs_per_host=6, links_per_doc=4, seed=91)
    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    # flaky first attempts exercise the retry path
    cfg = PolitenessConfig(flaky_first_attempt=True, retry_delay_s=20)

    overlays = {
        # host000: one retry only, short retry delay
        "example,host000,": {"max_retries": 1, "retry_delay_s": 2},
        # host001: extraction capped at 2 outlinks per page
        "example,host001,": {"max_outlinks": 2},
        # host002: nothing deeper than 1 hop enters the frontier
        "example,host002,": {"max_hops": 1},
        # host003: retry delay only; max_retries falls through
        "example,host003,": {"retry_delay_s": 5},
    }
    host_config = spark.createDataFrame(
        [
            ("example,host000,", 1.0, 2.0, None, None),
            ("example,host001,", None, None, 2.0, None),
            ("example,host002,", None, None, None, 1.0),
            ("example,host003,", None, 5.0, None, None),
        ],
        "class_key string, max_retries double, retry_delay_s double, "
        "max_outlinks double, max_hops double",
    )

    result = crawl(
        spark,
        str(tmp_path / "store"),
        docs,
        seeds,
        robots,
        cfg,
        host_config=host_config,
    )
    sim = simulate(
        fx.doc_map(), fx.seeds, fx.robots_map(), cfg, host_config=overlays
    )

    assert _fetch_log_rows(result) == _oracle_rows(sim)
    engine_seen = sorted(r["canon_url"] for r in result.url_seen().collect())
    assert engine_seen == sorted(sim.url_seen)

    # each overlay had a visible effect
    log = result.fetch_log()
    # host000: a flaky URL's second failure is terminal (failure, not
    # endless retries) and its one retry waited 2 s, not the global 20 s
    h0 = log.filter(F.col("class_key") == "example,host000,")
    assert h0.filter(F.col("disposition") == "retry").count() >= 1
    r0 = h0.filter(F.col("disposition") == "retry").collect()
    assert all(r["politeness_delay_ms"] == 2000 for r in r0)
    # host001: no page contributed more than 2 candidates; the frontier
    # never saw its 3rd/4th links
    h1_seen = [u for u in engine_seen if "host001" in u]
    assert 0 < len(h1_seen) < 1 + 6 * 4
    # host002: no pure navlink path deeper than 1 hop (an embed may
    # still enter past the cap — TransclusionDecideRule ACCEPTs after
    # TooManyHops in the last-matching-rule-wins fold)
    h2 = log.filter(
        (F.col("class_key") == "example,host002,")
        & (F.length("hops_path") > 1)
        & F.col("hops_path").rlike("^L+$")
    )
    assert h2.count() == 0
