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
