"""Per-host bandwidth throttle (DispositionProcessor.java:263-290,
maxPerHostBandwidthUsageKbSec): after fetching b content bytes a host
may not emit again before b*1000/(kb*1024) ms; effective wake =
max(politeness wake, bandwidth wake). Politeness is zeroed here so the
bandwidth term alone drives the round clock."""

from __future__ import annotations

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.oracle.simulator import simulate


def _cfg(kb: int) -> PolitenessConfig:
    return PolitenessConfig(
        delay_factor=0.0,
        min_delay_ms=0,
        max_delay_ms=0,
        max_per_host_kb_sec=kb,
    )


def test_oracle_bandwidth_drives_clock():
    fx = generate(hosts=3, docs_per_host=3, links_per_doc=2, seed=3)

    sim_free = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), _cfg(0))
    # zero politeness + no throttle → the logical clock never advances
    assert all(r["now_ms"] == 0 for r in sim_free.fetch_log)

    sim_bw = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), _cfg(1))
    assert any(r["now_ms"] > 0 for r in sim_bw.fetch_log)
    # same fetches either way — the throttle changes timing, not coverage
    assert sim_bw.url_seen == sim_free.url_seen


def test_engine_matches_oracle_bandwidth(spark, tmp_path):
    from heritrix_spark.plans.crawl import crawl

    fx = generate(hosts=3, docs_per_host=3, links_per_doc=2, seed=3)
    cfg = _cfg(1)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)
    assert any(r["now_ms"] > 0 for r in sim.fetch_log)

    paths = write_parquet(fx, str(tmp_path / "fx"))
    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store"), docs, seeds, robots, cfg)

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
