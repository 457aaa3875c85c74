"""End-to-end equality: Spark engine vs the pure-Python oracle simulator
(the north-star gate: URL-seen membership equality + per-host fetch-order
equality + full fetch_log row equality under the same seeds and
politeness budget)."""

from __future__ import annotations

import pytest

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.oracle.simulator import simulate
from heritrix_spark.plans.crawl import crawl


@pytest.fixture(scope="module")
def fixture_small(tmp_path_factory):
    fx = generate(hosts=4, docs_per_host=4, links_per_doc=3, seed=7)
    out = tmp_path_factory.mktemp("fx_small")
    paths = write_parquet(fx, str(out))
    return fx, paths


def test_engine_matches_oracle(spark, fixture_small, tmp_path):
    fx, paths = fixture_small
    cfg = PolitenessConfig()

    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)
    assert sim.rounds > 3 and len(sim.fetch_log) > 10  # fixture is non-trivial

    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store"), docs, seeds, robots, cfg)

    # --- URL-seen membership equality
    got_seen = {r["canon_url"] for r in result.url_seen().collect()}
    assert got_seen == sim.url_seen

    # --- full fetch_log equality (covers ordering, clock, statuses,
    #     dispositions, delays, ordinals, hops paths)
    got_log = [
        r.asDict()
        for r in result.fetch_log()
        .orderBy("round", "class_key", "ordinal")
        .collect()
    ]
    exp_log = sorted(
        sim.fetch_log, key=lambda r: (r["round"], r["class_key"], r["ordinal"])
    )
    assert len(got_log) == len(exp_log), (
        f"fetch count: engine {len(got_log)} vs oracle {len(exp_log)}"
    )
    for g, e in zip(got_log, exp_log):
        assert g == e, f"fetch_log row mismatch:\n engine {g}\n oracle {e}"

    # --- per-host fetch order equality (explicit, though implied above)
    got_order: dict[str, list[str]] = {}
    for r in sorted(got_log, key=lambda r: (r["round"],)):
        got_order.setdefault(r["class_key"], []).append(r["canon_url"])
    assert got_order == sim.per_host_order()

    # --- frontier drained
    assert result.frontier().count() == 0


def test_engine_matches_oracle_with_retries(spark, fixture_small, tmp_path):
    """Flaky-first-attempt mode: S_CONNECT_FAILED retries (expend cost,
    900 s snooze, re-enqueue with same ordinal) must match the oracle."""
    fx, paths = fixture_small
    cfg = PolitenessConfig(flaky_first_attempt=True)

    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)
    assert any(r["disposition"] == "retry" for r in sim.fetch_log)

    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store_flaky"), docs, seeds, robots, cfg)

    got_log = [
        r.asDict()
        for r in result.fetch_log().orderBy("round", "class_key", "ordinal").collect()
    ]
    exp_log = sorted(
        sim.fetch_log, key=lambda r: (r["round"], r["class_key"], r["ordinal"])
    )
    assert len(got_log) == len(exp_log)
    for g, e in zip(got_log, exp_log):
        assert g == e, f"fetch_log row mismatch:\n engine {g}\n oracle {e}"
    assert {r["canon_url"] for r in result.url_seen().collect()} == sim.url_seen


def test_engine_matches_oracle_bounded_activation(spark, fixture_small, tmp_path):
    """Queue-precedence-ordered bounded activation (max 2 hosts/round,
    highest_uri policy) must match the oracle exactly."""
    fx, paths = fixture_small
    cfg = PolitenessConfig(
        queue_precedence_policy="highest_uri", max_hosts_per_round=2
    )
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)
    sim_unbounded = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), PolitenessConfig())
    assert sim.rounds > sim_unbounded.rounds  # throttling is observable

    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store_bounded"), docs, seeds, robots, cfg)

    got_log = [
        r.asDict()
        for r in result.fetch_log().orderBy("round", "class_key", "ordinal").collect()
    ]
    exp_log = sorted(
        sim.fetch_log, key=lambda r: (r["round"], r["class_key"], r["ordinal"])
    )
    assert len(got_log) == len(exp_log)
    for g, e in zip(got_log, exp_log):
        assert g == e, f"fetch_log row mismatch:\n engine {g}\n oracle {e}"


def test_precedence_floor_blocks_everything(spark, fixture_small, tmp_path):
    """highest_uri precedence = base(3) + uri precedence(1) = 4; a floor
    of 4 makes every queue ineligible → crawl ends after seeding."""
    fx, paths = fixture_small
    cfg = PolitenessConfig(queue_precedence_policy="highest_uri", precedence_floor=4)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)
    assert len(sim.fetch_log) == 0

    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store_floor"), docs, seeds, robots, cfg)
    assert result.rounds == 0
    assert result.fetch_log().count() == 0


def test_engine_matches_oracle_with_recrawl(spark, fixture_small, tmp_path):
    """futureUris analog: successful seeds reschedule once (1h later,
    attempts reset, same ordinal) and the whole timeline must match."""
    fx, paths = fixture_small
    cfg = PolitenessConfig(recrawl_interval_ms=3_600_000, max_recrawls=1)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)
    seeds_twice = [r for r in sim.fetch_log if r["hops_path"] == ""]
    assert len(seeds_twice) > len(fx.seeds)  # recrawls happened

    docs = spark.read.parquet(paths["docs"])
    seeds = spark.read.parquet(paths["seeds"])
    robots = spark.read.parquet(paths["robots"])
    result = crawl(spark, str(tmp_path / "store_recrawl"), docs, seeds, robots, cfg)

    got_log = [
        r.asDict()
        for r in result.fetch_log()
        .orderBy("round", "class_key", "ordinal", "now_ms")
        .collect()
    ]
    exp_log = sorted(
        sim.fetch_log,
        key=lambda r: (r["round"], r["class_key"], r["ordinal"], r["now_ms"]),
    )
    assert len(got_log) == len(exp_log)
    for g, e in zip(got_log, exp_log):
        assert g == e, f"fetch_log row mismatch:\n engine {g}\n oracle {e}"
