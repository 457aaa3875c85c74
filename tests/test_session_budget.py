"""Session budget ("duty cycle") rotation under bounded activation.

Reference: WorkQueueFrontier.java:119-127 (balanceReplenishAmount),
WorkQueue.isOverSessionBudget :260-264, deactivateQueue :628-634,
activateInactiveQueue :753-786 (per-precedence FIFO reactivation).
A queue that spends past its session budget rotates to the back of the
activation line so other queues get the crawl slots — fairness across
more queues than toe threads. Here: max_hosts_per_round=1 is the
single-toe-thread analog; session_budget=3 with unit costs means a host
holds the slot for 4 emissions, then yields.
"""

from __future__ import annotations

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.oracle.simulator import simulate


def _cfg(session_budget: int = 3) -> PolitenessConfig:
    # zero politeness delay: the emitting host stays ready, so without
    # the session budget the (precedence, seq, class_key) tiebreak would
    # hand it the single slot forever — the exact starvation the
    # reference's duty cycle exists to break. (With nonzero delays the
    # min-wake round clock already rotates hosts naturally: an emitter
    # snoozes behind every still-ready host.)
    return PolitenessConfig(
        max_hosts_per_round=1,
        session_budget=session_budget,
        delay_factor=0.0,
        min_delay_ms=0,
        max_delay_ms=0,
    )


def test_oracle_duty_cycle_rotates():
    fx = generate(hosts=3, docs_per_host=5, links_per_doc=2, seed=5)
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), _cfg())

    emitting_hosts = [r["class_key"] for r in sim.fetch_log]
    switches = sum(
        1 for a, b in zip(emitting_hosts, emitting_hosts[1:]) if a != b
    )
    distinct = len(set(emitting_hosts))
    assert distinct >= 2 and switches >= 2, (distinct, switches)

    # golden rotation prefix: while all three hosts have work, each holds
    # the single slot for exactly session_budget+1 = 4 unit-cost
    # emissions before rotating to the back of the line
    assert emitting_hosts[:12] == (
        ["example,host000,"] * 4
        + ["example,host001,"] * 4
        + ["example,host002,"] * 4
    )

    # without the budget gate the slot-holder keeps the slot past the
    # 4-emission duty cycle (it yields only on queue-exhaustion grounds)
    sim_free = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), _cfg(10_000))
    free_hosts = [r["class_key"] for r in sim_free.fetch_log]
    assert free_hosts[:12] != emitting_hosts[:12]
    longest_free_run = max(
        len(list(g)) for _, g in __import__("itertools").groupby(free_hosts)
    ) if free_hosts else 0
    assert longest_free_run > _cfg().session_budget + 1


def test_engine_matches_oracle_duty_cycle(spark, tmp_path):
    from heritrix_spark.plans.crawl import crawl

    fx = generate(hosts=3, docs_per_host=5, links_per_doc=2, seed=5)
    cfg = _cfg()
    sim = simulate(fx.doc_map(), fx.seeds, fx.robots_map(), cfg)

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
    assert {r["canon_url"] for r in result.url_seen().collect()} == sim.url_seen
