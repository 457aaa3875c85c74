"""Snapshot time travel + rollback (store/snapstore.py): the Iceberg
read-as-of / rollback-to-snapshot analogs over the round-manifest
history, including the expire-snapshots boundary after compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.fixtures.gen import generate, write_parquet
from heritrix_spark.plans.crawl import crawl
from heritrix_spark.store.snapstore import SnapshotExpiredError, SnapStore


@pytest.fixture(scope="module")
def fx_paths(tmp_path_factory):
    fx = generate(hosts=3, docs_per_host=3, links_per_doc=2, seed=11)
    out = tmp_path_factory.mktemp("fx_tt")
    return write_parquet(fx, str(out))


def _log_rows(df):
    return sorted(tuple(sorted(r.asDict().items())) for r in df.collect())


def test_time_travel_reads_match_history(spark, fx_paths, tmp_path):
    cfg = PolitenessConfig()
    docs = spark.read.parquet(fx_paths["docs"])
    seeds = spark.read.parquet(fx_paths["seeds"])
    robots = spark.read.parquet(fx_paths["robots"])

    res = crawl(spark, str(tmp_path / "tt"), docs, seeds, robots, cfg)
    store = res.store
    snaps = store.snapshots()
    # round 0 = the seed-schedule commit, then one snapshot per round
    assert snaps == list(range(res.rounds + 1))

    full_log = res.fetch_log()
    for k in (1, max(2, res.rounds // 2)):
        asof = store.read("fetch_log", as_of_round=k)
        want = full_log.filter(F.col("round") <= k)
        assert _log_rows(asof) == _log_rows(want), f"as-of round {k}"
        # full-mode table (host_state) also resolves per snapshot
        assert store.read("host_state", as_of_round=k).count() > 0

    with pytest.raises(SnapshotExpiredError):
        store.read("fetch_log", as_of_round=res.rounds + 100)


def test_rollback_then_resume_bit_identical(spark, fx_paths, tmp_path):
    cfg = PolitenessConfig()
    docs = spark.read.parquet(fx_paths["docs"])
    seeds = spark.read.parquet(fx_paths["seeds"])
    robots = spark.read.parquet(fx_paths["robots"])

    full = crawl(spark, str(tmp_path / "full"), docs, seeds, robots, cfg)

    other = crawl(spark, str(tmp_path / "rb"), docs, seeds, robots, cfg)
    assert other.rounds == full.rounds
    other.store.rollback(3)
    assert other.store.manifest()["round"] == 3
    assert other.store.snapshots() == [0, 1, 2, 3]

    resumed = crawl(spark, str(tmp_path / "rb"), docs, seeds, robots, cfg)
    assert resumed.rounds == full.rounds
    assert _log_rows(resumed.fetch_log()) == _log_rows(full.fetch_log())
    assert sorted(r.canon_url for r in resumed.url_seen().collect()) == sorted(
        r.canon_url for r in full.url_seen().collect()
    )


def test_compaction_expires_snapshots(spark, tmp_path):
    store = SnapStore(str(tmp_path / "exp"), spark)
    df = spark.range(3).select(F.col("id").alias("v"))
    store.write_delta(df, "fetch_log", 1)
    store.commit_round(1, {})
    store.write_delta(df.withColumn("v", F.col("v") + 10), "fetch_log", 2)
    store.commit_round(2, {})
    assert store.snapshots() == [1, 2]
    assert store.read("fetch_log", as_of_round=1).count() == 3

    # compaction: the resolved view rewritten as round 3's only delta
    store.write_delta(store.read("fetch_log"), "fetch_log", 3, reset=True)
    store.commit_round(3, {})
    assert store.snapshots() == [3]
    assert store.read("fetch_log").count() == 6
    assert store.read("fetch_log", as_of_round=3).count() == 6
    with pytest.raises(SnapshotExpiredError):
        store.read("fetch_log", as_of_round=1)


def test_rollback_drops_newer_snapshots(spark, tmp_path):
    store = SnapStore(str(tmp_path / "rbd"), spark)
    df = spark.range(2).select(F.col("id").alias("v"))
    for r in (1, 2, 3, 4):
        store.write_delta(df.withColumn("v", F.col("v") + r), "fetch_log", r)
        store.commit_round(r, {})
    store.rollback(2)
    assert store.snapshots() == [1, 2]
    assert store.manifest()["round"] == 2
    assert store.read("fetch_log").count() == 4  # rounds 1+2 only


def test_compaction_crash_window_never_silently_partial(spark, tmp_path, monkeypatch):
    """Kill between the commit's snapshot-expiry unlink and the
    partition vacuum: expired history must already be GONE (as-of read
    raises) rather than retained-but-pointing-at-deleted-data (as-of
    read silently partial). Pins the unlink-before-vacuum ordering."""
    store = SnapStore(str(tmp_path / "cw"), spark)
    df = spark.range(3).select(F.col("id").alias("v"))
    store.write_delta(df, "fetch_log", 1)
    store.commit_round(1, {})
    store.write_delta(df, "fetch_log", 2)
    store.commit_round(2, {})

    calls = {"n": 0}

    def killed_vacuum(table, keep):  # the simulated SIGKILL point
        calls["n"] += 1
        raise RuntimeError("killed before vacuum")

    monkeypatch.setattr(store, "_vacuum", killed_vacuum)
    store.write_delta(store.read("fetch_log"), "fetch_log", 3, reset=True)
    with pytest.raises(RuntimeError):
        store.commit_round(3, {})
    assert calls["n"] == 1

    # manifest committed, expired snapshots unlinked, partitions orphaned
    assert store.manifest()["round"] == 3
    assert store.snapshots() == [3]
    assert store.read("fetch_log").count() == 6
    with pytest.raises(SnapshotExpiredError):
        store.read("fetch_log", as_of_round=1)
