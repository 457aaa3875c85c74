"""Reports, recovery-journal import/export, and hot-host salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.journal import (
    export_recover_log,
    import_recover_log,
    parse_recover_log,
)
from heritrix_spark.operators.reports import (
    average_queue_depth,
    hosts_report,
    response_code_report,
)
from heritrix_spark.operators.salt import desalt_col, salted_counts, salted_key_col


def _log(spark):
    rows = [
        # round, class_key, canon_url, fetch_status, disposition, hops_path
        (1, "a,", "http://a/1", 200, "success", ""),
        (1, "b,", "http://b/1", 404, "success", ""),
        (2, "a,", "http://a/2", -9998, "disregard", "L"),
        (3, "a,", "http://a/3", -2, "retry", "L"),
        (4, "a,", "http://a/3", 200, "success", "L"),
    ]
    return spark.createDataFrame(
        rows, ["round", "class_key", "canon_url", "fetch_status", "disposition", "hops_path"]
    )


def test_hosts_and_response_reports(spark):
    log = _log(spark)
    hosts = {r["class_key"]: r for r in hosts_report(log).collect()}
    assert hosts["a,"]["emitted"] == 4
    assert hosts["a,"]["succeeded"] == 2
    assert hosts["a,"]["disregarded"] == 1
    assert hosts["a,"]["retried"] == 1
    codes = {r["fetch_status"]: r["n"] for r in response_code_report(log).collect()}
    assert codes == {-9998: 1, -2: 1, 200: 2, 404: 1}


def test_journal_roundtrip(spark):
    lineage = spark.createDataFrame(
        [
            (0, "F+", "http://a/1", "a,", 0),
            (0, "F+", "http://a/2", "a,", 0),
            (1, "Fe", "http://a/1", "a,", 0),
            (1, "Fs", "http://a/1", "a,", 0),
        ],
        ["round", "tag", "canon_url", "class_key", "partition_id"],
    )
    lines = export_recover_log(lineage)
    parsed = parse_recover_log(spark, lines.select("line"))
    to_schedule, noted = import_recover_log(parsed)
    # a/1 finished → only noted; a/2 pending → rescheduled
    assert [r["canon_url"] for r in to_schedule.collect()] == ["http://a/2"]
    assert [r["canon_url"] for r in noted.collect()] == ["http://a/1"]

    none_sched, all_noted = import_recover_log(parsed, include_only=True)
    assert none_sched.count() == 0
    assert all_noted.count() == 2


def test_salted_counts_match_plain(spark):
    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 8, F.lit("hot,")).otherwise(F.lit("cold,")).alias(
            "class_key"
        ),
        F.concat(F.lit("http://h/seg"), (F.col("id") % 7).cast("string"),
                 F.lit("/p"), F.col("id").cast("string")).alias("url"),
    )
    got = {r["class_key"]: r["n_urls"] for r in salted_counts(df).collect()}
    exp = {
        r["class_key"]: r["cnt"]
        for r in df.groupBy("class_key").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == exp


def test_salt_desalt_roundtrip(spark):
    df = spark.createDataFrame(
        [("org,example,", "http://example.org/a/b"), ("org,x,", "http://x.org/")],
        ["class_key", "url"],
    )
    out = df.select(
        "class_key",
        desalt_col(salted_key_col(F.col("class_key"), F.col("url"))).alias("back"),
        salted_key_col(F.col("class_key"), F.col("url")).alias("salted"),
    ).collect()
    for r in out:
        assert r["back"] == r["class_key"]
        assert r["salted"].startswith(r["class_key"] + "#s")


def test_congestion_ratio(spark):
    """congestionRatio (WorkQueueFrontier :1564-1574): queues wanting
    attention per queue being serviced, on derived round-model states."""
    from heritrix_spark.operators.reports import congestion_ratio

    frontier = spark.createDataFrame(
        [("a,", 1), ("a,", 2), ("b,", 3), ("c,", 4)],
        ["class_key", "ordinal"],
    )
    host_state = spark.createDataFrame(
        [("a,", 0, False), ("b,", 5000, False), ("c,", 9000, False),
         ("d,", 0, False)],  # d has no pending rows → not counted
        ["class_key", "wake_time", "retired"],
    )
    row = congestion_ratio(frontier, host_state, now_ms=5000).collect()[0]
    # nonempty: a, b, c; ready (wake<=5000): a, b → 3/2
    assert row["nonempty_queues"] == 3
    assert row["ready_queues"] == 2
    assert abs(row["congestion_ratio"] - 1.5) < 1e-9
