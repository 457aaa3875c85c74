"""URL-seen semantics (FIXTURES.md §5d; BdbUriUniqFilterTest.java:78-186
behaviors re-expressed): add-twice, addForce, note, forget."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.seen import (
    collapse_batch_duplicates,
    dedup_candidates,
    forget,
    note,
    shard_col,
)


def _seen(spark, canons):
    return spark.createDataFrame(
        [(c,) for c in canons], schema="canon_url string"
    )


def _cands(spark, rows):
    # rows: (canon_url, ordinal, force_fetch)
    return spark.createDataFrame(rows, ["canon_url", "ordinal", "force_fetch"])


def test_add_same_twice_drops_second(spark):
    cands = _cands(spark, [("http://a/x", 1, False), ("http://a/x", 2, False)])
    uniq = collapse_batch_duplicates(cands)
    assert uniq.count() == 1
    assert uniq.first()["ordinal"] == 1  # first discovery wins
    novel = dedup_candidates(uniq, _seen(spark, []))
    assert novel.count() == 1


def test_seen_membership_drops(spark):
    cands = _cands(spark, [("http://a/x", 1, False), ("http://a/y", 2, False)])
    novel = dedup_candidates(cands, _seen(spark, ["http://a/x"]))
    assert [r["canon_url"] for r in novel.collect()] == ["http://a/y"]


def test_add_force_bypasses(spark):
    cands = _cands(spark, [("http://a/x", 1, True), ("http://a/y", 2, False)])
    novel = dedup_candidates(cands, _seen(spark, ["http://a/x", "http://a/y"]))
    assert [r["canon_url"] for r in novel.collect()] == ["http://a/x"]


def test_note_marks_without_scheduling(spark):
    seen = note(_seen(spark, ["http://a/x"]), _seen(spark, ["http://a/z"]))
    assert sorted(r["canon_url"] for r in seen.collect()) == [
        "http://a/x",
        "http://a/z",
    ]


def test_forget_readds(spark):
    seen = _seen(spark, ["http://a/x", "http://a/y"])
    seen2 = forget(seen, _seen(spark, ["http://a/x"]))
    assert [r["canon_url"] for r in seen2.collect()] == ["http://a/y"]
    cands = _cands(spark, [("http://a/x", 1, False)])
    assert dedup_candidates(cands, seen2).count() == 1


def test_distinct_post_query_canons_stay_distinct(spark):
    cands = _cands(
        spark, [("http://a/x?p=1", 1, False), ("http://a/x?p=2", 2, False)]
    )
    assert dedup_candidates(collapse_batch_duplicates(cands), _seen(spark, [])).count() == 2


def test_shards_balanced(spark):
    df = spark.range(2000).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("canon_url")
    )
    counts = (
        df.select(shard_col("canon_url", 16).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(counts) == 16
    sizes = [r["count"] for r in counts]
    assert max(sizes) < 2 * min(sizes)  # roughly uniform
