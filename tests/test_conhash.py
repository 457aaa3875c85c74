"""LongToIntConsistentHash law: Spark Column == python twin, tailMap
wraparound, the parallel-queue "+N" suffix quirks, and the property
that justifies the circle — raising the bucket count migrates only a
small fraction of keys (vs ~all for modulo)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.conhash import (
    circle_points,
    consistent_bucket_col,
    consistent_bucket_py,
    fp60_py,
    parallel_class_key_col,
)

KEYS = [f"seg{i}" for i in range(200)] + ["", "a", "index.html", "très-läng"]


def test_column_matches_python_twin(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], ["k"])
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", consistent_bucket_col(F.col("k"), 8, replicas=8).alias("b")
        ).collect()
    }
    for k in KEYS:
        assert got[k] == consistent_bucket_py(k, 8, replicas=8), k


def test_wraparound_matches_smallest_point():
    # a key hashing above every circle point wraps to the circle head
    pts = circle_points(4, replicas=4)
    top = max(p[0] for p in pts)
    key = next(k for k in (f"w{i}" for i in range(100000)) if fp60_py(k) > top)
    assert consistent_bucket_py(key, 4, replicas=4) == pts[0][1]


def test_buckets_cover_range():
    seen = {consistent_bucket_py(f"k{i}", 8, replicas=64) for i in range(2000)}
    assert seen == set(range(8))


def test_monotone_migration_vs_modulo():
    # LongToIntConsistentHash's point: N -> N+1 moves only the new
    # bucket's arc (expected 1/(N+1) of keys); hash % N moves ~all.
    keys = [f"k{i}" for i in range(1000)]
    before = {k: consistent_bucket_py(k, 8, replicas=64) for k in keys}
    after = {k: consistent_bucket_py(k, 9, replicas=64) for k in keys}
    moved = sum(1 for k in keys if before[k] != after[k])
    assert moved < 300  # ~111 expected; modulo would move ~889
    # every moved key landed on the NEW bucket (old arcs untouched)
    assert all(after[k] == 8 for k in keys if before[k] != after[k])
    mod_moved = sum(1 for k in keys if fp60_py(k) % 8 != fp60_py(k) % 9)
    assert mod_moved > 800


def test_parallel_class_key_suffix_law(spark):
    rows = [
        ("http://h.example/alpha/x", "com,example,h,"),
        ("http://h.example/", "com,example,h,"),  # empty segment -> bare
        ("http://h.example/beta", "com,example,h,"),
    ]
    df = spark.createDataFrame(rows, ["url", "class_key"])
    got = {
        r["url"]: r["key2"]
        for r in df.select(
            "url",
            parallel_class_key_col(
                F.col("class_key"), F.col("url"), 4, replicas=8
            ).alias("key2"),
        ).collect()
    }
    assert got["http://h.example/"] == "com,example,h,"  # :107-109
    for url, seg in [("http://h.example/alpha/x", "alpha"),
                     ("http://h.example/beta", "beta")]:
        sub = consistent_bucket_py(seg, 4, replicas=8)
        want = "com,example,h," + (f"+{sub}" if sub > 0 else "")
        assert got[url] == want  # subqueue 0 stays bare (:97-100)


def test_parallel_queues_one_is_identity(spark):
    df = spark.createDataFrame([("http://h/x", "k")], ["url", "class_key"])
    (r,) = df.select(
        parallel_class_key_col(F.col("class_key"), F.col("url"), 1).alias("k2")
    ).collect()
    assert r["k2"] == "k"
