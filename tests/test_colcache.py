"""functions/colcache.py — identity, keying, and reuse-across-plans
semantics of the cross-round expression cache."""

import pyspark.sql.functions as F
import pytest

from heritrix_spark.functions import colcache


def test_cached_returns_same_object_per_key(spark):
    a = colcache.cached(("t", 1), lambda: F.col("x") + 1)
    b = colcache.cached(("t", 1), lambda: F.col("x") + 2)  # builder ignored
    assert a is b
    c = colcache.cached(("t", 2), lambda: F.col("x") + 2)
    assert c is not a


def test_cached_builder_runs_once(spark):
    calls = []

    def build():
        calls.append(1)
        return F.lit(42)

    colcache.cached(("once",), build)
    colcache.cached(("once",), build)
    assert len(calls) == 1


def test_cached_column_reused_across_plans(spark):
    """The same cached Column object resolves correctly against
    different DataFrames (different schemas around the named column) —
    the property every round of the crawl loop relies on."""
    expr = colcache.cached(("reuse", "v2"), lambda: (F.col("v") * 2).alias("d"))
    df1 = spark.createDataFrame([(1,), (2,)], "v int")
    df2 = spark.createDataFrame([(10, "x"), (20, "y")], "v int, s string")
    assert [r["d"] for r in df1.select(expr).orderBy("d").collect()] == [2, 4]
    assert [r["d"] for r in df2.select(expr).orderBy("d").collect()] == [20, 40]
    # and twice within ONE plan (common-subexpression case)
    out = df1.select(expr, (F.col("v") * 0).alias("z")).select("d").orderBy("d")
    assert [r["d"] for r in out.collect()] == [2, 4]


def test_cached_lambda_hof_reused_across_plans(spark):
    """Higher-order-function lambdas (transform/aggregate) re-bind their
    lambda variables at each analysis — a cached tree containing one
    must work in plan after plan (extract_outlinks depends on this)."""
    tree = colcache.cached(
        ("hof", "sumlen"),
        lambda: F.aggregate(
            F.col("arr"), F.lit(0), lambda acc, s: acc + F.length(s)
        ).alias("n"),
    )
    df = spark.createDataFrame([(["ab", "c"],), (["defg"],)], "arr array<string>")
    for _ in range(3):
        assert sorted(r["n"] for r in df.select(tree).collect()) == [3, 4]


def test_clear_drops_entries(spark):
    a = colcache.cached(("clearme",), lambda: F.lit(1))
    colcache.clear()
    b = colcache.cached(("clearme",), lambda: F.lit(1))
    assert a is not b
