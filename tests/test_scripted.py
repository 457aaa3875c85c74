"""Scripted hook points (operators/scripted.py): the explicit
ScriptedDecideRule / ScriptedProcessor contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.scope import apply_rules
from heritrix_spark.operators.scripted import (
    chain,
    scripted_decide_rule,
    scripted_decide_rule_py,
    scripted_processor,
)


def test_column_rule_composes_into_fold(spark):
    df = spark.createDataFrame(
        [("http://a.example/x",), ("http://b.example/y",)], ["url"]
    )
    rule = scripted_decide_rule(
        "only-a", lambda: F.col("url").contains("//a."), decision=True
    )
    out = df.withColumn("d", apply_rules([rule], start=False))
    got = {r.url: r.d for r in out.collect()}
    assert got["http://a.example/x"] is True
    assert got["http://b.example/y"] is False


def test_py_rule_vectorized_decision_for(spark):
    df = spark.createDataFrame(
        [("http://a.example/login",), ("http://a.example/page",), (None,)],
        ["url"],
    )
    # reject anything with 'login' — last matching rule wins over an
    # accept-all start
    reject = scripted_decide_rule_py(
        "no-login", lambda u: "login" in u, decision=False
    )
    out = df.withColumn("d", apply_rules([reject], start=True))
    got = [r.d for r in out.collect()]
    assert got == [False, True, True]  # None url: rule passes, start holds


def test_processor_chain_composition(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    p1 = scripted_processor(lambda d: d.filter(F.col("v") % 2 == 0))
    p2 = scripted_processor(
        lambda d: d.withColumn("v2", F.col("v") * 10)
    )
    out = chain(p1, p2)(df)
    rows = sorted((r.v, r.v2) for r in out.collect())
    assert rows == [(0, 0), (2, 20), (4, 40), (6, 60), (8, 80)]
