"""Deterministic sampling / splitting (pipeline/sampling.py) and the
vocabulary heavy hitters (textstats.token_topk)."""

import os

import pytest
from pyspark.sql import functions as F

from heritrix_spark.pipeline.sampling import (
    cap_per_group,
    hash_sample_fraction,
    hash_split_col,
    sample_fixed_n,
    sample_hash_col,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_split_deterministic_and_partition_invariant(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out1 = docs.select(
        "doc_id", hash_split_col(F.col("doc_id"), w).alias("s")
    )
    out2 = docs.repartition(13).select(
        "doc_id", hash_split_col(F.col("doc_id"), w).alias("s")
    )
    a = {r["doc_id"]: r["s"] for r in out1.collect()}
    b = {r["doc_id"]: r["s"] for r in out2.collect()}
    assert a == b
    # proportions roughly honored (60-bit uniform hash, n>=100)
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert abs(c["train"] / n - 0.8) < 0.12
    # disjoint + exhaustive by construction (single CASE expression)


def test_split_salt_changes_assignment(spark, docs):
    w = {"a": 0.5, "b": 0.5}
    s1 = docs.select(hash_split_col(F.col("doc_id"), w, "s1").alias("s"))
    s2 = docs.select(hash_split_col(F.col("doc_id"), w, "s2").alias("s"))
    both = list(zip([r["s"] for r in s1.collect()], [r["s"] for r in s2.collect()]))
    assert any(x != y for x, y in both)


def test_fraction_filter_is_stable(spark, docs):
    kept = hash_sample_fraction(docs, F.col("doc_id"), 0.25)
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in hash_sample_fraction(
            docs.repartition(7), F.col("doc_id"), 0.25
        ).collect()
    )
    assert ids1 == ids2
    n = docs.count()
    assert 0.1 * n < len(ids1) < 0.4 * n


def test_sample_fixed_n_exact_and_stable(spark, docs):
    s = sample_fixed_n(docs, F.col("doc_id"), 37)
    ids = sorted(r["doc_id"] for r in s.collect())
    assert len(ids) == 37
    ids2 = sorted(
        r["doc_id"]
        for r in sample_fixed_n(docs.repartition(5), F.col("doc_id"), 37).collect()
    )
    assert ids == ids2
    # matches the definitional N-smallest-hash set
    want = [
        r["doc_id"]
        for r in docs.select(
            "doc_id", sample_hash_col(F.col("doc_id"), "fixedn").alias("h")
        )
        .orderBy("h")
        .limit(37)
        .collect()
    ]
    assert ids == sorted(want)


def test_cap_per_group(spark, docs):
    capped = cap_per_group(docs, F.col("source"), F.col("doc_id"), 10)
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in per)
    # groups smaller than the cap are kept whole
    orig = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    got = {r["source"]: r["count"] for r in per}
    for src, n in orig.items():
        assert got.get(src, 0) == min(n, 10)
    # stable under repartition
    ids1 = sorted(r["doc_id"] for r in capped.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in cap_per_group(
            docs.repartition(9), F.col("source"), F.col("doc_id"), 10
        ).collect()
    )
    assert ids1 == ids2


def test_token_topk_matches_python(spark, docs):
    from collections import Counter

    from heritrix_spark.pipeline.textstats import token_topk

    got = [
        (r["token"], r["term_freq"], r["doc_freq"])
        for r in token_topk(docs, k=20).collect()
    ]
    tf: Counter = Counter()
    df: Counter = Counter()
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in (r["text"] or "").lower().split() if t]
        tf.update(toks)
        df.update(set(toks))
    want = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(t, n, df[t]) for t, n in want] == got


def test_mix_by_weights_quotas_and_determinism(spark, docs):
    from heritrix_spark.pipeline.sampling import mix_by_weights, mix_quotas
    from pyspark.sql import functions as F

    weights = {"s0": 0.5, "s1": 0.25, "s2": 0.25, "ghost": 0.0}
    quotas = mix_quotas(weights, 40)
    assert quotas == {"s0": 20, "s1": 10, "s2": 10, "ghost": 0}

    df = docs.withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 4).cast("string"))
    )
    picked = mix_by_weights(
        df, F.col("source"), F.col("doc_id"), weights, 40
    )
    by_src = {
        r["source"]: r["n"]
        for r in picked.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # s3 not in weights → dropped entirely; ghost has no rows
    assert by_src == {"s0": 20, "s1": 10, "s2": 10}

    ids1 = sorted(r["doc_id"] for r in picked.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mix_by_weights(
            df.repartition(7), F.col("source"), F.col("doc_id"), weights, 40
        ).collect()
    )
    assert ids1 == ids2


def test_mix_by_weights_small_group_contributes_all(spark):
    from heritrix_spark.pipeline.sampling import mix_by_weights
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "big" if i < 50 else "tiny") for i in range(53)],
        "doc_id long, source string",
    )
    picked = mix_by_weights(
        df, F.col("source"), F.col("doc_id"), {"big": 0.5, "tiny": 0.5}, 40
    )
    by_src = {
        r["source"]: r["n"]
        for r in picked.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src == {"big": 20, "tiny": 3}  # tiny has only 3 rows
