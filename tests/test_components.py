"""Connected components over near-dup pairs (pipeline/components.py).

Pinned against a pure-Python union-find twin on hand graphs, randomized
graphs, and the real minhash-LSH pair output; survivor selection law
(min id per cluster, singletons self-kept) checked end-to-end.
"""

import os
import random

import pytest
from pyspark.sql import functions as F

from heritrix_spark.pipeline.components import (
    components_py,
    connected_components,
    keep_canonical,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _cc_spark(spark, pairs):
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_chain(spark):
    # a 6-long chain: worst case for naive label propagation
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    assert _cc_spark(spark, pairs) == components_py(pairs)
    assert set(_cc_spark(spark, pairs).values()) == {1}


def test_two_components_and_star(spark):
    pairs = [(10, 3), (3, 7), (100, 200), (200, 150), (150, 100)]
    got = _cc_spark(spark, pairs)
    assert got == components_py(pairs)
    assert got[7] == 3 and got[10] == 3
    assert got[200] == 100 and got[150] == 100


def test_self_and_duplicate_edges(spark):
    pairs = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = _cc_spark(spark, pairs)
    # self-loop contributes no edge; node 5 only appears via (5,5) so it
    # is dropped from the edge set entirely (singleton — keep_canonical's
    # job, not the closure's)
    assert got == {1: 1, 2: 1}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(1, 120))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _cc_spark(spark, pairs) == components_py(pairs)


def test_keep_canonical_singletons_and_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 5), (5, 7), (3, 8)], "a_id long, b_id long"
    )
    cc = connected_components(pairs)
    out = keep_canonical(docs, cc).orderBy("doc_id")
    rows = {r["doc_id"]: (r["component"], r["is_kept"]) for r in out.collect()}
    assert rows == {
        1: (1, True),
        2: (2, True),
        3: (3, True),
        4: (4, True),
        5: (2, False),
        6: (6, True),
        7: (2, False),
        8: (3, False),
    }
    # exactly one survivor per component
    surv = (
        out.groupBy("component")
        .agg(F.sum(F.col("is_kept").cast("int")).alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in surv)


def test_on_real_minhash_pairs(spark):
    from heritrix_spark.pipeline.dedup import minhash_lsh_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = minhash_lsh_dedup(docs, n_hashes=8, bands=4, shingle_k=3)
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    want = components_py(
        [(r["a_id"], r["b_id"]) for r in pairs.collect()]
    )
    assert got == want


def test_scale_shape_star_and_long_chain(spark):
    """Adversarial shapes at 10^4 scale: a 20k-leaf hub (the boilerplate
    near-dup star — max-degree skew) unioned with a 2k-long chain (max
    diameter — the case naive label propagation needs 2k rounds for).
    Star contraction must converge in a handful of iterations and get
    both exactly right, without collecting any data rows."""
    hub = spark.range(1, 20001).selectExpr("0 as a_id", "id as b_id")
    chain = spark.range(100000, 102000).selectExpr(
        "id as a_id", "id + 1 as b_id"
    )
    cc = connected_components(hub.union(chain))
    agg = cc.groupBy("component").count().collect()
    got = {r["component"]: r["count"] for r in agg}
    assert got == {0: 20001, 100000: 2001}
    # every chain node resolved to the chain head, none to the hub
    bad = cc.filter(
        (F.col("node") >= 100000) & (F.col("component") != 100000)
    ).count()
    assert bad == 0
