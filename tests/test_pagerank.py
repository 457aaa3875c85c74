"""PageRank (reference extras/pagerank/PageRank.java law): Spark ==
pure-Python twin, sink/target-only reset law, partitioning
determinism, duplicate-edge weighting."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.pipeline.pagerank import JUMP, SCALE, pagerank, pagerank_py


def _run(spark, edges, iterations, n_parts=None):
    df = spark.createDataFrame(edges, ["src", "dst"])
    if n_parts:
        df = df.repartition(n_parts)
    rows = pagerank(df, iterations=iterations).collect()
    return {r["node"]: r["rank_micro"] for r in rows}


def test_matches_python_twin(spark):
    # ring + chord + sink (4 has no outlinks) + target-only node 5
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 4), (1, 5), (3, 0), (3, 4)]
    for iters in (1, 2, 4):
        assert _run(spark, edges, iters) == pagerank_py(edges, iters)


def test_sink_and_target_only_reset_to_jump(spark):
    # PageRank.java:126-130 — empty adjacency discards received mass
    edges = [(0, 1), (0, 2), (1, 2)]
    got = _run(spark, edges, 3)
    assert got[2] == JUMP  # sink: huge inflow, still 0.15
    # node 3 absent entirely; node 1 has outlinks so keeps damped mass
    assert got[1] > JUMP


def test_no_inbound_node_with_outlinks_gets_jump(spark):
    edges = [(7, 8), (8, 7)]
    got = _run(spark, edges + [(9, 7)], 2)
    # 9 has outlinks but no inbound -> 0.15 exactly (0.85*0 + 0.15)
    assert got[9] == JUMP


def test_partitioning_invariance(spark):
    edges = [(i, (i * 7 + 1) % 23) for i in range(23)] + [
        (i, (i * 3 + 2) % 23) for i in range(0, 23, 2)
    ]
    a = _run(spark, edges, 3, n_parts=1)
    b = _run(spark, edges, 3, n_parts=17)
    assert a == b  # fixed-point law is bit-identical under re-layout


def test_duplicate_edges_count_twice(spark):
    # the Hadoop comma-list emits one contribution per listed target
    # (1 and 2 keep outlinks so the sink-reset law doesn't mask the test)
    base = [(0, 1), (0, 2), (1, 0), (2, 0)]
    once = pagerank_py(base, 1)
    twice = pagerank_py(base + [(0, 1)], 1)
    assert twice[1] > once[1]
    got = _run(spark, base + [(0, 1)], 1)
    assert got == twice


def test_initial_rank_is_one(spark):
    edges = [(0, 1), (1, 0)]
    got = _run(spark, edges, 1)
    # after one iteration from rank0=1.0: 0.15 + 0.85*1.0 = 1.0
    assert got[0] == SCALE and got[1] == SCALE
