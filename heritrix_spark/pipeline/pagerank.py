"""PageRank over the crawl link graph — the reference repo's own
post-crawl analytics job, re-expressed Spark-first.

The reference ships a Hadoop MapReduce PageRank over crawl-extracted
links (heritrix3/dist/src/main/extras/pagerank/PageRank.java): the
mapper emits pr(v)/outdeg(v) to every outlink target plus the node's
adjacency line, the reducer sums contributions and applies
``value*0.85 + 0.15`` (PageRank.java:120-121), and — the reference's
quirk, kept faithfully — any node whose adjacency list is empty
(a sink, or a node only ever seen as a link *target*) is reset to the
flat jump value 0.15 and its received mass is discarded
(PageRank.java:126-130 "no outlink, delete accumulated values, keep
random jump").  So the per-iteration law is

    rank'(u) = 0.15                                     if outdeg(u) = 0
    rank'(u) = 0.15 + 0.85 * sum_{v->u} rank(v)/outdeg(v)   otherwise

with rank0 = 1.0 for every node of V = src ∪ dst (the job's seed input
carries initial pr per line; 1.0 is the conventional seeding).

**Fixed-point arithmetic, deliberately.** The Hadoop original sums
Java doubles in reducer-arrival order; on a cluster that order is
nondeterministic, so two runs of the *reference* can disagree in the
last ulps.  At 10^10-edge scale a reproducible crawl-analytics job
cannot be built on float reduce order, so this implementation does all
math in integer micro-rank units (rank0 = 1_000_000; contribution =
rank div outdeg; damped = 150_000 + (850_000 * sum) div 1_000_000).
Integer sums are associative/commutative — the result is bit-identical
under any partitioning, any AQE re-plan, and any executor count, and
the DuckDB oracle can replay it exactly (driver row ``pagerank``).
Quantization error is < 1e-6 rank per term per iteration.

Plan shape (the part that matters at 100 TB): the edge table is joined
with outdeg once and hash-partitioned by ``src`` once, outside the
loop; each iteration then reshuffles only the *rank* table (|V| rows,
two narrow columns — orders of magnitude smaller than the edges) to
the edges' existing partitioning, aggregates contributions with one
map-side-combined hash shuffle on ``dst``, and rejoins the static node
list.  ``localCheckpoint(eager=True)`` per iteration cuts the growing
lineage exactly as pipeline/components.py does.  No collect of data
rows; the loop trip count is a parameter, not data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: micro-rank fixed-point scale (1.0 == 1_000_000)
SCALE = 1_000_000
#: damping numerator: 0.85 (PageRank.java:120 ``value*=0.85``)
DAMPING_NUM = 850_000
#: random-jump term: 0.15 (PageRank.java:121 ``value+=0.15``)
JUMP = 150_000


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Iterate the reference PageRank law ``iterations`` times over an
    (src, dst) edge table; returns (node, rank_micro bigint, rank
    double).  Duplicate edges count separately, exactly as duplicate
    lines in the Hadoop job's comma-list would."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # static per-edge (src, dst, outdeg) — partitioned by src ONCE;
    # every iteration's rank join reuses this layout
    edges_w = (
        e.join(outdeg, on="src")
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    # nodes with outgoing links keep received mass; sinks reset to JUMP
    node_deg = nodes.join(
        outdeg.withColumnRenamed("src", "node"), on="node", how="left"
    ).localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank_micro", F.lit(SCALE).cast("long"))
    for _ in range(iterations):
        contribs = (
            edges_w.join(
                ranks.withColumnRenamed("node", "src"), on="src"
            )
            .select(
                "dst",
                F.expr("rank_micro div outdeg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            node_deg.join(
                contribs.withColumnRenamed("dst", "node"), on="node", how="left"
            )
            .select(
                "node",
                F.when(F.col("outdeg").isNull(), F.lit(JUMP).cast("long"))
                .otherwise(
                    # (850_000 * s) stays in int64 up to s ~ 1e13, i.e.
                    # total graph mass ~1e7 nodes; beyond that switch the
                    # accumulator to decimal(38,0) as components.py does
                    F.expr(
                        f"cast({JUMP} as bigint)"
                        f" + (cast({DAMPING_NUM} as bigint)"
                        f"    * coalesce(s, cast(0 as bigint))) div {SCALE}"
                    )
                )
                .cast("long")
                .alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.withColumn(
        "rank", (F.col("rank_micro") / F.lit(SCALE)).cast("double")
    )


def pagerank_py(
    edges: list[tuple], iterations: int = 4
) -> dict:
    """Pure-Python twin of the same fixed-point law (test oracle)."""
    from collections import defaultdict

    outdeg: dict = defaultdict(int)
    nodes = set()
    for s, d in edges:
        outdeg[s] += 1
        nodes.add(s)
        nodes.add(d)
    ranks = {n: SCALE for n in nodes}
    for _ in range(iterations):
        sums: dict = defaultdict(int)
        for s, d in edges:
            sums[d] += ranks[s] // outdeg[s]
        ranks = {
            n: (JUMP + (DAMPING_NUM * sums[n]) // SCALE)
            if outdeg[n] > 0
            else JUMP
            for n in nodes
        }
    return ranks
