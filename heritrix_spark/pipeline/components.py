"""Connected components over near-duplicate pairs → dedup clusters.

The dedup operators (``pipeline/dedup.py``, ``pipeline/similarity.py``)
emit *pairs* — (a_id, b_id) rows whose documents are near-duplicates by
MinHash/SimHash/embedding distance.  A training-data pipeline needs the
transitive closure of those pairs: duplicate *clusters*, and one
canonical survivor per cluster.  (The reference engine has no analog —
its dedup is per-URI digest identity, WriterPoolProcessor revisit
handling; clustering is a beyond-reference training-pipeline op per the
task brief.)

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014 — public).  Each iteration is one groupBy per star
step; the edge set converges in O(log^2 n) iterations to a forest of
stars where every node points at its component's minimum id.  Unlike
naive min-label propagation (O(diameter) rounds — a 10^6-long chain of
near-dup shingles takes 10^6 rounds), star contraction is the published
cluster-scale answer: at 100 TB the per-iteration cost is one hash
shuffle on the node id, high-degree hubs shrink monotonically (large-star
reattaches every larger neighbor to the current minimum), and the edge
set never grows beyond the symmetrized input.

Spark mechanics that matter at scale:
- each iteration ends in ``localCheckpoint(eager=True)`` — iterative
  DataFrames otherwise accumulate an unbounded lineage/plan tree and
  re-plan cost grows superlinearly with iterations;
- convergence is detected by an order-independent edge-set digest
  (count + sum of xxhash64(u, v)), one tiny aggregate action per
  iteration — no ``collect()`` of data rows;
- the groupBys aggregate ``min`` besides ``collect_set`` only of the
  *current* neighbor set, which star contraction keeps shrinking, so no
  unbounded per-key state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_digest(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) accumulator: exact, order-independent, and immune to
    # the ANSI-mode long-overflow a plain sum of 64-bit hashes would hit
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    grouped = sym.groupBy("u").agg(
        F.collect_set("v").alias("nbrs"), F.min("v").alias("mn")
    )
    m = F.least(F.col("u"), F.col("mn"))
    return (
        grouped.select(
            F.explode(F.filter("nbrs", lambda x: x > F.col("u"))).alias("u"),
            m.alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the smaller endpoint, then connect every
    neighbor (and u itself) to the minimum of the neighborhood."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    grouped = directed.groupBy("u").agg(
        F.collect_set("v").alias("nbrs"), F.min("v").alias("mn")
    )
    return (
        grouped.select(
            F.explode(
                F.array_union("nbrs", F.array(F.col("u")))
            ).alias("node"),
            F.col("mn").alias("v"),
        )
        .where(F.col("node") != F.col("v"))
        .select(F.col("node").alias("u"), "v")
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iterations: int = 50,
) -> DataFrame:
    """Transitive closure of a pair table.

    Returns one row per node that appears in ``pairs``:
    ``(node, component)`` where ``component`` is the smallest node id
    reachable from it.  Nodes absent from ``pairs`` (singletons) are the
    caller's to handle (see :func:`keep_canonical`).
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _edge_digest(edges)
    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _edge_digest(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    # Converged: every edge points at its component root (the minimum).
    roots = edges.select(F.col("v").alias("u"), F.col("v"))
    return (
        edges.union(roots)
        .distinct()
        .select(F.col("u").alias("node"), F.col("v").alias("component"))
    )


def keep_canonical(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Map every document to its duplicate-cluster id and survivor flag.

    Documents in no cluster are their own (singleton) component.  The
    survivor of a cluster is its minimum id — deterministic, and the
    join is on the doc id (broadcast-able when the pair-participating
    subset is small relative to the corpus, which is the common case).
    """
    comp = F.coalesce(F.col("component"), F.col(id_col))
    return (
        docs.join(components, docs[id_col] == components["node"], "left")
        .drop("node")
        .withColumn("component", comp)
        .withColumn("is_kept", F.col("component") == F.col(id_col))
    )


# ---------------------------------------------------------------------------
# Pure-Python twin (the normative mirror used by pytest)
# ---------------------------------------------------------------------------


def components_py(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find over the pair list; component id = minimum member."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}
