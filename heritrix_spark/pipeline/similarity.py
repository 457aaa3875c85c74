"""Similarity search over an embedding column (``embeddings`` table:
vec_id, embedding: array<float>, label).

- :func:`brute_force_topk` — exact cosine top-k: query-set × corpus
  join with the dot product as a native higher-order expression
  (``zip_with`` + ``aggregate``), ranked per query with a window. The
  corpus side stays distributed; only the (small) query set broadcasts.
  This is the correctness baseline.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH
  (sign of dot with md5-derived deterministic pseudo-random planes →
  bucket id); queries only meet corpus vectors in their bucket, with
  multi-probe via several independent tables. Recall < 1 by design;
  the exact baseline is the oracle.

No Python UDFs: dot products run as Catalyst higher-order functions.
For very wide vectors a Pandas-UDF/BLAS variant can slot in behind the
same API, but at dim=64 the JVM expression wins (no Arrow transfer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query_id, neighbor_id,
    rank). Query set is broadcast; corpus never moves. Self-matches
    (same id) are excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"))
    )


def _plane_values(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5 — reproducible
    across engines and runs, no RNG state. Computed DRIVER-side (the
    values are constants — md5 of fixed strings) and shipped as ONE
    literal array per plane: the earlier per-component
    ``md5(lit)``/``conv``/``when`` expression tree was ~10 Catalyst
    nodes × dim × n_planes × n_tables (≈60k nodes at dim=64), and
    measured ~10 s of pure py4j plan-construction per query against
    ~1 s of execution. The DuckDB oracle twin already renders the same
    values as SQL literals (driverq._plane_literal_sql) — this makes
    the Spark side symmetric. Bit-identical: the literal feeds the
    same sequential zip_with/aggregate fold as before."""
    import hashlib

    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"plane{plane}|{i}".encode()).hexdigest()[:15], 16)
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


def _plane_literal(plane: int, dim: int):
    """The plane as ONE ``F.expr`` array literal — a single py4j call
    parsed JVM-side (``F.lit(list)`` still fans out one gateway call
    per element). ``D`` suffix keeps the elements DOUBLE (bare ``1.0``
    parses as DECIMAL in Spark SQL)."""
    body = ",".join("1.0D" if v > 0 else "-1.0D" for v in _plane_values(plane, dim))
    return F.expr(f"array({body})")


def lsh_bucket_col(vec, dim: int, n_planes: int = 8, table: int = 0):
    """Random-hyperplane LSH bucket id: n_planes sign bits."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = _plane_literal(table * 1000 + p, dim)
        s = _dot(vec, comps)
        bucket = bucket + F.when(s >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing an LSH
    bucket with the query in ANY of ``n_tables`` tables; exact cosine +
    rank within candidates. At 10^9 vectors the bucket join replaces the
    full cross product with |bucket| × queries work.

    ``max_bucket`` bounds the corpus side of each (table, bucket): a
    degenerate bucket (e.g. the all-zeros region, or too few planes for
    the corpus size) is truncated to its first ``max_bucket`` members by
    vector id — deterministic, and candidate scoring stays
    O(queries × max_bucket × tables) instead of O(queries × bucket).
    Recall within the truncated bucket degrades, which is the standard
    LSH truncation tradeoff; raise ``n_planes``/``n_tables`` if over-cap
    buckets are common."""
    # one pass computes every table's bucket on each side (posexplode),
    # one (table, bucket) broadcast join replaces the per-table
    # join ∪ union — identical candidates, half the giant bucket
    # expressions to compile/evaluate, a single exchange
    def all_buckets(vcol):
        return F.posexplode(
            F.array(
                *[lsh_bucket_col(vcol, dim, n_planes, t) for t in range(n_tables)]
            )
        ).alias("table", "bucket")

    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        all_buckets(F.col(vec_col)),
    )
    if max_bucket is not None:
        wb = Window.partitionBy("table", "bucket").orderBy(F.asc("neighbor_id"))
        cb = (
            cb.withColumn("__br", F.row_number().over(wb))
            .filter(F.col("__br") <= F.lit(max_bucket))
            .drop("__br")
        )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        all_buckets(F.col(vec_col)),
    )
    cand = cb.join(F.broadcast(qb), on=["table", "bucket"]).drop("table", "bucket")
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_col(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), F.round("cosine", 6).alias("cosine"))
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the ``n_centroids``
    corpus vectors ranked first by md5 of their id — a reproducible
    pseudo-random pivot sample (no RNG state, no iterative k-means, and
    an oracle engine repeats the identical walk). A Lloyd refinement
    would be repeated assign + groupBy-average passes behind the same
    (centroid_id, cent_vec) contract; pivots are the IVF-flat baseline.
    Returns (centroid_id [0..n), cent_vec)."""
    w = Window.orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_centroids)
        .select(
            (F.col("__r") - 1).cast("int").alias("centroid_id"),
            F.col(vec_col).alias("cent_vec"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the classic ANN scale
    path next to LSH: corpus vectors are listed under their nearest
    coarse centroid; a query scores only the lists of its ``nprobe``
    nearest centroids.

    Physical shape at 10^9 vectors: the centroid table is K rows —
    both the corpus assignment and the query probe are broadcast hash
    joins + a max_by/min-struct argmax (map-side combinable, corpus
    never shuffles by vector); the candidate join is corpus-list ×
    probed-query keyed on centroid_id (the only shuffle, bounded by
    list sizes); exact cosine + windowed rank inside candidates.
    Recall < 1 by design; brute_force_topk is the oracle."""
    cent = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # invert: each corpus vector under its nearest centroid (argmax by
    # cosine, centroid_id tiebreak) — one broadcast join, one aggregate
    assigned = (
        c.join(F.broadcast(cent))
        .select(
            "neighbor_id",
            "c_vec",
            "centroid_id",
            cosine_col(F.col("c_vec"), F.col("cent_vec")).alias("__cos"),
        )
        .groupBy("neighbor_id")
        .agg(
            F.max_by(
                F.col("centroid_id"),
                F.struct(F.col("__cos").alias("c"), (-F.col("centroid_id")).alias("t")),
            ).alias("centroid_id"),
            F.first("c_vec").alias("c_vec"),
        )
    )
    # probe: nprobe nearest centroids per query
    probes = (
        q.join(F.broadcast(cent))
        .select(
            "query_id",
            "q_vec",
            "centroid_id",
            cosine_col(F.col("q_vec"), F.col("cent_vec")).alias("__cos"),
        )
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("__cos"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    cand = assigned.join(F.broadcast(probes), on="centroid_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # (query, neighbor) is already unique: each corpus vector lives in
    # exactly one inverted list — no dedup shuffle needed (unlike LSH's
    # multi-table union)
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_col(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def lsh_neardup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates are corpus
    pairs sharing a random-hyperplane LSH bucket in ANY table; survivors
    have exact cosine >= threshold. The brief's 'embedding-cosine
    near-dup' dedup entry as a bucket self-join — candidate work is
    sum(|bucket|^2) per table, never the |corpus|^2 cross product.
    Recall is the standard LSH guarantee (a near pair collides in >= 1
    of n_tables with high probability for high cosine); the bucketing
    is deterministic (md5-derived planes), so an oracle engine can
    replay the exact same candidate set."""
    # ONE pass computes every table's bucket (an array + posexplode),
    # and ONE self-join on the composite (table, bucket) key replaces
    # the per-table join ∪ union — the candidate set is identical, but
    # the plan evaluates the 16-dot-product bucket expression once per
    # join side instead of once per (table, side), and ships a single
    # exchange instead of n_tables of them.
    c = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    cb = c.select(
        "__id",
        "__v",
        F.posexplode(
            F.array(
                *[
                    lsh_bucket_col(F.col("__v"), dim, n_planes, t)
                    for t in range(n_tables)
                ]
            )
        ).alias("table", "bucket"),
    )
    if max_bucket is not None:
        wb = Window.partitionBy("table", "bucket").orderBy(F.asc("__id"))
        cb = (
            cb.withColumn("__br", F.row_number().over(wb))
            .filter(F.col("__br") <= F.lit(max_bucket))
            .drop("__br")
        )
    left = cb.select(
        F.col("__id").alias("a_id"), F.col("__v").alias("a_vec"), "table", "bucket"
    )
    right = cb.select(
        F.col("__id").alias("b_id"), F.col("__v").alias("b_vec"), "table", "bucket"
    )
    cand = (
        left.join(right, on=["table", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .drop("table", "bucket")
    )
    return (
        cand.dropDuplicates(["a_id", "b_id"])
        .withColumn("cosine", cosine_col(F.col("a_vec"), F.col("b_vec")))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select(
            "a_id",
            "b_id",
            F.floor(F.col("cosine") * 1e6).cast("long").alias("cosine_micro"),
        )
    )
