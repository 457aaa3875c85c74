"""Deterministic sampling / splitting for training-data pipelines.

Training corpora need reproducible subsets: a train/val/test split that
never moves when the pipeline reruns, a fixed-size uniform sample for
eval sets, and per-domain caps so a handful of giant hosts doesn't
dominate the mixture.  All three are pure column math over a *portable*
content hash — ``md5`` truncated to 60 bits (the repo's md5-60
convention, pipeline/dedup.py:31) — so the DuckDB oracle can replay the
assignment bit-for-bit and a rerun on any engine lands every document in
the same bucket.

Scale shape:
- ``hash_split`` / ``hash_sample_fraction`` are stateless per-row
  projections — no shuffle at all, fully pushdown-friendly;
- ``sample_fixed_n`` is a global top-N by hash: Spark executes
  ``orderBy(...).limit(n)`` as per-partition TakeOrdered + a single
  N-row merge on the driver — no full sort, no full shuffle;
- ``cap_per_group`` is one window shuffle on the group key (host /
  domain-grained, the same skew profile as every per-host operator in
  the engine); the hash ordering inside the window makes the kept
  subset a uniform sample of each group rather than a prefix of crawl
  order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from heritrix_spark.pipeline.dedup import md5_60

# md5-60 of the salted key: uniform in [0, 2^60), portable to DuckDB as
# ('0x' || substr(md5(...), 1, 15))::BIGINT  (same trick as dedup.md5_60)
_SPACE = 1 << 60


def sample_hash_col(key: Column, salt: str = "") -> Column:
    """Portable uniform 60-bit hash of a (salted) key column."""
    return md5_60(F.concat(F.lit(salt), key.cast("string")))


def hash_split_col(
    key: Column, weights: dict[str, float], salt: str = "split"
) -> Column:
    """Assign each row a split label with probability proportional to
    ``weights`` (e.g. {"train": .9, "val": .05, "test": .05}),
    deterministically in the key: the same document lands in the same
    split on every run, on every engine, regardless of partitioning."""
    total = sum(weights.values())
    h = sample_hash_col(key, salt)
    expr = None
    acc = 0.0
    items = sorted(weights.items())  # deterministic boundary order
    for name, w in items[:-1]:
        acc += w / total
        bound = int(acc * _SPACE)
        expr = (
            F.when(h < F.lit(bound), F.lit(name))
            if expr is None
            else expr.when(h < F.lit(bound), F.lit(name))
        )
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def hash_sample_fraction(
    df: DataFrame, key: Column, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows (stateless filter —
    the scale-safe Bernoulli sample; survives reruns and repartitions,
    unlike ``DataFrame.sample`` whose output depends on partition
    layout)."""
    bound = int(fraction * _SPACE)
    return df.where(sample_hash_col(key, salt) < F.lit(bound))


def sample_fixed_n(
    df: DataFrame, key: Column, n: int, salt: str = "fixedn"
) -> DataFrame:
    """Exactly-N uniform deterministic sample: the N smallest salted
    hashes.  Equivalent to a seeded reservoir sample but stable under
    reruns and input reordering; executes as TakeOrdered (per-partition
    top-N + driver merge of N rows), never a global sort."""
    return (
        df.withColumn("__sh", sample_hash_col(key, salt))
        .orderBy("__sh")
        .limit(n)
        .drop("__sh")
    )


def cap_per_group(
    df: DataFrame,
    group: Column,
    key: Column,
    max_rows: int,
    salt: str = "cap",
) -> DataFrame:
    """Stratified downsampling: keep at most ``max_rows`` rows per group
    (host, domain, language, ...), chosen uniformly inside the group by
    hash order rather than input order.  One window shuffle on the
    group key."""
    w = Window.partitionBy(group).orderBy(
        sample_hash_col(key, salt).asc(), key.cast("string").asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= max_rows)
        .drop("__rk")
    )


def mix_quotas(weights: dict[str, float], total_n: int) -> dict[str, int]:
    """Per-group row quotas for :func:`mix_by_weights`:
    ``floor(total_n · w_g / Σw)`` — the deterministic integer allocation
    (no largest-remainder fixup: quotas must be a pure per-group
    function so the oracle can replay them)."""
    tot = sum(weights.values())
    if tot <= 0:
        raise ValueError("weights must sum to a positive value")
    return {g: int(total_n * w / tot) for g, w in weights.items()}


def mix_by_weights(
    df: DataFrame,
    group: Column,
    key: Column,
    weights: dict[str, float],
    total_n: int,
    salt: str = "mix",
) -> DataFrame:
    """Corpus mixture composition: draw a ~``total_n``-row corpus whose
    group (source/domain/language) proportions follow ``weights`` —
    the epoch-mixing step of a pre-training data pipeline.  Each group
    contributes its quota's worth of rows chosen uniformly by salted
    hash order (groups not named in ``weights`` are dropped; a group
    smaller than its quota contributes everything it has).  One window
    shuffle on the group key; deterministic under reruns and
    repartitioning."""
    quotas = mix_quotas(weights, total_n)
    pairs: list[Column] = []
    for g, q in sorted(quotas.items()):
        pairs.append(F.lit(g))
        pairs.append(F.lit(q))
    quota_map = F.create_map(*pairs)
    w = Window.partitionBy(group).orderBy(
        sample_hash_col(key, salt).asc(), key.cast("string").asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.coalesce(quota_map[group], F.lit(0)))
        .drop("__rk")
    )


def duck_sample_hash(key_sql: str, salt: str = "") -> str:
    """DuckDB twin of :func:`sample_hash_col` for oracle SQL."""
    return (
        f"('0x' || substr(md5('{salt}' || cast({key_sql} as varchar)), 1, 15))"
        "::BIGINT"
    )
