"""Hot-host (skew) mitigation: order-preserving salted sub-queueing.

Reference analog: ``parallelQueues`` splits one authority into N
subqueues ``key#N`` via a consistent hash of the first path segment
(URIAuthorityBasedQueueAssignmentPolicy.getSubqueue + LongToIntConsistentHash,
heritrix3/engine/.../frontier/; SURVEY.md §2.4) — Heritrix's own answer
to a host too hot for one politeness queue.

Spark restatement: skew hurts at the *shuffle*, not the queue. The salt
is applied only inside shuffle-heavy stages and removed before any
order-sensitive step:

- :func:`salted_key_col` — ``class_key#salt`` with the salt drawn from
  a consistent hash of the first path segment (same segment → same
  subqueue, preserving per-path-prefix fetch order like the reference).
- :func:`desalt_col` — recover the plain class_key.
- :func:`salted_counts` — the canonical usage: per-host aggregates
  computed as salted partials + final combine, so one mega-host's rows
  spread over ``n_salts`` reducers. (Spark's map-side partial
  aggregation already does this for algebraic aggs; the explicit salt
  is for the non-algebraic ones — collect_list-ish or windowed work.)

AQE skew-join splitting (enabled in session.py) remains the automatic
backstop for joins; this operator is for deliberate plan-level control.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_path_segment_col(url: Column) -> Column:
    return F.regexp_extract(url, r"^\w+://[^/]+/([^/?#]*)", 1)


def salted_key_col(class_key: Column, url: Column, n_salts: int = 16) -> Column:
    """class_key + '#' + consistent-hash(first path segment) % n_salts.

    Same first segment → same subqueue (the reference's consistent-hash
    property that keeps related URIs together)."""
    salt = F.pmod(F.xxhash64(first_path_segment_col(url)), F.lit(n_salts))
    return F.concat(class_key, F.lit("#s"), salt.cast("string"))


def desalt_col(salted: Column) -> Column:
    return F.regexp_replace(salted, r"#s\d+$", "")


def salted_counts(
    df: DataFrame, class_key: str = "class_key", url: str = "url", n_salts: int = 16
) -> DataFrame:
    """Two-stage skew-proof per-host count: salted partials → combine."""
    partial = (
        df.withColumn(
            "__salted", salted_key_col(F.col(class_key), F.col(url), n_salts)
        )
        .groupBy("__salted")
        .agg(F.count("*").alias("__partial"))
    )
    return (
        partial.withColumn(class_key, desalt_col(F.col("__salted")))
        .groupBy(class_key)
        .agg(F.sum("__partial").cast("long").alias("n_urls"))
    )
