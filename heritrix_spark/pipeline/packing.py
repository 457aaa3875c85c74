"""Sequence packing: lay the corpus token stream into fixed-length
training examples (block size B), documents split across example
boundaries — the standard LM-pretraining packing step.

The global token offset of each document is a weighted prefix sum along
a total document order.  A naive window over that order is a
single-partition plan; this uses the same two-phase shape as
``operators/prepare.assign_ordinals``: monotone-bucket the id space
(one hash shuffle, order-preserving across buckets), cumulative-sum
WITHIN each bucket, then add per-bucket offsets computed by a lazy
cumulative window over one row per bucket (tiny) and broadcast back —
no driver-side data, no single-partition stage over corpus rows.
Piece generation is a row-local ``sequence``+``transform`` explode
(pipelined into the scan side of the window output; a document
spanning M examples emits M pieces).

All arithmetic is integer (`div`/`pmod`) so offsets stay exact past
2^53 tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from heritrix_spark.pipeline.textstats import tokens_col


def pack_sequences(
    docs: DataFrame,
    block: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
    id_bound: int | None = None,
) -> DataFrame:
    """One row per (document, example) piece:

    (id_col, n_tokens, start_offset, example_id, example_offset,
    doc_offset, piece_len) — token ``doc_offset .. doc_offset+piece_len``
    of the document lands at ``example_offset`` of ``example_id``.
    Zero-token documents occupy no space and emit no piece.

    ``id_bound`` is the (inclusive) max of ``id_col``; when None it is
    read with one column-pruned aggregate (the only driver action)."""
    spark = docs.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = docs.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("__n"),
    ).filter(F.col("__n") > 0)
    if id_bound is None:
        id_bound = docs.agg(F.max(F.col(id_col))).collect()[0][0] or 0

    # width-based monotone bucketing: `id div width` never multiplies,
    # so hash-scale ids (up to 2^63-1) cannot overflow — `id * B` would
    # throw under ANSI mode (or wrap non-monotone without it)
    width = max(int(id_bound) // num_buckets, 0) + 1
    bucket = F.expr(f"cast(`{id_col}` as long) div {width}").cast("int")
    work = base.withColumn("__bucket", bucket).repartition(
        num_buckets, F.col("__bucket")
    )
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    work = work.withColumn(
        "__local", F.coalesce(F.sum("__n").over(w_local), F.lit(0))
    )
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        work.groupBy("__bucket")
        .agg(F.sum("__n").alias("__bsum"))
        .select(
            "__bucket",
            F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    placed = (
        work.join(F.broadcast(offsets), "__bucket")
        .withColumn("__start", F.col("__off") + F.col("__local"))
        .drop("__bucket", "__local", "__off")
    )
    b = int(block)
    pieces = F.transform(
        F.sequence(
            F.expr(f"__start div {b}"),
            F.expr(f"(__start + __n - 1) div {b}"),
        ),
        lambda e: F.struct(
            e.cast("long").alias("example_id"),
            (F.greatest(F.col("__start"), e * b) - e * b)
            .cast("int")
            .alias("example_offset"),
            (F.greatest(F.col("__start"), e * b) - F.col("__start"))
            .cast("int")
            .alias("doc_offset"),
            (
                F.least(F.col("__start") + F.col("__n"), (e + 1) * b)
                - F.greatest(F.col("__start"), e * b)
            )
            .cast("int")
            .alias("piece_len"),
        ),
    )
    return placed.select(
        id_col,
        F.col("__n").cast("int").alias("n_tokens"),
        F.col("__start").alias("start_offset"),
        F.explode(pieces).alias("__p"),
    ).select(
        id_col,
        "n_tokens",
        "start_offset",
        F.col("__p")["example_id"].alias("example_id"),
        F.col("__p")["example_offset"].alias("example_offset"),
        F.col("__p")["doc_offset"].alias("doc_offset"),
        F.col("__p")["piece_len"].alias("piece_len"),
    )
