"""Stateful streaming URL-seen filter: UriUniqFilter as a true
Structured Streaming stateful operator (``applyInPandasWithState``).

The batch path (operators/seen.py) re-expresses the reference's
FP-merge batch filter as an exact anti-join against stored state; this
module is the *push-model* twin for continuous feeds: per-shard 64-bit
fingerprint sets held in Spark streaming state — the analog of
MemFPMergeUriUniqFilter's in-memory sorted fingerprint set
(heritrix3/commons/.../util/fingerprint + FPMergeUriUniqFilter.java:43-46,
after Najork & Heydon 2001 §3.2). Fingerprints instead of full keys is
the reference's own design (BdbUriUniqFilter.createKey's host-prefixed
64-bit FP, BdbUriUniqFilter.java:303-312); the 2^-64-per-pair collision
risk is the accuracy tradeoff the reference already accepts.

Scale shape (10^10 URLs):
- state is partitioned by ``shard = pmod(xxhash64(canon), n_shards)`` —
  the SAME sharding as the stored seen table (operators/seen.shard_col),
  so each state partition holds |seen|/n fingerprints and the seen set
  itself never crosses a shuffle; only the candidate micro-batch moves.
- fingerprints are computed Spark-side (``F.xxhash64`` — codegen, no
  Python hashing); the Python state function does only vectorized
  pandas set membership per group, which is exactly the "custom
  stateful operator" case applyInPandasWithState exists for.
- in production the state store should be RocksDB
  (``spark.sql.streaming.stateStore.providerClass``) so per-shard FP
  sets page to disk instead of executor heap (pinned working by
  tests/test_stateful_stream.py::test_stateful_dedup_on_rocksdb_state_store).
- SIZE ``n_shards`` TO THE CORPUS, not the cluster: state is one FP
  array per shard and a touched shard rewrites its whole array at
  commit, so per-shard cardinality is the write-amplification unit.
  Pick ``n_shards ≈ |expected seen| / 10^6`` (10^10 URLs → ~10^4
  shards; shard count is free — it's just a hash-shuffle key — while
  oversized shards turn every micro-batch commit into a multi-GB blob
  rewrite). The fixture default of 64 is fixture-sized.

Semantics per micro-batch == one ``add()`` batch of the UriUniqFilter:
batch-internal duplicates collapse first-wins along ``order_cols``
(the scheduling-order law, same as seen.collapse_batch_duplicates),
then membership against state, then state absorbs the novel FPs —
first discovery wins across the whole stream, exactly once per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_STATE_SCHEMA = "fps array<long>"


def dedup_stream(
    candidates: DataFrame,
    key: str = "canon_url",
    n_shards: int = 64,
    order_cols: tuple[str, ...] = ("parent_ordinal", "link_seq"),
) -> DataFrame:
    """Streaming first-discovery-wins dedup: returns the novel rows of
    each micro-batch (original columns), maintaining per-shard FP-set
    state across batches. ``candidates`` must be a streaming DataFrame
    already carrying the canonical key column ``key`` and the
    ``order_cols`` that define in-batch scheduling order."""
    out_cols = list(candidates.columns)
    out_schema = candidates.schema
    order = list(order_cols)

    prepared = candidates.withColumn("__fp", F.xxhash64(F.col(key))).withColumn(
        "__shard", F.pmod(F.col("__fp"), F.lit(n_shards)).cast("int")
    )

    def filter_group(group_key, pdf_iter, state: GroupState):
        import pandas as pd

        (prev,) = state.get if state.exists else ([],)
        seen = set(prev)
        parts = list(pdf_iter)
        if not parts:
            if False:
                yield None
            return
        pdf = pd.concat(parts, ignore_index=True)
        # in-batch first-wins along the scheduling order (vectorized)
        pdf = pdf.sort_values(order, kind="mergesort").drop_duplicates(
            "__fp", keep="first"
        )
        novel = pdf[~pdf["__fp"].isin(seen)]
        if len(novel):
            state.update((sorted(seen | set(novel["__fp"].tolist())),))
        yield novel[out_cols]

    return prepared.groupBy("__shard").applyInPandasWithState(
        filter_group,
        outputStructType=out_schema,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
