"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side machinery — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested, while the codec step itself is stubbed
(no image/audio libraries ship in this container): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (content-hash-seeded) produces stable
"features" so the distributed plumbing can be asserted end-to-end.

Pattern notes for 100 TB media:
- media rows are big and few → ``mapInPandas`` with small
  ``maxRecordsPerBatch`` so a batch of decoded frames fits executor
  memory;
- decode → feature-extract runs per-partition with zero shuffle; only
  the small feature vectors shuffle afterwards;
- frame sampling happens inside the iterator so full videos never
  materialize as a single pandas cell list.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_real(payload: bytes, kind: str):
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg/librosa) are not available in this "
        "environment; pass fake=True for the deterministic stub decoder"
    )


def _decode_fake(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic fake 'decode + feature-extract': dim floats derived
    from the content digest — stable across runs/partitionings."""
    h = hashlib.md5(payload or b"").digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_features(
    media: DataFrame, fake: bool = False, dim: int = 8
) -> DataFrame:
    """media(MEDIA_SCHEMA) → features(FEATURE_SCHEMA) via an
    Arrow-batched mapInPandas (the only sanctioned Python hot path —
    codecs cannot run JVM-side)."""

    decode = _decode_fake if fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p, k, dim) if fake else decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """video rows → one row per sampled frame timestamp. Frame
    timestamps come from metadata (duration), so sampling is a native
    explode — the decoder (stubbed) would be applied per sampled frame
    afterwards, never to whole videos."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Plumbing for resize: passes metadata through with the new target
    size; the pixel operation is part of the stubbed codec layer."""
    return media.withColumn("width", F.lit(width)).withColumn(
        "height", F.lit(height)
    )
