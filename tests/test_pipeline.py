"""Training-data pipeline operators: dedup (exact/minhash/simhash/
jaccard), similarity search (brute-force + LSH), text stats, multimodal
plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from heritrix_spark.pipeline.similarity import brute_force_topk, lsh_bucketed_topk
from heritrix_spark.pipeline.textstats import (
    lang_id_col,
    quality_score_col,
    token_count_col,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and AGAIN!"),  # near dup
        (4, "der hund und die katze sind nicht ein problem mit den"),
        (5, "completely different content about spark shuffles and joins here"),
        (6, "le chat et le chien sont les animaux que pour des"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2  # docs 1+2 collapse
    assert sum(groups.values()) == 6
    assert len(groups) == 5


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["a_id"], r["b_id"]) for r in minhash_lsh_dedup(docs).collect()}
    assert (1, 2) in pairs  # identical docs always collide
    # different-language docs must not collide
    assert (4, 6) not in pairs and (4, 5) not in pairs


def test_ngram_jaccard(spark, docs):
    pairs = minhash_lsh_dedup(docs)
    scored = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, pairs, threshold=0.0).collect()
    }
    assert scored[(1, 2)] == 1.0


def test_simhash_groups_exact_dups(spark, docs):
    out = {r["keep_id"]: r["n_docs"] for r in simhash_dedup(docs).collect()}
    assert out.get(1, 0) >= 2


def test_brute_force_topk(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.2]),  # closest to 2
        (4, [-1.0, 0.0, 0.1]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = brute_force_topk(df, df.filter(F.col("vec_id").isin(0, 2)), k=1)
    got = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    assert got == {0: 1, 2: 3}


def test_lsh_topk_recall_on_identical(spark):
    import random

    rng = random.Random(5)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    vecs.append((1000, list(vecs[0][1])))  # exact duplicate of vec 0
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = lsh_bucketed_topk(df, df.filter(F.col("vec_id") == 1000), dim=16, k=1)
    rows = out.collect()
    assert rows and rows[0]["neighbor_id"] == 0  # identical vector shares every bucket


def test_textstats(spark, docs):
    out = {
        r["doc_id"]: (r["lang"], r["n_tok"], r["q"])
        for r in docs.select(
            "doc_id",
            lang_id_col(F.col("text")).alias("lang"),
            token_count_col(F.col("text")).alias("n_tok"),
            quality_score_col(F.col("text")).alias("q"),
        ).collect()
    }
    assert out[1][0] == "en"
    assert out[4][0] == "de"
    assert out[6][0] == "fr"
    assert out[1][1] == 12
    assert 0.0 <= out[1][2] <= 1.0


def test_multimodal_fake_features(spark):
    from heritrix_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        sample_video_frames,
    )

    rows = [
        ("m1", "image", b"\x01\x02\x03", "image/png", 4, 4, None),
        ("m2", "video", b"\x04\x05", "video/mp4", 8, 8, 3500),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert feats["m1"]["n_bytes"] == 3
    assert len(feats["m1"]["feature"]) == 8
    # determinism across partitionings
    feats2 = {
        r["media_id"]: r["feature"]
        for r in extract_features(media.repartition(4), fake=True).collect()
    }
    assert feats2["m1"] == list(feats["m1"]["feature"])

    frames = sample_video_frames(media, every_ms=1000).collect()
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000, 3000]

    with pytest.raises(Exception, match="NotImplementedError|not available"):
        extract_features(media, fake=False).collect()
