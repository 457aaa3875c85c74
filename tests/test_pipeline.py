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


def test_minhash_hot_bucket_cap(spark):
    """A degenerate corpus (thousands of identical docs -> one band
    bucket) must not go quadratic: over-cap buckets emit linear star
    pairs around the bucket min, keeping the cluster connected."""
    n = 2000
    rows = [(i, "boilerplate cookie banner text repeated everywhere") for i in range(n)]
    rows.append((n, "some genuinely distinct document body with novel words"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_dedup(docs, max_bucket=64)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    # linear star, not quadratic: n-1 pairs for the hot cluster
    assert got == {(0, i) for i in range(1, n)}

    # under-cap corpora keep the exact pairwise behavior
    small = spark.createDataFrame(rows[:5], ["doc_id", "text"])
    got_small = {(r["a_id"], r["b_id"]) for r in minhash_lsh_dedup(small).collect()}
    assert got_small == {(a, b) for a in range(5) for b in range(a + 1, 5)}


def test_lsh_topk_bucket_truncation(spark):
    """max_bucket bounds the per-bucket corpus side; results stay
    deterministic and ranked."""
    base = [float(i % 7 + 1) for i in range(8)]
    rows = [(i, [x + (i * 0.001) for x in base]) for i in range(50)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(rows[:2], ["vec_id", "embedding"])
    out = lsh_bucketed_topk(
        corpus, queries, dim=8, k=3, max_bucket=10
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # truncation: only the 10 lowest vec_ids per bucket are candidates
    assert all(r["neighbor_id"] < 10 for r in out)


def test_simhash_neardup_banded_equals_bruteforce(spark):
    """Pigeonhole recall: 4 bands, hd<=3 — the banded join must produce
    exactly the brute-force pair set (computed here from the collected
    band values)."""
    from heritrix_spark.pipeline.dedup import (
        simhash_from_hashes_col,
        simhash_neardup_pairs,
        token_hashes_col,
    )

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = [(i, base + f"tail{i % 7}") for i in range(40)]
    docs += [(100 + i, base) for i in range(4)]  # identical -> hd 0
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r["a_id"], r["b_id"], r["hamming_distance"])
        for r in simhash_neardup_pairs(df, max_hd=3).collect()
    }

    hashed = df.select(
        "doc_id", token_hashes_col(F.col("text")).alias("th")
    )
    bandvals = hashed.select(
        "doc_id",
        *[
            simhash_from_hashes_col(F.col("th"), 16, 16 * j).alias(f"b{j}")
            for j in range(4)
        ],
    ).collect()
    sigs = {r["doc_id"]: tuple(r[f"b{j}"] for j in range(4)) for r in bandvals}
    expected = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hd = sum(
                bin(sigs[a][j] ^ sigs[b][j]).count("1") for j in range(4)
            )
            if hd <= 3:
                expected.add((a, b, hd))
    assert got == expected
    assert any(hd == 0 for (_, _, hd) in got)  # the identical block


def test_simhash_neardup_flood_cap(spark):
    """A boilerplate flood larger than max_bucket collapses to a hub
    star (null hd) instead of a quadratic self-join."""
    from heritrix_spark.pipeline.dedup import simhash_neardup_pairs

    df = spark.createDataFrame(
        [(i, "same boilerplate text everywhere") for i in range(50)],
        "doc_id long, text string",
    )
    rows = simhash_neardup_pairs(df, max_bucket=10).collect()
    assert len(rows) == 49  # hub -> every other member, no quadratic set
    assert all(r["a_id"] == 0 for r in rows)
    assert all(r["hamming_distance"] is None for r in rows)


def test_ivf_topk_full_probe_equals_bruteforce(spark):
    """With nprobe = n_centroids every inverted list is probed, so IVF
    must reproduce the exact brute-force ranking; with nprobe=1 it
    still returns k rows per query (approximate recall)."""
    import math
    import random

    from heritrix_spark.pipeline.similarity import brute_force_topk, ivf_topk

    rng = random.Random(3)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") < 4)

    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(emb, queries, k=4).collect()
    }
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(
            emb, queries, k=4, n_centroids=6, nprobe=6
        ).collect()
    }
    assert full == exact

    narrow = ivf_topk(emb, queries, k=4, n_centroids=6, nprobe=1).collect()
    per_q = {}
    for r in narrow:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3}
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_lsh_neardup_pairs_identical_vectors(spark):
    """Identical vectors share every bucket and survive any threshold;
    dissimilar ones never reach the filter unless a bucket collides,
    and a cap bounds degenerate buckets."""
    import random

    from heritrix_spark.pipeline.similarity import lsh_neardup_pairs

    rng = random.Random(11)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    rows = [(0, base), (1, base), (2, base)]
    rows += [(10 + i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["a_id"], r["b_id"]): r["cosine_micro"]
        for r in lsh_neardup_pairs(emb, dim=16, threshold=0.99).collect()
    }
    assert set(got) >= {(0, 1), (0, 2), (1, 2)}
    assert all(v >= 990_000 for v in got.values())


def test_simhash_votes_matches_hof(spark):
    """The explode/groupBy vote path (simhash_votes +
    band_from_votes_expr) is bit-identical to the higher-order
    F.aggregate form on every band — pins the codegen rewrite."""
    from heritrix_spark.pipeline.dedup import (
        band_from_votes_expr,
        simhash_from_hashes_col,
        simhash_votes,
        token_hashes_col,
    )

    docs = [
        (i, f"alpha beta gamma delta token{i % 9} omega trailing text {i}")
        for i in range(60)
    ]
    docs += [(200, "x"), (201, ""), (202, "  padded   whitespace  run ")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    votes = simhash_votes(df, "text", "doc_id", 64)
    got = {
        r["doc"]: tuple(r[f"b{j}"] for j in range(4))
        for r in votes.select(
            "doc",
            *[band_from_votes_expr(16 * j, 16).alias(f"b{j}") for j in range(4)],
        ).collect()
    }
    want = {
        r["doc_id"]: tuple(r[f"b{j}"] for j in range(4))
        for r in df.select(
            "doc_id",
            *[
                simhash_from_hashes_col(
                    token_hashes_col(F.col("text")), 16, 16 * j
                ).alias(f"b{j}")
                for j in range(4)
            ],
        ).collect()
    }
    assert got == want
