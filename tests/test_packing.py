"""pack_sequences invariants: exact packing, piece reassembly, and
independence from the bucket decomposition."""

from __future__ import annotations

from collections import defaultdict

from heritrix_spark.pipeline.packing import pack_sequences


def _docs(spark, n=60):
    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 7) % 23)))  # 0..22 tokens
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_pack_invariants(spark):
    df, rows = _docs(spark)
    block = 16
    out = pack_sequences(df, block=block, num_buckets=8).collect()
    tok_counts = {i: len(t.split()) for i, t in rows if t.split()}

    # 1. every example except the last is exactly `block` tokens
    per_ex = defaultdict(int)
    for r in out:
        per_ex[r["example_id"]] += r["piece_len"]
    last = max(per_ex)
    assert set(per_ex) == set(range(last + 1))  # contiguous example ids
    for e, tot in per_ex.items():
        assert tot == block or (e == last and 0 < tot <= block)

    # 2. pieces of a doc reassemble 0..n_tokens contiguously, in
    #    consecutive examples
    per_doc = defaultdict(list)
    for r in out:
        per_doc[r["doc_id"]].append(r)
    assert set(per_doc) == set(tok_counts)  # zero-token docs absent
    for d, pieces in per_doc.items():
        pieces.sort(key=lambda r: r["example_id"])
        assert [p["example_id"] for p in pieces] == list(
            range(pieces[0]["example_id"], pieces[-1]["example_id"] + 1)
        )
        pos = 0
        for p in pieces:
            assert p["doc_offset"] == pos
            assert p["n_tokens"] == tok_counts[d]
            pos += p["piece_len"]
        assert pos == tok_counts[d]
        # mid-pieces start at example offset 0
        for p in pieces[1:]:
            assert p["example_offset"] == 0

    # 3. global order: start offsets are the exclusive prefix sums in
    #    doc_id order
    want = 0
    for i in sorted(tok_counts):
        got = per_doc[i][0]["start_offset"]
        assert got == want, i
        want += tok_counts[i]


def test_pack_bucket_invariance(spark):
    df, _ = _docs(spark)
    outs = []
    for nb in (1, 3, 8, 32):
        rows = pack_sequences(df, block=16, num_buckets=nb).collect()
        outs.append(sorted(map(tuple, rows)))
    assert outs[0] == outs[1] == outs[2] == outs[3]


def test_pack_explicit_bound_matches_derived(spark):
    df, _ = _docs(spark)
    a = sorted(map(tuple, pack_sequences(df, block=16).collect()))
    b = sorted(
        map(tuple, pack_sequences(df, block=16, id_bound=59).collect())
    )
    assert a == b


def test_pack_hash_scale_ids_no_overflow(spark):
    # ids near 2^62: `id * num_buckets` would overflow int64; the
    # width-based bucketing must stay exact and monotone
    ids = [2**62 + 17, 2**61, 5, 2**62, 2**60 + 3]
    rows = [(i, " ".join(f"w{j}" for j in range(7 + i % 5))) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        pack_sequences(df, block=8, num_buckets=200).collect(),
        key=lambda r: (r["doc_id"], r["example_id"]),
    )
    # sequential twin
    want = []
    start = 0
    for i in sorted(ids):
        n = 7 + i % 5
        for e in range(start // 8, (start + n - 1) // 8 + 1):
            want.append((i, e, max(start, e * 8) - e * 8,
                         max(start, e * 8) - start,
                         min(start + n, (e + 1) * 8) - max(start, e * 8)))
        start += n
    got = [(r["doc_id"], r["example_id"], r["example_offset"],
            r["doc_offset"], r["piece_len"]) for r in out]
    assert sorted(got) == sorted(want)
