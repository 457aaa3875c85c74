"""decontaminate / repetition_stats vs hand-computed plants and a
pure-Python twin."""

from __future__ import annotations

from heritrix_spark.pipeline.decontam import decontaminate, repetition_stats


def _py_ngrams(text: str, n: int) -> list[str]:
    toks = text.lower().split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_decontaminate_planted(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota " \
                 "kappa lam mu nu xi omicron"
    bench = spark.createDataFrame([(bench_text,)], "text string")
    docs = spark.createDataFrame(
        [
            # shares the first 13-gram of bench (prefix copy)
            (1, "x " + " ".join(bench_text.split()[:13]) + " y z"),
            # clean document, same vocabulary shuffled
            (2, "beta alpha delta gamma zeta epsilon theta eta kappa "
                "iota mu lam xi nu omicron"),
            # shorter than 13 tokens — can never be contaminated
            (3, "alpha beta gamma delta epsilon"),
            # contains TWO distinct 13-grams of bench (14-token copy)
            (4, " ".join(bench_text.split()[:14])),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in decontaminate(docs, bench, n=13).collect()
    }
    assert out == {1: (1, True), 2: (0, False), 3: (0, False), 4: (2, True)}


def test_decontaminate_matches_py_twin(spark):
    # pseudo-random soup with planted overlaps
    texts = []
    for i in range(40):
        words = [f"w{(i * 13 + j * 7) % 19}" for j in range(5 + i % 25)]
        texts.append((i, " ".join(words)))
    bench_rows = [(t,) for i, t in texts if i % 9 == 0]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "text string")
    n = 8
    bench_ngrams = {g for (t,) in bench_rows for g in _py_ngrams(t, n)}
    want = {
        i: len(set(_py_ngrams(t, n)) & bench_ngrams) for i, t in texts
    }
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate(docs, bench, n=n).collect()
    }
    assert got == want


def test_repetition_stats_planted(spark):
    docs = spark.createDataFrame(
        [
            # "a b" occurs 3x; the repeated 5-gram "a b a b a" occurs 2x
            (1, "a b a b a b a"),
            (2, "one two three four five six"),  # no repetition
            (3, "x"),                            # degenerate: 1 token
            (4, ""),                             # empty
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["total_tokens"], r["top2_count"], r["dup5_tokens"])
        for r in repetition_stats(docs).collect()
    }
    # doc 1: 7 tokens; bigrams = ab ba ab ba ab ba -> top "a b"=3;
    # 5-grams: ababa babab ababa -> 3 total, 2 distinct -> 1 duplicate
    assert out[1] == (7, 3, 1)
    assert out[2] == (6, 1, 0)
    assert out[3] == (1, 0, 0)
    assert out[4] == (0, 0, 0)


def test_repetition_stats_matches_py_twin(spark):
    texts = [
        (i, " ".join(f"t{(i * 11 + j * 5) % 7}" for j in range(i % 17)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["total_tokens"], r["top2_count"], r["dup5_tokens"])
        for r in repetition_stats(docs).collect()
    }
    for i, t in texts:
        toks = t.lower().split()
        bgs = _py_ngrams(t, 2)
        fives = _py_ngrams(t, 5)
        want = (
            len(toks),
            max((bgs.count(b) for b in set(bgs)), default=0),
            len(fives) - len(set(fives)),
        )
        assert got[i] == want, (i, t)


def test_cross_doc_ngram_overlap_planted(spark):
    from heritrix_spark.pipeline.decontam import cross_doc_ngram_overlap

    base = " ".join(f"w{i}" for i in range(20))  # 20 tokens → 8 13-grams
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact duplicate: every gram shared
            (3, " ".join(f"w{i}" for i in range(5, 19))),  # 14-token slice
            (4, "totally different words repeated nowhere else at all "
                "and still more unique filler tokens here to pass "
                "thirteen easily done"),
            (5, "short doc"),  # < 13 tokens → zero grams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["shared_grams"], r["dup_frac"])
        for r in cross_doc_ngram_overlap(docs, n=13).collect()
    }
    # docs 1/2 share all 8 grams with each other; doc 3's 2 grams
    # (tokens 5..18) are interior grams of base, so they're shared too
    assert out[1] == (8, 8, 1.0)
    assert out[2] == (8, 8, 1.0)
    assert out[3] == (2, 2, 1.0)
    assert out[4][1] == 0 and out[4][2] == 0.0
    assert out[5] == (0, 0, 0.0)


def test_cross_doc_ngram_overlap_matches_py_twin(spark):
    from heritrix_spark.pipeline.decontam import cross_doc_ngram_overlap

    rows = []
    for d in range(30):
        toks = [f"t{(d * 7 + i * (1 + d % 5)) % 41}" for i in range(16 + d % 9)]
        rows.append((d, " ".join(toks)))
    n = 13
    grams = {d: set(_py_ngrams(t, n)) for d, t in rows}
    exp = {}
    for d, gs in grams.items():
        shared = sum(
            1 for g in gs
            if any(g in go for do, go in grams.items() if do != d)
        )
        exp[d] = (len(gs), shared,
                  round(shared / len(gs), 6) if gs else 0.0)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["shared_grams"], r["dup_frac"])
        for r in cross_doc_ngram_overlap(df, n=n).collect()
    }
    assert got == exp


def test_remove_contaminated_spans_twin(spark):
    """Planted-overlap removal: coverage mask equals the pure-Python
    union-of-spans twin, including MERGED overlapping matches (union of
    spans, not 2n tokens) and repeated-gram occurrences."""
    from heritrix_spark.pipeline.decontam import remove_contaminated_spans

    n = 3
    bench_texts = ["b1 b2 b3", "b2 b3 b4"]
    docs = [
        (0, "a1 b1 b2 b3 b4 a2 a3"),     # two overlapping matches -> union [1,5)
        (1, "b1 b2 b3 x b1 b2 b3"),      # repeated gram -> two spans
        (2, "clean text only here"),
        (3, "b1 b2"),                    # shorter than n
        (4, ""),
    ]

    def twin(text):
        toks = [t for t in text.lower().split() if t]
        bench = set()
        for bt in bench_texts:
            bt_toks = bt.split()
            for i in range(len(bt_toks) - n + 1):
                bench.add(" ".join(bt_toks[i : i + n]))
        starts = [
            i
            for i in range(len(toks) - n + 1)
            if " ".join(toks[i : i + n]) in bench
        ]
        covered = {j for s in starts for j in range(s, s + n)}
        kept = [t for j, t in enumerate(toks) if j not in covered]
        return len(toks), len(starts), len(toks) - len(kept), " ".join(kept)

    docs_df = spark.createDataFrame(docs, "doc_id int, text string")
    bench_df = spark.createDataFrame([(t,) for t in bench_texts], "text string")
    rows = {
        r.doc_id: r
        for r in remove_contaminated_spans(docs_df, bench_df, n=n).collect()
    }
    for doc_id, text in docs:
        want = twin(text)
        r = rows[doc_id]
        got = (r.n_tokens, r.matched_spans, r.tokens_removed, r.clean_text)
        assert got == want, (doc_id, got, want)
    # the planted cases actually exercise merge + repeat
    assert rows[0].tokens_removed == 4 and rows[0].matched_spans == 2
    assert rows[1].matched_spans == 2 and rows[1].tokens_removed == 6
