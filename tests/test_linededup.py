"""C4-style corpus-wide duplicate-line removal (pipeline/linededup.py)."""

from __future__ import annotations

from heritrix_spark.pipeline.linededup import line_dedup, line_dedup_py


def test_line_dedup_matches_py_twin(spark):
    docs = [
        (1, "alpha one\ncommon footer\nbeta"),
        (2, "gamma two\ncommon footer\ndelta"),
        (3, "epsilon three\ncommon footer"),
        (4, "common footer\ncommon footer"),  # within-doc repeats count too
        (5, "unique only"),
        (6, "pair line\nzeta"),
        (7, "pair line\neta"),  # count 2 < 3 → kept
    ]
    df = spark.createDataFrame(docs, schema="doc_id int, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in line_dedup(df, min_count=3).collect()
    }
    exp = {d: (t, n) for d, t, n in line_dedup_py(docs, min_count=3)}
    assert got == exp
    # 'common footer' appears 5 times → removed everywhere;
    # doc 4 becomes empty but still yields a row (C4 empty-page analog)
    assert got[4] == ("", 2)
    assert got[7] == ("pair line\neta", 0)


def test_line_dedup_preserves_order_and_threshold(spark):
    # a line at exactly min_count is removed (>=, not >)
    docs = [(i, f"keep {i}\nboundary line") for i in range(3)]
    df = spark.createDataFrame(docs, schema="doc_id int, text string")
    got = {r["doc_id"]: r["clean_text"] for r in line_dedup(df, min_count=3).collect()}
    assert got == {i: f"keep {i}" for i in range(3)}

    # order preservation with interleaved removals
    docs2 = [
        (1, "a\nX\nb\nX\nc"),
        (2, "X"),
        (3, "X"),
    ]
    df2 = spark.createDataFrame(docs2, schema="doc_id int, text string")
    got2 = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in line_dedup(df2, min_count=3).collect()
    }
    assert got2[1] == ("a\nb\nc", 2)
    assert got2[2] == ("", 1)
