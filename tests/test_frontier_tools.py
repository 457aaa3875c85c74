"""deleteURIs semantics: full-match anchoring on both regexes, correct
kept/deleted split, per-queue tallies."""

from __future__ import annotations

from heritrix_spark.operators.frontier_tools import delete_uris


def test_delete_uris_full_match_semantics(spark):
    rows = [
        ("example,a,", "http://a.example/spam/1"),
        ("example,a,", "http://a.example/keep/2"),
        ("example,ab,", "http://ab.example/spam/3"),   # queue NOT full-matched
        ("example,b,", "http://b.example/spam/4"),     # queue not matched
        ("example,a,", "http://a.example/spamtail"),   # uri not full-matched
    ]
    f = spark.createDataFrame(rows, "class_key string, url string")
    # java matches(): "example,a," must match the WHOLE key
    kept, counts = delete_uris(
        f, queue_regex="example,a,", uri_regex=r"http://a\.example/spam/\d"
    )
    assert sorted(r["url"] for r in kept.collect()) == [
        "http://a.example/keep/2",
        "http://a.example/spamtail",
        "http://ab.example/spam/3",
        "http://b.example/spam/4",
    ]
    c = {r["class_key"]: (r["deleted"], r["remaining"]) for r in counts.collect()}
    assert c == {
        "example,a,": (1, 2),
        "example,ab,": (0, 1),
        "example,b,": (0, 1),
    }


def test_delete_uris_null_rows_kept_and_counted(spark):
    f = spark.createDataFrame(
        [("example,a,", "http://a.example/spam/1"),
         (None, "http://orphan.example/x"),
         ("example,a,", None)],
        "class_key string, url string",
    )
    kept, counts = delete_uris(
        f, queue_regex="example,a,", uri_regex=".*spam.*"
    )
    # null-keyed rows are NOT matched: they stay in kept and count as
    # remaining (a bare null predicate would drop them from kept while
    # tallying them remaining)
    assert kept.count() == 2
    c = {r["class_key"]: (r["deleted"], r["remaining"])
         for r in counts.collect()}
    assert c == {"example,a,": (1, 1), None: (0, 1)}
