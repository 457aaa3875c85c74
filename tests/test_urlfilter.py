"""URL-level corpus filter (pipeline/urlfilter.py): pure-Python twin of
the badword score, blocklist verdict law, and the registered-domain
subdomain-coverage property of the PSL-keyed join."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.pipeline.urlfilter import (
    BADWORDS_MILLI,
    DEFAULT_THRESHOLD_MILLI,
    blocklist_df,
    url_filter,
)

URLS = [
    # (url, expected_score_milli, expected_blocked)
    ("http://news.example/today.html", 0, False),
    ("http://bad.example/anything", 0, True),
    ("http://www.bad.example/sub", 0, True),  # www stripped by canon chain
    ("http://a.b.bad.example/deep", 0, True),  # any subdomain, same reg-domain
    ("http://bad.example:8080/port", 0, True),  # port folded into the key
    ("http://ok.example/casino/slots", 1000, False),  # hard term blocks alone
    ("http://ok.example/poker", 800, False),  # soft term under threshold
    ("http://ok.example/poker-webcam", 1200, False),  # soft combo crosses
    ("http://ok.example/free-bet.html", 300, False),
    ("http://ok.example/CASINO", 1000, False),  # case-insensitive
    ("http://virgin.co.uk.evil.example/x", 0, False),  # not a co.uk block
    ("http://www.virgin.co.uk/x", 0, True),  # multi-label PSL suffix
]

BLOCKED_DOMAINS = ["bad.example", "virgin.co.uk"]


def _py_score(url: str) -> int:
    low = url.lower()
    return sum(wt for w, wt in BADWORDS_MILLI if w in low)


def test_url_filter_twin(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _, _) in enumerate(URLS)], "i int, url string")
    bl = blocklist_df(spark, BLOCKED_DOMAINS)
    rows = {r.i: r for r in url_filter(df, bl).collect()}
    for i, (url, want_score, want_blocked) in enumerate(URLS):
        r = rows[i]
        assert r.badword_score_milli == want_score == _py_score(url), url
        assert r.blocked_domain == want_blocked, url
        if want_blocked:
            want_verdict = "blocked_domain"
        elif want_score >= DEFAULT_THRESHOLD_MILLI:
            want_verdict = "badword"
        else:
            want_verdict = "keep"
        assert r.url_verdict == want_verdict, url


def test_url_filter_no_blocklist(spark):
    df = spark.createDataFrame([(0, "http://bad.example/casino")], "i int, url string")
    r = url_filter(df, None).collect()[0]
    assert not r.blocked_domain
    assert r.url_verdict == "badword"


def test_blocklist_df_normalizes(spark):
    bl = blocklist_df(spark, ["  BAD.example ", "bad.example", "", "other.test"])
    keys = sorted(r.domain_key for r in bl.collect())
    assert len(keys) == 2  # dedup + blank dropped
    assert all(k.endswith(",") for k in keys)  # reduced-SURT form


def test_url_filter_plan_no_corpus_shuffle(spark):
    """The verdict plan must contain no Exchange on the corpus side —
    only the broadcast of the blocklist."""
    df = spark.range(100).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"), F.lit(".example/p")).alias("url")
    )
    bl = blocklist_df(spark, ["h3.example"])
    plan = url_filter(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" not in plan
    import re

    # shuffle exchanges only allowed below the broadcast side (none expected)
    assert not re.search(r"Exchange hashpartitioning", plan), plan


def test_text_badword_filter_word_boundaries(spark):
    """C4 matches WORDS, not substrings: 'bet' must not fire inside
    'alphabet'/'betting', must fire at punctuation/hyphen boundaries,
    start/end of text, and case-insensitively."""
    from heritrix_spark.pipeline.urlfilter import text_badword_filter

    docs = [
        (0, "the alphabet and betting are fine", 0, "keep"),
        (1, "place a bet now", 300, "keep"),
        (2, "CASINO!", 1000, "badword"),
        (3, "free-bet and poker-webcam tonight", 1500, "badword"),
        (4, "bet", 300, "keep"),
        (5, None, 0, "keep"),
        (6, "viagra, pills; warez", 2600, "badword"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in docs], "doc_id int, text string"
    )
    rows = {r.doc_id: r for r in text_badword_filter(df).collect()}
    for i, t, want_score, want_verdict in docs:
        assert rows[i].badword_score_milli == want_score, t
        assert rows[i].text_verdict == want_verdict, t


def test_text_badword_regex_metachars(spark):
    """Words with regex metacharacters are matched literally, keeping
    the shared-list contract with the substring-based URL probe."""
    from heritrix_spark.pipeline.urlfilter import text_badword_filter

    words = (("c++", 500), (".onion", 700))
    docs = [
        (0, "learn c++ today", 500),
        (1, "cxx is not c-plus-plus", 0),   # '.'/'+' must not act as regex
        (2, "visit site.onion now", 700),
        (3, "visit siteXonion now", 0),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in docs], "doc_id int, text string")
    rows = {r.doc_id: r.badword_score_milli for r in text_badword_filter(df, words=words).collect()}
    for i, t, want in docs:
        assert rows[i] == want, t
