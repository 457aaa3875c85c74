"""FetchHistoryProcessor / IdenticalDigestDecideRule / WARC revisit
selection vs a pure-Python replay of the Java semantics.

The twin below re-implements the reference literally — a fixed-size
entry array rotated up with insert-at-0 (FetchHistoryProcessor.java:
96-117), FetchHTTP.setSizes' 304 reference-length carry-forward
(:747-766), and the IdenticalDigestDecideRule / writeHttpRecords
if-chain — and the Spark windows must reproduce it row for row.
(FetchHistoryProcessorTest.java is an empty TODO stub upstream; this
is the test it never had.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.recrawl import (
    fetch_history,
    has_identical_digest_col,
    warc_record_type_col,
)

# ---------------------------------------------------------- python twin


def _twin(rows, k):
    """Replay FetchHistoryProcessor + setSizes per URI. ``rows`` are
    (url, seq, status, began, digest, etag, lm, clen) sorted by seq."""
    out = {}
    by_url = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1])):
        url, seq, status, began, digest, etag, lm, clen = r
        history = by_url.get(url, [None] * k)
        # FetchHTTP.setSizes: 304 carries history[0]'s reference length
        if (
            status == 304
            and history[0] is not None
            and "reference_length" in history[0]
        ):
            ref = history[0]["reference_length"]
        else:
            ref = clen
        entry = {"fetch_status": status, "fetch_began_ms": began,
                 "reference_length": ref}
        if digest is not None:
            entry["content_digest"] = digest
        if etag is not None:
            entry["etag"] = etag
        if lm is not None:
            entry["last_modified"] = lm
        history = [entry] + history[: k - 1]
        by_url[url] = history
        # IdenticalDigestDecideRule.hasIdenticalDigest
        identical = (
            history[0] is not None
            and "content_digest" in history[0]
            and len(history) > 1
            and history[1] is not None
            and "content_digest" in history[1]
            and history[0]["content_digest"] == history[1]["content_digest"]
        )
        # writeHttpRecords if-chain
        if identical:
            rec = "warcRevisit:digest"
        elif status == 304:
            rec = "warcRevisit:notModified"
        else:
            rec = "response"
        out[(url, seq)] = (list(history), ref, identical, rec)
    return out


def _mkrows():
    rows = []
    for u in range(12):
        url = f"http://h{u % 5}.example/{u}"
        for k in range(1 + u % 6):
            h = (u * 31 + k * 17) % 13
            status = 404 if h == 3 else (304 if h in (5, 8) else 200)
            digest = (
                None
                if status == 304 or h == 7
                else f"sha1:{(u * 7 + k // (1 + u % 3)) % 9}"
            )
            etag = f'"e{k % 3}"' if h % 3 == 0 else None
            lm = f"Mon, 0{k % 9 + 1} Jan 2024" if h % 4 == 1 else None
            clen = 0 if status == 304 else 1000 + (u * 37 + k * 101) % 900
            rows.append(
                (url, k, status, 1_600_000_000_000 + k * 7200_000, digest,
                 etag, lm, clen)
            )
    return rows


def _run(spark, rows, k):
    df = spark.createDataFrame(
        rows,
        "url string, seq int, fetch_status int, ts_ms long, "
        "content_digest string, etag string, last_modified string, "
        "content_length long",
    )
    out = fetch_history(
        df, k=k, key_cols=("url",), order_cols=("seq",),
        etag="etag", last_modified="last_modified",
        content_length="content_length",
    )
    return out.select(
        "url", "seq", "fetch_status", "reference_length", "history",
        has_identical_digest_col(F.col("history")).alias("identical"),
        warc_record_type_col(
            has_identical_digest_col(F.col("history")), F.col("fetch_status")
        ).alias("rec"),
    ).collect()


def _entry_to_dict(e):
    d = {"fetch_status": e["fetch_status"],
         "fetch_began_ms": e["fetch_began_ms"],
         "reference_length": e["reference_length"]}
    for f in ("content_digest", "etag", "last_modified"):
        if e[f] is not None:
            d[f] = e[f]
    return d


def test_fetch_history_matches_java_twin(spark):
    rows = _mkrows()
    for k in (2, 3):
        want = _twin(rows, k)
        got = _run(spark, rows, k)
        assert len(got) == len(rows)
        for r in got:
            hist, ref, identical, rec = want[(r["url"], r["seq"])]
            live = [e for e in hist if e is not None]
            assert [_entry_to_dict(e) for e in r["history"]] == live, (
                r["url"], r["seq"])
            assert r["reference_length"] == ref
            assert bool(r["identical"]) == identical
            assert r["rec"] == rec


def test_304_chain_carries_first_reference_length(spark):
    # 200(len 500) -> 304 -> 304 -> 200(len 700) -> 304
    rows = [
        ("http://a/x", i, st, 1 + i, f"d{i}" if st != 304 else None,
         None, None, cl)
        for i, (st, cl) in enumerate(
            [(200, 500), (304, 0), (304, 0), (200, 700), (304, 0)]
        )
    ]
    got = {r["seq"]: r["reference_length"] for r in _run(spark, rows, 2)}
    assert got == {0: 500, 1: 500, 2: 500, 3: 700, 4: 700}
    # leading-304 run falls back to the first fetch's own length
    rows2 = [("http://a/y", i, 304, 1 + i, None, None, None, 42 + i)
             for i in range(3)]
    got2 = {r["seq"]: r["reference_length"] for r in _run(spark, rows2, 2)}
    assert got2 == {0: 42, 1: 42, 2: 42}


def test_record_type_toggles(spark):
    identical = F.lit(True)
    not_identical = F.lit(False)
    df = spark.range(1).select(
        warc_record_type_col(identical, F.lit(304)).alias("both_hit"),
        warc_record_type_col(
            identical, F.lit(304),
            write_revisit_for_identical_digests=False,
        ).alias("ident_off"),
        warc_record_type_col(
            not_identical, F.lit(304),
            write_revisit_for_not_modified=False,
        ).alias("notmod_off"),
        warc_record_type_col(
            identical, F.lit(304),
            write_revisit_for_identical_digests=False,
            write_revisit_for_not_modified=False,
        ).alias("all_off"),
    )
    r = df.collect()[0]
    # identical digest outranks 304 (writeHttpRecords if-chain order)
    assert r["both_hit"] == "warcRevisit:digest"
    assert r["ident_off"] == "warcRevisit:notModified"
    assert r["notmod_off"] == "response"
    assert r["all_off"] == "response"


def test_rescheduling_processor_law(spark):
    """ReschedulingProcessor.java:59-73: prereqs never reschedule, the
    -1 default disables, positive delay => now + 1000*delay."""
    from pyspark.sql import functions as F

    from heritrix_spark.operators.recrawl import reschedule_time_col

    df = spark.createDataFrame(
        [("", 5_000), ("L", 5_000), ("LLP", 5_000), ("P", 5_000)],
        "hops string, now long",
    )
    on = {
        r.hops: r.t
        for r in df.select(
            "hops",
            reschedule_time_col(F.col("hops"), F.col("now"), 60).alias("t"),
        ).collect()
    }
    assert on[""] == on["L"] == 65_000
    assert on["LLP"] == on["P"] == -1
    off = df.select(
        reschedule_time_col(F.col("hops"), F.col("now"), -1).alias("t")
    ).collect()
    assert all(r.t == -1 for r in off)
