"""Persist store/load continuation: splitting a crawl at any boundary
and round-tripping the history through the store must be bit-equal to
never having split it (PersistStoreProcessor / PersistLoadProcessor /
persistKeyFor, recrawl package)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.functions.surt import (
    surt_case_col,
    surt_case_expr_col,
    surt_case_py,
    surt_py,
)
from heritrix_spark.operators.persist import (
    continue_fetch_history,
    persist_key_col,
    persist_store,
)
from heritrix_spark.operators.recrawl import fetch_history


def test_surt_case_preserving(spark):
    urls = [
        "HTTP://WWW.Example.COM:8080/CaseSensitive/Path?Q=1",
        "http://user:PW@Sub.Host.org/x",
        "https://1.2.3.4/Ip",
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url",
        surt_case_col("url").alias("arrow"),
        surt_case_expr_col("url").alias("expr"),
    )
    for r in df.collect():
        want = surt_case_py(r["url"])
        assert r["arrow"] == want and r["expr"] == want, r["url"]
    # case-sensitive vs default: lowercase of the case form == surt form
    assert surt_case_py(urls[0]).lower() == surt_py(urls[0])
    assert surt_case_py(urls[0]) != surt_py(urls[0])


def _mklog():
    rows = []
    for u in range(10):
        url = f"http://h{u % 4}.example/D{u}"  # mixed-case path
        for s in range(1 + u % 6):
            h = (u * 29 + s * 13) % 11
            status = 304 if h in (2, 6) else (404 if h == 9 else 200)
            digest = None if status == 304 or h == 4 else f"sha1:{(u + s // 2) % 5}"
            rows.append(
                (url, s, status, 1000 + s, digest,
                 f'"e{s}"' if h % 2 == 0 else None,
                 f"LM{s}" if h % 3 == 1 else None,
                 0 if status == 304 else 100 + u * 10 + s)
            )
    return rows


_SCHEMA = (
    "url string, seq int, fetch_status int, ts_ms long, "
    "content_digest string, etag string, last_modified string, "
    "content_length long"
)


def test_continuation_equals_unbroken(spark):
    rows = _mklog()
    df = spark.createDataFrame(rows, _SCHEMA).withColumn(
        "persist_key", persist_key_col(F.col("url"))
    )
    for k in (2, 3):
        unbroken = fetch_history(
            df, k=k, key_cols=("persist_key",), order_cols=("seq",),
            etag="etag", last_modified="last_modified",
            content_length="content_length",
        )
        for split in (1, 2, 3):
            h1 = fetch_history(
                df.filter(F.col("seq") < split), k=k,
                key_cols=("persist_key",), order_cols=("seq",),
                etag="etag", last_modified="last_modified",
                content_length="content_length",
            )
            cont = continue_fetch_history(
                df.filter(F.col("seq") >= split), persist_store(h1), k=k
            )
            want = {
                (r["url"], r["seq"]): (r["reference_length"],
                                       [tuple(e) for e in r["history"]])
                for r in unbroken.collect()
                if r["seq"] >= split
            }
            got = {
                (r["url"], r["seq"]): (r["reference_length"],
                                       [tuple(e) for e in r["history"]])
                for r in cont.collect()
            }
            assert got == want, (k, split)


def test_persist_store_keeps_last_fetch_state(spark):
    rows = _mklog()
    df = spark.createDataFrame(rows, _SCHEMA).withColumn(
        "persist_key", persist_key_col(F.col("url"))
    )
    h = fetch_history(
        df, k=2, key_cols=("persist_key",), order_cols=("seq",),
        etag="etag", last_modified="last_modified",
        content_length="content_length",
    )
    stored = {r["persist_key"]: [tuple(e) for e in r["history"]]
              for r in persist_store(h).collect()}
    last = {}
    for r in sorted(h.collect(), key=lambda r: r["seq"]):
        last[r["persist_key"]] = [tuple(e) for e in r["history"]]
    assert stored == last
