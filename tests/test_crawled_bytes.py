"""CrawledBytesHistotable classification/tally law + the ArchiveUtils
formatBytesForDisplay rendering law (Spark Column vs Python twin vs
hand-derived Java goldens)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.reports import (
    crawled_bytes_histotable,
    crawled_bytes_summary,
    format_bytes_col,
    format_bytes_py,
)

# (amount, expected) — expected derived by hand from
# ArchiveUtils.java:579-598 (HALF_EVEN, grouping, <10 -> 1 digit)
GOLDENS = [
    (0, "0 B"),
    (-7, "0 B"),
    (1, "1.0 B"),
    (9, "9.0 B"),
    (10, "10 B"),
    (999, "999 B"),
    (1023, "1,023 B"),
    (1024, "1.0 KiB"),
    (1536, "1.5 KiB"),
    (2304, "2.2 KiB"),  # 2.25 -> HALF_EVEN -> 2.2
    (7936, "7.8 KiB"),  # 7.75 -> HALF_EVEN -> 7.8
    (10240, "10 KiB"),
    (1024 * 1023, "1,023 KiB"),
    (1024 * 1024, "1.0 MiB"),
    (int(2.5 * 1024 * 1024), "2.5 MiB"),
    (1024 ** 3, "1.0 GiB"),
    (1024 ** 4, "1.0 TiB"),
    (1024 ** 5, "1,024 TiB"),  # unit capped at TiB, display >= 1024
]


def test_format_bytes_py_goldens():
    for amount, want in GOLDENS:
        assert format_bytes_py(amount) == want, amount


def test_format_bytes_col_matches_twin(spark):
    df = spark.createDataFrame([(a,) for a, _ in GOLDENS], ["amount"])
    got = {
        r["amount"]: r["display"]
        for r in df.select(
            "amount", format_bytes_col(F.col("amount")).alias("display")
        ).collect()
    }
    for amount, want in GOLDENS:
        assert got[amount] == want, amount


def test_classification_precedence(spark):
    # 304 wins over identical digest (CrawledBytesHistotable.java:45-50)
    rows = [
        (304, 100, True),   # notModified despite identical digest
        (304, 50, None),    # notModified
        (200, 10, True),    # dupByHash
        (200, 7, False),    # novel
        (503, 3, None),     # novel (null identical -> false)
    ]
    df = spark.createDataFrame(
        rows, "fetch_status int, content_size long, identical_digest boolean"
    )
    got = {
        r["class"]: (r["bytes"], r["urls"])
        for r in crawled_bytes_histotable(df).collect()
    }
    assert got == {
        "notModified": (150, 2),
        "dupByHash": (10, 1),
        "novel": (10, 2),
    }


def test_summary_string(spark):
    rows = [(200, 1024, False), (200, 512, True), (304, 512, None)]
    df = spark.createDataFrame(
        rows, "fetch_status int, content_size long, identical_digest boolean"
    )
    (s,) = crawled_bytes_summary(df).collect()[0]
    assert s == "2.0 KiB crawled (1.0 KiB novel, 512 B dupByHash, 512 B notModified)"


def test_summary_omits_absent_classes(spark):
    df = spark.createDataFrame(
        [(200, 2048, False)],
        "fetch_status int, content_size long, identical_digest boolean",
    )
    (s,) = crawled_bytes_summary(df).collect()[0]
    assert s == "2.0 KiB crawled (2.0 KiB novel)"
