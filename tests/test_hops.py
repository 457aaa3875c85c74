"""Hops-path golden cases (FIXTURES.md §5f; CrawlURI.java:679-723,1668-1675)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.functions.hops import (
    extend_hops_path_py,
    hop_count_col,
    hop_count_py,
    link_hops_col,
    link_hops_py,
    trans_hops_col,
    trans_hops_py,
    extend_hops_path_col,
)

# (hops_path, hop_count, link_hops, trans_hops)
GOLDEN = [
    ("", 0, 0, 0),
    ("L", 1, 1, 0),
    ("LLLE", 4, 3, 1),
    ("LLP", 3, 2, 1),
    ("LEXR", 4, 1, 3),
    ("EE", 2, 0, 2),
    ("51+" + "L" * 50, 101, 101, 0),
    ("3+" + "L" * 48 + "EE", 53, 51, 2),
]


@pytest.mark.parametrize("path,hc,lh,th", GOLDEN)
def test_hops_py(path, hc, lh, th):
    assert hop_count_py(path) == hc
    assert link_hops_py(path) == lh
    assert trans_hops_py(path) == th


def test_hops_spark(spark):
    df = spark.createDataFrame([(p,) for p, *_ in GOLDEN], ["hops_path"])
    got = {
        r.hops_path: (r.hc, r.lh, r.th)
        for r in df.select(
            "hops_path",
            hop_count_col("hops_path").alias("hc"),
            link_hops_col("hops_path").alias("lh"),
            trans_hops_col("hops_path").alias("th"),
        ).collect()
    }
    for path, hc, lh, th in GOLDEN:
        assert got[path] == (hc, lh, th), f"{path!r}: {got[path]}"


def test_extend_overflow_py():
    p = ""
    for _ in range(50):
        p = extend_hops_path_py(p, "L")
    assert p == "L" * 50
    p = extend_hops_path_py(p, "E")
    assert p == "1+" + "L" * 49 + "E"
    assert hop_count_py(p) == 51
    p = extend_hops_path_py(p, "L")
    assert p == "2+" + "L" * 48 + "EL"


def test_extend_overflow_spark_matches_py(spark):
    paths = ["", "L" * 50, "1+" + "L" * 49 + "E", "LLE", "9+" + "X" * 50]
    df = spark.createDataFrame([(p,) for p in paths], ["hops_path"])
    got = {
        r.hops_path: r.ext
        for r in df.select(
            "hops_path",
            extend_hops_path_col("hops_path", F.lit("L")).alias("ext"),
        ).collect()
    }
    for p in paths:
        assert got[p] == extend_hops_path_py(p, "L"), f"{p!r}"
