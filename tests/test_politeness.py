"""Robots prefix law (RobotstxtTest.java:105-133 / FIXTURES.md §5e) and
the politeness delay formula (DispositionProcessor.java:231-294)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.operators.politeness import (
    politeness_delay_col,
    politeness_delay_py,
    robots_allows_col,
    robots_allows_py,
)

# (allows, disallows, path, expected_allowed)
ROBOTS_CASES = [
    ([], [], "/anything", True),  # allow-all host
    ([], ["/cgi-bin/"], "/cgi-bin/trap.html", False),
    ([], ["/cgi-bin/"], "/index.html", True),
    ([], ["/"], "/index.html", False),  # full exclusion
    (["/path"], ["/"], "/path/ok.html", True),  # longest allow wins
    (["/path"], ["/"], "/other.html", False),
    (["/foo"], ["/foo/bar"], "/foo/bar/x", False),  # longer disallow wins
    (["/foo/bar"], ["/foo"], "/foo/bar/x", True),
]


@pytest.mark.parametrize("allows,disallows,path,expected", ROBOTS_CASES)
def test_robots_py(allows, disallows, path, expected):
    assert robots_allows_py(allows, disallows, path) is expected


def test_robots_spark(spark):
    df = spark.createDataFrame(
        [(a, d, p) for a, d, p in [(c[0], c[1], c[2]) for c in ROBOTS_CASES]],
        ["allows", "disallows", "path"],
    )
    got = [
        r["ok"]
        for r in df.select(
            robots_allows_col(F.col("allows"), F.col("disallows"), F.col("path")).alias(
                "ok"
            )
        ).collect()
    ]
    # createDataFrame preserves row order for local data
    assert got == [c[3] for c in ROBOTS_CASES]


# (duration_ms, crawl_delay_s, expected_delay_ms) with defaults:
# factor 5.0, clamp [3000, 30000], respect crawl-delay up to 300 s
DELAY_CASES = [
    (100, -1.0, 3000),  # 500 < min → 3000
    (1000, -1.0, 5000),  # 5×1000
    (10000, -1.0, 30000),  # clamped at max
    (100, 20.0, 20000),  # crawl-delay 20 s beats 3000
    (10000, 20.0, 30000),  # delay already ≥ crawl-delay
    (100, 400.0, 300000),  # crawl-delay capped at respect threshold
    (100, 1.0, 3000),  # crawl-delay 1 s below computed min
]


@pytest.mark.parametrize("dur,cd,expected", DELAY_CASES)
def test_delay_py(dur, cd, expected):
    assert politeness_delay_py(dur, cd) == expected


def test_delay_spark(spark):
    df = spark.createDataFrame(
        [(d, c) for d, c, _ in DELAY_CASES], ["dur", "cd"]
    )
    got = [
        r["ms"]
        for r in df.select(
            politeness_delay_col(F.col("dur"), F.col("cd")).alias("ms")
        ).collect()
    ]
    assert got == [e for _, _, e in DELAY_CASES]


def test_delay_matches_py_on_grid(spark):
    cfg = PolitenessConfig()
    cases = [(d, c) for d in (0, 1, 599, 600, 601, 6000, 99999) for c in (-1.0, 0.0, 2.5, 20.0, 301.0)]
    df = spark.createDataFrame(cases, ["dur", "cd"])
    got = {
        (r["dur"], r["cd"]): r["ms"]
        for r in df.select(
            "dur", "cd", politeness_delay_col(F.col("dur"), F.col("cd"), cfg).alias("ms")
        ).collect()
    }
    for d, c in cases:
        assert got[(d, c)] == politeness_delay_py(d, c, cfg), (d, c)
