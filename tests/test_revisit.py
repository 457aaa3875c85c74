"""Adaptive-revisit (AR frontier) law tests.

Goldens hand-derived from WaitEvaluator.java:169-292 +
ChangeEvaluator.java:69-163 defaults; the Spark fold is pinned equal to
the pure-Python twin on generated histories.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from heritrix_spark.operators.revisit import (
    RevisitConfig,
    adaptive_revisit,
    revisit_peek,
    revisit_state_py,
)

INITIAL = 86_400_000
DEFAULT = 259_200_000
MIN_W = 3_600_000
MAX_W = 2_419_200_000

HIST_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("fetch_status", T.IntegerType()),
        T.StructField("digest", T.StringType()),
    ]
)


def _spark_state(spark, visits):
    df = spark.createDataFrame(
        [("u",) + tuple(v) for v in visits], schema=HIST_SCHEMA
    )
    row = adaptive_revisit(df).collect()[0]
    return {
        "last_digest": row["last_digest"],
        "wait_ms": row["wait_ms"],
        "visits": row["visits"],
        "versions": row["versions"],
        "next_ms": row["next_ms"],
    }


# ------------------------------------------------------------- Python goldens


def test_first_visit_initial_wait():
    s = revisit_state_py([(0, 1000, 200, "d1")])
    assert s == {
        "last_digest": "d1",
        "wait_ms": INITIAL,
        "visits": 1,
        "versions": 1,
        "next_ms": 1000 + INITIAL,
    }


def test_unchanged_multiplies_wait():
    s = revisit_state_py([(0, 0, 200, "d1"), (1, 10, 200, "d1")])
    # (long)(86400000 * 1.5) = 129600000 (WaitEvaluator.java:263)
    assert s["wait_ms"] == 129_600_000
    assert (s["visits"], s["versions"]) == (2, 1)


def test_changed_divides_wait():
    s = revisit_state_py([(0, 0, 200, "d1"), (1, 10, 200, "d2")])
    # (long)(86400000 / 1.5) = 57600000 (WaitEvaluator.java:240)
    assert s["wait_ms"] == 57_600_000
    assert (s["visits"], s["versions"]) == (2, 2)
    assert s["last_digest"] == "d2"


def test_min_clamp():
    visits = [(k, k * 10, 200, f"d{k}") for k in range(12)]
    s = revisit_state_py(visits)
    assert s["wait_ms"] == MIN_W  # floor-divided by 1.5 eleven times -> clamped


def test_max_clamp():
    visits = [(k, k * 10, 200, "same") for k in range(12)]
    s = revisit_state_py(visits)
    assert s["wait_ms"] == MAX_W


def test_both_null_digests_hard_return():
    # ChangeEvaluator.java:95-103: both digests null -> no counters, and
    # WaitEvaluator sees no content state -> fixed default wait.
    s = revisit_state_py([(0, 1000, 200, None)])
    assert (s["visits"], s["versions"]) == (0, 0)
    assert s["wait_ms"] == DEFAULT
    assert s["next_ms"] == 1000 + DEFAULT


def test_null_after_digest_counts_as_change():
    s = revisit_state_py([(0, 0, 200, "d1"), (1, 10, 200, None)])
    assert (s["visits"], s["versions"]) == (2, 2)
    assert s["last_digest"] is None
    assert s["wait_ms"] == 57_600_000


def test_failure_is_inert():
    base = revisit_state_py([(0, 0, 200, "d1")])
    with_fail = revisit_state_py([(0, 0, 200, "d1"), (1, 10, -2, "d2")])
    assert with_fail == base


def test_overdue_time_added_when_enabled():
    cfg = RevisitConfig(use_overdue_time=True)
    # visit 0 at t=0 -> next = 86400000; visit 1 arrives 1000 ms late.
    s = revisit_state_py([(0, 0, 200, "d1"), (1, INITIAL + 1000, 200, "d1")], cfg)
    # w = 86400000 + 1000 overdue, then *1.5 (WaitEvaluator.java:228-243,263)
    assert s["wait_ms"] == int((INITIAL + 1000) * 1.5)


# --------------------------------------------------------------- Spark == py


@pytest.mark.parametrize(
    "visits",
    [
        [(0, 1000, 200, "d1")],
        [(0, 0, 200, "d1"), (1, 10, 200, "d1")],
        [(0, 0, 200, "d1"), (1, 10, 200, "d2")],
        [(0, 1000, 200, None)],
        [(0, 0, 200, "d1"), (1, 10, 200, None), (2, 20, 200, None)],
        [(0, 0, -2, "d1"), (1, 10, 200, "d1"), (2, 20, -4, None)],
        [(k, k * 7, 200, f"d{k % 2}") for k in range(9)],
        [(k, k * 7, 200 if k % 3 else -2, None if k % 5 == 2 else f"d{k // 2}")
         for k in range(10)],
    ],
)
def test_spark_matches_python(spark, visits):
    assert _spark_state(spark, visits) == revisit_state_py(visits)


def test_spark_matches_python_fuzz(spark):
    import random

    rng = random.Random(1729)
    rows = []
    expected = {}
    for u in range(40):
        url = f"http://h{u % 7}.example/{u}"
        visits = [
            (
                k,
                1_600_000_000_000 + u * 1000 + k * 37,
                rng.choice([200, 200, 200, 404, -2, -6]),
                rng.choice([None, "a", "b", "c"]),
            )
            for k in range(rng.randrange(0, 8))
        ]
        expected[url] = revisit_state_py(visits)
        rows += [(url,) + v for v in visits]
        if not visits:
            expected.pop(url)  # no rows -> no output row
    df = spark.createDataFrame(rows, schema=HIST_SCHEMA)
    got = {
        r["url"]: {
            "last_digest": r["last_digest"],
            "wait_ms": r["wait_ms"],
            "visits": r["visits"],
            "versions": r["versions"],
            "next_ms": r["next_ms"],
        }
        for r in adaptive_revisit(df).collect()
    }
    assert got == expected


# ------------------------------------------------------------------ peek law


def test_revisit_peek_smallest_next_time(spark):
    rows = [
        ("http://a.example/1", 0, 0, 200, "x"),
        ("http://a.example/2", 0, 0, 200, None),  # default wait -> later
        ("http://b.example/1", 0, 500, 200, "y"),
    ]
    df = spark.createDataFrame(rows, schema=HIST_SCHEMA)
    state = adaptive_revisit(df).withColumn(
        "class_key", F.regexp_extract("url", r"//([^/]+)/", 1)
    )
    got = {r["class_key"]: (r["peek_url"], r["next_ready_ms"])
           for r in revisit_peek(state).collect()}
    assert got["a.example"] == ("http://a.example/1", INITIAL)
    assert got["b.example"] == ("http://b.example/1", 500 + INITIAL)
