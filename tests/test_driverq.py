"""Replicates the driver's correctness gate locally: every QUERIES entry
vs its ORACLE_SQL twin on the sf0.001 tables (order-insensitive value
comparison, column names sorted)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from heritrix_spark.driverq import ORACLE_SQL, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows(records, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in records]
    # None is not orderable against str/int — sort on a None-safe key,
    # compare the raw tuples (the real driver stringifies before
    # hashing, which handles nulls the same way on both sides)
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    if name not in ORACLE_SQL:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    res = duck.execute(ORACLE_SQL[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    got = _rows(spark_rows, spark_cols)
    exp = _rows(duck_rows, duck_cols)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    mismatches = [(g, e) for g, e in zip(got, exp) if g != e]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"
