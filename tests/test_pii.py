"""PII detection/redaction goldens + a pure-Python (re-module) twin —
Java regex and RE2 must agree because the patterns live in the shared
dialect subset."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from heritrix_spark.pipeline.pii import (
    PII_ORDER,
    PII_PATTERNS,
    pii_stats,
    redact_pii_col,
)

DOCS = [
    (1, "mail me at jane.doe+spam@sub.example.org or bob@x.co today"),
    (2, "server 10.0.255.1 and 192.168.1.100 responded"),
    (3, "ssn 123-45-6789 phone 555-123-4567"),
    (4, "no pii here at all"),
    (5, "edge: 999-99-9999, 1.2.3.4, a@b.io"),
    (6, ""),
]


def _py_redact(text: str) -> str:
    for kind in PII_ORDER:
        text = re.sub(PII_PATTERNS[kind], f"<{kind.upper()}>", text)
    return text


def test_counts_and_redaction_goldens(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_ssn"], r["n_phone"])
        for r in pii_stats(df).collect()
    }
    assert got == {
        1: (2, 0, 0, 0),
        2: (0, 2, 0, 0),
        3: (0, 0, 1, 1),
        4: (0, 0, 0, 0),
        5: (1, 1, 1, 0),
        6: (0, 0, 0, 0),
    }


def test_redaction_matches_python_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r["red"]
        for r in df.select(
            "doc_id", redact_pii_col(F.col("text")).alias("red")
        ).collect()
    }
    for doc_id, text in DOCS:
        assert out[doc_id] == _py_redact(text), doc_id


def test_ssn_and_phone_shapes_disjoint(spark):
    # 3-2-4 must never be half-eaten by 3-3-4 or vice versa
    df = spark.createDataFrame(
        [(1, "a 123-45-6789 b 555-123-4567 c")], "doc_id long, text string"
    )
    row = df.select(redact_pii_col(F.col("text")).alias("r")).first()
    assert row.r == "a <SSN> b <PHONE> c"
