"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (canonicalize → SURT queue keys →
disposition classification → per-queue frontier counters) on the
sf0.001 tables.

``queries()`` / ``oracle_sql()`` — the registry lives in
``heritrix_spark/driverq.py``: each crawl operator from SURVEY.md §2
runs as native Spark Column expressions and is checked against a
DuckDB SQL twin over the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from heritrix_spark.driverq import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["frontier_counters"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
