"""Property-based expr-vs-Python-twin agreement for the non-URL kernels:
hops-path accounting (incl. the 50-char overflow encoding), the robots
longest-prefix law, and the politeness delay formula.

Each hypothesis example ships a whole batch of generated rows through
ONE Spark job (per-example jobs would dominate the suite), comparing
the Catalyst column expressions against the pure-Python twins the
oracle simulator uses. The driver rows pin Spark-vs-DuckDB on fixture
data; these pin Spark-vs-simulator on adversarial data, closing the
triangle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from heritrix_spark.functions.hops import (
    extend_hops_path_col,
    extend_hops_path_py,
    hop_count_col,
    hop_count_py,
    link_hops_col,
    link_hops_py,
    trans_hops_col,
    trans_hops_py,
)
from heritrix_spark.operators.politeness import (
    PolitenessConfig,
    politeness_delay_col,
    politeness_delay_py,
    robots_allows_col,
    robots_allows_py,
)

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_HOPSEQ = st.lists(
    st.sampled_from("LPREXI"), min_size=0, max_size=120
)


@settings(**_SETTINGS)
@given(st.lists(_HOPSEQ, min_size=1, max_size=30))
def test_hops_exprs_match_py(spark, seqs):
    # fold each sequence through the Python extend twin (the fixture
    # generator's path), then make Spark recompute every derived stat
    # AND the next extension step from the encoded string alone.
    rows = []
    for seq in seqs:
        path = ""
        for ch in seq:
            path = extend_hops_path_py(path, ch)
        rows.append((path, seq[-1] if seq else "L", len(seq)))
    df = spark.createDataFrame(
        rows, "hops_path string, next_ch string, true_hops int"
    ).select(
        "hops_path",
        "next_ch",
        "true_hops",
        hop_count_col("hops_path").alias("hc"),
        link_hops_col("hops_path").alias("lh"),
        trans_hops_col("hops_path").alias("th"),
        extend_hops_path_col("hops_path", F.col("next_ch")).alias("ext"),
    )
    for r in df.collect():
        p = r["hops_path"]
        assert r["hc"] == hop_count_py(p) == r["true_hops"], p
        assert r["lh"] == link_hops_py(p), p
        assert r["th"] == trans_hops_py(p), p
        assert r["ext"] == extend_hops_path_py(p, r["next_ch"]), p


_PREFIX = st.text(alphabet="/abc.?=", min_size=0, max_size=8)
_RULES = st.lists(_PREFIX, min_size=0, max_size=6)
_PATH = st.builds(lambda s: "/" + s, st.text(alphabet="/abc.?=x", max_size=12))


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(_RULES, _RULES, _PATH, st.booleans()),
        min_size=1,
        max_size=40,
    )
)
def test_robots_prefix_law_matches_py(spark, cases):
    rows = [
        (None if null_a else a, d, p) for (a, d, p, null_a) in cases
    ]
    df = spark.createDataFrame(
        rows, "allows array<string>, disallows array<string>, path string"
    ).select(
        "allows",
        "disallows",
        "path",
        robots_allows_col(
            F.col("allows"), F.col("disallows"), F.col("path")
        ).alias("allowed"),
    )
    for r in df.collect():
        assert r["allowed"] == robots_allows_py(
            r["allows"], r["disallows"], r["path"]
        ), (r["allows"], r["disallows"], r["path"])


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**7),  # fetch ms
            st.one_of(
                st.just(-1.0),
                st.floats(
                    min_value=0.0,
                    max_value=10**6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),  # crawl-delay seconds
        ),
        min_size=1,
        max_size=50,
    )
)
def test_politeness_delay_matches_py(spark, cases):
    cfg = PolitenessConfig()
    df = spark.createDataFrame(
        cases, "ms long, cd double"
    ).select(
        "ms",
        "cd",
        politeness_delay_col(F.col("ms"), F.col("cd"), cfg).alias("delay"),
    )
    for r in df.collect():
        assert r["delay"] == politeness_delay_py(r["ms"], r["cd"], cfg), (
            r["ms"],
            r["cd"],
        )
