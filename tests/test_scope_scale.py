"""Large-seed-list scope scaling: the bisect-floor membership kernel
(SurtPrefixSet.containsPrefixOf law, SurtPrefixSet.java:269-330) must
agree exactly with the small-set OR-chain, and the predicate must not
blow the plan converter at tens of thousands of prefixes."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from heritrix_spark.operators.scope import (
    SURT_PREFIX_OR_CHAIN_MAX,
    coalesce_prefixes,
    surt_prefix_member_col,
    surt_prefix_predicate,
)


def test_coalesce_drops_covered_entries():
    ps = ["http://(com,a,", "http://(com,a,b,", "http://(com,c,", "http://(com,a,"]
    assert coalesce_prefixes(ps) == ["http://(com,a,", "http://(com,c,"]


def _mk_surts(n, rng):
    out = []
    for i in range(n):
        host = f"h{rng.randrange(400)}"
        sub = f"s{rng.randrange(5)}," if rng.random() < 0.3 else ""
        out.append(f"http://(example,{host},{sub})/p{i}")
    out += ["", "http://(other,x,)/", "http://(example,)/"]
    return out


def test_member_kernel_equals_or_chain(spark):
    rng = random.Random(13)
    prefixes = [f"http://(example,h{i}," for i in range(0, 400, 3)]
    surts = _mk_surts(600, rng)
    df = spark.createDataFrame([(s,) for s in surts], ["surt"])
    small = prefixes[:SURT_PREFIX_OR_CHAIN_MAX - 4]  # stays an OR-chain
    got = [
        (r.a, r.b)
        for r in df.select(
            surt_prefix_member_col(F.col("surt"), prefixes).alias("a"),
            surt_prefix_predicate(
                F.col("surt"), small, surt=F.col("surt")
            ).alias("b"),
        ).collect()
    ]
    # compare kernel vs python ground truth on the FULL list, and the
    # OR-chain (small subset) vs the same truth on that subset
    truth_full = [any(s.startswith(p) for p in prefixes) for s in surts]
    assert [a for a, _ in got] == truth_full
    truth_small = [any(s.startswith(p) for p in small) for s in surts]
    assert [b for _, b in got] == truth_small


def test_predicate_switches_and_survives_25k_prefixes(spark):
    prefixes = [f"http://(example,h{i}," for i in range(25_000)]
    surts = [f"http://(example,h{i * 7},)/x" for i in range(500)] + [
        "http://(nomatch,q,)/"
    ]
    df = spark.createDataFrame([(s,) for s in surts], ["surt"])
    # the OR-chain would stack-overflow the plan converter here; the
    # auto-switched predicate must both plan and agree with truth
    rows = df.select(
        F.col("surt"),
        surt_prefix_predicate(F.col("surt"), prefixes, surt=F.col("surt")).alias("m"),
    ).collect()
    for r in rows:
        # every example surt is h(i*7) with i*7 < 25000 -> matches its
        # own host prefix; the nomatch row must not
        want = r.surt.startswith("http://(example")
        assert r.m == want, r.surt

