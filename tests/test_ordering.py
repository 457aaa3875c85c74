"""The intra-queue ordering law (FIXTURES.md §5c;
BdbMultipleWorkQueuesTest.testCalculateInsertKey semantics:
ascending (directive, precedence, ordinal) per class_key) and the
determinism of distributed ordinal assignment across parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from heritrix_spark.operators.prepare import assign_ordinals


def _rank(spark, rows):
    """rows: (class_key, url, directive, precedence, ordinal) → ranked urls per key."""
    df = spark.createDataFrame(
        rows, ["class_key", "url", "directive", "precedence", "ordinal"]
    )
    w = Window.partitionBy("class_key").orderBy("directive", "precedence", "ordinal")
    out = df.withColumn("rank", F.row_number().over(w)).collect()
    ranked = {}
    for r in out:
        ranked.setdefault(r["class_key"], {})[r["rank"]] = r["url"]
    return ranked


def test_ordinal_breaks_ties(spark):
    # lower ordinal first at equal directive/precedence — sweep ordinal
    # origins over doublings up to 2^47 (48-bit ordinal law)
    rows = []
    origin = 1
    while origin < (1 << 47):
        rows.append(("q", f"a{origin}", 3, 1, origin))
        rows.append(("q", f"b{origin}", 3, 1, origin + 1))
        origin <<= 4
    ranked = _rank(spark, rows)["q"]
    order = [ranked[i] for i in sorted(ranked)]
    for i in range(0, len(order), 2):
        assert order[i].startswith("a") and order[i + 1].startswith("b")


def test_high_directive_beats_lower_ordinal(spark):
    ranked = _rank(
        spark,
        [("q", "normal_early", 3, 1, 1), ("q", "high_late", 1, 1, 999)],
    )["q"]
    assert ranked[1] == "high_late"


def test_low_precedence_number_beats_lower_ordinal(spark):
    ranked = _rank(
        spark,
        [("q", "p2_early", 3, 2, 1), ("q", "p1_late", 3, 1, 999)],
    )["q"]
    assert ranked[1] == "p1_late"


def test_assign_ordinals_deterministic_across_parallelism(spark):
    import random

    rng = random.Random(3)
    rows = [
        (rng.randrange(1000), rng.randrange(50), f"http://h{rng.randrange(99)}/p{i}")
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, ["parent_ordinal", "link_seq", "canon_url"])

    expected = [
        url
        for _, _, url in sorted(rows, key=lambda r: (r[0], r[1], r[2]))
    ]

    for buckets in (2, 8, 31):
        numbered, n = assign_ordinals(
            df.repartition(buckets),
            ["parent_ordinal", "link_seq", "canon_url"],
            base=100,
            num_buckets=buckets,
        )
        assert n == 5000
        got = [
            r["canon_url"]
            for r in numbered.orderBy("ordinal").collect()
        ]
        ords = [r["ordinal"] for r in numbered.orderBy("ordinal").collect()]
        assert got == expected, f"ordinal order diverged at buckets={buckets}"
        assert ords == list(range(101, 5101))


def test_assign_ordinals_broadcast_offset_path(spark, monkeypatch):
    """With the literal-map threshold forced to 0, the per-bucket offsets
    ride a broadcast join instead of a create_map literal — same
    ordinals either way (the 1000-executor-bucket-count path)."""
    import random

    from heritrix_spark.operators import prepare

    monkeypatch.setattr(prepare, "_OFFSET_MAP_LITERAL_MAX", 0)
    rng = random.Random(9)
    rows = [
        (rng.randrange(500), rng.randrange(50), f"http://h{rng.randrange(30)}/b{i}")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, ["parent_ordinal", "link_seq", "canon_url"])
    expected = [u for _, _, u in sorted(rows)]

    # bounded-lead path
    numbered, n = prepare.assign_ordinals(
        df, ["parent_ordinal", "link_seq", "canon_url"],
        base=7, num_buckets=8, lead_bound=500,
    )
    assert n == 2000
    assert [
        r["canon_url"] for r in numbered.orderBy("ordinal").collect()
    ] == expected

    # generic (range-partition) path
    numbered2, n2 = prepare.assign_ordinals(
        df, ["parent_ordinal", "link_seq", "canon_url"], base=7, num_buckets=8,
    )
    assert n2 == 2000
    assert [
        r["canon_url"] for r in numbered2.orderBy("ordinal").collect()
    ] == expected


def test_assign_ordinals_defer_count_equivalence(spark):
    """defer_count=True (lazy cumulative-offset join, no driver action)
    must number rows identically to the collected fast path, at several
    parallelism levels, including base offsets and empty input."""
    import random

    rng = random.Random(11)
    rows = [
        (rng.randrange(400), rng.randrange(50), f"http://h{rng.randrange(37)}/q{i}")
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, ["parent_ordinal", "link_seq", "canon_url"])
    expected = [
        url for _, _, url in sorted(rows, key=lambda r: (r[0], r[1], r[2]))
    ]

    for buckets in (2, 16):
        eager, n = assign_ordinals(
            df.repartition(buckets),
            ["parent_ordinal", "link_seq", "canon_url"],
            base=7,
            num_buckets=buckets,
            lead_bound=400,
        )
        lazy, n2 = assign_ordinals(
            df.repartition(buckets),
            ["parent_ordinal", "link_seq", "canon_url"],
            base=7,
            num_buckets=buckets,
            lead_bound=400,
            defer_count=True,
        )
        assert n == 3000 and n2 is None
        got_e = [(r["ordinal"], r["canon_url"]) for r in eager.orderBy("ordinal").collect()]
        got_l = [(r["ordinal"], r["canon_url"]) for r in lazy.orderBy("ordinal").collect()]
        assert got_e == got_l
        assert [u for _, u in got_l] == expected
        assert [o for o, _ in got_l] == list(range(8, 3008))

    empty = spark.createDataFrame(
        [], "parent_ordinal long, link_seq long, canon_url string"
    )
    lazy, n = assign_ordinals(
        empty, ["parent_ordinal", "link_seq", "canon_url"],
        base=7, lead_bound=400, defer_count=True,
    )
    assert n is None and lazy.count() == 0 and "ordinal" in lazy.columns
