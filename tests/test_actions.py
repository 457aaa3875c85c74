"""ActionDirectory hot-folder laws: suffix routing, importRecoverFormat
line law, TextSeedModule seed-line law (ActionDirectory.java:205-258,
AbstractFrontier.java:894-952, TextSeedModule.java:140-174)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.actions import (
    act_on_lines,
    action_passes,
    import_recover_format,
    seeds_action_lines,
)


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], ["line"])


def test_suffix_routing_table():
    assert action_passes("x.seeds") == [{"op": "seeds"}]
    assert action_passes("x.seeds.gz") == [{"op": "seeds"}]  # .gz stripped
    rec = action_passes("frontier.recover.gz")
    # two passes, includes-first then adds (:224-229)
    assert [p["accept_tags"] for p in rec] == [r"F[si] ", r"F\+ "]
    assert [p["include_only"] for p in rec] == [True, False]
    assert not rec[0]["apply_scope"]
    assert all(p["apply_scope"] for p in action_passes("f.s.recover"))
    (force,) = action_passes("urls.force")
    assert force["force_fetch"] and not force["include_only"]
    (inc,) = action_passes("urls.s.include")
    assert inc["include_only"] and inc["apply_scope"]
    assert action_passes("notes.txt") is None  # script/ignored arm


def test_import_line_law(spark):
    lines = _lines(spark, [
        "F+ http://a/ L http://via/",     # full add line
        "F+ http://b/",                    # no hops/via
        "F+ http://c/ LL -",               # via length 1 -> null (:294-296)
        "Fs http://d/",                    # tag not matched by F\+
        "F++ http://e/",                   # 3-char prefix 'F++' != 'F+ '
        "xy",                              # < 4 chars skipped
    ])
    got = {
        r["canon_url"]: r
        for r in import_recover_format(lines, r"F\+ ").collect()
    }
    assert set(got) == {"http://a/", "http://b/", "http://c/"}
    assert got["http://a/"]["via"] == "http://via/"
    assert got["http://a/"]["hops_path"] == "L"
    assert got["http://b/"]["via"] is None and got["http://b/"]["hops_path"] == ""
    assert got["http://c/"]["via"] is None  # short via nulled
    assert all(r["op"] == "schedule" and not r["force_fetch"]
               for r in got.values())


def test_include_only_ignores_force_and_notes(spark):
    lines = _lines(spark, ["Fs http://a/", "Fi http://b/", "F+ http://c/"])
    got = import_recover_format(
        lines, r"F[si] ", include_only=True, force_fetch=True
    ).collect()
    assert sorted(r["canon_url"] for r in got) == ["http://a/", "http://b/"]
    # forceFetch is ignored when includeOnly is set (:888, :929)
    assert all(r["op"] == "note" and not r["force_fetch"] for r in got)


def test_scope_predicate_applied(spark):
    lines = _lines(spark, ["F+ http://in/x", "F+ http://out/y"])
    got = import_recover_format(
        lines, r".*",
        scope_predicate=lambda u, h: u.startswith("http://in/"),
    ).collect()
    assert [r["canon_url"] for r in got] == ["http://in/x"]


def test_seeds_line_law(spark):
    lines = _lines(spark, [
        "http://a.example/  # trailing comment",
        "b.example/path",          # scheme-less -> http:// (:170-173)
        "# full comment line",     # first char not letter/digit -> dropped
        "ftp://c.example/",
        "  d.example",             # leading whitespace trimmed
    ])
    got = sorted(r["canon_url"] for r in seeds_action_lines(lines).collect())
    assert got == [
        "ftp://c.example/",
        "http://a.example/",
        "http://b.example/path",
        "http://d.example",
    ]


def test_act_on_recover_two_pass_union(spark):
    lines = _lines(spark, [
        "F+ http://a/ L http://via/",
        "Fs http://a/",
        "Fi http://b/",
        "F+ http://c/",
    ])
    got = act_on_lines("j.recover", lines).collect()
    by_op = {}
    for r in got:
        by_op.setdefault(r["op"], set()).add(r["canon_url"])
    # note pass takes Fs/Fi; schedule pass RE-adds every F+ (the
    # reference's already-included check happens at schedule time, not
    # in the import — a noted URI simply loses the seen-set race)
    assert by_op == {
        "note": {"http://a/", "http://b/"},
        "schedule": {"http://a/", "http://c/"},
    }
    assert act_on_lines("something.py", _lines(spark, ["x"])) is None


def test_supplementary_links_scoper(spark):
    from heritrix_spark.operators.scope import Rule, supplementary_links_filter

    rows = [
        ("http://keep/a", False),
        ("http://drop/b", False),
        ("http://drop/with-prereq", True),  # prereq page: skip processing
    ]
    df = spark.createDataFrame(rows, ["url", "page_has_prereq"])
    rules = [Rule("onkeep", F.col("url").startswith("http://keep/"), True)]
    got = sorted(
        r["url"]
        for r in supplementary_links_filter(
            df, rules, page_prereq_col=F.col("page_has_prereq")
        ).collect()
    )
    # NONE (no rule fired) = out-of-scope; prereq rows pass untouched
    assert got == ["http://drop/with-prereq", "http://keep/a"]
