"""MirrorWriterProcessor path law: hand-derived goldens from
MirrorWriterProcessor.java (LumpyString lumps, dotBegin/dotEnd,
suffix/query placement, trimming priorities, tooLongDirectory,
hostMap/port dirs, batch collision numbering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.mirror import mirror_path_py, mirror_paths


def test_basic_shapes():
    f = mirror_path_py
    assert f("http://h.example/a/b/c.html") == "h.example/a/b/c.html"
    assert f("http://h.example/dir/") == "h.example/dir/index.html"
    assert f("http://h.example/") == "h.example/index.html"
    assert f("http://h.example") == "h.example/index.html"
    assert f("ftp://h.example/x") is None  # innerProcess :345-349
    assert f(None) is None


def test_query_concatenated_without_separator():
    # joinParts appends getQuery() (no '?') between main and suffix
    assert (
        mirror_path_py("http://h.example/p.html?x=1")
        == "h.example/px=1.html"
    )
    # suffixAtEnd=false puts the suffix before the query (:1236-1243)
    assert (
        mirror_path_py("http://h.example/p.html?x=1", suffix_at_end=False)
        == "h.example/p.htmlx=1"
    )


def test_dot_begin_default_active():
    # dotBegin default "%2E" replaces a leading dot (:164, :1211-1214)
    assert (
        mirror_path_py("http://h.example/.hidden/.rc")
        == "h.example/%2Ehidden/%2Erc"
    )


def test_percent_escape_is_one_lump():
    # maxSegLen cut never splits a %XX lump (:1452-1467)
    got = mirror_path_py(
        "http://h.example/abcdefgh%3A/x", max_seg_length=10
    )
    assert got == "h.example/abcdefgh/x"  # %3A dropped whole, not "%3"
    got2 = mirror_path_py(
        "http://h.example/abcdefg%3A/x", max_seg_length=10
    )
    assert got2 == "h.example/abcdefg%3A/x"  # exactly fits


def test_character_map_lump():
    got = mirror_path_py(
        "http://h.example/a:b/x", character_map={":": "%3A"}
    )
    assert got == "h.example/a%3Ab/x"


def test_dot_end_loop():
    got = mirror_path_py(
        "http://h.example/name.../x", dot_end="_d", max_seg_length=255
    )
    # one dot chopped, dotEnd appended, loop exits (no trailing dot)
    assert got == "h.example/name.._d/x"


def test_underscore_set():
    got = mirror_path_py("http://h.example/aux/x", underscore_set={"AUX"})
    assert got == "h.example/_aux/x"


def test_host_map_and_port_dir():
    got = mirror_path_py(
        "http://h.example:8080/x",
        create_port_directory=True,
        host_map=["h.example", "hh"],
    )
    assert got == "hh/8080/x"
    assert mirror_path_py("http://h.example:8080/x") == "h.example/x"


def test_content_type_suffix_override():
    got = mirror_path_py(
        "http://h.example/page.asp?q=2",
        content_type="TEXT/HTML; charset=utf-8",
        content_type_map=["text/html", "html"],
    )
    assert got == "h.example/pageq=2.html"


def test_too_long_directory_fallback():
    got = mirror_path_py(
        "http://h.example/longdirname1/longdirname2/x.html",
        max_path_length=40,
        max_seg_length=10,
    )
    assert got == "h.example/LONG/x.html"


def test_trim_priority_query_first():
    # maxSeg forces trimming; query lumps go before main part (:1296-1325)
    got = mirror_path_py(
        "http://h.example/mainname.html?aquerystring", max_seg_length=16
    )
    # end maxSeg = 15; main(8) + query(12) + .html(5) = 25 -> query
    # trimmed to whole-lump boundary so total fits 15: query loses 10
    assert got == "h.example/mainnameaq.html"


def test_unique_numbering_law():
    base = mirror_path_py("http://h.example/c.html")
    n1 = mirror_path_py("http://h.example/c.html", unique_i=1)
    assert base == "h.example/c.html" and n1 == "h.example/c1.html"
    # NumberFormat grouping commas at >= 1000 (:968-975)
    n1k = mirror_path_py("http://h.example/c.html", unique_i=1000)
    assert n1k == "h.example/c1,000.html"


def test_dataframe_collision_numbering(spark):
    rows = [(i, "http://h.example/same.html") for i in range(3)] + [
        (9, "http://h.example/other.html")
    ]
    df = spark.createDataFrame(rows, ["ordinal", "url"])
    out = mirror_paths(df, url_col="url", order_col="ordinal")
    got = {r["ordinal"]: r["mirror_path"] for r in out.collect()}
    assert got[0] == "h.example/same.html"
    assert got[1] == "h.example/same1.html"
    assert got[2] == "h.example/same2.html"
    assert got[9] == "h.example/other.html"
