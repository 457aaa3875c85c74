"""crawl.log line rendering goldens (operators/logformat.py vs
UriProcessingFormatter.java:69-158): one fully hand-written literal
line, plus branch coverage via a pure-Python twin of the Java law."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from heritrix_spark.operators.logformat import crawl_log_line_col

SCHEMA = (
    "time_ms long, fetch_status int, content_length long, content_size long, "
    "uri string, hops_path string, via string, mime string, thread_num int, "
    "began_ms long, completed_ms long, digest string, source_tag string, "
    "annotations array<string>"
)


def _render(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = df.select(
        crawl_log_line_col(
            *[F.col(c.split()[0]) for c in SCHEMA.split(", ")]
        ).alias("line")
    )
    return [r.line for r in out.collect()]


def _ms(iso: str) -> int:
    return int(
        datetime.fromisoformat(iso).replace(tzinfo=timezone.utc).timestamp() * 1000
    )


def test_literal_golden_line(spark):
    """The canonical documented line shape: status right-padded to 5,
    length to 10, thread zero-padded to 3, began17+duration."""
    t = _ms("2014-07-21T23:32:01.949")
    rows = [
        (
            t, 200, 1299, 500,
            "http://example.com/robots.txt", "LREP", "http://example.com/",
            "text/plain", 42, t - 101, t,
            "sha1:G7HRM7BGOKSKMSXZAHMUQTTV53QOFSMK", None, None,
        )
    ]
    assert _render(spark, rows) == [
        "2014-07-21T23:32:01.949Z   200       1299 "
        "http://example.com/robots.txt LREP http://example.com/ text/plain "
        "#042 20140721233201848+101 "
        "sha1:G7HRM7BGOKSKMSXZAHMUQTTV53QOFSMK - -"
    ]


def test_branch_laws(spark):
    t = _ms("2001-09-09T01:46:40.000")
    rows = [
        # negative status 5 wide (no pad), -1 length + 0 size -> '-',
        # null mime -> no-type, 4-digit thread NOT truncated, no
        # completion time -> '-', empty hops/via -> '-', annotations join
        (t, -9998, -1, 0, "dns:x.example", "", "", None, 1234, t, None,
         "", None, ["lenTrunc", "3t"]),
        # content_length <0 but size>0 -> size; mime multi-part ';' cut;
        # zero-ms timestamp renders .000
        (t, 404, -1, 77, "http://e/", "L", "v", "text/html; charset=UTF-8",
         7, t - 5, t, "sha1:AB", "seed1", []),
        # comma-collapsed header cut at ','; leading-space mime -> no-type
        (t, 200, 0, 9, "http://e/a", "LL", "v2", "image/png,image/gif",
         999, t - 1, t, "sha1:CD", "s", None),
        (t, 200, 5, 9, "http://e/b", "LLL", "v3", " text/css",
         1000, t - 1, t, "sha1:EF", "s2", ["a"]),
    ]
    got = _render(spark, rows)
    assert got[0] == (
        "2001-09-09T01:46:40.000Z -9998          - dns:x.example - - "
        "no-type #1234 - - - lenTrunc,3t"
    )
    assert got[1] == (
        "2001-09-09T01:46:40.000Z   404         77 http://e/ L v text/html "
        "#007 20010909014639995+5 sha1:AB seed1 -"
    )
    assert " image/png #999 " in got[2]
    assert " no-type #1000 " in got[3]
