"""Per-record gzip members (.warc.gz): the GZIPMembersInputStream law
re-expressed (boundary offsets, per-member payload lengths, full-read
concatenation — GZIPMembersInputStreamTest.java:68-140), plus the
write_warc_gz → read_warc roundtrip against the uncompressed sink."""

from __future__ import annotations

import glob
import gzip
import random

import pytest

from heritrix_spark.operators.warc import (
    gzip_members,
    gzip_record,
    read_warc,
    warc_records,
    write_warc,
    write_warc_gz,
)


def _gz(payload: bytes) -> bytes:
    return gzip_record(payload)


@pytest.fixture(scope="module")
def members():
    rand = random.Random(1)
    noise1k = rand.randbytes(1024)
    noise32k = rand.randbytes(32 * 1024)
    return [noise1k, noise32k, b"a", b"hello"]


def test_full_read_all_four(members):
    allfour = b"".join(_gz(m) for m in members)
    got = gzip_members(allfour)
    assert sum(len(p) for _, _, p in got) == 1024 + 32 * 1024 + 1 + 5


def test_full_read_six_small():
    six = b"".join(_gz(m) for m in [b"a", b"hello"] * 3)
    got = gzip_members(six)
    assert sum(len(p) for _, _, p in got) == (1 + 5) * 3
    assert [p for _, _, p in got] == [b"a", b"hello"] * 3


def test_member_boundaries_all_four(members):
    gzs = [_gz(m) for m in members]
    got = gzip_members(b"".join(gzs))
    assert len(got) == 4
    expect_start = 0
    for (start, end, payload), m, gz in zip(got, members, gzs):
        assert payload == m
        assert start == expect_start
        assert end == expect_start + len(gz)
        expect_start = end


def test_rejects_garbage_and_truncation(members):
    with pytest.raises(ValueError, match="magic"):
        gzip_members(b"not-gzip")
    whole = _gz(b"hello world")
    with pytest.raises(ValueError, match="truncated"):
        gzip_members(whole[: len(whole) - 3])
    # stdlib multi-member readers agree with the splitter
    assert gzip.decompress(b"".join(_gz(m) for m in members)) == b"".join(members)


def test_warc_gz_roundtrip(spark, tmp_path):
    rows = [
        ("http://h1.example/", 1_600_000_000_000, "<html>alpha</html>",
         200, None, "", 12),
        ("http://h1.example/a", 1_600_000_001_000, "<html>beta</html>",
         200, "http://h1.example/", "L", 9),
        ("http://h2.example/gone", 1_600_000_003_000, "", 404,
         "http://h1.example/a", "LL", 3),
    ]
    fetches = spark.createDataFrame(
        rows,
        "url string, fetch_time_ms long, content string, status int, "
        "via string, hops string, dur long",
    )
    recs = warc_records(
        fetches, status_col="status", via_col="via", hops_col="hops",
        duration_ms_col="dur",
    )
    plain_dir, gz_dir = str(tmp_path / "plain"), str(tmp_path / "gz")
    write_warc(recs, plain_dir, num_files=2)
    write_warc_gz(recs, gz_dir, num_files=2)

    gz_files = glob.glob(gz_dir + "/part-*.warc.gz")
    assert gz_files
    # every part file is pure concatenated gzip members, one per record
    n_members = sum(len(gzip_members(open(f, "rb").read())) for f in gz_files)

    def rows_of(path):
        return sorted(
            (tuple(r) for r in read_warc(spark, path)
             .drop("source_file").collect()),
        )

    got, want = rows_of(gz_dir), rows_of(plain_dir)
    assert n_members == len(want)
    assert got == want


def test_anvl_render_laws():
    from heritrix_spark.operators.warc import anvl_render

    # empty record IS one CRLF (ANVLRecordTest.testEmptyRecord)
    assert anvl_render([]) == "\r\n"
    # label: value lines + blank-line terminator
    assert anvl_render([("who", "G&S"), ("entry", None)]) == (
        "who: G&S\r\nentry\r\n\r\n"
    )
    # newlines in values fold to CRLF + space (ANVLRecord.FOLD_PREFIX)
    assert anvl_render([("what", "Yeoman of\nthe guard")]) == (
        "what: Yeoman of\r\n the guard\r\n\r\n"
    )
    # labels with line terminators rejected (testFolding)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        anvl_render([("bad\nlabel", "x")])


def test_warcinfo_first_record(spark, tmp_path):
    from heritrix_spark.operators.warc import warc_records, write_warc_gz

    fetches = spark.createDataFrame(
        [("http://h1.example/", 1_600_000_000_000, "<html>x</html>", 200,
          None, "", 5)],
        "url string, fetch_time_ms long, content string, status int, "
        "via string, hops string, dur long",
    )
    recs = warc_records(
        fetches, status_col="status", via_col="via", hops_col="hops",
        duration_ms_col="dur",
    )
    out = str(tmp_path / "wi")
    fields = [
        ("software", "heritrix-spark"),
        ("format", "WARC File Format 1.0"),
        ("robots", "obey"),
    ]
    write_warc_gz(recs, out, num_files=1, warcinfo_fields=fields,
                  warcinfo_time_ms=1_600_000_000_000)
    files = glob.glob(out + "/part-*.warc.gz")
    assert len(files) == 1
    rows = read_warc(spark, out).orderBy("warc_type").collect()
    types = [r.warc_type for r in rows]
    assert "warcinfo" in types
    wi = next(r for r in rows if r.warc_type == "warcinfo")
    assert wi.headers["WARC-Filename"] == "part-00000.warc.gz"
    assert wi.content_type == "application/warc-fields"
    assert wi.block == (
        "software: heritrix-spark\r\nformat: WARC File Format 1.0\r\n"
        "robots: obey\r\n\r\n"
    )
    assert wi.headers["WARC-Date"] == "2020-09-13T12:26:40Z"
    # warcinfo has no Target-URI header (WARCWriter.java:406)
    assert "WARC-Target-URI" not in wi.headers


def test_part_file_sink_edge_cases(spark, tmp_path):
    """Empty input writes no files; empty partitions produce no
    zero-record parts; tmp files never remain visible."""
    from heritrix_spark.operators.warc import warc_records, write_warc_gz

    empty = spark.createDataFrame(
        [],
        "url string, fetch_time_ms long, content string, status int, "
        "via string, hops string, dur long",
    )
    out_empty = str(tmp_path / "empty")
    write_warc_gz(
        warc_records(empty, status_col="status", via_col="via",
                     hops_col="hops", duration_ms_col="dur"),
        out_empty, num_files=3,
    )
    assert glob.glob(out_empty + "/*") == []

    one = spark.createDataFrame(
        [("http://h/", 1_600_000_000_000, "x", 200, None, "", 1)],
        "url string, fetch_time_ms long, content string, status int, "
        "via string, hops string, dur long",
    )
    out_one = str(tmp_path / "one")
    # 3 records across 8 partitions -> most partitions empty
    write_warc_gz(
        warc_records(one, status_col="status", via_col="via",
                     hops_col="hops", duration_ms_col="dur"),
        out_one, num_files=8,
    )
    files = glob.glob(out_one + "/*")
    assert files and all(f.endswith(".warc.gz") for f in files)
    assert not any(".tmp" in f for f in files)  # incl. attempt-scoped .tmp-<id>
    total = sum(len(gzip_members(open(f, "rb").read())) for f in files)
    assert total == 3  # response + request + metadata
