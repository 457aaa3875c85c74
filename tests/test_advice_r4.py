"""Round-4 regression pins for the ADVICE findings: WARC record-id
millisecond uniqueness, attempt-scoped part-file tmp names, Kw3 null
guards, non-ASCII badword-list escaping, and per-table-scoped snapshot
expiry in SnapStore."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from heritrix_spark.store.snapstore import SnapshotExpiredError, SnapStore


# ------------------------------------------------ WARC record-id resolution


def test_warc_record_ids_unique_within_one_second(spark):
    """Two fetches of the same URL inside the same wall-clock second
    (distinct time_ms) must get distinct WARC-Record-IDs — the rendered
    WARC-Date has only second resolution, so the id law hashes the raw
    millisecond clock (reference uniqueness is via random UUIDs,
    UUIDGenerator)."""
    from heritrix_spark.operators.warc import warc_records

    fetches = spark.createDataFrame(
        [
            ("http://h.example/p", 1_600_000_000_100, "a"),
            ("http://h.example/p", 1_600_000_000_900, "b"),
        ],
        "url string, fetch_time_ms long, content string",
    )
    recs = warc_records(fetches, revisit_for_identical_digests=False)
    rows = recs.select("record_id", "warc_type", "warc_date").collect()
    ids = [r.record_id for r in rows]
    assert len(ids) == len(set(ids)) == 6  # 2 × (response+request+metadata)
    # same rendered second on both — the old law would have collided
    assert len({r.warc_date for r in rows}) == 1


def test_part_file_tmp_names_are_attempt_scoped(spark, tmp_path):
    """The sink's tmp path embeds the task attempt id (the
    FileOutputCommitter rule), and no tmp file of any attempt survives
    a successful write."""
    from heritrix_spark.operators.warc import warc_records, write_warc_gz

    fetches = spark.createDataFrame(
        [("http://h.example/%d" % i, 1_600_000_000_000 + i, "x" * i)
         for i in range(10)],
        "url string, fetch_time_ms long, content string",
    )
    out = str(tmp_path / "gz")
    write_warc_gz(warc_records(fetches), out, num_files=4)
    files = glob.glob(out + "/*")
    assert files and all(f.endswith(".warc.gz") for f in files)
    assert not any(".tmp" in f for f in files)


# ------------------------------------------------------- Kw3 null guards


def test_kw3_null_ip_mime_status_render_as_null_literal(spark):
    """One NULL input column must not NULL the whole file (silently
    dropping the archive file at the sink); the Java reference's string
    concat prints 'null'."""
    from heritrix_spark.operators.kw3 import kw3_files

    fetches = spark.createDataFrame(
        [(1, "http://h.example/a", "h.example", 80, 1_600_000_000_000,
          None, None, None, "body")],
        "doc_id long, url string, host string, port int, "
        "fetch_time_ms long, ip string, mime string, status int, "
        "content string",
    )
    row = kw3_files(fetches).collect()[0]
    assert row.path and row.file_text is not None
    assert "HTTP-IP-Address: null\n" in row.file_text
    assert "HTTP-Status-Code: null\n" in row.file_text
    assert "HTTP/1.1 null" in row.file_text
    assert "Content-Type: null\nHTTP-Part: Content" in row.file_text


# --------------------------------------------- non-ASCII badword escaping


def test_badword_list_accepts_non_ascii_words(spark):
    """A custom list entry with accented letters must compile (no
    backslash-before-letter, which the Java regex dialect rejects) and
    match on word boundaries."""
    from heritrix_spark.pipeline.urlfilter import (
        _re_escape_word,
        text_badword_filter,
    )

    assert _re_escape_word("café") == "café"
    assert _re_escape_word("c++") == "c\\+\\+"
    assert _re_escape_word("né.e") == "né\\.e"

    docs = spark.createDataFrame(
        [(1, "un café noir"), (2, "cafeteria talk"), (3, "clean text")],
        "doc_id long, text string",
    )
    out = text_badword_filter(
        docs, words=(("café", 1000),), threshold_milli=1000
    )
    verdicts = {r.doc_id: r.text_verdict for r in out.collect()}
    # doc 1 contains the word; 2 must NOT match (substring inside
    # 'cafeteria' is not a word hit and the accent differs anyway)
    assert verdicts == {1: "badword", 2: "keep", 3: "keep"}


# ------------------------------------------- scoped snapshot expiry


def test_compaction_expiry_is_scoped_to_referencing_snapshots(spark, tmp_path):
    """Compacting a table expires ONLY the snapshots that reference its
    vacuumed deltas: history from before the table first wrote survives
    (the Iceberg per-table expire-snapshots bound)."""
    store = SnapStore(str(tmp_path / "scoped"), spark)
    df = spark.range(3).select(F.col("id").alias("v"))

    # rounds 1-2: only fetch_log exists
    store.write_delta(df, "fetch_log", 1)
    store.commit_round(1, {})
    store.write_delta(df, "fetch_log", 2)
    store.commit_round(2, {})
    # round 3: a second table appears
    store.write_delta(df, "fetch_log", 3)
    store.write_delta(df, "url_seen_bloom", 3)
    store.commit_round(3, {})
    assert store.snapshots() == [1, 2, 3]

    # round 4: compact ONLY url_seen_bloom
    store.write_delta(store.read("url_seen_bloom"), "url_seen_bloom", 4,
                      reset=True)
    store.commit_round(4, {})
    # rounds 1-2 never referenced url_seen_bloom -> retained;
    # round 3 referenced its vacuumed round-3 delta -> expired
    assert store.snapshots() == [1, 2, 4]
    assert store.read("fetch_log", as_of_round=1).count() == 3
    assert store.read("fetch_log", as_of_round=2).count() == 6
    with pytest.raises(SnapshotExpiredError):
        store.read("fetch_log", as_of_round=3)
    # current reads of both tables intact
    assert store.read("fetch_log").count() == 9
    assert store.read("url_seen_bloom").count() == 3

    # round 5: now compact fetch_log -> every retained snapshot (1, 2,
    # and 4) references vacuumed fetch_log deltas and expires
    store.write_delta(store.read("fetch_log"), "fetch_log", 5, reset=True)
    store.commit_round(5, {})
    assert store.snapshots() == [5]
    with pytest.raises(SnapshotExpiredError):
        store.read("fetch_log", as_of_round=1)
