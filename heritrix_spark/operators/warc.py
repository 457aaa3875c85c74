"""WARC record assembly + sink — the WARCWriterProcessor analog.

Reference (studied for semantics, not copied):

- ``WARCWriterProcessor``
  (heritrix3/modules/.../writer/WARCWriterProcessor.java:230-260,319-470):
  per fetched URI one "transaction" of records sharing a base record id —
  a ``response`` (or ``revisit`` when the payload digest was already
  seen, :340-375), an optional ``request``, and a ``metadata`` record
  carrying via / hopsFromSeed / fetchTimeMs as ANVL fields (:579-637).
  Request/metadata ids are the base id qualified with ``?type=...``
  (qualifyRecordID) and point back via ``WARC-Concurrent-To``.
- ``WARCWriter.createRecordHeader``
  (heritrix3/commons/.../io/warc/WARCWriter.java:176-206): the exact
  header layout — ``WARC/1.0`` magic, WARC-Type, WARC-Target-URI,
  WARC-Date, extra headers, WARC-Record-ID, Content-Type,
  Content-Length, then CRLF CRLF, the block, CRLF CRLF (:222-274).
- WARC-Date is ISO-8601 seconds UTC (ArchiveUtils.TIMESTAMP14ISO8601Z,
  commons/.../util/ArchiveUtils.java:95).
- Record ids: the reference draws random UUIDs (UUIDGenerator). Batch
  determinism (and the cross-engine oracle) needs content-addressed
  ids, so this writer derives the UUID from md5(target-uri, date,
  type) — same urn:uuid shape, reproducible.

Spark restatement: a record is ONE string column built from codegen'd
``concat``/``sha``/``octet_length`` expressions — no UDF, no shuffle;
the revisit decision is a window over the payload digest (first
occurrence wins — the dedup-history lookup of :340-355 as a batch
rank); the sink is a single partitioned text write with an empty line
separator (records already carry their CRLF framing), so one Spark job
writes any number of .warc part files, each a valid standalone WARC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CRLF = "\r\n"
WARC_VERSION = "WARC/1.0"
HTTP_RESPONSE_MIMETYPE = "application/http; msgtype=response"
HTTP_REQUEST_MIMETYPE = "application/http; msgtype=request"
ANVL_MIMETYPE = "application/warc-fields"
# WARC-Profile for identical-payload revisits (WARCConstants
# PROFILE_REVISIT_IDENTICAL_DIGEST)
REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.0/revisit/uri-agnostic-identical-payload-digest"
)


def record_uuid_col(*parts: Column) -> Column:
    """Deterministic urn:uuid record id: md5 of the identifying parts
    laid out 8-4-4-4-12. (Reference ids are random UUIDs —
    UUIDGenerator; determinism is required for resumable batch runs and
    the cross-engine oracle.)"""
    m = F.md5(F.concat_ws("", *parts))
    return F.concat(
        F.lit("urn:uuid:"),
        F.substring(m, 1, 8),
        F.lit("-"),
        F.substring(m, 9, 4),
        F.lit("-"),
        F.substring(m, 13, 4),
        F.lit("-"),
        F.substring(m, 17, 4),
        F.lit("-"),
        F.substring(m, 21, 12),
    )


def warc_date_col(epoch_ms: Column) -> Column:
    """ISO-8601 seconds UTC (ArchiveUtils.java:95 TIMESTAMP14ISO8601Z);
    requires spark.sql.session.timeZone=UTC (session.py default)."""
    return F.date_format(
        F.timestamp_millis(epoch_ms), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )


def _digest_col(payload: Column, backend: str) -> Column:
    """Labelled payload digest. ``sha1`` is the engine default
    (CrawlURI digest convention, sha1:BASE32); ``sha256_160`` feeds the
    Base32 walk with sha256's first 160 bits — the sanctioned oracle
    substitute (DuckDB has no sha1), same convention as the
    content_digest driver query."""
    from heritrix_spark.pipeline.dedup import base32_of_hex160_col

    if backend == "sha1":
        return F.concat(F.lit("sha1:"), base32_of_hex160_col(F.sha1(payload)))
    if backend == "sha256_160":
        return F.concat(
            F.lit("sha256-160:"),
            base32_of_hex160_col(F.substring(F.sha2(payload, 256), 1, 40)),
        )
    raise ValueError(f"unknown digest backend {backend!r}")


def _record_text(
    warc_type: Column,
    target_uri: Column,
    warc_date: Column,
    record_id: Column,
    content_type: Column,
    block: Column,
    extra_headers: list[Column] | None = None,
) -> Column:
    """The full record string, WARCWriter.createRecordHeader layout
    (WARCWriter.java:176-206 + trailing CRLFs :265-274). Header order is
    normative: magic, Type, Target-URI, Date, extras, Record-ID,
    Content-Type, Content-Length."""
    parts: list[Column] = [
        F.lit(WARC_VERSION + CRLF),
        F.lit("WARC-Type: "),
        warc_type,
        F.lit(CRLF),
        F.lit("WARC-Target-URI: "),
        target_uri,
        F.lit(CRLF),
        F.lit("WARC-Date: "),
        warc_date,
        F.lit(CRLF),
    ]
    for h in extra_headers or []:
        parts += [h, F.lit(CRLF)]
    parts += [
        F.lit("WARC-Record-ID: <"),
        record_id,
        F.lit(">" + CRLF),
        F.lit("Content-Type: "),
        content_type,
        F.lit(CRLF),
        F.lit("Content-Length: "),
        F.octet_length(block).cast("string"),
        F.lit(CRLF + CRLF),
        block,
        F.lit(CRLF + CRLF),
    ]
    return F.concat(*parts)


RECORD_COLUMNS = [
    "record_id",
    "warc_type",
    "target_uri",
    "warc_date",
    "content_type",
    "content_length",
    "payload_digest",
    "block_digest",
    "concurrent_to",
    "record_text",
]


def warc_records(
    fetches: DataFrame,
    url_col: str = "url",
    time_ms_col: str = "fetch_time_ms",
    content_col: str = "content",
    status_col: str | None = None,
    via_col: str | None = None,
    hops_col: str | None = None,
    duration_ms_col: str | None = None,
    write_requests: bool = True,
    write_metadata: bool = True,
    revisit_for_identical_digests: bool = True,
    digest: str = "sha1",
) -> DataFrame:
    """Assemble the per-URI record transaction (WARCWriterProcessor
    :246-260 writeHttpRecords): response (or revisit on an
    already-seen payload digest), request, metadata. Returns one row
    per record with RECORD_COLUMNS; feed ``record_text`` to
    ``write_warc``.

    Everything is a column expression over one window (the
    digest-first-occurrence rank); with revisits disabled there is no
    shuffle at all.
    """
    url = F.col(url_col)
    t_ms = F.col(time_ms_col).cast("long")
    content = F.coalesce(F.col(content_col), F.lit(""))
    status = (
        F.col(status_col).cast("int") if status_col else F.lit(200)
    )
    date = warc_date_col(t_ms)
    # id hashes the RAW millisecond clock, not the rendered seconds-
    # resolution WARC-Date: two fetches of one URL inside the same
    # second must still get distinct WARC-Record-IDs (the reference
    # guarantees uniqueness via random UUIDs, UUIDGenerator)
    base_id = record_uuid_col(url, t_ms.cast("string"), F.lit("response"))

    http_headers = F.concat(
        F.lit("HTTP/1.1 "),
        status.cast("string"),
        F.when(status == 200, F.lit(" OK"))
        .when(status == 301, F.lit(" Moved Permanently"))
        .when(status == 404, F.lit(" Not Found"))
        .otherwise(F.lit("")),
        F.lit(CRLF + "Content-Type: text/html" + CRLF + "Content-Length: "),
        F.octet_length(content).cast("string"),
        F.lit(CRLF + CRLF),
    )
    payload_digest = _digest_col(content, digest)

    df = fetches.withColumn("__date", date).withColumn("__base_id", base_id)
    df = df.withColumn("__payload_digest", payload_digest)
    if revisit_for_identical_digests:
        # the persistent digest-history lookup (:340-355) as a batch
        # rank: first occurrence of a payload digest is the stored
        # response; later ones are revisit records referencing it
        w = Window.partitionBy("__payload_digest").orderBy(
            t_ms.asc(), url.asc()
        )
        df = df.withColumn("__dup_rank", F.row_number().over(w)).withColumn(
            "__first_id", F.first("__base_id").over(w)
        )
    else:
        df = df.withColumn("__dup_rank", F.lit(1)).withColumn(
            "__first_id", F.col("__base_id")
        )

    is_revisit = F.col("__dup_rank") > 1
    # revisit block = response headers only, no payload
    # (WARCWriter.writeRevisitRecord; :352-355)
    resp_block = F.when(is_revisit, http_headers).otherwise(
        F.concat(http_headers, content)
    )
    resp_type = F.when(is_revisit, F.lit("revisit")).otherwise(F.lit("response"))
    resp_extras = [
        F.concat(F.lit("WARC-Payload-Digest: "), F.col("__payload_digest")),
        F.when(
            is_revisit,
            F.concat(
                F.lit("WARC-Profile: " + REVISIT_PROFILE + CRLF),
                F.lit("WARC-Refers-To: <"),
                F.col("__first_id"),
                F.lit(">"),
            ),
        ),
    ]
    # None-valued extras must vanish entirely (concat of the pieces
    # handles it: F.when without otherwise is NULL, and we filter nulls
    # by concat_ws below). Build header tails as one nullable column.
    resp_extra = F.concat_ws(
        CRLF, *[e for e in resp_extras]
    )  # concat_ws skips nulls

    records = [
        df.select(
            F.col("__base_id").alias("record_id"),
            resp_type.alias("warc_type"),
            url.alias("target_uri"),
            F.col("__date").alias("warc_date"),
            F.lit(HTTP_RESPONSE_MIMETYPE).alias("content_type"),
            F.octet_length(resp_block).cast("long").alias("content_length"),
            F.col("__payload_digest").alias("payload_digest"),
            _digest_col(resp_block, digest).alias("block_digest"),
            F.lit(None).cast("string").alias("concurrent_to"),
            _record_text(
                resp_type,
                url,
                F.col("__date"),
                F.col("__base_id"),
                F.lit(HTTP_RESPONSE_MIMETYPE),
                resp_block,
                extra_headers=[resp_extra],
            ).alias("record_text"),
        )
    ]

    if write_requests:
        # GET request record; id = base?type=request, Concurrent-To =
        # base (qualifyRecordID + writeRequest :450-466)
        host = F.regexp_extract(url, r"^https?://([^/]+)", 1)
        path = F.coalesce(
            F.nullif(F.regexp_extract(url, r"^https?://[^/]+(/.*)$", 1), F.lit("")),
            F.lit("/"),
        )
        req_block = F.concat(
            F.lit("GET "),
            path,
            F.lit(" HTTP/1.1" + CRLF + "Host: "),
            host,
            F.lit(CRLF + "User-Agent: heritrix-spark" + CRLF + CRLF),
        )
        req_id = F.concat(F.col("__base_id"), F.lit("?type=request"))
        records.append(
            df.select(
                req_id.alias("record_id"),
                F.lit("request").alias("warc_type"),
                url.alias("target_uri"),
                F.col("__date").alias("warc_date"),
                F.lit(HTTP_REQUEST_MIMETYPE).alias("content_type"),
                F.octet_length(req_block).cast("long").alias("content_length"),
                F.lit(None).cast("string").alias("payload_digest"),
                _digest_col(req_block, digest).alias("block_digest"),
                F.col("__base_id").alias("concurrent_to"),
                _record_text(
                    F.lit("request"),
                    url,
                    F.col("__date"),
                    req_id,
                    F.lit(HTTP_REQUEST_MIMETYPE),
                    req_block,
                    extra_headers=[
                        F.concat(
                            F.lit("WARC-Concurrent-To: <"),
                            F.col("__base_id"),
                            F.lit(">"),
                        )
                    ],
                ).alias("record_text"),
            )
        )

    if write_metadata:
        # ANVL fields via / hopsFromSeed / fetchTimeMs
        # (writeMetadata :579-637); absent fields are omitted lines
        anvl_parts = []
        if via_col:
            anvl_parts.append(
                F.when(
                    F.col(via_col).isNotNull(),
                    F.concat(F.lit("via: "), F.col(via_col)),
                )
            )
        if hops_col:
            anvl_parts.append(
                F.when(
                    F.coalesce(F.col(hops_col), F.lit("")) != "",
                    F.concat(F.lit("hopsFromSeed: "), F.col(hops_col)),
                )
            )
        if duration_ms_col:
            anvl_parts.append(
                F.concat(
                    F.lit("fetchTimeMs: "),
                    F.col(duration_ms_col).cast("long").cast("string"),
                )
            )
        meta_block = (
            F.concat(F.concat_ws(CRLF, *anvl_parts), F.lit(CRLF))
            if anvl_parts
            else F.lit("")
        )
        meta_id = F.concat(F.col("__base_id"), F.lit("?type=metadata"))
        records.append(
            df.select(
                meta_id.alias("record_id"),
                F.lit("metadata").alias("warc_type"),
                url.alias("target_uri"),
                F.col("__date").alias("warc_date"),
                F.lit(ANVL_MIMETYPE).alias("content_type"),
                F.octet_length(meta_block).cast("long").alias("content_length"),
                F.lit(None).cast("string").alias("payload_digest"),
                _digest_col(meta_block, digest).alias("block_digest"),
                F.col("__base_id").alias("concurrent_to"),
                _record_text(
                    F.lit("metadata"),
                    url,
                    F.col("__date"),
                    meta_id,
                    F.lit(ANVL_MIMETYPE),
                    meta_block,
                    extra_headers=[
                        F.concat(
                            F.lit("WARC-Concurrent-To: <"),
                            F.col("__base_id"),
                            F.lit(">"),
                        )
                    ],
                ).alias("record_text"),
            )
        )

    out = records[0]
    for r in records[1:]:
        out = out.unionByName(r)
    return out


def warc_from_fetch_log(
    fetch_log: DataFrame, docs: DataFrame, digest: str = "sha1"
) -> DataFrame:
    """Record transactions for a crawl's successful fetches: join the
    fetch log back to the fixture docs for payload text (the processor
    runs post-fetch with the body in hand; shouldWrite skips failures
    — WriterPoolProcessor.shouldWrite)."""
    payload = F.concat_ws(
        "\n",
        F.transform(F.col("spans"), lambda s: F.coalesce(s["text"], F.lit(""))),
    )
    docs_sel = docs.select(F.col("doc_id"), payload.alias("content"))
    fetched = (
        fetch_log.filter(F.col("fetch_status").isin(200, 301))
        .join(docs_sel, on=F.col("canon_url") == docs_sel["doc_id"], how="left")
        .drop("doc_id")
        .withColumn("content", F.coalesce(F.col("content"), F.lit("")))
    )
    return warc_records(
        fetched,
        url_col="url",
        time_ms_col="now_ms",
        content_col="content",
        status_col="fetch_status",
        via_col="via",
        hops_col="hops_path",
        digest=digest,
    )


def write_warc(records: DataFrame, out_dir: str, num_files: int | None = None):
    """One text write — each part file is a standalone valid WARC. The
    records carry their own CRLF framing; the text sink insists on a
    non-empty row separator, so each row is the record minus its final
    byte ('\\n') and the sink's default '\\n' separator restores it —
    byte-exact output. The size-rotation of the reference's writer pool
    (maxBytes, WriterPoolProcessor) maps to choosing ``num_files``."""
    out = records.select(
        F.expr(
            "substring(record_text, 1, length(record_text) - 1)"
        ).alias("value")
    )
    if num_files:
        out = out.repartition(num_files)
    out.write.mode("overwrite").text(out_dir)


# ------------------------------------------------------------------ reader

READ_WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "block string, headers map<string,string>, source_file string"
)


def parse_warc_bytes(data: bytes, source: str = "") -> list[dict]:
    """Content-length-framed WARC parse of one file's bytes (pure
    Python, unit-testable; the distributed entry is :func:`read_warc`).
    Header layout per WARCWriter.createRecordHeader
    (WARCWriter.java:176-206): version line, named headers, blank line,
    Content-Length octets of block, two CRLFs between records. Never
    splits on block content — only the declared Content-Length frames
    the block, so blocks containing 'WARC/1.0' or blank lines parse
    correctly (the reason a regex split would be wrong)."""
    out: list[dict] = []
    pos, n = 0, len(data)
    magic = WARC_VERSION.encode()
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(magic, pos):
            raise ValueError(f"bad record magic at offset {pos} in {source!r}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        lines = data[pos:hdr_end].decode("utf-8").split(CRLF)
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        length = int(headers["Content-Length"])
        block_start = hdr_end + 4
        block = data[block_start : block_start + length]
        pos = block_start + length
        out.append(
            {
                "record_id": headers.get("WARC-Record-ID", "").strip("<>"),
                "warc_type": headers.get("WARC-Type", ""),
                "target_uri": headers.get("WARC-Target-URI", ""),
                "warc_date": headers.get("WARC-Date", ""),
                "content_type": headers.get("Content-Type", ""),
                "content_length": length,
                "block": block.decode("utf-8"),
                "headers": headers,
                "source_file": source,
            }
        )
    return out


def read_warc(spark, path: str) -> DataFrame:
    """WARC source: parse .warc part files back into the RECORD_COLUMNS
    shape (the reference reads its own WARCs for revisit/dedup history —
    WARCWriterProcessor revisit records key off previously written
    digests). Spark-first shape: ``binaryFile`` scan (one task per
    file — WARCs are record-framed, not line-framed, so files are the
    natural split unit, as in warcbase/ArchiveSpark's input formats) →
    ``mapInPandas`` running the content-length-framed parser per file,
    Arrow-batched, never per-row Python. At 100 TB the unit of
    parallelism is the file (the writer pool's maxBytes rotation keeps
    files bounded), so task count tracks corpus size."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(pdfs):
        for pdf in pdfs:
            rows: list[dict] = []
            for src, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == GZIP_MAGIC:
                    # .warc.gz: one gzip member per record
                    # (GZIPMembersInputStream analog) — decompressed
                    # members concatenate back into the plain framing
                    data = b"".join(p for _, _, p in gzip_members(data))
                rows.extend(parse_warc_bytes(data, source=src))
            yield pd.DataFrame(
                rows,
                columns=[
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "content_type",
                    "content_length",
                    "block",
                    "headers",
                    "source_file",
                ],
            )

    return files.select("path", "content").mapInPandas(
        parse, schema=READ_WARC_SCHEMA
    )


# ----------------------------------------------------------- gzip members

GZIP_MAGIC = b"\x1f\x8b"


def gzip_members(data: bytes) -> list[tuple[int, int, bytes]]:
    """Split concatenated per-record gzip members —
    ``GZIPMembersInputStream`` (commons/.../io/GZIPMembersInputStream.java;
    member-boundary law pinned by GZIPMembersInputStreamTest.java:68-140:
    member k spans [end of member k-1, its own compressed end), the
    concatenation decompresses to the concatenation of payloads).
    Returns ``[(compressed_start, compressed_end, payload_bytes)]``."""
    import zlib

    out: list[tuple[int, int, bytes]] = []
    pos, n = 0, len(data)
    view = memoryview(data)  # zero-copy tails: O(n) total, not O(n*R)
    while pos < n:
        if data[pos : pos + 2] != GZIP_MAGIC:
            raise ValueError(f"bad gzip member magic at offset {pos}")
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        payload = d.decompress(view[pos:])
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        consumed = (n - pos) - len(d.unused_data)
        out.append((pos, pos + consumed, payload))
        pos += consumed
    return out


def gzip_record(record_bytes: bytes) -> bytes:
    """One WARC record → one gzip member (the .warc.gz layout: the
    reference's WARCWriter compresses each record as its own member so
    readers can split/seek per record — WriterPoolMember.java compress
    path). mtime pinned to 0 for deterministic bytes."""
    import gzip as _gzip
    import io

    buf = io.BytesIO()
    with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(record_bytes)
    return buf.getvalue()


def write_part_files(
    records: DataFrame,
    out_dir: str,
    ext: str,
    encode_record,
    header_for=None,
    num_files: int | None = None,
):
    """Task-owned part-file sink (the writer-pool shape — each
    ToeThread's WriterPoolMember owns its output file; here each task
    owns ``part-NNNNN<ext>``). The pass is ``mapInArrow`` over the
    record text — Arrow-batched, no per-row pickling — and the file I/O
    goes through ``pyarrow.fs.FileSystem.from_uri``, so ``out_dir`` may
    be a local absolute path or any URI pyarrow's filesystems reach
    from the executors (hdfs://, s3://); tasks never assume
    driver-local disk. Files land under ``.tmp`` names and rename on
    close, so a killed task leaves no half-written part visible.

    ``encode_record(text) -> bytes`` frames one record;
    ``header_for(filename) -> bytes`` (optional) opens each file."""
    if num_files:
        records = records.repartition(num_files)

    from pyarrow import fs as pafs

    filesystem, base = pafs.FileSystem.from_uri(out_dir)
    filesystem.create_dir(base, recursive=True)

    def write_batches(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        name = f"part-{pid:05d}{ext}"
        fsys, root = pafs.FileSystem.from_uri(out_dir)
        # attempt-scoped tmp name (FileOutputCommitter's rule): a retried
        # task and a still-running zombie attempt of the same partition
        # must never share a tmp path — truncate-on-open of a shared path
        # would let interleaved writes publish a corrupt part file via the
        # final rename. Last rename wins; each attempt's bytes are whole.
        tmp = f"{root}/{name}.tmp-{ctx.taskAttemptId()}"
        out = None
        n = 0
        for batch in batches:
            for text in batch.column("record_text"):
                if out is None:
                    out = fsys.open_output_stream(tmp)
                    if header_for is not None:
                        out.write(header_for(name))
                out.write(encode_record(text.as_py()))
                n += 1
        if out is not None:
            out.close()
            fsys.move(tmp, f"{root}/{name}")
        yield pa.record_batch([pa.array([n], type=pa.int64())], names=["n"])

    records.select("record_text").mapInArrow(
        write_batches, "n long"
    ).agg(F.sum("n")).collect()


def write_warc_gz(
    records: DataFrame,
    out_dir: str,
    num_files: int | None = None,
    warcinfo_fields: list[tuple[str, str | None]] | None = None,
    warcinfo_time_ms: int = 0,
):
    """.warc.gz sink: each record its own gzip member, members
    concatenated per task-owned part file (see :func:`write_part_files`
    for the I/O contract).

    ``warcinfo_fields`` makes each part file start with its own
    ``warcinfo`` record (WARCWriter.java:115-125 writes one per file
    open, WARC-Filename = that file) carrying the fields as the ANVL
    body — pass the crawl metadata (software/hostname/operator/...)
    the reference's WriterPoolProcessor supplies."""
    header_for = None
    if warcinfo_fields is not None:
        def header_for(name):
            return gzip_record(
                warcinfo_record_text(
                    name, warcinfo_time_ms, warcinfo_fields
                ).encode("utf-8")
            )

    write_part_files(
        records,
        out_dir,
        ".warc.gz",
        lambda text: gzip_record(text.encode("utf-8")),
        header_for=header_for,
        num_files=num_files,
    )


# ------------------------------------------------------------ warcinfo/ANVL


def anvl_render(fields: list[tuple[str, str | None]]) -> str:
    """ANVL record rendering — ``ANVLRecord.toString``
    (commons/.../util/anvl/ANVLRecord.java:94-104): one ``label: value``
    (or bare ``label`` for value-less entries) per CRLF line, record
    terminated by a blank CRLF line; the empty record IS just CRLF
    (ANVLRecordTest.testEmptyRecord). Labels may not contain line
    terminators (testFolding's IllegalArgumentException); newlines in
    values are folded to ``CRLF + ' '`` (ANVLRecord.FOLD_PREFIX:66).
    (The reference's lenient *parser* law — comment lines, tab folds —
    is read-side surface the engine never emits, so only the writer law
    is modeled.)"""
    lines: list[str] = []
    for label, value in fields:
        if "\r" in label or "\n" in label:
            raise ValueError(f"ANVL label may not contain CR/LF: {label!r}")
        if value is None:
            lines.append(label)
        else:
            folded = (
                value.replace("\r\n", "\n").replace("\r", "\n")
                .replace("\n", "\r\n ")
            )
            lines.append(f"{label}: {folded}")
    return CRLF.join(lines) + CRLF + CRLF if lines else CRLF


def warcinfo_record_text(
    filename: str, time_ms: int, fields: list[tuple[str, str | None]]
) -> str:
    """The per-file ``warcinfo`` first record —
    ``WARCWriter.writeWarcinfoRecord`` (WARCWriter.java:345-431: no
    Target-URI — "the warcinfo type uses its recordId as its URL" :406 —
    WARC-Filename as the named field, application/warc-fields body) with
    the same createRecordHeader layout/framing as every other record.
    Record id is the deterministic md5-uuid law (record_uuid_col)."""
    import hashlib

    body = anvl_render(fields)
    m = hashlib.md5(f"warcinfo{filename}{time_ms}".encode()).hexdigest()
    rid = f"urn:uuid:{m[0:8]}-{m[8:12]}-{m[12:16]}-{m[16:20]}-{m[20:32]}"
    date = __import__("datetime").datetime.fromtimestamp(
        time_ms / 1000, tz=__import__("datetime").timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    header = (
        f"{WARC_VERSION}{CRLF}"
        f"WARC-Type: warcinfo{CRLF}"
        f"WARC-Date: {date}{CRLF}"
        f"WARC-Filename: {filename}{CRLF}"
        f"WARC-Record-ID: <{rid}>{CRLF}"
        f"Content-Type: {ANVL_MIMETYPE}{CRLF}"
        f"Content-Length: {len(body.encode('utf-8'))}{CRLF}{CRLF}"
    )
    return header + body + CRLF + CRLF
