"""ARC record assembly + sink/reader — the ARCWriterProcessor analog
(the reference's original archive format, still shipped alongside WARC).

Reference (studied for semantics, not copied):

- ``ARCWriter.createMetaline`` (commons/.../io/arc/ARCWriter.java:431-437):
  ``uri ip date14 mimetype length`` space-separated + ``\\n``; date is
  ``ArchiveUtils.get14DigitDate`` (yyyyMMddHHmmss UTC), mimetype runs
  through ``MimetypeUtils.truncate`` (:417-429), and the line is
  validated non-empty 5-field ≤4096 (:121, :443-455).
- record framing (:380-403): metaline, ``length`` content bytes, one
  ``\\n`` record separator.
- file header record (:202-276 generateARCFileMetaData):
  ``filedesc://<filename> 0.0.0.0 <date14> text/plain <L>`` followed by
  version lines ``1 0 InternetArchive`` and the field-name line, where
  ``L`` is the byte length of the version-lines block (which begins
  with the newline terminating the filedesc metaline), then the record
  separator. Version minor digit is 1 only when a metadata body
  follows (none here).
- ``ARCWriterProcessor.write`` (modules/.../writer/ARCWriterProcessor.java:106-150):
  the record content is the recorded HTTP response (status line +
  headers + body); the ip field is the server address.

Spark restatement mirrors operators/warc.py: a record is ONE codegen'd
string column (no UDF, no shuffle); the sink writes per-task part
files each opened with its own filedesc header (the writer-pool
shape); the reader is a binaryFile scan + mapInPandas length-framed
parser. (The reference's compressed ARCs use a special IA gzip header
extra field — out of scope; plain ARCs only.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heritrix_spark.operators.logformat import mimetype_truncate_col

LF = "\n"
ARC_MAGIC = "filedesc://"
VERSION_LINES = LF + "1 0 InternetArchive" + LF + (
    "URL IP-address Archive-date Content-type Archive-length"
) + LF


def date14_col(epoch_ms: Column) -> Column:
    """ArchiveUtils.get14DigitDate: yyyyMMddHHmmss UTC (session
    timezone pinned UTC in session.py)."""
    return F.date_format(F.timestamp_millis(epoch_ms), "yyyyMMddHHmmss")


def arc_metaline_col(
    uri: Column, ip: Column, time_ms: Column, mime: Column, length: Column
) -> Column:
    """createMetaline: 5 space-separated fields + newline. Null fields
    render as the literal ``null`` — Java's ``+`` concatenation prints
    null references as "null" and validateMetaLine's 5-field regex
    accepts it (:431-455); concat_ws would silently DROP the field and
    corrupt every later record's framing at read time."""
    nn = lambda c: F.coalesce(c, F.lit("null"))
    return F.concat(
        F.concat_ws(
            " ",
            nn(uri),
            nn(ip),
            nn(date14_col(time_ms)),
            mimetype_truncate_col(mime),  # null mime -> 'no-type' already
            nn(length.cast("string")),
        ),
        F.lit(LF),
    )


def arc_records(
    fetches: DataFrame,
    url_col: str = "url",
    time_ms_col: str = "fetch_time_ms",
    content_col: str = "content",
    status_col: str | None = None,
    ip_col: str | None = None,
    mime_col: str | None = None,
) -> DataFrame:
    """One ARC record per fetch: metaline + recorded HTTP response +
    record separator, as pure column expressions (the HTTP block shares
    the composition of operators/warc.py so both formats archive the
    same bytes). Returns (url, ip, arc_date, mime, content_length,
    record_text)."""
    url = F.col(url_col)
    t_ms = F.col(time_ms_col).cast("long")
    content = F.coalesce(F.col(content_col), F.lit(""))
    status = F.col(status_col).cast("int") if status_col else F.lit(200)
    ip = F.col(ip_col) if ip_col else F.lit("0.0.0.0")
    mime = F.col(mime_col) if mime_col else F.lit("text/html")

    http_headers = F.concat(
        F.lit("HTTP/1.1 "),
        status.cast("string"),
        F.when(status == 200, F.lit(" OK"))
        .when(status == 301, F.lit(" Moved Permanently"))
        .when(status == 404, F.lit(" Not Found"))
        .otherwise(F.lit("")),
        F.lit("\r\nContent-Type: text/html\r\nContent-Length: "),
        F.octet_length(content).cast("string"),
        F.lit("\r\n\r\n"),
    )
    block = F.concat(http_headers, content)
    length = F.octet_length(block).cast("long")
    record = F.concat(
        arc_metaline_col(url, ip, t_ms, mime, length), block, F.lit(LF)
    )
    return fetches.select(
        url.alias("url"),
        ip.alias("ip"),
        date14_col(t_ms).alias("arc_date"),
        mimetype_truncate_col(mime).alias("mime"),
        length.alias("content_length"),
        record.alias("record_text"),
    )


def arc_file_header_text(filename: str, time_ms: int) -> str:
    """generateARCFileMetaData: the filedesc:// first record."""
    import datetime as _dt

    date14 = _dt.datetime.fromtimestamp(
        time_ms / 1000, tz=_dt.timezone.utc
    ).strftime("%Y%m%d%H%M%S")
    body_len = len(VERSION_LINES.encode("utf-8"))
    return (
        f"{ARC_MAGIC}{filename} 0.0.0.0 {date14} text/plain {body_len}"
        f"{VERSION_LINES}{LF}"
    )


def write_arc(
    records: DataFrame,
    out_dir: str,
    num_files: int | None = None,
    file_time_ms: int = 0,
):
    """ARC sink: task-owned part files, each opened with its own
    filedesc:// header record — same Arrow-batched pyarrow-fs I/O
    contract as :func:`heritrix_spark.operators.warc.write_part_files`."""
    from heritrix_spark.operators.warc import write_part_files

    write_part_files(
        records,
        out_dir,
        ".arc",
        lambda text: text.encode("utf-8"),
        header_for=lambda name: arc_file_header_text(name, file_time_ms).encode(
            "utf-8"
        ),
        num_files=num_files,
    )


def parse_arc_bytes(data: bytes, source: str = "") -> list[dict]:
    """Length-framed ARC parse of one file's bytes. The filedesc
    record's declared length counts from the newline that terminates
    its own metaline (generateARCFileMetaData law); URL records'
    lengths count only the content after the metaline newline."""
    out: list[dict] = []
    pos, n = 0, len(data)
    while pos < n:
        nl = data.index(b"\n", pos)
        fields = data[pos:nl].decode("utf-8").split(" ")
        if len(fields) != 5:
            raise ValueError(
                f"bad ARC metaline ({len(fields)} fields) at {pos} in {source!r}"
            )
        uri, ip, date14, mime, length_s = fields
        length = int(length_s)
        if uri.startswith(ARC_MAGIC):
            # length includes the metaline-terminating newline
            block = data[nl : nl + length]
            pos = nl + length
        else:
            block = data[nl + 1 : nl + 1 + length]
            pos = nl + 1 + length
        if data[pos : pos + 1] != b"\n":
            raise ValueError(f"missing ARC record separator at {pos} in {source!r}")
        pos += 1
        out.append(
            {
                "url": uri,
                "ip": ip,
                "arc_date": date14,
                "mime": mime,
                "content_length": length,
                "block": block.decode("utf-8"),
                "source_file": source,
            }
        )
    return out


READ_ARC_SCHEMA = (
    "url string, ip string, arc_date string, mime string, "
    "content_length long, block string, source_file string"
)


def read_arc(spark, path: str) -> DataFrame:
    """ARC source: binaryFile scan (file = split unit) → mapInPandas
    length-framed parser — the same Spark-first shape as read_warc."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(pdfs):
        for pdf in pdfs:
            rows: list[dict] = []
            for src, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_arc_bytes(bytes(content), source=src))
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "ip", "arc_date", "mime",
                    "content_length", "block", "source_file",
                ],
            )

    return files.select("path", "content").mapInPandas(
        parse, schema=READ_ARC_SCHEMA
    )
