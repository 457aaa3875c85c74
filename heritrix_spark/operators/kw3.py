"""Kulturarw3 MIME-file assembly — the Kw3WriterProcessor analog
(the Swedish National Library harvest format; with this the full
writer-processor family the reference ships — ARC, WARC, Mirror, Kw3 —
is covered).

Reference (studied for semantics, not copied):
``Kw3WriterProcessor`` (modules/.../writer/Kw3WriterProcessor.java):

- path law (:262-302 initOutputStream): ``<md5(host)[0:2]>/<host>/
  current/<md5(url)>.<fetch seconds>`` where host carries ``:port``
  only for non-80 ports (:295-297), md5 lowercase hex.
- file law (:224-250 writeMimeFile): three LF-separated MIME parts
  with boundary ``KulturArw3_<md5(url)>`` (:180, :229) —
  1. ArchiveInfo (:286-322): ``MIME-version: 1.1``, multipart
     Content-Type, ``HTTP-Part: ArchiveInfo``, then the
     Kw3Constants.java:28-38 keys (Collection/Harvester/URL/IP-Address/
     Header-Length/Header-MD5/Content-Length/Content-MD5/Archive-Time/
     Status-Code), blank line;
  2. Header (:326-334): ``--boundary``, text/plain part header, blank
     line, the raw HTTP response header;
  3. Content (:337-360): ``--boundary``, the content-type, blank line,
     the body — the whole part OMITTED when content is empty (:345);
  then the terminator ``\\n--boundary--\\n`` (:247-248).

The reference stamps Archive-Time from the wall clock (:294); batch
determinism takes it as an input column instead. All columns, no UDF,
no shuffle — like the ARC/WARC record builders, rendering is a
map-only job; the file sink rides the same
``warc.write_part_files``-style task-owned I/O if materialized
per-URI (one row per FILE here, so a partitioned text sink keyed by
the path column also works).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LF = "\n"
BOUNDARY_START = "KulturArw3_"


def kw3_host_col(host: Column, port: Column) -> Column:
    """host, or host:port for non-default ports (:295-297)."""
    return F.when(
        (port == 80) | port.isNull() | (port <= 0), host
    ).otherwise(F.concat(host, F.lit(":"), port.cast("string")))


def kw3_path_col(url: Column, host: Column, port: Column, fetch_begin_ms: Column) -> Column:
    """``<md5(host)[0:2]>/<host>/current/<md5(url)>.<sec>`` (:262-302)."""
    h = kw3_host_col(host, port)
    return F.concat(
        F.substring(F.md5(h), 1, 2),
        F.lit("/"),
        h,
        F.lit("/current/"),
        F.md5(url),
        F.lit("."),
        (fetch_begin_ms / 1000).cast("long").cast("string"),
    )


def kw3_mime_file_col(
    url: Column,
    ip: Column,
    http_header: Column,
    content: Column,
    content_type: Column,
    status: Column,
    archive_time_s: Column,
    collection: str = "kw3",
    harvester: str = "heritrix-spark",
) -> Column:
    """The full Kulturarw3 MIME file as one string column.

    NULL ip/content_type/status are rendered as the literal ``null``
    (Java string concatenation prints "null"); an unguarded concat
    would instead NULL the whole file_text column and silently drop
    the archive file at the sink — the trap logformat.py documents."""
    ip = F.coalesce(ip, F.lit("null"))
    content_type = F.coalesce(content_type, F.lit("null"))
    status_s = F.coalesce(status.cast("string"), F.lit("null"))
    boundary = F.concat(F.lit(BOUNDARY_START), F.md5(url))
    header_len = F.octet_length(http_header).cast("string")
    content_len = F.octet_length(content).cast("string")
    archive_info = F.concat(
        F.lit("MIME-version: 1.1" + LF),
        F.lit("Content-Type: multipart/mixed; boundary="),
        boundary,
        F.lit(LF),
        F.lit("HTTP-Part: ArchiveInfo" + LF),
        F.lit(f"HTTP-Collection: {collection}" + LF),
        F.lit(f"HTTP-Harvester: {harvester}" + LF),
        F.lit("HTTP-URL: "),
        url,
        F.lit(LF),
        F.lit("HTTP-IP-Address: "),
        ip,
        F.lit(LF),
        F.lit("HTTP-Header-Length: "),
        header_len,
        F.lit(LF),
        F.lit("HTTP-Header-MD5: "),
        F.md5(http_header),
        F.lit(LF),
        F.lit("HTTP-Content-Length: "),
        content_len,
        F.lit(LF),
        F.lit("HTTP-Content-MD5: "),
        F.md5(content),
        F.lit(LF),
        F.lit("HTTP-Archive-Time: "),
        archive_time_s.cast("string"),
        F.lit(LF),
        F.lit("HTTP-Status-Code: "),
        status_s,
        F.lit(LF + LF),
    )
    header_part = F.concat(
        F.lit("--"),
        boundary,
        F.lit(LF),
        F.lit('Content-Type: text/plain; charset="US-ascii"' + LF),
        F.lit("HTTP-Part: Header" + LF + LF),
        http_header,
    )
    content_part = F.when(
        F.octet_length(content) > 0,
        F.concat(
            F.lit("--"),
            boundary,
            F.lit(LF),
            F.lit("Content-Type: "),
            content_type,
            F.lit(LF),
            F.lit("HTTP-Part: Content" + LF + LF),
            content,
        ),
    ).otherwise(F.lit(""))
    terminator = F.concat(F.lit(LF + "--"), boundary, F.lit("--" + LF))
    return F.concat(archive_info, header_part, content_part, terminator)


def kw3_files(
    fetches: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    port_col: str = "port",
    time_ms_col: str = "fetch_time_ms",
    content_col: str = "content",
    status_col: str = "status",
    ip_col: str = "ip",
    mime_col: str = "mime",
    archive_time_s_col: str | None = None,
) -> DataFrame:
    """(path, file_text) per successful fetch — the whole writer as one
    codegen projection. The HTTP header block shares the ARC/WARC
    composition so all writers archive the same response bytes."""
    url = F.col(url_col)
    t_ms = F.col(time_ms_col).cast("long")
    content = F.coalesce(F.col(content_col), F.lit(""))
    status = F.col(status_col).cast("int")
    http_header = F.concat(
        F.lit("HTTP/1.1 "),
        F.coalesce(status.cast("string"), F.lit("null")),
        F.when(status == 200, F.lit(" OK"))
        .when(status == 301, F.lit(" Moved Permanently"))
        .when(status == 404, F.lit(" Not Found"))
        .otherwise(F.lit("")),
        F.lit("\r\nContent-Type: text/html\r\nContent-Length: "),
        F.octet_length(content).cast("string"),
        F.lit("\r\n\r\n"),
    )
    at = (
        F.col(archive_time_s_col).cast("long")
        if archive_time_s_col
        else (t_ms / 1000).cast("long")
    )
    return fetches.select(
        kw3_path_col(url, F.col(host_col), F.col(port_col), t_ms).alias("path"),
        kw3_mime_file_col(
            url,
            F.col(ip_col),
            http_header,
            content,
            F.col(mime_col),
            status,
            at,
        ).alias("file_text"),
    )
