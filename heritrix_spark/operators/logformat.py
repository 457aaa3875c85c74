"""crawl.log text-line rendering — the reference's exact field law.

Reference: ``UriProcessingFormatter.format``
(heritrix3/engine/src/main/java/org/archive/crawler/io/UriProcessingFormatter.java:69-158):

  <log17date> <status pad 5> <length pad 10> <uri> <hopsPath|-> <via|->
  <mime-truncated> #<thread pad 3 '0'> <began17+durationMs|-> <digest|->
  <sourceTag|-> <annotations ','-joined|->

with the helper laws
- ``ArchiveUtils.getLog17Date`` (:209-224): ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'``
  UTC;
- ``ArchiveUtils.get17DigitDate`` (:272-277): ``yyyyMMddHHmmssSSS`` UTC;
- ``ArchiveUtils.padTo`` (:477-502): LEFT-pad, and **no truncation**
  when the value is already wider (Spark's ``lpad`` truncates — the
  width guard below restores the Java behavior);
- ``MimetypeUtils.truncate`` (commons/.../MimetypeUtils.java:61-74):
  full-match ``^([^\\s;,]+).*`` → group 1, else (null, empty, leading
  delimiter, or embedded line terminator) → ``no-type``;
- length (:76-88): contentLength when >= 0, else contentSize when > 0,
  else ``-`` (pass contentLength = -1 for non-HTTP transactions and the
  two Java branches collapse into this one law);
- ``checkForNull`` (:161-163): null or empty → ``-``.

Everything is a pure codegen projection (string concat + lpad +
date_format) — rendering 10^10 log lines is a map-only job over the
fetch_log table, written straight to text files. The DuckDB twins live
in the ``*_sql`` renderers; regex dialect note: Java's ``.`` excludes
all five line terminators, RE2's only ``\\n`` — the patterns below use
an explicit ASCII class for ``\\s`` and share the ``\\n`` exclusion,
the only divergence left is exotic separators (\\r \\u0085 \\u2028
\\u2029) inside a content-type, which cannot appear in a parsed header
value."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NA = "-"
_WS = r" \t\n\x0B\f\r"  # Java \s, spelled out for the RE2 ∩ Java subset


def pad_to_col(s: Column, width: int, fill: str = " ") -> Column:
    """ArchiveUtils.padTo: left-pad to ``width``, never truncate."""
    return F.when(F.length(s) >= width, s).otherwise(F.lpad(s, width, fill))


def na_if_empty_col(s: Column) -> Column:
    """checkForNull: null or empty string → '-'."""
    return F.when(s.isNull() | (F.length(s) == 0), F.lit(NA)).otherwise(s)


def mimetype_truncate_col(mime: Column) -> Column:
    """MimetypeUtils.truncate — full-match law, not find."""
    ok = mime.rlike(rf"\A[^{_WS};,]+.*\z")
    first = F.regexp_extract(mime, rf"^([^{_WS};,]+)", 1)
    return F.when(mime.isNull() | ~ok, F.lit("no-type")).otherwise(first)


def log17_date_col(ms: Column) -> Column:
    """ArchiveUtils.getLog17Date: yyyy-MM-dd'T'HH:mm:ss.SSS'Z' UTC.
    Millis appended from integer arithmetic so the Spark and DuckDB
    renderers share one law (session timezone is pinned UTC)."""
    ts = F.timestamp_millis(ms)
    return F.concat(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit("."),
        F.lpad(F.pmod(ms, 1000).cast("string"), 3, "0"),
        F.lit("Z"),
    )


def ts17_col(ms: Column) -> Column:
    """ArchiveUtils.get17DigitDate: yyyyMMddHHmmssSSS UTC."""
    ts = F.timestamp_millis(ms)
    return F.concat(
        F.date_format(ts, "yyyyMMddHHmmss"),
        F.lpad(F.pmod(ms, 1000).cast("string"), 3, "0"),
    )


def crawl_log_line_col(
    time_ms: Column,
    fetch_status: Column,
    content_length: Column,
    content_size: Column,
    uri: Column,
    hops_path: Column,
    via: Column,
    mime: Column,
    thread_num: Column,
    began_ms: Column,
    completed_ms: Column,
    digest: Column,
    source_tag: Column,
    annotations: Column,
) -> Column:
    """One crawl.log line (without the trailing newline the Java
    Formatter appends — the text sink adds it per record)."""
    length = (
        F.when(content_length >= 0, content_length.cast("string"))
        .when(content_size > 0, content_size.cast("string"))
        .otherwise(F.lit(NA))
    )
    arc_time = F.when(
        completed_ms.isNotNull() & began_ms.isNotNull(),
        F.concat(
            ts17_col(began_ms), F.lit("+"), (completed_ms - began_ms).cast("string")
        ),
    ).otherwise(F.lit(NA))
    anno = F.when(
        annotations.isNotNull() & (F.size(annotations) > 0),
        F.array_join(annotations, ","),
    ).otherwise(F.lit(NA))
    # nullable inputs render as Java would print them ("null" for the
    # primitive-backed fields, '-' via checkForNull for the rest) —
    # concat_ws would silently DROP a null field and shift every later
    # column, corrupting downstream crawl.log parsers
    nn = lambda c: F.coalesce(c, F.lit("null"))
    return F.concat_ws(
        " ",
        nn(log17_date_col(time_ms)),
        pad_to_col(nn(fetch_status.cast("string")), 5),
        pad_to_col(length, 10),
        nn(uri),
        na_if_empty_col(hops_path),
        na_if_empty_col(via),
        mimetype_truncate_col(mime),
        F.concat(F.lit("#"), pad_to_col(nn(thread_num.cast("string")), 3, "0")),
        arc_time,
        na_if_empty_col(digest),
        na_if_empty_col(source_tag),
        anno,
    )


# ------------------------------------------------------------ DuckDB twins


def pad_to_sql(expr: str, width: int, fill: str = " ") -> str:
    return (
        f"case when length({expr}) >= {width} then {expr} "
        f"else lpad({expr}, {width}, '{fill}') end"
    )


def na_if_empty_sql(expr: str) -> str:
    return (
        f"case when {expr} is null or length({expr}) = 0 then '{NA}' "
        f"else {expr} end"
    )


def mimetype_truncate_sql(expr: str) -> str:
    return (
        f"case when {expr} is null "
        f"or not regexp_full_match({expr}, '[^{_WS};,]+.*') then 'no-type' "
        f"else regexp_extract({expr}, '^([^{_WS};,]+)', 1) end"
    )


def log17_date_sql(ms: str) -> str:
    return (
        f"strftime(epoch_ms({ms}), '%Y-%m-%dT%H:%M:%S') || '.' || "
        f"lpad(cast({ms} % 1000 as varchar), 3, '0') || 'Z'"
    )


def ts17_sql(ms: str) -> str:
    return (
        f"strftime(epoch_ms({ms}), '%Y%m%d%H%M%S') || "
        f"lpad(cast({ms} % 1000 as varchar), 3, '0')"
    )
