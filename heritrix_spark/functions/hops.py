"""Hops-path functions.

Reference semantics (heritrix3/modules/.../CrawlURI.java):

- ``hops_path`` is a string of hop characters ``L P R E X I`` recording
  the discovery path from a seed (seed = empty string).
- overflow encoding (CrawlURI.extendHopsPath, :1668-1675): once the path
  exceeds 50 chars it is stored as ``"<N>+<last-50-chars>"`` where N is
  the count of truncated leading hops.
- getHopCount (:679-689): total hops = len(tail) + N.
- getLinkHopCount (:1607-1617): count of ``L`` hops only (+N if
  overflowed — truncated hops are assumed navlinks).
- getTransHops (:713-723): trailing non-``L`` hop run length (distance
  from last real link).

All are native column expressions; :func:`extend_hops_path_col`
reproduces the overflow encoding when appending a hop char.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_HOPS_DISPLAYED = 50  # CrawlURI.java:1668


def _overflow_n(col: Column) -> Column:
    """Leading '<N>+' overflow count, 0 when not overflow-encoded."""
    n = F.regexp_extract(col, r"^(\d+)\+", 1)
    return F.when(n == F.lit(""), F.lit(0)).otherwise(n.cast("long"))


def _tail(col: Column) -> Column:
    """Hop chars after any '<N>+' prefix."""
    return F.regexp_replace(col, r"^\d+\+", "")


def hop_count_col(hops_path: Column | str) -> Column:
    col = F.col(hops_path) if isinstance(hops_path, str) else hops_path
    return (_overflow_n(col) + F.length(_tail(col))).cast("int")


def link_hops_col(hops_path: Column | str) -> Column:
    col = F.col(hops_path) if isinstance(hops_path, str) else hops_path
    tail = _tail(col)
    n_l = F.length(tail) - F.length(F.translate(tail, "L", ""))
    return (_overflow_n(col) + n_l).cast("int")


def trans_hops_col(hops_path: Column | str) -> Column:
    """Length of the trailing run of non-'L' hop chars."""
    col = F.col(hops_path) if isinstance(hops_path, str) else hops_path
    tail = _tail(col)
    trailing = F.regexp_extract(tail, r"([^L]*)$", 1)
    return F.length(trailing).cast("int")


def extend_hops_path_col(hops_path: Column | str, hop_char: Column) -> Column:
    """Append one hop char with the reference's 50-char overflow encoding."""
    col = F.col(hops_path) if isinstance(hops_path, str) else hops_path
    n, tail = _overflow_n(col), _tail(col)
    extended = F.concat(tail, hop_char)
    overflow = F.length(extended) > F.lit(MAX_HOPS_DISPLAYED)
    new_n = F.when(overflow, n + 1).otherwise(n)
    new_tail = F.when(
        overflow, F.substring(extended, 2, MAX_HOPS_DISPLAYED)
    ).otherwise(extended)
    return F.when(new_n > 0, F.concat(new_n.cast("string"), F.lit("+"), new_tail)).otherwise(
        new_tail
    )


# ---------------------------------------------------------------- Python twins


def _split_py(hops_path: str) -> tuple[int, str]:
    import re

    m = re.match(r"^(\d+)\+", hops_path)
    if m:
        return int(m.group(1)), hops_path[m.end() :]
    return 0, hops_path


def hop_count_py(hops_path: str) -> int:
    n, tail = _split_py(hops_path)
    return n + len(tail)


def link_hops_py(hops_path: str) -> int:
    n, tail = _split_py(hops_path)
    return n + tail.count("L")


def trans_hops_py(hops_path: str) -> int:
    _, tail = _split_py(hops_path)
    count = 0
    for ch in reversed(tail):
        if ch == "L":
            break
        count += 1
    return count


def extend_hops_path_py(hops_path: str, hop_char: str) -> str:
    n, tail = _split_py(hops_path)
    extended = tail + hop_char
    if len(extended) > MAX_HOPS_DISPLAYED:
        n += 1
        extended = extended[1:]
    return f"{n}+{extended}" if n > 0 else extended
