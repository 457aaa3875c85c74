"""SURT (Sort-friendly URI Reordering Transform) + queue-key policies.

Reference semantics: ``SURT.fromURI`` (heritrix3/commons/.../util/SURT.java:101-160)
splits an authority-based URI with URI_SPLITTER into
(scheme://, userinfo, @, dotted-quad-host, host, :port, path), then emits

    scheme://( reversed-host-as-csv-with-trailing-comma | ip ) :port @ userinfo ) path

all lowercased; non-matching URIs pass through unchanged; IPv4 hosts are
NOT reversed. Golden pairs in SURTTest.java:63-106.

Queue keys:

- :func:`class_key_*` — the default SurtAuthorityQueueAssignmentPolicy
  (heritrix3/engine/.../frontier/SurtAuthorityQueueAssignmentPolicy.java:33-45):
  substring of the SURT form between ``://(`` and ``)``, with ``:``→``#``;
  falls back to the literal ``default...`` bucket when there is no
  well-formed SURT authority.
- :func:`hostname_class_key_col` — HostnameQueueAssignmentPolicy
  (HostnameQueueAssignmentPolicy.java:38-57): authority minus userinfo,
  https without explicit port gets ``#443``, ``:``→``#``.

All three backends (Spark Column / Python / DuckDB SQL) share one
pattern, restricted to the Java ∩ RE2 ∩ Python regex subset.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Same group layout as the reference URI_SPLITTER (SURT.java:76-80):
# 1: scheme://  2: userinfo  3: @  4: IPv4 host  5: other host  6: :port  7: path
SURT_SPLITTER = (
    r"^(\w+://)(?:([-\w.!~*'()%;:&=+$,]+?)(@))?"
    r"(?:((?:\d{1,3}\.){3}\d{1,3})|(\S+?))(:\d+)?(/\S*)?$"
)

# Heritrix's bucket for unkeyable URIs
# (URIAuthorityBasedQueueAssignmentPolicy DEFAULT_CLASS_KEY).
DEFAULT_CLASS_KEY = "default..."

_SURT_RE = re.compile(SURT_SPLITTER)


# ---------------------------------------------------------------- Spark

# Separator for the single-execution group-pack trick (never occurs in
# URL data). Running the splitter once via regexp_replace("$1␁$2␁…")
# and splitting is ~8× cheaper than 7×regexp_extract + rlike.
_SEP = "\x01"


def _surt_expr(col: Column, lower: bool) -> Column:
    """Shared body of the Catalyst SURT backends (lowered default form
    and the case-preserving persist-key form)."""
    repl = _SEP.join(f"${i}" for i in range(1, 8))
    parts = F.split(F.regexp_replace(col, SURT_SPLITTER, repl), _SEP, -1)
    scheme, userinfo, at = parts[0], parts[1], parts[2]
    ip, host, port, path = parts[3], parts[4], parts[5], parts[6]
    revhost = F.when(
        ip != F.lit(""),
        ip,
    ).otherwise(F.concat(F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(",")))
    surt = F.concat(scheme, F.lit("("), revhost, port, at, userinfo, F.lit(")"), path)
    if lower:
        surt = F.lower(surt)
    return F.when(F.size(parts) == 7, surt).otherwise(col)


def surt_expr_col(url: Column | str) -> Column:
    """SURT form as a native Catalyst expression (no Python).

    The splitter regex executes exactly once per row: all 7 groups are
    packed into one delimited string (non-participating groups render
    empty, same as regexp_extract), then unpacked with a literal split.
    A non-matching URI yields a pack without separators (size 1) and
    passes through unchanged, exactly like the reference's non-authority
    fallback (SURT.fromURI, SURT.java:124-127). Fallback backend; the
    hot path uses the Arrow/RE2 UDF below (java.util.regex backtracking
    makes this ~10x slower per row).
    """
    col = F.col(url) if isinstance(url, str) else url
    return _surt_expr(col, lower=True)


def class_key_expr_col(url: Column | str) -> Column:
    """Catalyst-expression twin of :func:`class_key_col` (fallback)."""
    s = surt_expr_col(url)
    auth = F.regexp_extract(s, r"^\w+://\(([^)]+)\)", 1)
    return F.when(auth == F.lit(""), F.lit(DEFAULT_CLASS_KEY)).otherwise(
        F.translate(auth, ":", "#")
    )


# Named-group variant of SURT_SPLITTER for pyarrow.compute.extract_regex
# (same pattern, RE2 dialect — lazy quantifiers and \w are RE2-safe).
_SPLIT_NAMED = (
    r"^(?P<scheme>\w+://)(?:(?P<userinfo>[-\w.!~*'()%;:&=+$,]+?)(?P<at>@))?"
    r"(?:(?P<ip>(?:\d{1,3}\.){3}\d{1,3})|(?P<host>\S+?))(?P<port>:\d+)?(?P<path>/\S*)?$"
)


def _reverse_labels_arrow(host):
    """'www.archive.org' → 'org,archive,www' — vectorized, no Python rows.

    Char-reverse the whole host, split on '.', char-reverse each label
    in the flattened child array, rebuild the list, join with ','.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    rev = pc.utf8_reverse(host)
    parts = pc.split_pattern(rev, pattern=".")
    fixed = pc.utf8_reverse(parts.values)
    rebuilt = pa.ListArray.from_arrays(parts.offsets, fixed)
    return pc.binary_join(rebuilt, ",")


def _surt_arrow(arr, lower: bool = True):
    """SURT transform on a pyarrow StringArray (RE2 extract, C++ only).
    ``lower=False`` is the case-preserving variant (SURT.fromURI's
    ``preserveCase`` arg, SURT.java:118-160) used by persist keys."""
    import pyarrow.compute as pc

    ex = pc.extract_regex(arr, _SPLIT_NAMED)
    matched = pc.is_valid(ex)
    g = {n: pc.coalesce(pc.struct_field(ex, n), "") for n in
         ("scheme", "userinfo", "at", "ip", "host", "port", "path")}
    revhost = pc.if_else(
        pc.not_equal(g["ip"], ""),
        g["ip"],
        pc.binary_join_element_wise(_reverse_labels_arrow(g["host"]), "", ","),
    )
    surt = pc.binary_join_element_wise(
        g["scheme"], "(", revhost, g["port"], g["at"], g["userinfo"], ")",
        g["path"], "",
    )
    if lower:
        surt = pc.utf8_lower(surt)
    return pc.if_else(matched, surt, arr)


def _surt_case_arrow(arr):
    return _surt_arrow(arr, lower=False)


def _class_key_arrow(arr):
    import pyarrow as pa
    import pyarrow.compute as pc

    s = _surt_arrow(arr)
    ex = pc.extract_regex(s, r"^\w+://\((?P<auth>[^)]+)\)")
    auth = pc.coalesce(pc.struct_field(ex, "auth"), "")
    keyed = pc.replace_substring(auth, ":", "#")
    res = pc.if_else(pc.equal(auth, ""), DEFAULT_CLASS_KEY, keyed)
    # null in → null out (matches the Catalyst backend; unkeyable
    # non-null URIs still get the DEFAULT_CLASS_KEY bucket)
    return pc.if_else(pc.is_valid(arr), res, pa.scalar(None, pa.string()))


_SURT_UDF = None
_CLASS_KEY_UDF = None


def _make_str_udf(fn):
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql.functions import pandas_udf

    def _f(s: pd.Series) -> pd.Series:
        return fn(pa.Array.from_pandas(s, type=pa.string())).to_pandas()

    _f.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_f, "string")


def surt_col(url: Column | str) -> Column:
    """SURT form — vectorized Arrow/RE2 UDF (hot-path default; the
    north-star contract canonicalizes/keys URLs in Arrow UDFs with no
    per-row Python). Same splitter pattern as the expression backend;
    all four backends pinned equal by tests/test_surt.py."""
    global _SURT_UDF
    if _SURT_UDF is None:
        _SURT_UDF = _make_str_udf(_surt_arrow)
    col = F.col(url) if isinstance(url, str) else url
    return _SURT_UDF(col)


_SURT_CASE_UDF = None


def surt_case_col(url: Column | str) -> Column:
    """Case-preserving SURT (persist key) — Arrow/RE2 UDF."""
    global _SURT_CASE_UDF
    if _SURT_CASE_UDF is None:
        _SURT_CASE_UDF = _make_str_udf(_surt_case_arrow)
    col = F.col(url) if isinstance(url, str) else url
    return _SURT_CASE_UDF(col)


def surt_case_expr_col(url: Column | str) -> Column:
    """Case-preserving SURT as a Catalyst expression (fallback backend;
    same pack trick as :func:`surt_expr_col`, no final lowercase)."""
    col = F.col(url) if isinstance(url, str) else url
    return _surt_expr(col, lower=False)


def class_key_col(url: Column | str) -> Column:
    """Default queue key: SURT authority between ``://(`` and ``)``,
    ``:``→``#`` — vectorized Arrow/RE2 UDF."""
    global _CLASS_KEY_UDF
    if _CLASS_KEY_UDF is None:
        _CLASS_KEY_UDF = _make_str_udf(_class_key_arrow)
    col = F.col(url) if isinstance(url, str) else url
    return _CLASS_KEY_UDF(col)


_URL_PREP_UDF = None


def url_prep_struct_col(url: Column | str) -> Column:
    """Fused hot-path UDF: raw url → struct(surt, canon_url, class_key).

    The frontier prepare chain needs all three per candidate (scope
    checks SURT of the raw URI, then canonical form, then queue key of
    the canonical form — FrontierPreparer.java:161-179 order). Fusing
    them into ONE pandas/Arrow UDF means one Python worker per task and
    one Arrow round trip instead of three chained ArrowEvalPython
    stages — chained UDFs each add a worker process per task, which
    triples CPU oversubscription on the hot path.
    """
    global _URL_PREP_UDF
    if _URL_PREP_UDF is None:
        import pandas as pd
        import pyarrow as pa
        from pyspark.sql.functions import pandas_udf

        from heritrix_spark.functions.canonicalize import _canonicalize_arrow

        def _prep(s: pd.Series) -> pd.DataFrame:
            arr = pa.Array.from_pandas(s, type=pa.string())
            surt = _surt_arrow(arr)
            canon = _canonicalize_arrow(arr)
            key = _class_key_arrow(canon)
            return pa.table(
                {"surt": surt, "canon_url": canon, "class_key": key}
            ).to_pandas()

        _prep.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
        # asNondeterministic is an OPTIMIZER FENCE, not a semantic claim:
        # the function is pure, but left "deterministic" Catalyst pushes
        # the scope filter (which reads .surt) below the projection
        # (which reads .canon_url/.class_key) and re-expands the UDF on
        # both sides — the hot-path plan then runs TWO ArrowEvalPython
        # stages over every candidate instead of one (verified via
        # explain("formatted"): duplicate _prep(url) nodes). Marking it
        # nondeterministic pins one evaluation with the filter above it.
        _URL_PREP_UDF = pandas_udf(
            _prep, "surt string, canon_url string, class_key string"
        ).asNondeterministic()
    col = F.col(url) if isinstance(url, str) else url
    return _URL_PREP_UDF(col)


def hostname_class_key_col(url: Column | str) -> Column:
    """HostnameQueueAssignmentPolicy: authority-minus-userinfo, https→``#443``."""
    col = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(col, r"^(\w+)://", 1))
    auth = F.lower(F.regexp_extract(col, r"^\w+://(?:[^/@]+@)?([^/?#]+)", 1))
    needs_port = (scheme == F.lit("https")) & ~auth.rlike(r".+:[0-9]+$")
    keyed = F.when(needs_port, F.concat(auth, F.lit(":443"))).otherwise(auth)
    return F.when(auth == F.lit(""), F.lit(DEFAULT_CLASS_KEY)).otherwise(
        F.translate(keyed, ":", "#")
    )


def class_key_with_overrides_col(
    computed: Column,
    forced: Column | None = None,
    previous: Column | None = None,
) -> Column:
    """forceQueueAssignment / deferToPrevious
    (URIAuthorityBasedQueueAssignmentPolicy kp, SURVEY.md §2.4): an
    operator-forced key wins outright; otherwise a sticky previous key
    (the URI keeps the queue it was first assigned to, even if the
    policy/overlay changed since); otherwise the computed policy key.
    Expressed as one coalesce — null means "no override"."""
    parts = [c for c in (forced, previous) if c is not None]
    return F.coalesce(*parts, computed) if parts else computed


# ---------------------------------------------------------------- Python


def _surt_py(url: str, lower: bool) -> str:
    m = _SURT_RE.match(url)
    if not m:
        return url
    scheme, userinfo, at, ip, host, port, path = (m.group(i) or "" for i in range(1, 8))
    hostpart = ip if ip else ",".join(reversed(host.split("."))) + ","
    out = f"{scheme}({hostpart}{port}{at}{userinfo}){path}"
    return out.lower() if lower else out


def surt_py(url: str) -> str:
    return _surt_py(url, lower=True)


def surt_case_py(url: str) -> str:
    """Case-preserving twin of :func:`surt_py` (SURT.fromURI(s, true),
    SURT.java:121-160) — the persist-key form
    (PersistProcessor.persistKeyFor, recrawl/PersistProcessor.java:106-113)."""
    return _surt_py(url, lower=False)


def class_key_py(url: str) -> str:
    s = surt_py(url)
    m = re.match(r"^\w+://\(([^)]+)\)", s)
    if not m:
        return DEFAULT_CLASS_KEY
    return m.group(1).replace(":", "#")


# ---------------------------------------------------------------- DuckDB SQL


def _sql_pat() -> str:
    return SURT_SPLITTER.replace("'", "''")


def surt_sql(expr: str) -> str:
    pat = _sql_pat()
    g = lambda i: f"regexp_extract({expr}, '{pat}', {i})"  # noqa: E731
    revhost = (
        f"CASE WHEN {g(4)} <> '' THEN {g(4)} "
        f"ELSE array_to_string(list_reverse(string_split({g(5)}, '.')), ',') || ',' END"
    )
    surt = (
        f"lower({g(1)} || '(' || {revhost} || {g(6)} || {g(3)} || {g(2)} || ')' "
        f"|| {g(7)})"
    )
    return f"CASE WHEN regexp_matches({expr}, '{pat}') THEN {surt} ELSE {expr} END"


def class_key_sql(expr: str) -> str:
    s = surt_sql(expr)
    auth = f"regexp_extract({s}, '^\\w+://\\(([^)]+)\\)', 1)"
    return (
        f"CASE WHEN {auth} = '' THEN '{DEFAULT_CLASS_KEY}' "
        f"ELSE replace({auth}, ':', '#') END"
    )
