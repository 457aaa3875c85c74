"""UURI fixup — raw-URL normalization applied before canonicalization.

Reference: ``UURIFactory`` fixup (heritrix3/commons/.../net/UURIFactory.java:336-470,
fixupAuthority :537-575; golden behaviors in UURIFactoryTest.java:915-990).
Implemented subset (each item cited to a reference behavior):

1. trim leading/trailing whitespace and NBSP (testSameAsNutchURLFilterBasic
   " http://foo.com/ ");
2. strip interior CR/LF/TAB (testNewLineInURL / testTabsInURL);
3. drop the fragment (#ref removed);
4. lowercase scheme and authority, preserving path/query case;
5. strip default ports :80 (http) / :443 (https), keep others;
6. strip a trailing dot from the host;
7. empty path after authority → "/" ("http://foo.com" → "http://foo.com/");
8. escape bare spaces and backslashes in path/query (%20 / %5C —
   UURIFactory ESCAPED handling; "index%25 .html" → "index%25%20.html").

Deliberately out of subset (documented): IDN punycode (no codec dep),
``../`` path resolution, full stray-%% escaping — these need a real URI
parser; the crawl fixtures and bench corpus never produce them.

Three aligned backends, like functions/canonicalize.py.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "\x01"
# scheme:// | authority | rest
_AUTH_PAT = r"^([A-Za-z][A-Za-z0-9+.\-]*://)([^/?#]*)(.*)$"


def fixup_col(url: Column | str) -> Column:
    col = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(col, "^[\\s\u00a0]+|[\\s\u00a0]+$", "")
    u = F.regexp_replace(u, "[\\n\\r\\t]", "")
    u = F.regexp_replace(u, "#.*$", "")
    parts = F.split(
        F.regexp_replace(u, _AUTH_PAT, f"$1{_SEP}$2{_SEP}$3"), _SEP, -1
    )
    scheme = F.lower(parts[0])
    auth = F.lower(parts[1])
    auth = F.regexp_replace(auth, r"\.(:[0-9]+)?$", "$1")  # trailing host dot
    auth = F.when(
        scheme == "http://", F.regexp_replace(auth, ":80$", "")
    ).when(
        scheme == "https://", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    rest = parts[2]
    rest = F.regexp_replace(rest, " ", "%20")
    rest = F.regexp_replace(rest, r"\\", "%5C")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(F.size(parts) == 3, F.concat(scheme, auth, rest)).otherwise(u)


_AUTH_RE = re.compile(_AUTH_PAT)


def fixup_py(url: str) -> str:
    u = re.sub("^[\\s\u00a0]+|[\\s\u00a0]+$", "", url)
    u = re.sub(r"[\n\r\t]", "", u)
    u = re.sub(r"#.*$", "", u)
    m = _AUTH_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    auth = m.group(2).lower()
    auth = re.sub(r"\.(:[0-9]+)?$", r"\1", auth)
    if scheme == "http://":
        auth = re.sub(r":80$", "", auth)
    elif scheme == "https://":
        auth = re.sub(r":443$", "", auth)
    rest = m.group(3).replace(" ", "%20").replace("\\", "%5C")
    if rest == "":
        rest = "/"
    return scheme + auth + rest


def fixup_sql(expr: str) -> str:
    pat = _AUTH_PAT.replace("'", "''")
    u = f"regexp_replace({expr}, '^[\\s\u00a0]+|[\\s\u00a0]+$', '', 'g')"
    u = f"regexp_replace({u}, '[\\n\\r\\t]', '', 'g')"
    u = f"regexp_replace({u}, '#.*$', '')"
    parts = f"string_split(regexp_replace({u}, '{pat}', '\\1\x01\\2\x01\\3'), chr(1))"
    # DuckDB lacks let-bindings in scalar SQL; restate via a CASE over the
    # same parts expression (the engine CSEs repeated subexpressions).
    scheme = f"lower(({parts})[1])"
    auth0 = f"regexp_replace(lower(({parts})[2]), '\\.(:[0-9]+)?$', '\\1')"
    auth = (
        f"CASE WHEN {scheme} = 'http://' THEN regexp_replace({auth0}, ':80$', '') "
        f"WHEN {scheme} = 'https://' THEN regexp_replace({auth0}, ':443$', '') "
        f"ELSE {auth0} END"
    )
    rest0 = (
        f"replace(replace(({parts})[3], ' ', '%20'), chr(92), '%5C')"
    )
    rest = f"CASE WHEN {rest0} = '' THEN '/' ELSE {rest0} END"
    return (
        f"CASE WHEN len({parts}) = 3 THEN {scheme} || ({auth}) || ({rest}) "
        f"ELSE {u} END"
    )


def full_canonicalize_col(url: Column | str) -> Column:
    """fixup → canonicalization chain (the complete raw-URL → canon path)."""
    from heritrix_spark.functions.canonicalize import canonicalize_col

    return canonicalize_col(fixup_col(url))


def full_canonicalize_py(url: str) -> str:
    from heritrix_spark.functions.canonicalize import canonicalize_py

    return canonicalize_py(fixup_py(url))


def full_canonicalize_sql(expr: str) -> str:
    from heritrix_spark.functions.canonicalize import canonicalize_sql

    return canonicalize_sql(fixup_sql(expr))
