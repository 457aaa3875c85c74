"""UURI fixup — raw-URL normalization applied before canonicalization.

Reference: ``UURIFactory`` fixup (heritrix3/commons/.../net/UURIFactory.java:336-470,
fixupAuthority :537-575, fixupDomainlabel :586-611; golden behaviors in
UURIFactoryTest.java:773-1180).
Implemented laws (each item cited to a reference behavior):

1.  NBSP → plain space everywhere (UURIFactory.java:352-355), then trim
    leading/trailing whitespace (testSameAsNutchURLFilterBasic);
2.  strip interior CR/LF/TAB (testNewLineInURL / testTabsInURL);
3.  drop the fragment (#ref removed — testAnchors);
4.  IE backslash law (UURIFactory.java:359-372, testBackslashes):
    backslashes BEFORE the query string become '/'; backslashes in the
    query are escaped to %5C;
5.  three-or-more slashes after http(s): collapse to two, as mozilla
    (HTTP_SCHEME_SLASHES, UURIFactory.java:212-214);
6.  lowercase scheme and authority, preserving path/query case;
7.  strip default ports :80 (http) / :443 (https), keep others;
8.  strip a trailing and a leading dot from the host (stripTail/
    stripPrefix DOT, UURIFactory.java:446-448);
9.  empty path after authority → "/" ("http://foo.com" → "http://foo.com/");
10. minimal escaping in path/query: space %20, '"' %22, '<' %3C,
    '>' %3E, remaining (query) backslashes %5C (escapeWhitespace +
    LaxURLCodec EXPANDED_URI_SAFE; testQueryEscaping pins that FF-style
    only ``"<>`` gain escapes). Stray '%' is NEVER escaped
    (testTrailingPercents / testStrayPercents: "browsers don't escape
    '%'") — valid and stray escapes pass through verbatim;
11. dot-segment removal in the path (the commons-httpclient URI
    normalize step the reference inherits; goldens
    testSameAsNutchURLFilterBasic :990-1028): ``/./`` collapse,
    ``/seg/../`` contraction (a segment named ``a..a`` or ``foo.foo``
    is NOT a dot segment), leading ``(/../)+`` → ``/`` (SLASHDOTDOTSLASH,
    UURIFactory.java:139,424), trailing ``/..``/``/.`` resolved.

IDN punycode (law 12) lives in :func:`fixup_idn_col` / :func:`fixup_idn_py`
— non-ASCII host labels are RFC 3490/3491 nameprep+punycode encoded
(reference uses gnu.inet.encoding.IDNA.toASCII, fixupDomainlabel :593;
goldens testIdn). The Spark backend is a vectorized Arrow pass over the
authority only, short-circuiting all-ASCII batches; it is opt-in because
the pure-Catalyst :func:`fixup_col` covers every ASCII URL JVM-side.
There is deliberately no SQL twin for punycode (not expressible in
DuckDB); the driver row pins it against literal reference goldens.

The rewrite passes are expressed WITHOUT lookahead so one pattern set
runs identically on Java regex (Spark) and RE2 (DuckDB). Bounded-pass
note: backslash conversion handles ≤8 pre-query backslashes and
dot-segment contraction ≤8 levels per URL (identical bound on all three
backends — deeper pathological paths keep their residue consistently).

Three aligned backends, like functions/canonicalize.py.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "\x01"
# scheme:// | authority | rest
_AUTH_PAT = r"^([A-Za-z][A-Za-z0-9+.\-]*://)([^/?#]*)(.*)$"

# a path segment that is NOT "." or ".." (but "a..a", "...", ".a" are
# ordinary segments — UURIFactoryTest :1019-1027)
_SEG = r"(?:\.\.[^/]+|\.[^/.][^/]*|[^/.][^/]*)"

_N_BACKSLASH = 8  # bounded passes, law 4
_N_DOTSLASH = 4   # bounded passes, '/./'
_N_DOTDOT = 8     # bounded passes, '/seg/../'

# (pattern, replacement, n_passes) — applied to the fragment-stripped
# whole URI before parsing. Anchored patterns fire at most once per
# pass; `[^?]*`/`[^?\\]*` prefixes confine the rewrite to the pre-query
# region without lookahead. The `/seg/../ → /` system is confluent, so
# the greedy (rightmost) contraction order converges to the same normal
# form as RFC 3986 remove_dot_segments' left-to-right walk.
_PRE_RULES: list[tuple[str, str, int]] = [
    (r"^([^?\\]*)\\", r"$1/", _N_BACKSLASH),   # law 4: pre-query \ → /
    (r"^(https?://)/+", r"$1", 1),             # law 5: ///+ → //
]

# applied to the "rest" (path [+ ?query]) AFTER escaping; anchored
# `[^?]*` prefixes keep dot-segment rewriting inside the path
_REST_RULES: list[tuple[str, str, int]] = [
    (r"^([^?]*/\.\.?)$", r"$1/", 1),           # sentinel: trailing /.(.)
    (r"^([^?]*/\.\.?)\?", r"$1/?", 1),         # ...also just before ?query
    (r"^([^?]*)/\./", r"$1/", _N_DOTSLASH),    # /./ collapse
    (r"^([^?]*)/" + _SEG + r"/\.\./", r"$1/", _N_DOTDOT),  # /seg/../ →
    (r"^/\.\./", r"/", _N_DOTDOT),             # leading /../ (IE law);
    # repeated single-step passes: consecutive /../../ share the middle
    # slash, so a (/\.\./)+ one-shot can only strip the first
]

# minimal escaping (law 10): literal char → escape
_ESCAPES: list[tuple[str, str]] = [
    (" ", "%20"),
    ('"', "%22"),
    ("<", "%3C"),
    (">", "%3E"),
    ("\\", "%5C"),  # only query backslashes remain after law 4
]


def fixup_col(url: Column | str) -> Column:
    col = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(col, "\u00a0", " ")
    u = F.regexp_replace(u, r"^\s+|\s+$", "")
    u = F.regexp_replace(u, "[\\n\\r\\t]", "")
    u = F.regexp_replace(u, "#.*$", "")
    for pat, repl, n in _PRE_RULES:
        for _ in range(n):
            u = F.regexp_replace(u, pat, repl)
    parts = F.split(
        F.regexp_replace(u, _AUTH_PAT, f"$1{_SEP}$2{_SEP}$3"), _SEP, -1
    )
    scheme = F.lower(parts[0])
    auth = F.lower(parts[1])
    auth = F.regexp_replace(auth, r"\.(:[0-9]+)?$", "$1")  # trailing host dot
    auth = F.regexp_replace(auth, r"^\.", "")              # leading host dot
    auth = F.when(
        scheme == "http://", F.regexp_replace(auth, ":80$", "")
    ).when(
        scheme == "https://", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    rest = parts[2]
    for lit, esc in _ESCAPES:
        rest = F.replace(rest, F.lit(lit), F.lit(esc))
    for pat, repl, n in _REST_RULES:
        for _ in range(n):
            rest = F.regexp_replace(rest, pat, repl)
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(F.size(parts) == 3, F.concat(scheme, auth, rest)).otherwise(u)


_AUTH_RE = re.compile(_AUTH_PAT)


def _java_repl(repl: str) -> str:
    """'$1' group refs (shared rule table) → python re's '\\1'."""
    return re.sub(r"\$(\d)", r"\\\1", repl)


# precompiled rule tables + literal trigger per group: fixup_py runs
# PER EXTRACTED LINK inside the Python extraction kernels
# (html_extract.py page.add), so every rule carries a cheap containment
# short-circuit \u2014 the triggers are semantic no-ops (a rule whose
# trigger is absent cannot match) and keep all three backends aligned.
_TRIM_RE = re.compile(r"^\s+|\s+$")
_CTL_RE = re.compile(r"[\n\r\t]")
_FRAG_RE = re.compile(r"#.*$")
_TAILDOT_RE = re.compile(r"\.(:[0-9]+)?$")
_LEADDOT_RE = re.compile(r"^\.")
_P80_RE = re.compile(r":80$")
_P443_RE = re.compile(r":443$")
# per-rule containment triggers, parallel to _PRE_RULES — strict=True
# fails loudly if someone extends _PRE_RULES without a trigger (the
# silent zip truncation would desync the Python backend from the
# Catalyst/Arrow ones)
_PRE_TRIGGERS = ["\\", ":///"]
_PRE_COMPILED = [
    (re.compile(p), _java_repl(r), n, t)
    for (p, r, n), t in zip(_PRE_RULES, _PRE_TRIGGERS, strict=True)
]
_REST_COMPILED = [
    (re.compile(p), _java_repl(r), n) for p, r, n in _REST_RULES
]


def fixup_py(url: str) -> str:
    u = url
    if "\u00a0" in u:
        u = u.replace("\u00a0", " ")
    u = _TRIM_RE.sub("", u)
    if "\n" in u or "\r" in u or "\t" in u:
        u = _CTL_RE.sub("", u)
    if "#" in u:
        u = _FRAG_RE.sub("", u)
    for pat, repl, n, trigger in _PRE_COMPILED:
        if trigger not in u:
            continue
        for _ in range(n):
            u2 = pat.sub(repl, u, count=1)
            if u2 == u:
                break
            u = u2
    m = _AUTH_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    auth = m.group(2).lower()
    auth = _TAILDOT_RE.sub(r"\1", auth)
    auth = _LEADDOT_RE.sub("", auth)
    if scheme == "http://":
        auth = _P80_RE.sub("", auth)
    elif scheme == "https://":
        auth = _P443_RE.sub("", auth)
    rest = m.group(3)
    for lit, esc in _ESCAPES:
        if lit in rest:
            rest = rest.replace(lit, esc)
    if "/." in rest:  # every _REST_RULES pattern requires a '/.'
        for pat, repl, n in _REST_COMPILED:
            for _ in range(n):
                r2 = pat.sub(repl, rest, count=1)
                if r2 == rest:
                    break
                rest = r2
    if rest == "":
        rest = "/"
    return scheme + auth + rest


def _duck_repl(repl: str) -> str:
    """'$1' group refs → DuckDB RE2's '\\1'."""
    return re.sub(r"\$(\d)", r"\\\1", repl)


def fixup_sql(expr: str) -> str:
    pat = _AUTH_PAT.replace("'", "''")
    u = f"regexp_replace({expr}, '\u00a0', ' ', 'g')"
    u = f"regexp_replace({u}, '^\\s+|\\s+$', '', 'g')"
    u = f"regexp_replace({u}, '[\\n\\r\\t]', '', 'g')"
    u = f"regexp_replace({u}, '#.*$', '')"
    for p, repl, n in _PRE_RULES:
        p2 = p.replace("'", "''")  # DuckDB strings: backslash is literal
        for _ in range(n):
            u = f"regexp_replace({u}, '{p2}', '{_duck_repl(repl)}')"
    parts = f"string_split(regexp_replace({u}, '{pat}', '\\1\x01\\2\x01\\3'), chr(1))"
    # DuckDB lacks let-bindings in scalar SQL; restate via a CASE over the
    # same parts expression (the engine CSEs repeated subexpressions).
    scheme = f"lower(({parts})[1])"
    auth0 = f"regexp_replace(lower(({parts})[2]), '\\.(:[0-9]+)?$', '\\1')"
    auth0 = f"regexp_replace({auth0}, '^\\.', '')"
    auth = (
        f"CASE WHEN {scheme} = 'http://' THEN regexp_replace({auth0}, ':80$', '') "
        f"WHEN {scheme} = 'https://' THEN regexp_replace({auth0}, ':443$', '') "
        f"ELSE {auth0} END"
    )
    rest = f"({parts})[3]"
    for lit, esc in _ESCAPES:
        lit2 = "chr(92)" if lit == "\\" else f"'{lit.replace(chr(39), chr(39)*2)}'"
        rest = f"replace({rest}, {lit2}, '{esc}')"
    for p, repl, n in _REST_RULES:
        p2 = p.replace("'", "''")  # DuckDB strings: backslash is literal
        for _ in range(n):
            rest = f"regexp_replace({rest}, '{p2}', '{_duck_repl(repl)}')"
    rest_final = f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END"
    return (
        f"CASE WHEN len({parts}) = 3 THEN {scheme} || ({auth}) || ({rest_final}) "
        f"ELSE {u} END"
    )


# --------------------------------------------------------- IDN punycode

_NON_ASCII_RE = re.compile(r"[^\x00-\x7f]")


def idn_ascii_host(host: str) -> str:
    """RFC 3490/3491 (IDNA2003) host encoding, per dot-separated label —
    the gnu.inet.encoding.IDNA.toASCII law of fixupDomainlabel
    (UURIFactory.java:586-611, goldens UURIFactoryTest.testIdn:896-911,
    incl. nameprep 'josefßon' → 'josefsson'). ASCII labels pass through;
    an unencodable label is kept verbatim (the reference tolerates
    ACCEPTABLE_ASCII_DOMAIN misfits rather than dropping the URI)."""
    if not _NON_ASCII_RE.search(host):
        return host
    import encodings.idna as _idna

    out = []
    for label in host.split("."):
        if label and _NON_ASCII_RE.search(label):
            try:
                label = _idna.ToASCII(label).decode("ascii")
            except (UnicodeError, ValueError):
                pass
        out.append(label)
    return ".".join(out)


def fixup_idn_py(url: str) -> str:
    """fixup + IDN-punycode of the authority's host portion (userinfo@
    and :port untouched)."""
    u = fixup_py(url)
    m = _AUTH_RE.match(u)
    if not m or not _NON_ASCII_RE.search(m.group(2)):
        return u
    auth = m.group(2)
    userinfo, sep, hostport = auth.rpartition("@")
    host, psep, port = hostport.partition(":")
    host = idn_ascii_host(host)
    return m.group(1) + userinfo + sep + host + psep + port + m.group(3)


def fixup_idn_col(url: Column | str) -> Column:
    """:func:`fixup_col` plus the IDN pass: ONE vectorized Arrow batch
    over the already-fixed URL, short-circuiting all-ASCII batches with
    a single pandas vectorized containment test (the overwhelmingly
    common case pays one Arrow round-trip and zero per-row Python
    beyond it)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _idn_fix(s: pd.Series) -> pd.Series:
        mask = s.str.contains(r"[^\x00-\x7f]", regex=True, na=False)
        if not mask.any():
            return s
        out = s.copy()
        out[mask] = s[mask].map(
            lambda u: fixup_idn_py(u) if u is not None else None
        )
        return out

    return _idn_fix(fixup_col(url))


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
