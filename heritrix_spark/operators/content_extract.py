"""Content-type extractor kernels: CSS, JS-string, and XML URI mining.

Reference analogs (all in heritrix3/modules/.../extractor/):

- ``ExtractorCSS.java:69-80,126-139`` — ``url(...)`` / ``@import url(...)``
  mining with the CSS backslash-escape unescape
  (``CSS_BACKSLASH_ESCAPE``) and the (literal) ``&amp``->``&`` fixup;
  links are EMBED (``E``) hops added relative to base.
- ``ExtractorJS.java:68-73,152-193`` — whitespace-free quoted strings
  (``JAVASCRIPT_STRING_EXTRACTOR``); each candidate that passes
  ``UriUtils.isLikelyUri`` is JS-unescaped, speculative-fixed-up and
  added as a SPECULATIVE (``X``) hop; non-likely strings are
  *recursed into* for nested quoted strings, and the scan resumes AT
  the closing delimiter (``startIndex = strings.end(2)``,
  ExtractorJS.java:188) so a closing quote can open the next string —
  the reference's own test data (ExtractorJSTest.java
  ``'string with spaces','http://example.com/outlink'``) depends on
  this reuse law.
- ``ExtractorXML.java:57-58,148-166`` — ``["'>] uri ["'<]`` candidates,
  XML-unescaped, filtered by ``UriUtils.isLikelyUri``, added as
  SPECULATIVE (``X``) hops.
- ``UriUtils.java:92-100,245-290`` — the likely-URI law:
  ``isPossibleUri`` (has ``.`` or ``/``, no whitespace/angle brackets,
  doesn't end with ``.``) AND NOT ``isLikelyFalsePositive``
  (text/application mimetype shape, known audio/video/image mimetype,
  decimal number, unusual characters ``$()'"[]{}|``, leading/trailing
  ``+``).
- ``UriUtils.speculativeFixup`` (:296-337) — ``&amp;``->``&``,
  URL-decode of ``https?%3A``-prefixed strings, and ``http://``
  prefixing of scheme-less dotted-domain strings whose last label is a
  TLD (ArchiveUtils.isTld :896-898 over the IANA list).

Spark-first shape: CSS and XML mining are pure Catalyst
(``regexp_extract_all`` + higher-order ``transform`` — Spark's JVM
regex dialect is the same java.util.regex the reference uses, so the
patterns carry over verbatim, including the CSS backreference). The
JS string scan is the one kernel Catalyst cannot express — its
closing-delimiter *reuse* makes matches overlap, which no
non-overlapping ``regexp_extract_all`` reproduces — so it runs as an
Arrow-batched pandas UDF (the sanctioned slow path: vectorized
batches, no per-row Python round-trips), with a pure-Python twin
(:func:`js_strings_py`) used by tests to pin the loop law against the
reference's test vectors.

At 100 TB these are all row-local projections: no shuffle, no driver
state; the JS UDF is one ArrowEvalPython stage over the text column
only (payload columns are never touched).
"""

from __future__ import annotations

import re
from typing import List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------- patterns

#: UURI.MAX_URL_LENGTH (commons/.../net/UURI.java:72)
MAX_URL_LENGTH = 2083

#: ExtractorCSS.java:78-80 (java.util.regex, used verbatim by Spark's JVM
#: regexp functions; G2 is the URI)
CSS_URI_EXTRACTOR = (
    r"(?i)(?:@import (?:url[(]|)|url[(])\s*([\"']?)"
    r"([^\"'].{0,%d}?)\1\s*[);]" % MAX_URL_LENGTH
)

#: ExtractorCSS.java:69 — CSS escapes a backslash before , ' " ( ) and
#: whitespace inside url(); unescape restores the raw character.
CSS_BACKSLASH_ESCAPE = r"\\([,'\"()\s])"

#: ExtractorJS.java:68-70 (G1 = optional backslashes + quote, G2 = the
#: whitespace-free string body, closed by the exact G1 sequence)
JAVASCRIPT_STRING_EXTRACTOR = (
    r"(\\{0,8}+(?:\"|'))(\S{0,%d}?)(?:\1)" % MAX_URL_LENGTH
)

#: ExtractorXML.java:57-58 (G1 = the candidate URI)
XML_URI_EXTRACTOR = r"(?s)[\"'>]\s*([^<>\s'\"@]+)\s*[\"'<]"

#: UriUtils.java:92 — no whitespace or angle brackets, at least one dot
#: or slash, not ending with a dot. The reference expresses "not ending
#: with '.'" via a lookbehind; RE2 (the DuckDB oracle dialect) has no
#: lookbehind, so both engine and oracle use the identical decomposition
#: full-match(POSSIBLE_URI_BODY) AND NOT ends-with-dot.
POSSIBLE_URI_BODY = r"[^<>\s]*[./][^<>\s]*"

#: UriUtils.isLikelyFalsePositive (:245-290), rules 1/3/4/5 as RE2∩Java
#: patterns (rule 2 is the mimetype membership list below)
FP_MIMETYPE_SHAPE = r"(?:text|application)/[^/]+"
FP_DECIMAL = r"\d+\.\d+"
FP_UNUSUAL_CHARS = r"[$()'\"\[\]{}|]"

#: UriUtils.AUDIO_VIDEO_IMAGE_MIMETYPES (:102-236) — exact-string
#: rejection list, embedded in full (spec-constant replication; the
#: reference's own UriUtilsTest mimetype vectors require exact
#: membership, e.g. audio/x-pn-realaudio-plugin).
AUDIO_VIDEO_IMAGE_MIMETYPES = (
    "audio/aiff", "audio/asf", "audio/basic", "audio/m4a", "audio/mid",
    "audio/midi", "audio/mp3", "audio/mp4", "audio/mp4a-latm",
    "audio/mpeg", "audio/mpeg3", "audio/mpegurl", "audio/mpg", "audio/ogg",
    "audio/playlist", "audio/unknown", "audio/vnd.qcelp",
    "audio/vnd.rn-realaudio", "audio/wav", "audio/x-aiff", "audio/x-m4a",
    "audio/x-midi", "audio/x-mp3", "audio/x-mpeg", "audio/x-mpeg3",
    "audio/x-mpegurl", "audio/x-ms-wax", "audio/x-ms-wma",
    "audio/x-ms-wmv", "audio/x-pn-realaudio",
    "audio/x-pn-realaudio-plugin", "audio/x-realaudio", "audio/x-scpls",
    "audio/x-wav", "image/bitmap", "image/bmp", "image/BMP", "image/cur",
    "image/fits", "image/gif", "image/GIF", "image/ico", "image/icon",
    "image/jp2", "image/jpeg", "image/JPEG", "image/jpeg-cmyk",
    "image/jpg", "image/JPG", "image/pdf", "image/pict", "image/pjpeg",
    "image/png", "image/PNG", "image/svg+xml", "image/tiff",
    "image/vnd.adobe.photoshop", "image/vnd.djvu", "image/vnd.dwg",
    "image/vnd.dxf", "image/vnd.microsoft.icon", "image/vnd.ms-modi",
    "image/vnd.ms-photo", "image/vnd.wap.wbmp", "image/x-bitmap",
    "image/x-bmp", "image/x-citrix-pjpeg", "image/x-dcraw", "image/x-djvu",
    "image/x.djvu", "image/x-emf", "image/x-eps", "image/x-guffaw",
    "image/x-ico", "image/xicon", "image/x-icon", "image/x-jg",
    "image/x-ms-bmp", "image/x-MS-bmp", "image/x-pcx", "image/x-photoshop",
    "image/x-pict", "image/x-png", "image/x-portable-anymap",
    "image/x-portable-bitmap", "image/x-portable-graymap",
    "image/x-portable-pixmap", "image/x-psd", "image/x-quicktime",
    "image/x-rgb", "image/x-windows-bmp", "image/x-wmf", "image/x-xbitmap",
    "image/x-xbm", "image/x-xfig", "image/x-xpixmap", "video/3gpp",
    "video/asx", "video/avi", "video/f4v", "video/flv", "video/m4v",
    "video/mp4", "video/MP4", "video/mp4v-es", "video/mpeg", "video/mpeg3",
    "video/mpeg4", "video/mpg4", "video/msvideo", "video/ogg",
    "video/quicktime", "video/swf", "video/unknown",
    "video/vnd.objectvideo", "video/webm", "video/wmv", "video/x-dv",
    "video/x-flv", "video/x-m4v", "video/x-mp4", "video/x-mpeg",
    "video/x-ms-asf", "video/x-ms-asx", "video/x-msvideo", "video/x-ms-wm",
    "video/x-ms-wma", "video/x-ms-wmv", "video/x-ms-wmx", "video/x-ms-wvx",
    "video/x-pn-realaudio", "video/x-pn-realvideo", "video/x-sgi-movie",
    "video/x-swf",
)

#: speculativeFixup's dotted-domain detector (UriUtils.java:317-320)
DOTTED_DOMAIN = r"^[^./:\s%]+\.[^/:\s%]+\.([^./:\s%]+)(/.*|)$"

#: ArchiveUtils.isTld consults the IANA tlds-alpha-by-domain list
#: (ArchiveUtils.java:868-898). A representative public subset; exact
#: membership, lowercase.
TLDS = (
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "io", "co", "us", "uk", "de", "fr", "jp", "cn", "ru", "br",
    "in", "au", "ca", "it", "nl", "es", "se", "no", "ch", "at",
)

# ---------------------------------------------------------------- CSS

def css_uris(text: Column) -> Column:
    """array<string> of CSS ``url(...)`` / ``@import`` URIs in document
    order — ExtractorCSS.processStyleCode (:121-150): extract G2, apply
    the literal ``&amp``->``&`` replace (ESCAPED_AMP :65 carries no
    semicolon; replicated faithfully), then strip CSS backslash escapes.
    Pure Catalyst; Java regex dialect matches the reference verbatim
    (including the ``\\1`` quote backreference)."""
    raw = _regexp_extract_all(text, CSS_URI_EXTRACTOR, 2)
    return F.transform(
        raw,
        lambda u: F.regexp_replace(
            F.regexp_replace(u, "&amp", "&"), CSS_BACKSLASH_ESCAPE, "$1"
        ),
    )


def _regexp_extract_all(col: Column, pattern: str, group: int) -> Column:
    # regexp_extract_all is exposed in pyspark.sql.functions (3.5+)
    return F.regexp_extract_all(col, F.lit(pattern), group)


# ---------------------------------------------------------------- XML

def xml_candidates(text: Column) -> Column:
    """array<string> of raw XML URI candidates (ExtractorXML G1 matches,
    XML-unescaped). The find loop consumes each full match, so Catalyst's
    non-overlapping ``regexp_extract_all`` reproduces it exactly."""
    return F.transform(_regexp_extract_all(text, XML_URI_EXTRACTOR, 1),
                       lambda u: unescape_xml(u))


def unescape_xml(u: Column) -> Column:
    """StringEscapeUtils.unescapeXml over the five predefined XML
    entities (the subset the reference's own test corpus exercises);
    ``&amp;`` last so it can't manufacture new entities."""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        u = F.replace(u, F.lit(ent), F.lit(ch))
    return u


# ------------------------------------------------------- likely-URI law

def is_likely_uri(c: Column) -> Column:
    """UriUtils.isLikelyUri (:98-100) as a boolean Column:
    isPossibleUri AND NOT isLikelyFalsePositive."""
    possible = c.rlike("^(?:%s)$" % POSSIBLE_URI_BODY) & ~c.rlike(r"\.$")
    fp = (
        c.rlike("^(?:%s)$" % FP_MIMETYPE_SHAPE)
        | c.isin(*AUDIO_VIDEO_IMAGE_MIMETYPES)
        | c.rlike("^(?:%s)$" % FP_DECIMAL)
        | c.rlike(FP_UNUSUAL_CHARS)
        | c.startswith("+")
        | c.endswith("+")
    )
    return possible & ~fp


def is_likely_uri_py(s: str) -> bool:
    """Pure-Python twin of :func:`is_likely_uri` (used by the JS scan
    UDF's recursion decision and by backend-agreement tests)."""
    if not (re.fullmatch(POSSIBLE_URI_BODY, s) and not s.endswith(".")):
        return False
    if re.fullmatch(FP_MIMETYPE_SHAPE, s):
        return False
    if s in AUDIO_VIDEO_IMAGE_MIMETYPES:
        return False
    if re.fullmatch(FP_DECIMAL, s):
        return False
    if re.search(FP_UNUSUAL_CHARS, s):
        return False
    if s.startswith("+") or s.endswith("+"):
        return False
    return True


def speculative_fixup(c: Column) -> Column:
    """UriUtils.speculativeFixup (:296-337) minus the same-host scheme
    preservation (which needs the via host; the default ``http://``
    branch is the law for everything else): ``&amp;``->``&``; URL-decode
    strings opening with an encoded scheme (``https?%3A``); prefix
    ``http://`` onto scheme-less dotted-domain strings whose final
    label is a TLD."""
    c = F.regexp_replace(c, "&amp;", "&")
    decode = getattr(F, "try_url_decode", F.url_decode)
    c = F.when(c.rlike(r"(?i)^https?%3A"), decode(c)).otherwise(c)
    tld = F.lower(F.regexp_extract(c, DOTTED_DOMAIN, 1))
    return F.when(
        c.rlike(DOTTED_DOMAIN) & tld.isin(*TLDS), F.concat(F.lit("http://"), c)
    ).otherwise(c)


def speculative_fixup_py(s: str, base_host: str | None = None,
                         base_scheme: str | None = None) -> str:
    """Python twin of :func:`speculative_fixup`. With ``base_host``/
    ``base_scheme`` it also applies the reference's same-host scheme
    preservation (UriUtils.java:324-331, HER-1524): a scheme-less
    dotted-domain candidate that starts with the discovering page's
    host keeps that page's scheme instead of the default ``http``."""
    from urllib.parse import unquote_plus

    s = s.replace("&amp;", "&")
    if re.match(r"(?i)^https?%3A", s):
        s = unquote_plus(s)
    m = re.fullmatch(DOTTED_DOMAIN, s)
    if m and m.group(1).lower() in TLDS:
        scheme_plus = "http://"
        if base_host and base_scheme and s.startswith(base_host):
            scheme_plus = base_scheme + "://"
        s = scheme_plus + s
    return s


# ------------------------------------------------------- JS string scan

_JS_RE = re.compile(JAVASCRIPT_STRING_EXTRACTOR)


def unescape_js_py(s: str) -> str:
    """StringEscapeUtils.unescapeJavaScript subset: backslash escapes
    for ``\\ ' " /`` plus n/t/r and ``\\uXXXX``."""
    out: List[str] = []
    i, n = 0, len(s)
    simple = {"\\": "\\", "'": "'", '"': '"', "/": "/",
              "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u" and i + 5 < n:
                try:
                    out.append(chr(int(s[i + 2:i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass
            if nxt in simple:
                out.append(simple[nxt])
                i += 2
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def js_strings_py(text: str, base_host: str | None = None,
                  base_scheme: str | None = None) -> List[str]:
    """The ExtractorJS.considerStrings loop (:152-193), faithfully:
    scan for quoted whitespace-free strings; a likely-URI candidate is
    JS-unescaped and emitted; a non-likely candidate is recursed into;
    either way the scan resumes AT the closing delimiter
    (``startIndex = strings.end(2)``) so it can reopen the next string.
    ``base_host``/``base_scheme`` feed speculativeFixup's same-host
    scheme preservation (the reference passes ``curi.getUURI()``)."""
    found: List[str] = []
    _consider(text, found, 0, base_host, base_scheme)
    return found


def _consider(cs: str, found: List[str], depth: int,
              base_host: str | None = None,
              base_scheme: str | None = None) -> None:
    if depth > 8:  # the reference survives via StackOverflowError catch
        return
    start = 0
    while True:
        m = _JS_RE.search(cs, start)
        if m is None:
            return
        body = m.group(2)
        if is_likely_uri_py(body):
            found.append(speculative_fixup_py(
                unescape_js_py(body), base_host, base_scheme))
        else:
            _consider(body, found, depth + 1, base_host, base_scheme)
        start = m.end(2)


def js_string_uris(text: Column) -> Column:
    """array<string> of likely-URI JS strings per row — Arrow-batched
    pandas UDF around :func:`js_strings_py` (the scan's overlapping
    matches are inexpressible in ``regexp_extract_all``; this is the
    sanctioned vectorized slow path, one ArrowEvalPython stage)."""
    @F.pandas_udf(ArrayType(StringType()))
    def _scan(col: pd.Series) -> pd.Series:
        return col.map(lambda t: js_strings_py(t) if t is not None else [])

    return _scan(text)


# ------------------------------------------------------- resolution

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"


def resolve_relative(base: Column, ref: Column, max_depth: int = 10) -> Column:
    """RFC 3986 §5 reference resolution (the Link.addRelativeToBase /
    UURIFactory path, commons/.../net/UURIFactory.java) as pure
    Catalyst: absolute refs pass through; ``//authority`` adopts the
    base scheme; rooted paths adopt the base origin; relative paths
    append to the base directory; then dot-segments are removed by a
    bounded rewrite chain (``max_depth`` collapses per path — paths
    deeper than that keep their residual dots, documented bound).
    Tests pin this against ``urllib.parse.urljoin``."""
    scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    # base path's directory (default "/" when the base has no path)
    bpath = F.regexp_replace(base, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    bdir = F.when(
        bpath.rlike("/"), F.regexp_extract(bpath, r"^([^?#]*/)", 1)
    ).otherwise(F.lit("/"))

    resolved = (
        F.when(ref.rlike(_SCHEME_RE), ref)
        .when(ref.startswith("//"), F.concat(scheme, F.lit(":"), ref))
        .when(ref.startswith("/"), F.concat(origin, ref))
        .otherwise(F.concat(origin, bdir, ref))
    )
    # dot-segment removal (RFC 3986 §5.2.4), bounded
    path = F.regexp_replace(resolved, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*).*", "$1")
    rest = F.substring(resolved, F.length(path) + 1, F.lit(1 << 30))
    for _ in range(max_depth):
        rest = F.regexp_replace(rest, r"/\.(/|$)", "/")
        rest = F.regexp_replace(rest, r"/(?!\.\./)[^/]+/\.\.(/|$)", "/")
        rest = F.regexp_replace(rest, r"^/\.\.(/|$)", "/")
    return F.concat(path, rest)


def resolve_relative_py(base: str, ref: str) -> str:
    """urllib twin used by tests."""
    from urllib.parse import urljoin

    return urljoin(base, ref)


# ------------------------------------------------ query-string URI mining

#: ExtractorURI.java:56 — absolute http(s) URI full-match test
ABS_HTTP_URI_PATTERN = r"^https?://[^\s<>]*$"


def query_string_uris(url: Column) -> Column:
    """ExtractorURI.extractQueryStringLinks (ExtractorURI.java:126-168):
    URIs embedded in a discovered URI's own query string, added as
    SPECULATIVE hops. Two probes, in order: (1) the whole percent-decoded
    query, when it full-matches an absolute http(s) URI; (2) each
    ``key=value`` parameter (exactly one ``=``) whose decoded value
    full-matches. Pure Catalyst — decode via ``try_url_decode`` (the
    LaxURLCodec analog; undecodable values drop out like the
    reference's DecoderException continue)."""
    decode = getattr(F, "try_url_decode", F.url_decode)
    raw_q = F.regexp_extract(url, r"^[^?#]*\?([^#]*)", 1)
    full = decode(raw_q)
    full_hits = F.filter(
        F.array(full), lambda c: c.isNotNull() & c.rlike(ABS_HTTP_URI_PATTERN)
    )
    kvs = F.transform(F.split(raw_q, "&"), lambda p: F.split(p, "="))
    param_hits = F.filter(
        F.transform(
            kvs,
            lambda kv: F.when(F.size(kv) == 2, decode(F.element_at(kv, 2))),
        ),
        lambda c: c.isNotNull() & c.rlike(ABS_HTTP_URI_PATTERN),
    )
    return F.concat(full_hits, param_hits)


def query_string_uris_py(url: str) -> List[str]:
    """Python twin of :func:`query_string_uris` for tests."""
    from urllib.parse import unquote_plus

    m = re.match(r"^[^?#]*\?([^#]*)", url)
    if m is None:
        return []
    raw_q = m.group(1)
    out: List[str] = []
    full = unquote_plus(raw_q)
    if re.fullmatch(ABS_HTTP_URI_PATTERN[1:-1], full):
        out.append(full)
    for param in raw_q.split("&"):
        kv = param.split("=")
        if len(kv) == 2:
            cand = unquote_plus(kv[1])
            if re.fullmatch(ABS_HTTP_URI_PATTERN[1:-1], cand):
                out.append(cand)
    return out


# ------------------------------------------------- pure-Python twins
# (used by the oracle simulator's independent crawl replay and by
# backend-agreement tests; same laws as the Column kernels above)

_CSS_RE = re.compile(CSS_URI_EXTRACTOR)
_CSS_UNESC_RE = re.compile(CSS_BACKSLASH_ESCAPE)
_XML_RE = re.compile(XML_URI_EXTRACTOR)


def css_uris_py(text: str) -> List[str]:
    """Python twin of :func:`css_uris` (ExtractorCSS.processStyleCode)."""
    out: List[str] = []
    for m in _CSS_RE.finditer(text):
        u = m.group(2).replace("&amp", "&")
        out.append(_CSS_UNESC_RE.sub(r"\1", u))
    return out


def unescape_xml_py(s: str) -> str:
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        s = s.replace(ent, ch)
    return s


def xml_uris_py(text: str) -> List[str]:
    """Python twin of the XML mining path: candidates, unescaped,
    filtered by the likely-URI law (ExtractorXML.processXml)."""
    out: List[str] = []
    for m in _XML_RE.finditer(text):
        u = unescape_xml_py(m.group(1))
        if is_likely_uri_py(u):
            out.append(u)
    return out


# ------------------------------------------------ ExtractorUniversal

#: ExtractorUniversal.java:81-341 — the 2004-era IANA TLD alternation
#: (each entry matches the TLD optionally followed by /...). Exact
#: spec-constant replication; isTLD (:480-488) full-matches the first
#: <=6 chars after a dot against this set.
UNIVERSAL_TLDS = (
    "ac ad ae af ag ai al am an ao aero aq ar as at au aw az ba bb bd be "
    "bf bg bh bi biz bj bm bn bo br bs bt bv bw by bz ca cc cd cf cg ch "
    "ci ck cl cm cn co com coop cr cs cu cv cx cy cz de dj dk dm do dz "
    "ec edu ee eg eh er es et fi fj fk fm fo fr ga gd ge gf gg gh gi gl "
    "gm gn gov gp gq gr gs gt gu gw gy hk hm hn hr ht hu id ie il im in "
    "info int io iq ir is it je jm jo jp ke kg kh ki km kn kp kr kw ky "
    "kz la lb lc li lk lr ls lt lu lv ly ma mc md mg mh mil mk ml mm mn "
    "mo mp mq mr ms mt mu museum mv mw mx my mz na name nc ne net nf ng "
    "ni nl no np nr nt nu nz om org pa pe pf pg ph pk pl pm pn pr pro "
    "ps pt pw py qa re ro ru rw sa sb sc sd se sg sh si sj sk sl sm sn "
    "so sr sv st sy sz tc td tf tg th tj tk tm tn to tp tr tt tv tw tz "
    "ua ug uk um us uy uz va vc ve vg vi vn vu wf ws ye yt yu za zm zw"
).split()

_UNIVERSAL_TLD_RE = re.compile(
    "^(?:" + "|".join(f"{t}(/.*)?" for t in UNIVERSAL_TLDS) + ")$",
    re.DOTALL,
)

#: ExtractorUniversal.IP_ADDRESS (:74-75) — full-match http(s)://dotted-quad
_UNIVERSAL_IP_RE = re.compile(
    r"((http://)|(https://))(\d(\d)?(\d)?\.\d(\d)?(\d)?\.\d(\d)?(\d)?\.\d(\d)?(\d)?)"
)


def _universal_urlable(ch: str) -> bool:
    """isURLableChar (:513-521): the strict ANSI ranges
    35-38, 43-59, 61, 63-90, 95, 97-122, 126."""
    o = ord(ch)
    return (35 <= o <= 38 or 43 <= o <= 59 or o == 61
            or 63 <= o <= 90 or o == 95 or 97 <= o <= 122 or o == 126)


def _universal_looks_like_url(lookat: str) -> bool:
    """looksLikeAnURL (:420-446): full-match http(s)://IP, else a
    known TLD right after any dot (never at position 0), testing only
    the first <=6 chars after each dot."""
    if lookat.startswith("http://") or lookat.startswith("https://"):
        if _UNIVERSAL_IP_RE.fullmatch(lookat):
            return True
    dot = lookat.find(".")
    if dot != 0:
        while dot != -1 and dot < len(lookat):
            lookat = lookat[dot + 1:]
            probe = lookat[: 6 if len(lookat) > 6 else len(lookat)]
            if len(probe) >= 2 and _UNIVERSAL_TLD_RE.match(probe.lower()):
                return True
            dot = lookat.find(".")
    return False


def universal_uris_py(text: str, max_size: int = 1 << 20) -> List[str]:
    """ExtractorUniversal.innerExtract (:357-410): accumulate runs of
    URLable chars; on a break, a >3-char dotted run that looksLikeAnURL
    is emitted (trimmed to an interior ``http`` if present, trailing
    dots stripped). Two faithfully-kept quirks: a pending run at
    end-of-stream is never flushed, and a token UURIFactory cannot
    parse as an *absolute* URI raises URIException (an IOException
    subclass), which ends the whole document's scan — here: any
    accepted token without a scheme aborts the remaining scan."""
    found: List[str] = []
    lookat: List[str] = []
    found_dot = False
    for counter, ch in enumerate(text):
        if counter >= max_size:
            break
        if len(lookat) > MAX_URL_LENGTH:
            lookat, found_dot = [], False
        elif _universal_urlable(ch):
            if ch == ".":
                found_dot = True
            lookat.append(ch)
        elif len(lookat) > 3 and found_dot:
            token = "".join(lookat)
            if _universal_looks_like_url(token):
                idx = token.lower().find("http")
                if idx > 0:
                    token = token[idx:]
                token = token.rstrip(".")
                if not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", token):
                    return found  # URIException -> scan aborted
                found.append(token)
            lookat, found_dot = [], False
        elif lookat:
            lookat, found_dot = [], False
    return found


def universal_uris(text: Column) -> Column:
    """array<string> of ExtractorUniversal tokens per row (SPECULATIVE
    ``X`` hops, ``=SPECULATIVE_MISC`` context in the reference) —
    Arrow-batched pandas UDF; the char-run accumulator is sequential
    state no Catalyst regex reproduces."""
    @F.pandas_udf(ArrayType(StringType()))
    def _scan(col: pd.Series) -> pd.Series:
        return col.map(lambda t: universal_uris_py(t) if t is not None else [])

    return _scan(text)


# ---------------------------------------------------------------------------
# ExtractorDOC / ExtractorPDF (binary-document link mining)
# ---------------------------------------------------------------------------

#: ExtractorDOC.PATTERN (ExtractorDOC.java:47) — reluctant scan of the
#: extracted Word text for href-style fields; RE2/Java agree on ``.*?``
DOC_HYPERLINK_RE = 'HYPERLINK.*?"(.*?)"'

#: ExtractorPDF default maxSizeToParse (ExtractorPDF.java:49: 10 MiB)
PDF_MAX_SIZE_TO_PARSE = 10 * 1024 * 1024


def doc_should_extract_col(content_type: Column) -> Column:
    """ExtractorDOC.shouldExtract (:60-66): mimetype prefix
    application/msword, null never."""
    return F.coalesce(
        F.lower(content_type).startswith("application/msword"), F.lit(False)
    )


def doc_hyperlink_uris_col(doc_text: Column) -> Column:
    """ExtractorDOC.innerExtract (:75-108): every reluctant
    ``HYPERLINK.*?"(...)"`` match in the word97 text becomes a link.
    The Doc.getText binary decode itself is an upstream codec (stubbed
    like pipeline/multimodal's — no POI in this environment); this is
    the extraction law over its output."""
    return F.regexp_extract_all(doc_text, F.lit(DOC_HYPERLINK_RE), 1)


def doc_links(
    df: DataFrame,
    base_col: str = "url",
    text_col: str = "doc_text",
    content_type_col: str = "content_type",
) -> DataFrame:
    """One row per extracted DOC hyperlink, resolved against the base
    URI (ExtractorDOC.addLink :111-121: UURIFactory.getInstance(base,
    hyperlink) — RELATIVE resolution), hop 'L' (Hop.NAVLINK)."""
    gated = df.filter(doc_should_extract_col(F.col(content_type_col)))
    exploded = gated.select(
        F.col(base_col).alias("base"),
        F.explode(doc_hyperlink_uris_col(F.col(text_col))).alias("ref"),
    )
    return exploded.select(
        "base",
        resolve_relative(F.col("base"), F.col("ref")).alias("dest"),
        F.lit("L").alias("hop"),
    )


def pdf_should_extract_col(content_type: Column, content_size: Column) -> Column:
    """ExtractorPDF.shouldExtract: application/pdf prefix (:64-71) and
    the maxSizeToParse gate (:45-57, default 10 MiB)."""
    return F.coalesce(
        content_type.startswith("application/pdf"), F.lit(False)
    ) & (content_size <= F.lit(PDF_MAX_SIZE_TO_PARSE))


def pdf_links(
    df: DataFrame,
    base_col: str = "url",
    uris_col: str = "pdf_uris",
    content_type_col: str = "content_type",
    content_size_col: str = "content_size",
) -> DataFrame:
    """One row per PDFParser-extracted URI.  Unlike ExtractorDOC, the
    dest is built ABSOLUTE — UURIFactory.getInstance(uri) with no base
    (ExtractorPDF.java:115-119) — so relative strings in PDF objects
    are dropped rather than resolved; hop 'L' (Hop.NAVLINK :118).  The
    PDF object parse is an upstream codec (stubbed); ``uris_col`` is
    its array<string> output."""
    gated = df.filter(
        pdf_should_extract_col(F.col(content_type_col), F.col(content_size_col))
    )
    exploded = gated.select(
        F.col(base_col).alias("base"),
        F.explode(F.col(uris_col)).alias("ref"),
    )
    # absolute-only law: a ref without a scheme would throw URIException
    # in UURIFactory.getInstance(ref) and be logged+dropped (:120-123)
    return exploded.filter(F.col("ref").rlike(r"^[a-zA-Z][\w+.-]*:")).select(
        "base", F.col("ref").alias("dest"), F.lit("L").alias("hop")
    )


# ---------------------------------------------------------------------------
# ExtractorSWF (flash link mining over a stubbed javaswf decode)
# ---------------------------------------------------------------------------

#: ExtractorSWF.JSSTRING (ExtractorSWF.java:56) — the getURL branch
#: tests it with a case-sensitive startsWith (:316)
SWF_JSSTRING = "javascript:"


def swf_should_extract_col(url: Column, content_type: Column) -> Column:
    """ExtractorSWF.shouldExtract (ExtractorSWF.java:66-76): a null
    content-type NEVER extracts (the null check precedes the suffix
    disjunction, so even a ``.swf`` URL is skipped); otherwise extract
    when the lowercased type contains ``x-shockwave-flash`` OR the
    lowercased URI string ends with ``.swf``."""
    return content_type.isNotNull() & (
        F.lower(content_type).contains("x-shockwave-flash")
        | F.lower(url).endswith(".swf")
    )


def swf_links(
    df: DataFrame,
    base_col: str = "url",
    via_col: str = "via",
    events_col: str = "swf_events",
    content_type_col: str = "content_type",
) -> DataFrame:
    """One row per link mined from decoded SWF tag/action events
    (ExtractorSWF.CrawlUriSWFAction, ExtractorSWF.java:289-360).

    The javaswf binary decode (SWFReader/TagParser/ActionParser) is an
    upstream codec — stubbed here exactly like ExtractorDOC's
    Doc.getText and pipeline/multimodal's decoders (no flash lib in
    this environment); ``events_col`` is its output, an
    ``array<struct<kind:string, value:string>>`` with kind ``url``
    (a ``SWFActions.getURL`` call) or ``string`` (a ``push`` /
    ``lookupTable`` action value). The LINK LAW over those events is
    fully implemented:

    - a ``getURL`` value starting ``javascript:`` routes through
      ExtractorJS.considerStrings over the pseudo-URL (:316-317,
      ``handlingJSFile=false`` → ``Link.addRelativeToBase``): each
      quoted likely-URI string inside is unescaped, speculativeFixup'd,
      resolved against the BASE, hop 'X' (SPECULATIVE);
    - any other ``getURL`` value → hop 'E' (Hop.EMBED,
      LinkContext.EMBED_MISC) resolved against the VIA
      (``Link.addRelativeToVia`` :319-322);
    - a ``string`` value passes the ``UriUtils.isLikelyUri`` gate
      (:326-332) → hop 'X' resolved against the VIA — considerStringAsUri
      applies neither the JS unescape nor speculativeFixup.

    Pure Catalyst except the javascript: branch, which reuses the
    ExtractorJS Arrow scan (one ArrowEvalPython stage over only the
    javascript: events — at corpus scale a vanishing fraction of rows).
    """
    gated = df.filter(
        swf_should_extract_col(F.col(base_col), F.col(content_type_col))
    )
    ev = gated.select(
        F.col(base_col).alias("base"),
        F.col(via_col).alias("via"),
        F.explode(F.col(events_col)).alias("ev"),
    )
    kind, val = F.col("ev.kind"), F.col("ev.value")
    is_js = val.startswith(SWF_JSSTRING)

    embeds = ev.filter((kind == "url") & ~is_js).select(
        "base",
        resolve_relative(F.col("via"), val).alias("dest"),
        F.lit("E").alias("hop"),
    )
    strings = ev.filter((kind == "string") & is_likely_uri(val)).select(
        "base",
        resolve_relative(F.col("via"), val).alias("dest"),
        F.lit("X").alias("hop"),
    )
    js = (
        ev.filter((kind == "url") & is_js)
        .select("base", F.explode(js_string_uris(val)).alias("ref"))
        .select(
            "base",
            resolve_relative(F.col("base"), F.col("ref")).alias("dest"),
            F.lit("X").alias("hop"),
        )
    )
    return embeds.unionByName(strings).unionByName(js)
