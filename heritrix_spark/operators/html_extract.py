"""ExtractorHTML — the reference's flagship tag-scan link extractor.

Reference: heritrix3/modules/.../extractor/ExtractorHTML.java (957 LoC).
The extraction law is a *sequential, stateful* scan that no batch regex
can reproduce: ``<base href>`` mutates the resolution base for every
link that follows (:381-388), FORM handling couples the ACTION and
METHOD attributes across one tag (:511-516), OBJECT/APPLET resources
resolve against a CODEBASE collected earlier in the same tag
(:483-508), and a robots META carrying nofollow/none aborts the whole
document mid-scan (:772-777). Spark-first shape: one Arrow-batched
pandas UDF over (page_url, html) returning the ordered outlink array —
the sanctioned vectorized slow path; a single ArrowEvalPython stage, no
shuffle, payload columns untouched. The pure-Python law
(:func:`extract_html_py`) is shared by the UDF, the pytest goldens
(re-expressed ExtractorHTMLTest cases), and the oracle twins.

Law map (file:line → here):

- RELEVANT_TAG_EXTRACTOR (:113-117) — script/style bodies captured
  whole, meta recognized, any open tag with >=1 attribute, comments
  skipped. Possessive quantifiers carry over verbatim (Python 3.11 re).
- EACH_ATTRIBUTE_EXTRACTOR (:164-174) — attribute dispatch groups.
- processGeneralTag (:331-533) — HREF (LINK element => E, else L,
  ``javascript:`` => script scan; BASE sets the base *after* its own
  href is emitted), ACTION+METHOD form law (HER-1280: POST actions
  dropped while extractOnlyFormGets), ON* handlers => JS scan,
  SRC-family => E (FRAME/IFRAME => L when frames aren't embeds),
  CODEBASE => E + resolution base for CLASSID/DATA/ARCHIVE/CODE
  resources (APPLET CODE gains ``.class``), VALUE => flashvars
  query-string probe on PARAM (HER-1728) else likely-URI probe,
  STYLE attr => CSS url() scan, NAME/FLASHVARS remembered.
- processMeta (:871-921) — name=robots content recorded; nofollow/none
  aborts when the policy obeys; http-equiv=refresh content after ``=``
  => R hop with context ``meta``.
- processScript (:850-861) / processStyle (:931-942) — open-tag attrs
  as a general tag, then body JS-string / CSS-url mining.
- Contexts: ``elementContext`` (:952) ``element/@attr``; module
  constants ``=EMBED_MISC`` / ``=JS_MISC`` (LinkContext.java:51-56),
  ``meta`` (HTMLLinkContext.java:32).
- Destinations: Link.addRelativeToBase — resolved against the current
  base then UURI-normalized (our fixup subset). CrawlURI.outLinks is a
  HashSet (CrawlURI.java:1098), so duplicate (uri, context, hop)
  triples collapse; we additionally keep first-discovery order (the
  deterministic enrichment every Spark law here needs). The
  maxOutlinks cap (6000, AbstractFrontier.java:138) discards beyond.
"""

from __future__ import annotations

import html as _html
import re
from typing import List, Optional, Tuple

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from heritrix_spark.functions.fixup import fixup_py
from heritrix_spark.operators.content_extract import (
    css_uris_py,
    is_likely_uri_py,
    js_strings_py,
    resolve_relative_py,
)

# ---------------------------------------------------------------- patterns

#: ExtractorHTML.java:113-117 with maxElementLength=64 substituted
#: (afterPropertiesSet :316-328). Groups: 1 script..</script, 2 script
#: open tag, 3 style..</style, 4 style open tag, 5 other-tag innards,
#: 6 element, 7 META marker, 8 comment.
RELEVANT_TAG_EXTRACTOR = (
    r"(?is)<(?:((script[^>]*+)>.*?</script)"
    r"|((style[^>]*+)>.*?</style)"
    r"|(((meta)|(?:\w{1,64}))\s+[^>]*+)"
    r"|(!--.*?--))>"
)

#: ExtractorHTML.java:164-174 with maxAttributeNameLength=64 and
#: maxAttributeValLength=2048 substituted. Group layout per :175-194.
EACH_ATTRIBUTE_EXTRACTOR = (
    r"(?is)\s?((href)|(action)|(on\w*)"
    r"|((?:src)|(?:lowsrc)|(?:background)|(?:cite)|(?:longdesc)"
    r"|(?:usemap)|(?:profile)|(?:datasrc))"
    r"|(codebase)|((?:classid)|(?:data))|(archive)|(code)"
    r"|(value)|(style)|(method)"
    r"|([-\w]{1,64}))"
    r"\s*=\s*"
    r"(?:(?:\"(.{0,2048}?)(?:\"|$))"
    r"|(?:'(.{0,2048}?)(?:'|$))"
    r"|(\S{1,2048}))"
)

_TAG_RE = re.compile(RELEVANT_TAG_EXTRACTOR)
_ATTR_RE = re.compile(EACH_ATTRIBUTE_EXTRACTOR)

#: ExtractorHTML.java:819-821 — path extensions where HTML is "so
#: unexpected" the page isn't scanned (isHtmlExpectedHere :831-848).
NON_HTML_PATH_EXTENSION = (
    r"(?i)(gif)|(jp(e)?g)|(png)|(tif(f)?)|(bmp)|(avi)|(mov)|(mp(e)?g)"
    r"|(mp3)|(mp4)|(swf)|(wav)|(au)|(aiff)|(mid)"
)

JS_MISC = "=JS_MISC"
EMBED_MISC = "=EMBED_MISC"
META_CONTEXT = "meta"

MAX_OUTLINKS = 6000


def element_context(element: str, attribute: str) -> str:
    """ExtractorHTML.elementContext (:952-954)."""
    return "" if attribute is None else f"{element}/@{attribute}"


def is_html_expected_here(url: str) -> bool:
    """isHtmlExpectedHere (:831-848): reject when the path ends in a
    short known-binary extension."""
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", url)
    path = m.group(1) if m else url
    dot = path.rfind(".")
    if dot < 0 or dot < len(path) - 5:
        return True
    return re.fullmatch(NON_HTML_PATH_EXTENSION, path[dot + 1:]) is None


class _Page:
    """Mutable per-document extraction state (the CrawlURI analog)."""

    __slots__ = ("url", "base", "host", "scheme", "links", "seen",
                 "discarded", "meta_robots", "max_outlinks", "_dest_memo")

    def __init__(self, url: str, max_outlinks: int = MAX_OUTLINKS):
        self.url = url
        self.base = url  # CrawlURI.getBaseURI defaults to the URI itself
        m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:@]*(?::\d+)?)", url)
        self.scheme = m.group(1).lower() if m else None
        self.host = (m.group(2).split(":")[0].lower() if m else None)
        self.links: List[Tuple[str, str, str]] = []
        self.seen: set = set()
        self.discarded = 0
        self.meta_robots: Optional[str] = None
        self.max_outlinks = max_outlinks
        # per-page (base, raw uri) → resolved+normalized destination.
        # Real pages repeat the same hrefs (nav bars, per-item icons);
        # resolve+fixup was ~45% of kernel CPU before memoization. The
        # base participates in the key, so a mid-page <base href> change
        # never reuses a stale resolution.
        self._dest_memo: dict = {}

    def add(self, uri: str, context: str, hop: str) -> None:
        """Link.addRelativeToBase + outLinks HashSet + cap (Link.add2
        :156-165): resolve against the current base, UURI-normalize,
        collapse duplicates, discard-and-count past maxOutlinks."""
        if not uri:
            return
        memo_key = (self.base, uri)
        dest = self._dest_memo.get(memo_key)
        if dest is None:
            dest = fixup_py(resolve_relative_py(self.base, uri))
            self._dest_memo[memo_key] = dest
        key = (dest, context, hop)
        if key in self.seen:
            return
        if len(self.links) >= self.max_outlinks:
            self.discarded += 1
            return
        self.seen.add(key)
        self.links.append(key)


def extract_html_py(
    page_url: str,
    content: str,
    *,
    treat_frames_as_embeds: bool = True,
    ignore_form_action_urls: bool = False,
    extract_only_form_gets: bool = True,
    extract_javascript: bool = True,
    extract_value_attributes: bool = True,
    obey_meta_robots_nofollow: bool = True,
    max_outlinks: int = MAX_OUTLINKS,
    aggressive: bool = False,
    jericho_forms: bool = False,
) -> Tuple[List[Tuple[str, str, str]], Optional[str], int]:
    """The full ExtractorHTML.extract law (:757-816). Returns
    ``(links, meta_robots, discarded)`` with links as ordered
    ``(uri, context, hop)`` triples. Keyword defaults mirror the
    reference's kp defaults (:211-294). ``aggressive=True`` is
    AggressiveExtractorHTML.java:44-50: the script *body* is
    additionally scanned as general-tag innards (attribute mining
    inside script-written markup), after the normal JS string scan.
    ``jericho_forms=True`` is the JerichoExtractorHTML differential
    (processForm :352-421): form links carry the default field values
    as a GET query string instead of the bare ACTION (the form links
    append after the tag-scan links rather than in place)."""
    page = _Page(page_url, max_outlinks)
    suppress_actions = ignore_form_action_urls or jericho_forms
    for m in _TAG_RE.finditer(content):
        if m.start(8) > 0:
            continue  # comment
        if m.start(7) > 0:
            if _process_meta(page, m.group(5), obey_meta_robots_nofollow):
                break  # robots nofollow/none: abort extraction
        elif m.start(5) > 0:
            _process_general_tag(
                page, m.group(6), m.group(5),
                treat_frames_as_embeds, suppress_actions,
                extract_only_form_gets, extract_javascript,
                extract_value_attributes)
        elif m.start(1) > 0:
            seq = m.group(1)
            end_open = m.end(2) - m.start(1)
            _process_general_tag(
                page, seq[0:6], seq[0:end_open],
                treat_frames_as_embeds, suppress_actions,
                extract_only_form_gets, extract_javascript,
                extract_value_attributes)
            _process_script_code(page, seq[end_open:], extract_javascript)
            if aggressive:
                _process_general_tag(
                    page, seq[0:6], seq[end_open:],
                    treat_frames_as_embeds, suppress_actions,
                    extract_only_form_gets, extract_javascript,
                    extract_value_attributes)
        elif m.start(3) > 0:
            seq = m.group(3)
            end_open = m.end(4) - m.start(3)
            _process_general_tag(
                page, seq[0:6], seq[0:end_open],
                treat_frames_as_embeds, suppress_actions,
                extract_only_form_gets, extract_javascript,
                extract_value_attributes)
            for uri in css_uris_py(seq[end_open:]):
                page.add(uri, EMBED_MISC, "E")
    if jericho_forms:
        _jericho_forms(page, content, ignore_form_action_urls,
                       extract_only_form_gets, extract_javascript)
    return page.links, page.meta_robots, page.discarded


def _attr_value(m: "re.Match") -> str:
    grp = 14 if m.start(14) > -1 else 15 if m.start(15) > -1 else 16
    return _html.unescape(m.group(grp))


def _process_script_code(page: _Page, code: str,
                         extract_javascript: bool) -> None:
    """processScriptCode (:584-589) -> ExtractorJS.considerStrings with
    handlingJSFile=false: likely-URI strings, JS-unescaped,
    speculativeFixup'd with the page UURI, added relative to base as
    SPECULATIVE hops with the =JS_MISC context."""
    if not extract_javascript:
        return
    for uri in js_strings_py(code, page.host, page.scheme):
        page.add(uri, JS_MISC, "X")


def _process_general_tag(page: _Page, element: str, cs: str,
                         frames_as_embeds: bool, ignore_form_actions: bool,
                         only_form_gets: bool, extract_javascript: bool,
                         extract_value_attributes: bool) -> None:
    """processGeneralTag (:331-533), one attribute find-loop with the
    tag-scoped state (codebase, resources, action+method, value+name)
    resolved at the end exactly as the reference does."""
    codebase: Optional[str] = None
    resources: List[str] = []
    action = action_context = method = None
    value_val = value_context = name_val = None
    el = element.strip()
    el_low = el.lower()

    for attr in _ATTR_RE.finditer(cs):
        # uninteresting attributes (class/id/alt/type/data-* — group 13,
        # which by alternation order only matches when no interesting
        # group did) dominate real markup; dispatch them first with one
        # probe instead of walking all twelve interesting-group probes
        if attr.start(13) > -1:
            low = attr.group(1).lower()
            if low == "name":
                name_val = _attr_value(attr)
            elif low == "flashvars":
                _consider_query_string_values(
                    page, _attr_value(attr),
                    element_context(element, attr.group(13)))
            continue
        value = _attr_value(attr)
        attr_name = attr.group(1)
        if attr.start(2) > -1:  # HREF
            context = element_context(element, attr.group(2))
            if el_low == "link":
                page.add(value, context, "E")
            else:
                _process_link(page, value, context, extract_javascript)
            if el_low == "base":
                # setBaseURI — affects subsequent links only (:381-388);
                # UURIFactory.getInstance(value) is absolute-only (a
                # relative href raises URIException and is logged)
                if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", value):
                    page.base = fixup_py(value)
        elif attr.start(3) > -1:  # ACTION
            if not ignore_form_actions:
                action = value
                action_context = element_context(element, attr.group(3))
        elif attr.start(4) > -1:  # ON*
            _process_script_code(page, value, extract_javascript)
        elif attr.start(5) > -1:  # SRC family
            context = element_context(element, attr.group(5))
            if not frames_as_embeds and el_low in ("frame", "iframe"):
                page.add(value, context, "L")
            else:
                page.add(value, context, "E")
        elif attr.start(6) > -1:  # CODEBASE
            codebase = value
            page.add(value, element_context(element, attr.group(6)), "E")
        elif attr.start(7) > -1:  # CLASSID, DATA
            resources.append(value)
        elif attr.start(8) > -1:  # ARCHIVE (space-delimited list)
            resources.extend(p for p in re.split(r"\s", value) if p)
        elif attr.start(9) > -1:  # CODE (applet gains .class)
            if el_low == "applet" and not value.lower().endswith(".class"):
                resources.append(value + ".class")
            else:
                resources.append(value)
        elif attr.start(10) > -1:  # VALUE
            value_val = value
            value_context = element_context(element, attr.group(10))
        elif attr.start(11) > -1:  # STYLE inline attribute
            for uri in css_uris_py(value):
                page.add(uri, EMBED_MISC, "E")
        elif attr.start(12) > -1:  # METHOD
            method = value
        # (generic attributes — group 13 — were dispatched first above)

    if resources:
        # codebase resolves against the CrawlURI's own URI (:490-491
        # getInstance(curi.getUURI(), codebase)), not the <base> href
        codebase_uri = (
            fixup_py(resolve_relative_py(page.url, codebase))
            if codebase else None)
        for res in resources:
            res = _html.unescape(res)
            if codebase_uri is not None:
                res = resolve_relative_py(codebase_uri, res)
            page.add(res, element, "E")

    if action is not None:
        if method is None or method.upper() == "GET" or not only_form_gets:
            _process_link(page, action, action_context, extract_javascript)

    if value_val is not None:
        if (el_low == "param" and name_val is not None
                and name_val.lower() == "flashvars"):
            _consider_query_string_values(page, value_val, value_context)
        elif extract_value_attributes and is_likely_uri_py(value_val):
            page.add(value_val, value_context, "L")


# ------------------------------------------------- JerichoExtractorHTML
# (modules/.../extractor/JerichoExtractorHTML.java:352-421 processForm —
# the parser-based alternate's ONE behavioral delta vs ExtractorHTML:
# instead of the bare ACTION url, it submits the form's default field
# values as a GET query string. Goldens: JerichoExtractorHTMLTest
# testFormsLinkGet / IgnorePost / FindPost.)

_FORM_RE = re.compile(r"(?is)<form\b([^>]*)>(.*?)(?:</form\s*>|\Z)")
_CTRL_RE = re.compile(
    r"(?is)<(input|textarea|button)\b([^>]*)>"
    r"|<select\b([^>]*)>(.*?)(?:</select\s*>|\Z)"
)
_OPT_RE = re.compile(r"(?is)<option\b([^>]*)>")


def _tag_attr(attrs: str, name: str) -> Optional[str]:
    m = re.search(
        rf"(?is)\b{name}\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", attrs
    )
    if not m:
        return None
    return _html.unescape(next(g for g in m.groups() if g is not None))


def _has_flag(attrs: str, name: str) -> bool:
    return re.search(rf"(?is)\b{name}\b", attrs) is not None


def _jericho_forms(page: _Page, content: str, ignore_form_actions: bool,
                   only_form_gets: bool, extract_javascript: bool) -> None:
    """processForm law: every control contributes ``&name=value`` in
    document order — checked checkbox/radio their value (default
    ``on``), unchecked ones an empty value, a select its selected (else
    first) option, submit its predefined value, text-family controls
    their value attribute, textarea its content. The first ``&``
    becomes ``?`` unless the action already has one (:398-416)."""
    if ignore_form_actions:
        return  # :359-361 — no form links at all
    for fm in _FORM_RE.finditer(content):
        fattrs, body = fm.group(1), fm.group(2)
        method = _tag_attr(fattrs, "method") or "GET"
        if only_form_gets and method.upper() != "GET":
            continue
        action = _tag_attr(fattrs, "action")
        name = _tag_attr(fattrs, "name")
        pairs: List[str] = []
        for cm in _CTRL_RE.finditer(body):
            if cm.group(1) is not None:  # input / textarea / button
                el, attrs = cm.group(1).lower(), cm.group(2)
                cname = _tag_attr(attrs, "name")
                if cname is None or el == "button":
                    continue
                if el == "textarea":
                    pairs.append(f"{cname}=")
                    continue
                ctype = (_tag_attr(attrs, "type") or "text").lower()
                if ctype in ("reset", "button", "image", "file"):
                    continue
                if ctype in ("checkbox", "radio"):
                    val = (_tag_attr(attrs, "value") or "on") \
                        if _has_flag(attrs, "checked") else ""
                elif ctype == "submit":
                    val = _tag_attr(attrs, "value") or ""
                else:
                    val = _tag_attr(attrs, "value") or ""
                pairs.append(f"{cname}={val}")
            else:  # select
                sattrs, sbody = cm.group(3), cm.group(4)
                cname = _tag_attr(sattrs, "name")
                if cname is None:
                    continue
                opts = list(_OPT_RE.finditer(sbody))
                chosen = next(
                    (o for o in opts if _has_flag(o.group(1), "selected")),
                    opts[0] if opts else None,
                )
                val = _tag_attr(chosen.group(1), "value") if chosen else None
                pairs.append(f"{cname}={val or ''}")
        query = "".join("&" + p for p in pairs)
        if action is None:
            url = query.replace("&", "?", 1)
        else:
            url = action + (
                query.replace("&", "?", 1) if "?" not in action else query
            )
        _process_link(
            page, url, element_context("form", f"name={name}"),
            extract_javascript,
        )


def _process_link(page: _Page, value: str, context: str,
                  extract_javascript: bool) -> None:
    """processLink (:600-611): ``javascript:`` HREFs go to the JS
    string scan; everything else is a NAVLINK."""
    if re.match(r"(?i)^javascript:", value):
        _process_script_code(page, value[11:], extract_javascript)
    else:
        page.add(value, context, "L")


def _consider_query_string_values(page: _Page, query_string: str,
                                  context: str) -> None:
    """considerQueryStringValues (:544-558): each key=value pair's
    URL-decoded value is probed with the likely-URI law, hop
    SPECULATIVE."""
    from urllib.parse import unquote_plus

    for pair in query_string.split("&"):
        kv = pair.split("=")
        if len(kv) == 2:
            try:
                cand = unquote_plus(kv[1])
            except Exception:
                cand = kv[1]
            if is_likely_uri_py(cand):
                page.add(cand, context, "X")


def _process_meta(page: _Page, cs: str, obey_nofollow: bool) -> bool:
    """processMeta (:871-921). True = abort document extraction."""
    name = http_equiv = content = None
    for attr in _ATTR_RE.finditer(cs):
        value = _attr_value(attr)
        if attr.group(1).lower() == "name":
            name = value
        elif attr.group(1).lower() == "http-equiv":
            http_equiv = value
        elif attr.group(1).lower() == "content":
            content = value
    if name is not None and name.lower() == "robots" and content is not None:
        page.meta_robots = content
        lower = content.lower()
        if obey_nofollow and ("nofollow" in lower or "none" in lower):
            return True
    elif (http_equiv is not None and http_equiv.lower() == "refresh"
          and content is not None):
        idx = content.find("=") + 1
        if idx > 0:
            page.add(content[idx:], META_CONTEXT, "R")
    return False


# ---------------------------------------------------------------- Spark

LINK_TYPE = ArrayType(StructType([
    StructField("uri", StringType()),
    StructField("context", StringType()),
    StructField("hop", StringType()),
]))


def html_outlinks(page_url: Column, content: Column, **options) -> Column:
    """array<struct<uri,context,hop>> of ExtractorHTML outlinks in
    discovery order — one Arrow-batched pandas UDF (vectorized; the
    stateful scan law is inexpressible in Catalyst regex ops).
    ``options`` are :func:`extract_html_py` keywords bound at plan
    build (kp defaults otherwise).

    A body with no ``<`` cannot match the tag scan (every _TAG_RE
    alternative starts at '<'), so such rows are nulled JVM-side BEFORE
    the Arrow exchange — a mixed text/HTML corpus neither serializes
    nor scans its plain-text bytes through Python (the shouldProcess
    mimetype gate of ExtractorHTML.java restated as a content probe)."""
    gated = F.when(content.contains("<"), content)

    @F.pandas_udf(LINK_TYPE)
    def _scan(urls: pd.Series, texts: pd.Series) -> pd.Series:
        def one(url, text):
            if text is None or url is None:
                return []
            links, _, _ = extract_html_py(url, text, **options)
            return [{"uri": u, "context": c, "hop": h} for u, c, h in links]

        return pd.Series([one(u, t) for u, t in zip(urls, texts)])

    return _scan(page_url, gated)


def html_meta_robots(page_url: Column, content: Column) -> Column:
    """The recorded A_META_ROBOTS content (first robots meta tag), as a
    string column from the same scan law (None when absent)."""
    gated = F.when(content.contains("<"), content)  # same probe as outlinks

    @F.pandas_udf(StringType())
    def _scan(urls: pd.Series, texts: pd.Series) -> pd.Series:
        def one(url, text):
            if text is None or url is None:
                return None
            _, robots, _ = extract_html_py(url, text)
            return robots

        return pd.Series([one(u, t) for u, t in zip(urls, texts)],
                         dtype=object)

    return _scan(page_url, gated)
