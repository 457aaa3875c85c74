"""Scope = DecideRule chain as a fold of column expressions.

Reference semantics (heritrix3/modules/.../deciderules/DecideRuleSequence.java:78-95):
rules are evaluated in order; each yields ACCEPT / REJECT / NONE
(PASS); the **last non-NONE decision wins**. That is a fold, not a
short-circuit, so we express it as a chain of
``when(pred, lit(decision))`` overrides applied left-to-right:

    decision = fold(rules, start=REJECT*) where later writes win

(* DecideRuleSequence starts from NONE which the candidate scoper
treats as not-accepted; seeding the fold with REJECT is equivalent for
scoping.)

The default crawl scope chain (dist profile
engine/src/main/resources/.../profile-crawler-beans.cxml:114-183) is
assembled by :func:`default_scope`, with the SURT-prefix seed scope
realized as a broadcast-joined prefix match.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heritrix_spark.constants import PolitenessConfig
from heritrix_spark.functions.hops import hop_count_col, trans_hops_col
from heritrix_spark.functions.surt import surt_col


@dataclass(frozen=True)
class Rule:
    """One DecideRule: when ``predicate`` holds, force ``decision``."""

    name: str
    predicate: Column
    decision: bool  # True=ACCEPT, False=REJECT


def apply_rules(rules: list[Rule], start: bool = False) -> Column:
    """Fold the rule list: last matching rule wins (DecideRuleSequence)."""
    out = F.lit(start)
    for rule in rules:
        out = F.when(rule.predicate, F.lit(rule.decision)).otherwise(out)
    return out


# ------------------------------------------------------- individual rules


SURT_PREFIX_OR_CHAIN_MAX = 64


def coalesce_prefixes(prefixes: list[str]) -> list[str]:
    """SurtPrefixSet coalescing: drop any entry covered by a shorter
    entry already in the set (``importFrom`` keeps only maximal
    prefixes, SurtPrefixSet.java:269-330). Returns sorted."""
    out: list[str] = []
    for p in sorted(set(prefixes)):
        if not out or not p.startswith(out[-1]):
            out.append(p)
    return out


def surt_prefix_member_col(surt: Column, prefixes: list[str]) -> Column:
    """Large-seed-list SurtPrefixedDecideRule membership — the
    reference's ``SurtPrefixSet.containsPrefixOf`` bisect-floor law
    (SurtPrefixSet.java:269-330: headSet floor, then one startswith)
    as ONE vectorized Arrow pass: np.searchsorted over the sorted
    coalesced prefix array gives the floor for the whole batch at once,
    O(log P) per row. An OR-chain of P startswiths is O(P) per row AND
    overflows the plan-conversion stack beyond a few thousand terms —
    the 25k-seed soak's failure mode."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    arr = np.array(coalesce_prefixes(prefixes), dtype=object)

    @pandas_udf("boolean")
    def _member(s: pd.Series) -> pd.Series:
        vals = s.fillna("").to_numpy(dtype=object)
        if len(arr) == 0 or len(vals) == 0:
            return pd.Series(np.zeros(len(vals), dtype=bool))
        idx = np.searchsorted(arr, vals, side="right") - 1
        out = np.zeros(len(vals), dtype=bool)
        mask = idx >= 0
        floors = arr[np.clip(idx, 0, None)]
        out[mask] = [
            v.startswith(p) for v, p in zip(vals[mask], floors[mask])
        ]
        return pd.Series(out)

    return _member(surt)


def surt_prefix_predicate(
    url: Column, prefixes: list[str], surt: Column | None = None
) -> Column:
    """SurtPrefixedDecideRule: SURT form starts with any seed-derived prefix.

    For small prefix sets (the usual case: one prefix per seed host) this
    compiles to an OR of native ``startswith`` — JVM-side, broadcast-free.
    Beyond ``SURT_PREFIX_OR_CHAIN_MAX`` entries it switches to the
    bisect-floor membership kernel (:func:`surt_prefix_member_col`) —
    the OR-chain both evaluates O(P) per row and blows the plan
    converter's stack at tens of thousands of seeds. The two strategies
    are equivalent (coalescing removes only covered, hence redundant,
    entries; pinned in tests/test_scope_scale.py).
    Pass ``surt`` when the SURT form is already materialized (the fused
    url_prep_struct_col path) to avoid a second UDF evaluation.
    """
    s = surt_col(url) if surt is None else surt
    if len(prefixes) > SURT_PREFIX_OR_CHAIN_MAX:
        return surt_prefix_member_col(s, prefixes)
    pred = F.lit(False)
    for p in prefixes:
        pred = pred | s.startswith(p)
    return pred


def surt_prefix_join(df: DataFrame, url_col: str, prefixes: DataFrame) -> DataFrame:
    """Large-seed-set variant: broadcast prefix table, prefix-match join.

    ``prefixes`` has one column ``prefix``. Adds boolean ``in_scope``.
    The broadcast keeps this a map-side operation (no shuffle of df).
    """
    s = surt_col(F.col(url_col)).alias("__surt")
    marked = (
        df.withColumn("__surt", s)
        .join(
            F.broadcast(prefixes.select(F.col("prefix").alias("__prefix"))),
            on=F.col("__surt").startswith(F.col("__prefix")),
            how="left",
        )
        .withColumn("in_scope", F.col("__prefix").isNotNull())
    )
    # a URL may match several prefixes → dedupe back to one row per input row
    return marked.drop("__prefix").dropDuplicates(df.columns).drop("__surt")


def too_many_hops_predicate(
    hops_path: Column, max_hops: int, max_hops_col: Column | None = None
) -> Column:
    """TooManyHopsDecideRule: hopCount > maxHops → REJECT.
    ``max_hops_col`` is the per-SURT sheet override (KeyedProperties);
    null cells fall through to the global ``max_hops``."""
    cap = (
        F.coalesce(max_hops_col.cast("int"), F.lit(max_hops))
        if max_hops_col is not None
        else F.lit(max_hops)
    )
    return hop_count_col(hops_path) > cap


def transclusion_predicate(
    hops_path: Column, max_trans_hops: int = 2, max_speculative_hops: int = 1
) -> Column:
    """TransclusionDecideRule (TransclusionDecideRule.java:96-142): walk
    the trailing run of non-'L' hops; ACCEPT iff the run is non-empty,
    its speculative ('X') hops are ≤ max_speculative_hops, and its
    non-refer (≠'R') hops are ≤ max_trans_hops — redirects ride along
    free, script-speculation is tightly bounded."""
    from heritrix_spark.functions.hops import _tail

    col = F.col(hops_path) if isinstance(hops_path, str) else hops_path
    trailing = F.regexp_extract(_tail(col), r"([^L]*)$", 1)
    all_count = F.length(trailing)
    nonref = F.length(F.translate(trailing, "R", ""))
    spec = all_count - F.length(F.translate(trailing, "X", ""))
    return (
        (all_count > 0)
        & (spec <= F.lit(max_speculative_hops))
        & (nonref <= F.lit(max_trans_hops))
    )


def pathological_path_predicate(url: Column, repetitions: int = 2) -> Column:
    """PathologicalPathDecideRule: same path segment repeated > n times
    consecutively (default 2) → REJECT, e.g. /a/a/a/."""
    pat = r"^[^?]*?/(.+?/)\1{%d,}" % repetitions
    # Java/RE2 diverge on backrefs (RE2 lacks them); this rule is
    # Spark-side only (Java regex supports \1).
    return url.rlike(pat)


def too_many_path_segments_predicate(url: Column, max_segments: int = 20) -> Column:
    """TooManyPathSegmentsDecideRule: count of '/' beyond scheme > n → REJECT."""
    path = F.regexp_replace(url, r"^\w+://[^/]*", "")
    slashes = F.length(path) - F.length(F.translate(path, "/", ""))
    return slashes > F.lit(max_segments)


def scheme_not_in_set_predicate(
    url: Column, schemes: tuple[str, ...] = ("http", "https", "ftp")
) -> Column:
    """SchemeNotInSetDecideRule: scheme outside the allowed set → REJECT."""
    scheme = F.lower(F.regexp_extract(url, r"^(\w+):", 1))
    return ~scheme.isin(*schemes)


def prerequisite_predicate(hops_path: Column) -> Column:
    """PrerequisiteAcceptDecideRule: path ends with 'P' → ACCEPT."""
    return F.substring(hops_path, -1, 1) == "P"


def default_scope(
    url: Column,
    hops_path: Column,
    seed_surt_prefixes: list[str],
    cfg: PolitenessConfig = PolitenessConfig(),
    surt: Column | None = None,
    max_hops_col: Column | None = None,
) -> Column:
    """The default scope chain (profile-crawler-beans.cxml:114-183) as one
    boolean column: accept iff the last matching rule accepts.
    ``max_hops_col`` — optional per-SURT sheet override of the hop cap
    (see :func:`too_many_hops_predicate`)."""
    rules = [
        Rule(
            "surt_prefix",
            surt_prefix_predicate(url, seed_surt_prefixes, surt=surt),
            True,
        ),
        Rule(
            "too_many_hops",
            too_many_hops_predicate(hops_path, cfg.max_hops, max_hops_col),
            False,
        ),
        Rule("transclusion", transclusion_predicate(hops_path), True),
        Rule("pathological", pathological_path_predicate(url), False),
        Rule("too_many_segments", too_many_path_segments_predicate(url), False),
        Rule("prerequisite", prerequisite_predicate(hops_path), True),
        Rule("scheme", scheme_not_in_set_predicate(url), False),
    ]
    return apply_rules(rules, start=False)


# ---------------------------------------------- named SURT-family rules
# (modules/.../deciderules/surt/: SurtPrefixedDecideRule subclasses that
# patch the prefix set before matching — SurtPrefixSet.java:269-330)


def convert_prefix_to_host(prefix: str) -> str:
    """SurtPrefixSet.convertPrefixToHost (SurtPrefixSet.java:283-298):
    close an open-ended authority prefix with ')' so it enforces the
    exact host (subdomains no longer match); truncate path info."""
    if prefix.endswith(")"):
        return prefix
    i = prefix.find(")")
    if i < 0:
        if not prefix.endswith(","):
            prefix += ","
        return prefix + ")"
    return prefix[: i + 1]


def convert_prefix_to_domain(prefix: str) -> str:
    """SurtPrefixSet.convertPrefixToDomain (SurtPrefixSet.java:321-330):
    open the prefix at ')' so it matches the whole domain including
    subdomains, and strip a trailing 'www,' label."""
    i = prefix.find(")")
    if i >= 0:
        prefix = prefix[:i]
    if prefix.endswith("www,"):
        prefix = prefix[:-4]
    return prefix


def not_surt_prefixed_predicate(
    url: Column, prefixes: list[str], surt: Column | None = None
) -> Column:
    """NotSurtPrefixedDecideRule (surt/NotSurtPrefixedDecideRule.java):
    decision applies when the SURT form matches NO configured prefix."""
    return ~surt_prefix_predicate(url, prefixes, surt=surt)


def on_hosts_predicate(
    url: Column, prefixes: list[str], surt: Column | None = None
) -> Column:
    """OnHostsDecideRule (surt/OnHostsDecideRule.java: prefix set run
    through convertAllPrefixesToHosts): exact-host match only."""
    host_prefixes = sorted({convert_prefix_to_host(p) for p in prefixes})
    return surt_prefix_predicate(url, host_prefixes, surt=surt)


def on_domains_predicate(
    url: Column, prefixes: list[str], surt: Column | None = None
) -> Column:
    """OnDomainsDecideRule (surt/OnDomainsDecideRule.java: prefix set run
    through convertAllPrefixesToDomains): domain + all subdomains."""
    dom_prefixes = sorted({convert_prefix_to_domain(p) for p in prefixes})
    return surt_prefix_predicate(url, dom_prefixes, surt=surt)


def not_on_hosts_predicate(
    url: Column, prefixes: list[str], surt: Column | None = None
) -> Column:
    """NotOnHostsDecideRule (surt/NotOnHostsDecideRule.java)."""
    return ~on_hosts_predicate(url, prefixes, surt=surt)


def not_on_domains_predicate(
    url: Column, prefixes: list[str], surt: Column | None = None
) -> Column:
    """NotOnDomainsDecideRule (surt/NotOnDomainsDecideRule.java)."""
    return ~on_domains_predicate(url, prefixes, surt=surt)


# ---------------------------------------------- named regex-family rules


def matches_regex_predicate(subject: Column, regex: str) -> Column:
    """MatchesRegexDecideRule (MatchesRegexDecideRule.java:60-63).
    Java's Matcher.matches() is a FULL-string match; rlike is a find,
    so the pattern is anchored on both ends here."""
    return subject.rlike(f"^(?:{regex})$")


def not_matches_regex_predicate(subject: Column, regex: str) -> Column:
    """NotMatchesRegexDecideRule.java."""
    return ~matches_regex_predicate(subject, regex)


def matches_list_regex_predicate(
    subject: Column, regexes: list[str], logical_or: bool = True
) -> Column:
    """MatchesListRegexDecideRule (MatchesListRegexDecideRule.java:84-108):
    empty list never matches; otherwise OR / AND over full-string
    matches per ``listLogicalOr``."""
    if not regexes:
        return F.lit(False)
    preds = [matches_regex_predicate(subject, r) for r in regexes]
    out = preds[0]
    for p in preds[1:]:
        out = (out | p) if logical_or else (out & p)
    return out


# MatchesFilePatternDecideRule.java:34-47 preset groups (spec constants)
FILE_PATTERN_PRESETS = {
    "IMAGES": r".*(?i)(\.(bmp|gif|jpe?g|png|svg|tiff?))$",
    "AUDIO": r".*(?i)(\.(aac|aiff?|m3u|m4a|midi?|mp2|mp3|mp4|mpa|ogg|ra|ram|wav|wma))$",
    "VIDEO": r".*(?i)(\.(asf|asx|avi|flv|mov|mp4|mpeg|mpg|qt|ram|rm|smil|wmv))$",
    "MISC": r".*(?i)(\.(doc|pdf|ppt|swf))$",
}
FILE_PATTERN_PRESETS["ALL"] = (
    r".*(?i)(\.(bmp|gif|jpe?g|png|svg|tiff?|aac|aiff?|m3u|m4a|midi?"
    r"|mp2|mp3|mp4|mpa|ogg|ra|ram|wav|wma|asf|asx|avi|flv|mov|mp4"
    r"|mpeg|mpg|qt|ram|rm|smil|wmv|doc|pdf|ppt|swf))$"
)


def matches_file_pattern_predicate(url: Column, preset: str = "ALL") -> Column:
    """MatchesFilePatternDecideRule (MatchesFilePatternDecideRule.java)."""
    return matches_regex_predicate(url, FILE_PATTERN_PRESETS[preset])


def hops_path_matches_regex_predicate(hops_path: Column, regex: str) -> Column:
    """HopsPathMatchesRegexDecideRule.java: full-match over hopsPath."""
    return matches_regex_predicate(hops_path, regex)


def has_via_predicate(via: Column) -> Column:
    """HasViaDecideRule (HasViaDecideRule.java:45-47): non-seed URIs."""
    return via.isNotNull()


def hop_crosses_assignment_domain_predicate(url: Column, via: Column) -> Column:
    """HopCrossesAssignmentLevelDomainDecideRule: the hop leaves the
    via's registered domain (PSL-reduced SURT authority differs).
    Typically used with decision=REJECT to confine a crawl to the seed
    domains even across subdomains."""
    from heritrix_spark.functions.psl import assignment_level_class_key_col

    return via.isNotNull() & (
        assignment_level_class_key_col(url)
        != assignment_level_class_key_col(via)
    )


# ------------------------------------------ post-fetch / resource-size rules

#: ResourceNoLongerThanDecideRule.HEADER_PREDICTS_MISSING (:79)
HEADER_PREDICTS_MISSING = -1


def header_content_length_col(header_value: Column) -> Column:
    """The midfetch header-parse law (ResourceNoLongerThanDecideRule
    evaluate :80-117): missing / empty / unparseable Content-Length →
    HEADER_PREDICTS_MISSING (-1), which both resource rules treat as
    "let pass"."""
    return F.coalesce(
        F.when(
            header_value.isNotNull() & (F.length(header_value) > 0),
            header_value.try_cast("int"),
        ),
        F.lit(HEADER_PREDICTS_MISSING),
    )


def resource_no_longer_than_predicate(length: Column, threshold: int) -> Column:
    """ResourceNoLongerThanDecideRule.test (:126-128): match iff the
    (known) length is strictly < threshold; missing (-1) never matches
    (:115-117)."""
    return (length != HEADER_PREDICTS_MISSING) & (length < F.lit(threshold))


def resource_longer_than_predicate(length: Column, threshold: int) -> Column:
    """ResourceLongerThanDecideRule.test (:38-40): strictly >."""
    return (length != HEADER_PREDICTS_MISSING) & (length > F.lit(threshold))


def content_length_accept_predicate(
    content_length: Column, threshold: int = (1 << 63) - 1
) -> Column:
    """ContentLengthDecideRule.innerDecide (:52-57): a BINARY rule —
    ACCEPT when contentLength < threshold, REJECT otherwise (never
    PASS; default threshold 2^63-1 accepts everything)."""
    return content_length < F.lit(threshold)


def class_key_matches_regex_predicate(class_key: Column, regex: str) -> Column:
    """ClassKeyMatchesRegexDecideRule (:56-59): the MatchesRegex
    full-match law applied to the frontier's class key instead of the
    URI."""
    return matches_regex_predicate(class_key, regex)


def external_geo_predicate(country_code: Column, codes: list[str]) -> Column:
    """ExternalGeoLocationDecideRule.evaluate (:113-135): match iff the
    host's (cached or looked-up) country code is in the configured
    list; unknown hosts / failed lookups → false (:103-105, :137-141).
    The geo-IP lookup itself is a broadcast host→country dimension join
    upstream (live lookups stay stubbed, like operators/mapper's
    ServerCache DNS)."""
    if not codes:
        return F.lit(False)
    return F.coalesce(country_code.isin(codes), F.lit(False))


def supplementary_links_filter(
    candidates: DataFrame,
    rules: list[Rule],
    page_prereq_col: Column | None = None,
) -> DataFrame:
    """SupplementaryLinksScoper (engine/.../postprocessor/
    SupplementaryLinksScoper.java:44-120): after LinksScoper has ruled
    candidates in-scope, a SECOND rule sequence prunes them further —
    a candidate survives only when the supplementary fold's decision is
    exactly ACCEPT (isInScope :108-115; the sequence starts NONE, so
    no-rule-fires is out, which apply_rules' ``start=False`` models).
    A page carrying a prerequisite skips supplementary processing
    entirely (innerProcess :84-87) — pass ``page_prereq_col`` and those
    rows flow through untouched. The reference's multi-machine use case
    (prune links not intended for this crawler) is the mapper divert;
    this is its in-chain form."""
    keep = apply_rules(rules, start=False)
    if page_prereq_col is not None:
        keep = page_prereq_col | keep
    return candidates.filter(keep)


def seed_accept_predicate(is_seed: Column) -> Column:
    """SeedAcceptDecideRule (SeedAcceptDecideRule.java:35-38): ACCEPT
    exactly the URIs flagged as seeds."""
    return F.coalesce(is_seed, F.lit(False))


def fetch_status_in_set_predicate(
    fetch_status: Column, status_codes: list[int]
) -> Column:
    """FetchStatusDecideRule (:35-55): fetch status ∈ configured list
    (empty list matches nothing, like the reference's empty
    ArrayList)."""
    if not status_codes:
        return F.lit(False)
    return fetch_status.isin(*status_codes)


def fetch_status_matches_regex_predicate(
    fetch_status: Column, regex: str
) -> Column:
    """FetchStatusMatchesRegexDecideRule: the decimal status string
    full-matches the regex (MatchesRegexDecideRule.evaluate uses
    ``matches()``; Not- is the same predicate under a REJECT Rule)."""
    return matches_regex_predicate(fetch_status.cast("string"), regex)


def content_type_matches_regex_predicate(
    content_type: Column, regex: str
) -> Column:
    """ContentTypeMatchesRegexDecideRule: full-match over the content
    type; a null content type matches nothing (the reference NPE-guards
    by never running pre-fetch)."""
    return F.coalesce(matches_regex_predicate(content_type, regex),
                      F.lit(False))


def host_basename_col(url: Column) -> Column:
    """UURI.getHostBasename (commons/.../net/UURI.java:244-253): the
    referenced host with one leading ``www\\d*.`` stripped
    (MASSAGEHOST_PATTERN :74)."""
    host = F.lower(
        F.regexp_extract(
            url, r"^[a-zA-Z][\w+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1
        )
    )
    return F.regexp_replace(host, r"^www\d*\.", "")


def add_redirect_from_root_server_predicate(
    url: Column, via: Column, hops_path: Column
) -> Column:
    """AddRedirectFromRootServerToScope (:40-66): ACCEPT a redirect
    (last hop 'R' — CrawlURI.isLocation :1400-1404) whose host basename
    equals its via's AND whose via path is exactly ``/`` — i.e. the
    root page of a server bounced the crawler somewhere on the same
    (www-stripped) host. The reference also marks the URI a seed as a
    side effect; callers route accepted rows through the seed-promotion
    path (plans/round.py seeds_redirect_new_seeds) for that half."""
    is_location = F.coalesce(hops_path.endswith("R"), F.lit(False))
    via_path = F.coalesce(
        F.regexp_extract(via, r"^[a-zA-Z][\w+.-]*://[^/?#]*(/[^?#]*)?", 1),
        F.lit(""),
    )
    same_host = host_basename_col(url) == host_basename_col(via)
    return (
        via.isNotNull()
        & (host_basename_col(url) != "")
        & (host_basename_col(via) != "")
        & same_host
        & is_location
        & (via_path == "/")
    )
