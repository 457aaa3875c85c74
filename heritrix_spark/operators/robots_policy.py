"""RobotsPolicy family — obey / ignore / first-named / most-favored /
custom robots honoring.

Reference (heritrix3/modules/.../net/):

- ``RobotsPolicy.java`` — ``allows(userAgent, curi, robotstxt)`` +
  ``obeyMetaRobotsNofollow``; STANDARD_POLICIES obey/classic/ignore.
- ``ObeyRobotsPolicy.java`` — directives for the primary UA (with
  wildcard fallback) decide; meta nofollow obeyed.
- ``IgnoreRobotsPolicy.java`` — always allowed; nofollow ignored.
- ``FirstNamedRobotsPolicy.java`` — try the primary UA *named-group
  only* (getDirectivesFor(ua, false)); else the first candidate UA
  with a named group decides (masquerading as it); else the primary
  UA's normal fallback lookup.
- ``MostFavoredRobotsPolicy.java`` — allowed if the primary UA or ANY
  candidate UA is allowed (each with normal fallback); masquerade as
  the first allowing candidate when the primary was refused.
- ``CustomRobotsPolicy.java`` — an operator-supplied robots.txt body
  replaces the server's.

Goldens: FirstNamedRobotsPolicyTest.java:31-76.

Spark-first shape: robots bodies are a per-host dimension parsed once
driver-side (:mod:`heritrix_spark.functions.robots_parse` builds it);
the per-agent directive groups become one broadcast dimension row per
host — ``groups`` is an array of (agent, named, allows, disallows)
structs in try-order ``[primary, candidate...]`` plus the wildcard
arrays — and every policy decision is a pure Column fold over that
array with the RobotsDirectives prefix law
(:func:`heritrix_spark.operators.politeness.robots_allows_col`).
No Python on the hot path; the dimension is per-host (small), the
candidate list is fixed configuration, so the per-URI work is K+1
prefix matches inside whole-stage codegen.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

from heritrix_spark.functions.robots_parse import Directives, ParsedRobots
from heritrix_spark.operators.politeness import robots_allows_col


def _allows_path(d: Optional[Directives], path: str) -> bool:
    """RobotsDirectives.allows (:39-49) on a parsed group (None = the
    NO_DIRECTIVES allow-all fallback)."""
    if d is None:
        return True
    da = max((len(p) for p in d.disallows if path.startswith(p)), default=0)
    aa = max((len(p) for p in d.allows if path.startswith(p)), default=0)
    return not (da > aa)


def obey_allows_py(parsed: ParsedRobots, user_agent: str, path: str) -> bool:
    """ObeyRobotsPolicy.allows (:34-37)."""
    return _allows_path(parsed.directives_for(user_agent), path)


def ignore_allows_py(parsed: ParsedRobots, user_agent: str, path: str) -> bool:
    """IgnoreRobotsPolicy.allows (:33-36)."""
    return True


def first_named_allows_py(
    parsed: ParsedRobots, user_agent: str, path: str,
    candidates: Sequence[str] = (), should_masquerade: bool = True,
) -> Tuple[bool, Optional[str]]:
    """FirstNamedRobotsPolicy.allows (:60-78): returns (allowed,
    masquerade user-agent or None)."""
    d = parsed.directives_for(user_agent, use_fallbacks=False)
    if d is not None:
        return _allows_path(d, path), None
    for cand in candidates:
        d = parsed.directives_for(cand, use_fallbacks=False)
        if d is not None:
            return (_allows_path(d, path),
                    cand if should_masquerade else None)
    return _allows_path(parsed.directives_for(user_agent), path), None


def most_favored_allows_py(
    parsed: ParsedRobots, user_agent: str, path: str,
    candidates: Sequence[str] = (), should_masquerade: bool = True,
) -> Tuple[bool, Optional[str]]:
    """MostFavoredRobotsPolicy.allows (:61-75)."""
    if _allows_path(parsed.directives_for(user_agent), path):
        return True, None
    for cand in candidates:
        if _allows_path(parsed.directives_for(cand), path):
            return True, cand if should_masquerade else None
    return False, None


def custom_allows_py(custom_parsed: ParsedRobots, user_agent: str,
                     path: str) -> bool:
    """CustomRobotsPolicy.allows (:54-56): the operator-supplied body
    decides, the server's is ignored."""
    return _allows_path(custom_parsed.directives_for(user_agent), path)


def obeys_meta_nofollow(policy: str) -> bool:
    """obeyMetaRobotsNofollow per policy (Obey/FirstNamed/MostFavored/
    Custom default true, Ignore false)."""
    return policy != "ignore"


def policy_group_rows(
    bodies: dict, user_agent: str, candidates: Sequence[str]
) -> List[dict]:
    """{class_key: robots_body} -> dimension rows for the policy fold:
    ``groups`` holds the *named-group-only* lookup per agent in
    try-order [user_agent, candidate...], ``wc_allows``/``wc_disallows``
    the wildcard fallback. Parsed once driver-side (the robots table is
    per-host, tiny next to the frontier) and broadcast."""
    from heritrix_spark.functions.robots_parse import parse_robots

    rows = []
    for class_key, body in bodies.items():
        parsed = parse_robots(body)
        groups = []
        for agent in [user_agent, *candidates]:
            d = parsed.directives_for(agent, use_fallbacks=False)
            groups.append({
                "agent": agent,
                "named": d is not None,
                "allows": list(d.allows) if d else None,
                "disallows": list(d.disallows) if d else None,
            })
        wc = parsed.wildcard
        rows.append({
            "class_key": class_key,
            "groups": groups,
            "wc_allows": list(wc.allows) if wc else None,
            "wc_disallows": list(wc.disallows) if wc else None,
        })
    return rows


# ---------------------------------------------------------------- Columns

def first_named_allows_col(groups: Column, wc_allows: Column,
                           wc_disallows: Column, path: Column) -> Column:
    """FirstNamedRobotsPolicy decision as a Column: the first named
    group in try-order decides; no named group -> the primary UA's
    fallback lookup, i.e. the wildcard law."""
    named = F.filter(groups, lambda g: g["named"])
    first = F.element_at(named, 1)
    return F.when(
        F.size(named) > 0,
        robots_allows_col(first["allows"], first["disallows"], path),
    ).otherwise(robots_allows_col(wc_allows, wc_disallows, path))


def first_named_masquerade_col(groups: Column) -> Column:
    """The adopted candidate UA (null when the primary UA's own group
    matched, or when no candidate matched)."""
    primary_named = F.element_at(groups, 1)["named"]
    cand_named = F.filter(
        F.slice(groups, 2, 1 << 20), lambda g: g["named"])
    return F.when(
        (~primary_named) & (F.size(cand_named) > 0),
        F.element_at(cand_named, 1)["agent"],
    )


def _fallback_allowed(g, wc_allows: Column, wc_disallows: Column,
                      path: Column) -> Column:
    return F.when(
        g["named"], robots_allows_col(g["allows"], g["disallows"], path)
    ).otherwise(robots_allows_col(wc_allows, wc_disallows, path))


def most_favored_allows_col(groups: Column, wc_allows: Column,
                            wc_disallows: Column, path: Column) -> Column:
    """MostFavoredRobotsPolicy decision: ANY agent (each with normal
    wildcard fallback) allowing the path allows the fetch."""
    return F.exists(
        groups, lambda g: _fallback_allowed(g, wc_allows, wc_disallows, path)
    )


def most_favored_masquerade_col(groups: Column, wc_allows: Column,
                                wc_disallows: Column, path: Column) -> Column:
    """First allowing candidate UA, only when the primary UA was
    refused (MostFavoredRobotsPolicy.java:62-71)."""
    primary_ok = _fallback_allowed(
        F.element_at(groups, 1), wc_allows, wc_disallows, path)
    cand_ok = F.filter(
        F.slice(groups, 2, 1 << 20),
        lambda g: _fallback_allowed(g, wc_allows, wc_disallows, path),
    )
    return F.when(
        (~primary_ok) & (F.size(cand_ok) > 0),
        F.element_at(cand_ok, 1)["agent"],
    )
