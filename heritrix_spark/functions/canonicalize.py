"""URL canonicalization — Heritrix's default rule chain as data.

Reference semantics (NOT code): the default canonicalization policy
applies, in order (RulesCanonicalizationPolicy.getDefaultRules,
heritrix3/modules/.../canonicalize/RulesCanonicalizationPolicy.java:89-97):

  1. LowercaseRule            — whole-URL lowercase
  2. StripUserinfoRule        — drop ``user:pass@`` on http/https/ftp/ftps
                                (StripUserinfoRule.java:41-43)
  3. StripWWWNRule            — drop ``www[0-9]*.`` host prefix, only when a
                                non-empty path/query follows
                                (StripWWWNRule.java REGEX)
  4. StripSessionIDs          — jsessionid/phpsessid/sid = 32 alnum,
                                ASPSESSIONIDxxxxxxxx = 24 alpha
                                (StripSessionIDs.java BASE/SID/ASPSESSION)
  5. StripSessionCFIDs        — ``CFID=..&CFTOKEN=..[&jsession=..]``
                                (StripSessionCFIDs.java REGEX)
  6. FixupQueryString         — strip trailing ``?``/``?&``, redundant ``&``
                                right after ``?``, lone trailing ``&``
                                (FixupQueryString.java canonicalize — a
                                single if/elseif branch; our four patterns
                                are mutually exclusive to preserve the
                                one-branch behavior)

Each rule is "match whole string, keep group1+group2" — exactly the
shape of ``regexp_replace`` with an anchored pattern. We define the
rule table once and render it three ways:

- :func:`canonicalize_col`  — chained native ``F.regexp_replace`` Column
  expressions (JVM-side, whole-stage-codegen; no Python on the hot path),
- :func:`canonicalize_py`   — plain-Python twin for the oracle simulator,
- :func:`canonicalize_sql`  — DuckDB SQL twin for the driver's
  correctness gate.

Patterns are restricted to the Java-regex ∩ RE2 ∩ Python-re subset
(no backrefs-in-pattern, no lookaround), so all three backends agree.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class StripRule:
    name: str
    pattern: str  # anchored; groups 1(+2) are kept
    groups: int  # 1 or 2
    # Cheap necessary conditions for the pattern to match (evaluated on the
    # already-lowercased string). The Column backend only runs the regex
    # engine when they hold — pure pruning, never a semantic change: every
    # guard substring literally appears in any string the pattern accepts.
    guard_contains: str | None = None
    guard_endswith: str | None = None


# NOTE: rules run after LowercaseRule, but keep (?i) + full char classes so
# each rule is also correct standalone (Heritrix rules are independently
# configurable).
CANON_RULES: tuple[StripRule, ...] = (
    StripRule(
        "strip_userinfo",
        r"(?i)^((?:(?:https?)|(?:ftps?))://)(?:[^/]+@)(.*)$",
        2,
        guard_contains="@",
    ),
    StripRule(
        "strip_wwwn",
        r"(?i)^(https?://)(?:www[0-9]*\.)([^/]*/.+)$",
        2,
        guard_contains="://www",
    ),
    StripRule(
        "strip_sess_base",
        r"(?i)^(.+)(?:(?:jsessionid)|(?:phpsessid))=[0-9a-zA-Z]{32}(?:&(.*))?$",
        2,
        guard_contains="sess",
    ),
    StripRule(
        "strip_sess_sid",
        r"(?i)^(.+)sid=[0-9a-zA-Z]{32}(?:&(.*))?$",
        2,
        guard_contains="sid=",
    ),
    StripRule(
        "strip_aspsession",
        r"(?i)^(.+)aspsessionid[a-zA-Z]{8}=[a-zA-Z]{24}(?:&(.*))?$",
        2,
        guard_contains="aspsessionid",
    ),
    StripRule(
        "strip_cfids",
        r"(?i)^(.+)(?:cfid=[^&]+&cftoken=[^&]+(?:jsession=[^&]+)?)(?:&(.*))?$",
        2,
        guard_contains="cfid=",
    ),
    # FixupQueryString as four mutually-exclusive patterns (see module doc).
    StripRule("fixup_qmark_amp_end", r"^(.+)\?&$", 1, guard_endswith="?&"),
    StripRule("fixup_qmark_end", r"^(.+)\?$", 1, guard_endswith="?"),
    StripRule("fixup_redundant_amp", r"^(.+\?)&(.+)$", 2, guard_contains="?&"),
    StripRule("fixup_trailing_amp", r"^(.+\?[^&].*)&$", 1, guard_endswith="&"),
)


def canonicalize_expr_col(url: Column | str) -> Column:
    """canon_url as a pure Catalyst expression (lowercase + rule chain).

    Ten chained java.util.regex replaces — correct but regex-bound (each
    ``regexp_replace`` pays a full backtracking scan per row, ~10x the
    cost of the Arrow/RE2 path below). Guard-gating each rule with
    ``when(contains(...))`` is NOT viable here: the otherwise-branch
    re-references the previous step three times per rule, which makes
    the expression tree grow 3^10 and stalls Catalyst planning for
    minutes. Kept as the no-Python fallback and for plan inspection.
    """
    col = F.col(url) if isinstance(url, str) else url
    out = F.lower(col)
    for rule in CANON_RULES:
        repl = "$1$2" if rule.groups == 2 else "$1"
        out = F.regexp_replace(out, rule.pattern, repl)
    return out


def _canonicalize_arrow(arr):
    """The rule chain on a pyarrow StringArray — all vectorized C++:
    utf8_lower + RE2 ``replace_substring_regex`` (linear-time, no
    backtracking; anchored patterns match at most once). Guard
    substrings skip a rule for the whole batch when no row can match.
    """
    import pyarrow.compute as pc

    out = pc.utf8_lower(arr)
    for rule in CANON_RULES:
        if rule.guard_contains is not None:
            mask = pc.match_substring(out, rule.guard_contains)
            if not pc.any(mask).as_py():
                continue
        elif rule.guard_endswith is not None:
            mask = pc.ends_with(out, pattern=rule.guard_endswith)
            if not pc.any(mask).as_py():
                continue
        repl = r"\1\2" if rule.groups == 2 else r"\1"
        out = pc.replace_substring_regex(
            out, pattern=rule.pattern, replacement=repl
        )
    return out


_CANON_UDF = None


def canonicalize_col(url: Column | str) -> Column:
    """canon_url — vectorized Arrow UDF (the hot-path default).

    The north-star contract is explicit: URLs are canonicalized in
    vectorized pandas/Arrow UDFs with no per-row Python. Batches cross
    to the Python worker once as Arrow buffers; the entire rule chain
    runs in pyarrow.compute (RE2), so per-row work never touches the
    Python interpreter. Patterns live in the same CANON_RULES table as
    the Catalyst/Python/DuckDB backends (Java ∩ RE2 ∩ Python subset),
    so all four backends agree — pinned by tests/test_canonicalize.py.
    """
    global _CANON_UDF
    if _CANON_UDF is None:
        import pandas as pd
        import pyarrow as pa
        from pyspark.sql.functions import pandas_udf

        def _canon(s: pd.Series) -> pd.Series:
            return _canonicalize_arrow(
                pa.Array.from_pandas(s, type=pa.string())
            ).to_pandas()

        _canon.__annotations__ = {"s": pd.Series, "return": pd.Series}
        _CANON_UDF = pandas_udf(_canon, "string")
    col = F.col(url) if isinstance(url, str) else url
    return _CANON_UDF(col)


_PY_COMPILED = [(re.compile(r.pattern), r.groups) for r in CANON_RULES]


def _py_repl(groups: int):
    def repl(m: re.Match) -> str:
        parts = [m.group(1) or ""]
        if groups == 2:
            parts.append(m.group(2) or "")
        return "".join(parts)

    return repl


def canonicalize_py(url: str) -> str:
    """Plain-Python twin (used by the oracle simulator and fixtures)."""
    out = url.lower()
    for pat, groups in _PY_COMPILED:
        out = pat.sub(_py_repl(groups), out, count=1)
    return out


# ------------------------------------------------------------------
# Non-default rules (operator-configurable; not in the default chain):
# StripWWWRule, StripExtraSlashes, RegexRule
# (heritrix3/modules/.../canonicalize/StripWWWRule.java:45-53,
#  StripExtraSlashes.java:34-47, RegexRule.java)
# ------------------------------------------------------------------

# StripWWWRule: drop a lone "www." (only when a path/query follows;
# wwwN variants are left alone — that's StripWWWNRule's job)
STRIP_WWW_RULE = StripRule(
    "strip_www", r"(?i)^(https?://)(?:www\.)([^/]*/.+)$", 2
)


def apply_rule_col(url: Column, rule: StripRule) -> Column:
    """One StripRule as a Column expression (no guard; for custom chains)."""
    repl = "$1$2" if rule.groups == 2 else "$1"
    return F.regexp_replace(url, rule.pattern, repl)


def apply_rule_py(url: str, rule: StripRule) -> str:
    pat = re.compile(rule.pattern)
    return pat.sub(_py_repl(rule.groups), url, count=1)


def strip_www_col(url: Column) -> Column:
    return apply_rule_col(url, STRIP_WWW_RULE)


def strip_www_py(url: str) -> str:
    return apply_rule_py(url, STRIP_WWW_RULE)


def strip_extra_slashes_col(url: Column) -> Column:
    """StripExtraSlashes (StripExtraSlashes.java:34-47): collapse every
    run of slashes after the authority to one, http/https only. The
    reference loops its regex to a fixed point; the global replace of
    ``([^:/])/+`` → ``$1/`` reaches the same fixed point in one pass
    (the char class keeps ``://`` intact)."""
    collapsed = F.regexp_replace(url, r"([^:/])/+", r"$1/")
    return F.when(url.rlike(r"^https?://"), collapsed).otherwise(url)


def strip_extra_slashes_py(url: str) -> str:
    if not re.match(r"^https?://", url):
        return url
    return re.sub(r"([^:/])/+", r"\1/", url)


def regex_rule(name: str, pattern: str, groups: int = 1) -> StripRule:
    """RegexRule factory: operator-supplied match-and-keep-groups rule."""
    return StripRule(name, pattern, groups)


def canonicalize_custom_col(
    url: Column | str, rules: tuple[StripRule, ...], lowercase: bool = True
) -> Column:
    """Run an operator-configured ordered rule list (the reference's
    RulesCanonicalizationPolicy with a custom rule set). Linear chain —
    keep rule lists short (~dozen) or planning cost grows."""
    col = F.col(url) if isinstance(url, str) else url
    out = F.lower(col) if lowercase else col
    for rule in rules:
        out = apply_rule_col(out, rule)
    return out


def canonicalize_custom_py(
    url: str, rules: tuple[StripRule, ...], lowercase: bool = True
) -> str:
    out = url.lower() if lowercase else url
    for rule in rules:
        out = apply_rule_py(out, rule)
    return out


def canonicalize_sql(expr: str) -> str:
    """DuckDB SQL twin: renders the same chain over SQL expression `expr`."""
    out = f"lower({expr})"
    for rule in CANON_RULES:
        pat = rule.pattern.replace("'", "''")
        repl = r"\1\2" if rule.groups == 2 else r"\1"
        out = f"regexp_replace({out}, '{pat}', '{repl}')"
    return out


def rule_sql(expr: str, rule: StripRule) -> str:
    """One StripRule as DuckDB SQL (anchored → at most one match, so the
    non-global replace agrees with Spark's global regexp_replace)."""
    pat = rule.pattern.replace("'", "''")
    repl = r"\1\2" if rule.groups == 2 else r"\1"
    return f"regexp_replace({expr}, '{pat}', '{repl}')"


def strip_www_sql(expr: str) -> str:
    return rule_sql(expr, STRIP_WWW_RULE)


def strip_extra_slashes_sql(expr: str) -> str:
    """DuckDB twin of :func:`strip_extra_slashes_col` (needs the 'g'
    flag — the pattern is unanchored and Spark replaces globally)."""
    collapsed = f"regexp_replace({expr}, '([^:/])/+', '\\1/', 'g')"
    return (
        f"case when regexp_matches({expr}, '^https?://') "
        f"then {collapsed} else {expr} end"
    )
