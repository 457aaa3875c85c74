"""Public-suffix reduction of SURT authorities (full PSL).

Reference: ``PublicSuffixes.reduceSurtToAssignmentLevel``
(heritrix3/commons/.../net/PublicSuffixes.java:291-299) reduces a SURT
authority to the "assignable" level — public suffix + one label — via a
regex generated from the bundled Mozilla Public Suffix List
(effective_tld_names.dat, public data). Golden behavior pinned by
PublicSuffixesTest.java:37-95:

  reduce("uk,co,virgin,www,")           = "uk,co,virgin,"    (co.uk rule)
  reduce("jp,tokyo,public,assigned,www,") = "jp,tokyo,public,assigned,"
                                                             (*.tokyo.jp)
  reduce("jp,tokyo,metro,subdomain,")   = "jp,tokyo,metro,"  (!metro.tokyo.jp)
  reduce("zzz,example,www,")            = "zzz,example,"     (unknown-TLD fallback)
  reduce("1.2.3.4")                     = "1.2.3.4"          (no match → unchanged)

This module re-derives the same semantics from the same public list,
but relationally instead of via a generated mega-regex: the list is
compiled (data/psl_surt_rules.txt, built from the publicsuffix.org
data) into a hash table keyed by SURT prefix whose packed value
``v = exc_ps*100 + wild_ps*10 + norm_ps`` carries the public-suffix
label count each rule kind implies. Reduction is then three O(1)
lookups (PSL rules have ≤3 labels) combined by the PSL priority law —
exception rules beat everything, else the longest normal/wildcard rule,
else the unknown-TLD fallback (suffix = 1 label) — and a prefix slice
of ``ps+1`` labels. Wildcard rules (``*.tokyo.jp``) are keyed by their
parent prefix and require the starred label to exist (``n >= ps``).

Backends (all pinned equal by tests/test_psl_quota_implied.py):
- Python dict twin (oracle simulator),
- vectorized pandas/Arrow UDF for Spark — candidate-prefix extraction
  via RE2-style str ops, rule lookup via C-speed ``Series.map`` on the
  shared dict; same sanctioned Arrow shape as the SURT/canonicalize
  kernels (functions/surt.py),
- DuckDB SQL twin: the rule table as a ``psl_rules(k, v)`` VALUES CTE
  (:func:`psl_rules_cte`) probed by correlated scalar subqueries, which
  DuckDB decorrelates into hash joins — the same broadcast-join shape
  Spark would use for a JVM-only variant.

Used by AssignmentLevelSurtQueueAssignmentPolicy
(heritrix3/engine/.../frontier/AssignmentLevelSurtQueueAssignmentPolicy.java:30-40)
— queues keyed per registered domain rather than per host — and
HopCrossesAssignmentLevelDomainDecideRule (operators/scope.py).
"""

from __future__ import annotations

from importlib import resources

from pyspark.sql import Column
from pyspark.sql import functions as F

# key (SURT prefix, trailing comma) -> packed exc_ps*100 + wild_ps*10 + norm_ps
_PSL: dict[str, int] = {}


def _load() -> dict[str, int]:
    if _PSL:
        return _PSL
    # importlib.resources (not __file__+open) so the table also loads
    # when the package ships as a spark-submit --py-files zip archive
    text = (
        resources.files("heritrix_spark")
        .joinpath("data/psl_surt_rules.txt")
        .read_text()
    )
    for line in text.splitlines():
        if line.startswith("#"):
            continue
        key, e, w, n = line.split("\t")
        _PSL[key] = int(e) * 100 + int(w) * 10 + int(n)
    return _PSL


# ---------------------------------------------------------------- Python


def reduce_surt_authority_py(surt_auth: str) -> str:
    """SURT authority (e.g. 'uk,co,bbc,www,') → assignment level.

    Validity law (mirrors the anchored generated regex, including its
    backtracking to shorter rules): with ``t_k`` = "the input starts
    with k comma-terminated non-port labels",

    - an exception rule keyed on j labels is usable iff ``t_j`` (the key
      itself is the ps+1-label result) and beats everything,
    - a normal rule with ps=j needs ``t_{j+1}`` (the +1 label must be
      consumed with its comma),
    - a wildcard rule keyed on j labels (ps=j+1) needs ``t_{j+2}``,
    - the unknown-TLD fallback (ps=1) needs ``t_2``,
    - no usable rule → input returned unchanged (regex find() fails).

    Longest usable ps wins (trie descends deepest-first); if a deep rule
    can't complete its +1 label the next shorter rule applies — e.g.
    'jp,tokyo,public,' (no 4th label) reduces via 'jp,' to 'jp,tokyo,'.
    """
    rules = _load()
    labels = [x for x in surt_auth.split(",") if x and not x.startswith("#")]
    # t[k] for k=1..4; t[0] unused
    t = [False] * 5
    for k in (1, 2, 3, 4):
        if len(labels) >= k:
            t[k] = surt_auth.startswith(",".join(labels[:k]) + ",")
        if not t[k]:
            break
    v = [0] * 4  # v[j] = packed rule value at the j-label key
    for j in (1, 2, 3):
        if t[j]:
            v[j] = rules.get(",".join(labels[:j]) + ",", 0)
    exc = 0
    for j in (3, 2, 1):
        if t[j] and v[j] // 100:
            exc = v[j] // 100
            break
    if exc:
        return ",".join(labels[: exc + 1]) + ","
    best = 0
    for j in (1, 2, 3):
        if t[j + 1]:
            best = max(best, v[j] % 10)  # normal: ps=j
        if j + 2 <= 4 and t[j + 2]:
            best = max(best, (v[j] // 10) % 10)  # wildcard: ps=j+1
    if t[2]:
        best = max(best, 1)  # unknown-TLD fallback
    if best:
        return ",".join(labels[: best + 1]) + ","
    return surt_auth


# ---------------------------------------------------------------- Spark

_REDUCE_UDF = None

# candidate prefixes of 1..4 leading non-port labels (port labels start
# with '#' after the class-key ':'→'#' translation and never reduce)
_CAND_RE = [rf"^((?:[^,#][^,]*,){{{j}}})" for j in (1, 2, 3, 4)]


def _reduce_pandas(s):
    """Vectorized batch kernel: C-speed anchored str.extract + dict
    .map, no per-row Python beyond pandas' own loops. Same validity law
    as :func:`reduce_surt_authority_py` — the anchored extraction of k
    comma-terminated labels IS the ``t_k`` flag (NaN = false)."""
    import numpy as np

    rules = _load()
    # pref[k-1] = first k comma-terminated non-port labels, or NaN
    pref = [s.str.extract(_CAND_RE[k - 1], expand=False) for k in (1, 2, 3, 4)]
    t = [p.notna().to_numpy() for p in pref]  # t[k-1] = t_k
    v = [
        pref[j].map(rules).fillna(0).astype("int64").to_numpy()
        for j in range(3)
    ]
    e = [x // 100 for x in v]
    w = [(x // 10) % 10 for x in v]
    nm = [x % 10 for x in v]
    exc = np.select(
        [t[2] & (e[2] > 0), t[1] & (e[1] > 0), t[0] & (e[0] > 0)],
        [e[2], e[1], e[0]],
        0,
    )
    zero = np.zeros(len(s), dtype="int64")
    best = np.maximum.reduce(
        [
            np.where(t[1], nm[0], 0),  # normal ps=1 needs t_2
            np.where(t[2], nm[1], 0),  # normal ps=2 needs t_3
            np.where(t[3], nm[2], 0),  # normal ps=3 needs t_4
            np.where(t[2], w[0], 0),   # wildcard ps=2 needs t_3
            np.where(t[3], w[1], 0),   # wildcard ps=3 needs t_4
            np.where(t[1], 1, 0),      # unknown-TLD fallback needs t_2
            zero,
        ]
    )
    ps = np.where(exc > 0, exc, best)
    out = np.select(
        [ps == 1, ps == 2, ps == 3],
        [pref[1], pref[2], pref[3]],
        s,
    )
    res = s.copy()
    res[:] = out
    res[s.isna()] = None
    return res


def reduce_surt_authority_col(surt_auth: Column) -> Column:
    """Column backend: vectorized pandas/Arrow UDF over the shared rule
    table (the north-star-sanctioned Arrow shape for URL keying; a
    pure-JVM alternative is a broadcast join against the same table)."""
    global _REDUCE_UDF
    if _REDUCE_UDF is None:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _f(s: pd.Series) -> pd.Series:
            return _reduce_pandas(s)

        _f.__annotations__ = {"s": pd.Series, "return": pd.Series}
        _REDUCE_UDF = pandas_udf(_f, "string")
    return _REDUCE_UDF(surt_auth)


# ---------------------------------------------------------------- DuckDB SQL


def psl_rules_cte() -> str:
    """``psl_rules(k, v)`` CTE body (VALUES of the full rule table) —
    prepend to any oracle query using :func:`reduce_surt_sql`."""
    rules = _load()
    vals = ", ".join(f"('{k}',{v})" for k, v in sorted(rules.items()))
    return f"psl_rules(k, v) as (select * from (values {vals}) t(k, v))"


def reduce_surt_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`reduce_surt_authority_col`. Correlated
    scalar subqueries against the ``psl_rules`` CTE (see
    :func:`psl_rules_cte`); DuckDB decorrelates them into hash joins.
    Same ``t_k`` validity law as the Python/pandas backends."""
    labels = (
        f"list_filter(string_split({expr}, ','), "
        f"x -> x <> '' and x[1] <> '#')"
    )
    tk = (
        "len(l) >= {k} and starts_with(s, array_to_string(l[1:{k}], ',') || ',')"
    )
    return f"""
(select case when ps > 0
        then array_to_string(l[1:ps+1], ',') || ','
        else s end
 from (
  select s, l, case when e > 0 then e else b end as ps
  from (
   select s, l,
     case when t3 and v3 // 100 > 0 then v3 // 100
          when t2 and v2 // 100 > 0 then v2 // 100
          when t1 and v1 // 100 > 0 then v1 // 100
          else 0 end as e,
     greatest(
       case when t2 then v1 % 10 else 0 end,
       case when t3 then v2 % 10 else 0 end,
       case when t4 then v3 % 10 else 0 end,
       case when t3 then (v1 // 10) % 10 else 0 end,
       case when t4 then (v2 // 10) % 10 else 0 end,
       case when t2 then 1 else 0 end) as b
   from (
    select s, l, t1, t2, t3, t4,
      case when t1 then coalesce((select r.v from psl_rules r
        where r.k = array_to_string(l[1:1], ',') || ','), 0) else 0 end as v1,
      case when t2 then coalesce((select r.v from psl_rules r
        where r.k = array_to_string(l[1:2], ',') || ','), 0) else 0 end as v2,
      case when t3 then coalesce((select r.v from psl_rules r
        where r.k = array_to_string(l[1:3], ',') || ','), 0) else 0 end as v3
    from (select s, l,
                 {tk.format(k=1)} as t1, {tk.format(k=2)} as t2,
                 {tk.format(k=3)} as t3, {tk.format(k=4)} as t4
          from (select ({expr}) as s, {labels} as l) t00) t0
   ) t1
  ) t2
 ) t3)
""".strip()


# ------------------------------------------------------------ class keys


def assignment_level_class_key_col(url: Column | str) -> Column:
    """AssignmentLevelSurtQueueAssignmentPolicy: queue key = SURT
    authority reduced to public-suffix+1 (':'→'#' like the base policy)."""
    from heritrix_spark.functions.surt import class_key_col

    return reduce_surt_authority_col(class_key_col(url))


def assignment_level_class_key_py(url: str) -> str:
    from heritrix_spark.functions.surt import class_key_py

    return reduce_surt_authority_py(class_key_py(url))
