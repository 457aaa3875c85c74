"""Public-suffix reduction of SURT authorities (PSL-lite).

Reference: ``PublicSuffixes.reduceSurtToAssignmentLevel``
(heritrix3/commons/.../net/PublicSuffixes.java:291-299) reduces a SURT
authority to the "assignable" level — public suffix + one label — via a
regex generated from the full Mozilla Public Suffix List. Shipping the
whole PSL is out of scope here; this PSL-lite embeds the multi-label
suffixes that matter for tests plus the single-label TLD fallback, with
identical reduction semantics:

  reduce("uk,co,bbc,www,")  = "uk,co,bbc,"   (co.uk is a public suffix)
  reduce("org,archive,www,") = "org,archive,"
  reduce("com,example,")     = "com,example,"

Used by AssignmentLevelSurtQueueAssignmentPolicy
(heritrix3/engine/.../frontier/AssignmentLevelSurtQueueAssignmentPolicy.java:30-40)
— queues keyed per registered domain rather than per host.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# multi-label public suffixes in SURT (reversed) comma form, longest first
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "uk,co,",
    "uk,org,",
    "uk,ac,",
    "uk,gov,",
    "au,com,",
    "au,org,",
    "au,net,",
    "jp,co,",
    "jp,or,",
    "jp,ne,",
    "br,com,",
    "nz,co,",
    "in,co,",
    "za,co,",
)


def reduce_surt_authority_py(surt_auth: str) -> str:
    """SURT authority (e.g. 'uk,co,bbc,www,') → assignment level."""
    labels = [x for x in surt_auth.split(",") if x != ""]
    port = ""
    if labels and labels[-1].startswith("#"):
        port = labels.pop()
    for suffix in MULTI_LABEL_SUFFIXES:
        if surt_auth.startswith(suffix):
            n = suffix.count(",") + 1  # suffix labels + one assignable
            if len(labels) >= n:
                return ",".join(labels[:n]) + ","
            return surt_auth
    # single-label TLD fallback: tld + 1
    if len(labels) >= 2:
        return ",".join(labels[:2]) + ","
    return surt_auth


def reduce_surt_authority_col(surt_auth: Column) -> Column:
    """Column twin of :func:`reduce_surt_authority_py` (no UDF)."""
    labels = F.filter(F.split(surt_auth, ","), lambda x: x != "")
    out = None
    for suffix in MULTI_LABEL_SUFFIXES:
        n = suffix.count(",") + 1
        take = F.concat(
            F.array_join(F.slice(labels, 1, n), ","), F.lit(",")
        )
        cond = surt_auth.startswith(suffix) & (F.size(labels) >= n)
        out = F.when(cond, take) if out is None else out.when(cond, take)
    tld1 = F.concat(F.array_join(F.slice(labels, 1, 2), ","), F.lit(","))
    out = out.when(F.size(labels) >= 2, tld1).otherwise(surt_auth)
    return out


def reduce_surt_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`reduce_surt_authority_col` (same
    suffix table, same fallback), for driver-gate oracles."""
    labels = (
        f"list_filter(string_split({expr}, ','), x -> x <> '')"
    )
    cases = []
    for suffix in MULTI_LABEL_SUFFIXES:
        n = suffix.count(",") + 1
        cases.append(
            f"when starts_with({expr}, '{suffix}') and len({labels}) >= {n} "
            f"then array_to_string({labels}[1:{n}], ',') || ','"
        )
    cases.append(
        f"when len({labels}) >= 2 "
        f"then array_to_string({labels}[1:2], ',') || ','"
    )
    return "case " + " ".join(cases) + f" else {expr} end"


def assignment_level_class_key_col(url: Column | str) -> Column:
    """AssignmentLevelSurtQueueAssignmentPolicy: queue key = SURT
    authority reduced to public-suffix+1 (':'→'#' like the base policy)."""
    from heritrix_spark.functions.surt import class_key_col

    return reduce_surt_authority_col(class_key_col(url))


def assignment_level_class_key_py(url: str) -> str:
    from heritrix_spark.functions.surt import class_key_py

    return reduce_surt_authority_py(class_key_py(url))
