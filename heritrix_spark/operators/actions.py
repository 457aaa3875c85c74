"""ActionDirectory — the operator 'hot folder' protocol (reference:
heritrix3/engine/.../framework/ActionDirectory.java:186-265).

A running Heritrix crawl watches an ``action/`` directory; dropping a
file whose name ends in a known suffix triggers a frontier import with
suffix-determined flags, and the file moves to ``done/``. This module
re-expresses the two laws Spark-side:

- :func:`action_passes` — the suffix-routing table (``actOn``
  :205-258): which import passes a filename triggers, with which
  (acceptTags, includeOnly, forceFetch, alsoScope) flags. The ``.gz``
  wrapper is stripped first (:208-210); the secondary ``.s.`` infix
  means "also apply scope".
- :func:`import_recover_format` — the line law of
  ``AbstractFrontier.importRecoverFormat`` (:894-952): lines shorter
  than 4 chars skipped, the FIRST THREE characters (tag + space) must
  full-match the acceptTags regex, the remainder parses as
  ``<uri> <hopsPath> <via>`` per ``CrawlURI.fromHopsViaString``
  (CrawlURI.java:288-301 — via shorter than 2 chars is null), optional
  scope filter, then either note (considerIncluded) or schedule with
  the forceFetch flag.
- :func:`seeds_action_lines` — ``TextSeedModule.announceSeedsFromReader``
  (:140-161) + ``seedLine`` (:169-174): first nonwhitespace token of
  each line, comment/garbage lines whose first char is not
  letter-or-digit dropped, scheme-less entries prefixed ``http://``.
- :func:`act_on_lines` — the full router: filename + the file's lines
  as a DataFrame → one normalized op table
  ``(op, canon_url, hops_path, via, force_fetch)`` with op ``seed`` /
  ``note`` / ``schedule`` — the union a crawl round ingests (seeds →
  schedule_seeds, note → url_seen append, schedule → candidate union,
  force_fetch → the addForce bypass).

Everything is pure Catalyst column work over ``spark.read.text`` lines
— an action file of any size imports as one distributed scan, never a
driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: TextSeedModule.seedLine :170 — RFC2396 scheme test (2+ char scheme,
#: no dots); scheme-less seed lines get http://
_SEED_SCHEME_RE = r"^[a-zA-Z][\w+\-]+:"


def action_passes(filename: str) -> list[dict] | None:
    """The actOn suffix-routing table (ActionDirectory.java:205-258).
    Returns the ordered import passes for an action filename, or None
    when the file is not an action file (the reference then tries it as
    a script, else warns and ignores). Each pass dict carries the
    importRecoverFormat flags; a ``{"op": "seeds"}`` pass routes to the
    seed-line law instead."""
    core = filename[:-3] if filename.endswith(".gz") else filename
    if core.endswith(".seeds"):
        return [{"op": "seeds"}]
    if core.endswith(".recover"):
        s = core.endswith(".s.recover")
        # consider-included all successes and explicit includes, THEN
        # retry all adds — two passes, this exact order (:224-229)
        return [
            dict(op="import", accept_tags=r"F[si] ", include_only=True,
                 force_fetch=False, apply_scope=s),
            dict(op="import", accept_tags=r"F\+ ", include_only=False,
                 force_fetch=False, apply_scope=s),
        ]
    if core.endswith(".include"):
        return [dict(op="import", accept_tags=r".*", include_only=True,
                     force_fetch=False,
                     apply_scope=core.endswith(".s.include"))]
    if core.endswith(".schedule"):
        return [dict(op="import", accept_tags=r".*", include_only=False,
                     force_fetch=False,
                     apply_scope=core.endswith(".s.schedule"))]
    if core.endswith(".force"):
        return [dict(op="import", accept_tags=r".*", include_only=False,
                     force_fetch=True,
                     apply_scope=core.endswith(".s.force"))]
    return None


def import_recover_format(
    lines: DataFrame,
    accept_tags: str,
    include_only: bool = False,
    force_fetch: bool = False,
    scope_predicate=None,
) -> DataFrame:
    """One importRecoverFormat pass (AbstractFrontier.java:894-952) over
    ``lines(line: string)`` → ``(op, canon_url, hops_path, via,
    force_fetch)``.

    ``scope_predicate``, when given, is a callable
    ``(url_col, hops_col) -> BooleanColumn`` applied only when the
    caller's pass asked for scope (the applyScope arm :915-927);
    pass None to skip scoping."""
    kept = lines.filter(F.length("line") >= 4).filter(
        # Matcher.matches() on substring(0,3) = anchored full match
        F.substring("line", 1, 3).rlike(f"^(?:{accept_tags})$")
    )
    rest = F.split(F.trim(F.substring("line", 4, 1 << 30)), r"\s+")
    parsed = kept.select(
        F.get(rest, 0).alias("canon_url"),
        F.coalesce(F.get(rest, 1), F.lit("")).alias("hops_path"),
        # fromHopsViaString :294-296: a via of length <= 1 is null
        F.when(F.length(F.get(rest, 2)) > 1, F.get(rest, 2)).alias("via"),
    ).filter(F.col("canon_url").isNotNull() & (F.col("canon_url") != ""))
    if scope_predicate is not None:
        parsed = parsed.filter(
            scope_predicate(F.col("canon_url"), F.col("hops_path"))
        )
    op = "note" if include_only else "schedule"
    # forceFetch is ignored when includeOnly is set (:888 javadoc, :929)
    force = force_fetch and not include_only
    return parsed.select(
        F.lit(op).alias("op"),
        "canon_url",
        "hops_path",
        "via",
        F.lit(force).alias("force_fetch"),
    )


def seeds_action_lines(lines: DataFrame) -> DataFrame:
    """TextSeedModule seed-batch law (:140-161, :169-174): first
    nonwhitespace token per line, lines opening with a non-letter/digit
    (comments, directives) dropped, scheme-less tokens prefixed
    ``http://``. Same output shape as an import pass, op ``seed``."""
    tok = F.regexp_extract(F.trim(F.col("line")), r"^(\S+)", 1)
    seeds = (
        lines.select(tok.alias("u"))
        .filter(F.col("u").rlike(r"^[a-zA-Z0-9]"))
        .select(
            F.when(
                F.col("u").rlike(_SEED_SCHEME_RE), F.col("u")
            ).otherwise(F.concat(F.lit("http://"), F.col("u"))).alias(
                "canon_url"
            )
        )
    )
    return seeds.select(
        F.lit("seed").alias("op"),
        "canon_url",
        F.lit("").alias("hops_path"),
        F.lit(None).cast("string").alias("via"),
        F.lit(False).alias("force_fetch"),
    )


def act_on_lines(
    filename: str, lines: DataFrame, scope_predicate=None
) -> DataFrame | None:
    """Route one action file through its passes and union the results
    (None for a non-action filename — the tryAsScript/ignored arm)."""
    passes = action_passes(filename)
    if passes is None:
        return None
    outs = []
    for p in passes:
        if p["op"] == "seeds":
            outs.append(seeds_action_lines(lines))
        else:
            outs.append(
                import_recover_format(
                    lines,
                    p["accept_tags"],
                    include_only=p["include_only"],
                    force_fetch=p["force_fetch"],
                    scope_predicate=(
                        scope_predicate if p["apply_scope"] else None
                    ),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
