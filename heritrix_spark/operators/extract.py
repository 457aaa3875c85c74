"""Outlink extraction from interleaved text+media span documents.

The input binding (BASELINE.json input_hint / FIXTURES.md §1): docs rows
are ``(doc_id, spans: array<struct<kind, text, media_ref, offset>>)``.

Reference analog (heritrix3/modules/.../extractor/ExtractorHTML.java):
- ``kind='text'`` spans: URLs embedded in the text are NAVLINK (``L``)
  outlinks — the href path (processLink :600);
- ``kind='media'`` spans: ``media_ref`` is an EMBED (``E``) outlink —
  the src/embed path (processEmbed :628-633);
- extraction is suppressed for non-2xx/3xx fetches
  (CandidatesProcessor.innerProcess :160-163 clears outlinks of error
  pages);
- at most ``max_outlinks`` (6000, AbstractFrontier.java:138) links per
  document; the rest are discarded and counted (Link.add2,
  Link.java:156-165; CrawlURI.incrementDiscardedOutLinks :1705).

Everything is native Catalyst: ``posexplode`` over spans,
``regexp_extract_all`` for in-text URLs, higher-order ``transform`` to
tag hop types — no Python on the hot path. Link order within a document
is (span array position, position within span), which downstream feeds
the ordinal law (operators/prepare.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from heritrix_spark.functions.colcache import cached

# The URL shape recognized inside text spans. Shared with the fixture
# generator and the oracle simulator; restricted to Java ∩ RE2 ∩ Python.
URL_IN_TEXT_PATTERN = r"https?://[a-zA-Z0-9.\-]+(?::[0-9]+)?(?:/[^\s\"'<>]*)?"


# TrapSuppressExtractor (modules/.../extractor/TrapSuppressExtractor.java):
# suppress link extraction on pages *suspected of being crawler traps* —
# the page still fetches and logs, but mines no outlinks. The default
# trap signature is the pathological repeated-path-segment shape
# (PathologicalPathDecideRule's regex applied at extraction time).
TRAP_PATTERN = r"^[^?]*?/(.+?/)\1{2,}"


def extract_outlinks(
    fetched: DataFrame,
    max_outlinks: int = 6000,
    url_col: str = "url",
    ordinal_col: str = "ordinal",
    suppress_trap_pattern: str | None = None,
    meta_robots_col: str | None = None,
    carry_cols: tuple[str, ...] = (),
    max_outlinks_col: str | None = None,
) -> DataFrame:
    """fetched(url, ordinal, fetch_status, hops_path, spans, ...) →
    links(via=url, parent_ordinal, target, hop_char, link_seq).

    Adds nothing for rows whose status is outside [200, 400) or whose
    spans are null. Returns one row per surviving outlink, capped at
    ``max_outlinks`` per document in link order, plus a
    ``discarded_outlinks`` count replicated on each row of its document
    (0 when under the cap). ``suppress_trap_pattern`` (e.g.
    :data:`TRAP_PATTERN`) drops trap-suspected pages from extraction
    entirely (TrapSuppressExtractor analog).

    ``meta_robots_col`` names a per-page robots meta-tag content column;
    when given, pages whose content contains ``nofollow`` or ``none``
    (case-insensitive) mine no outlinks — ExtractorHTML's
    obeyMetaRobotsNofollow law (ExtractorHTML.java:894-906: the robots
    meta ends extraction for its page; the tag lives in <head>, so
    page-level suppression is the whole-document effect).

    ``carry_cols`` names parent-row columns replicated onto every
    outlink row — the CrawlURI "heritable data" channel
    (CrawlURI.makeHeritable: e.g. the A_SOURCE_TAG seed attribution
    flows from parent to child on link creation).

    Physical shape: the per-document outlink cap is applied INSIDE the
    document's link array (``flatten`` → ``slice(max_outlinks)``) before
    the explode, never as a ``row_number() over (partition by
    parent_ordinal)`` window. The window version shuffled and sorted
    every extracted link (one 10^7-row exchange per crawl round measured
    at the 10^7-candidate soak) just to drop the rare over-cap tail; the
    array slice is exact (link_seq order IS array order by construction)
    and keeps extraction a single pipelined map stage feeding the URL-
    prep UDF with no exchange in between.

    ``max_outlinks_col`` names a per-row (sheet-overlay) cap column —
    the KeyedProperties override of AbstractFrontier.maxOutlinks
    (AbstractFrontier.java:138); null cells fall through to the global
    ``max_outlinks``.
    """
    # The whole expression set is static given the parameters —
    # built once per crawl, reused every round (functions/colcache.py).
    X = cached(
        ("extract_outlinks", max_outlinks, url_col, ordinal_col,
         suppress_trap_pattern, carry_cols, max_outlinks_col),
        lambda: _extract_exprs(
            max_outlinks, url_col, ordinal_col, carry_cols, max_outlinks_col
        ),
    )
    eligible = fetched.filter(X["eligible"])
    if suppress_trap_pattern is not None:
        eligible = eligible.filter(~F.col(url_col).rlike(suppress_trap_pattern))
    if meta_robots_col is not None:
        mr = F.lower(F.coalesce(F.col(meta_robots_col), F.lit("")))
        eligible = eligible.filter(
            ~(mr.contains("nofollow") | mr.contains("none"))
        )

    doc_links = eligible.select(*X["doc_sel"])
    return doc_links.select(*X["exploded_sel"]).select(*X["links_sel"])


def _extract_exprs(
    max_outlinks: int,
    url_col: str,
    ordinal_col: str,
    carry_cols: tuple[str, ...] = (),
    max_outlinks_col: str | None = None,
) -> dict:
    """Static Column trees for :func:`extract_outlinks` (cache payload)."""
    eligible = (
        (F.col("fetch_status") >= 200)
        & (F.col("fetch_status") < 400)
        & F.col("spans").isNotNull()
    )
    carried = tuple(F.col(c) for c in carry_cols)
    _EMPTY = F.array().cast("array<struct<target:string,hop_char:string>>")

    def _span_links(s):
        """One span struct → array<struct<target, hop_char>> in in-span
        order (null-safe: a null text/media_ref yields an empty array,
        never a null element that would null the whole flatten)."""
        text_links = F.transform(
            F.regexp_extract_all(s["text"], F.lit(URL_IN_TEXT_PATTERN), 0),
            lambda u: F.struct(u.alias("target"), F.lit("L").alias("hop_char")),
        )
        # kind='script': URLs found in script content are SPECULATIVE
        # ('X') links (ExtractorHTML.processScript / considerStrings
        # speculative extraction; Hop.SPECULATIVE, Hop.java:41-44)
        script_links = F.transform(
            F.regexp_extract_all(s["text"], F.lit(URL_IN_TEXT_PATTERN), 0),
            lambda u: F.struct(u.alias("target"), F.lit("X").alias("hop_char")),
        )
        media_links = F.when(
            s["media_ref"].isNotNull() & (s["media_ref"] != ""),
            F.array(
                F.struct(
                    s["media_ref"].alias("target"), F.lit("E").alias("hop_char")
                )
            ),
        ).otherwise(_EMPTY)
        # kind='redirect': the span's media_ref is the Location header →
        # one 'R' outlink (ExtractorHTTP.java Location handling);
        # kind='refresh': <meta http-equiv=refresh content=";url=X"> →
        # one 'R' (REFER) outlink (ExtractorHTML.java:907-918
        # addRelativeToBase(..., Hop.REFER))
        redirect_links = F.when(
            s["media_ref"].isNotNull() & (s["media_ref"] != ""),
            F.array(
                F.struct(
                    s["media_ref"].alias("target"), F.lit("R").alias("hop_char")
                )
            ),
        ).otherwise(_EMPTY)
        return F.coalesce(
            F.when(s["kind"] == "text", text_links)
            .when(s["kind"] == "script", script_links)
            .when(s["kind"] == "redirect", redirect_links)
            .when(s["kind"] == "refresh", redirect_links)
            .otherwise(media_links),
            _EMPTY,
        )

    # doc-level link array in (span position, in-span position) order,
    # link_seq baked in; the outlink cap is an exact array slice here —
    # no exchange, no per-document window (see extract_outlinks doc)
    all_links = F.flatten(
        F.transform(
            F.col("spans"),
            lambda s, i: F.transform(
                _span_links(s),
                lambda link, j: F.struct(
                    (i.cast("long") * F.lit(1 << 20) + j.cast("long")).alias(
                        "link_seq"
                    ),
                    link["target"].alias("target"),
                    link["hop_char"].alias("hop_char"),
                ),
            ),
        )
    )
    if max_outlinks_col is not None:
        cap = F.coalesce(
            F.col(max_outlinks_col).cast("int"), F.lit(max_outlinks)
        )
    else:
        cap = F.lit(max_outlinks)
    doc_sel = (
        F.col(url_col).alias("via"),
        F.col(ordinal_col).alias("parent_ordinal"),
        F.col("hops_path").alias("via_hops_path"),
        *carried,
        F.slice(all_links, F.lit(1), cap).alias("__links"),
        F.greatest(F.size(all_links) - cap, F.lit(0))
        .cast("int")
        .alias("discarded_outlinks"),
    )
    exploded_sel = (
        F.col("via"),
        F.col("parent_ordinal"),
        F.col("via_hops_path"),
        *carried,
        F.col("discarded_outlinks"),
        F.explode("__links").alias("link"),
    )
    links_sel = (
        F.col("via"),
        F.col("parent_ordinal"),
        F.col("via_hops_path"),
        *carried,
        F.col("link.link_seq").alias("link_seq"),
        F.col("link.target").alias("target"),
        F.col("link.hop_char").alias("hop_char"),
        F.col("discarded_outlinks"),
    )
    return {
        "eligible": eligible,
        "doc_sel": doc_sel,
        "exploded_sel": exploded_sel,
        "links_sel": links_sel,
    }


def child_hops_path(parent_hops_path, hop_char):
    """pathFromSeed of a child = parent path + hop char, with the 50-char
    overflow encoding (CrawlURI.createCrawlURI :1645 + extendHopsPath :1668)."""
    from heritrix_spark.functions.hops import extend_hops_path_col

    return extend_hops_path_col(parent_hops_path, hop_char)


def implied_uris(
    links, pattern: str = r"^(https?://[^?]+/)[^/?]+\.(?:jpg|png|gif)$",
    template: str = "$1",
) -> "DataFrame":
    """ExtractorImpliedURI analog (modules/.../extractor/ExtractorImpliedURI.java):
    infer additional URIs from patterns *inside* discovered URIs — e.g.
    the directory of an image, a thumbnail's full-size variant — emitted
    with hop char 'I' (Hop.INFERRED). Pattern/template are operator
    supplied, Java-regex replacement syntax.

    Input: links(target, ...) from :func:`extract_outlinks`; output has
    the same shape with hop_char='I', link_seq bumped past the parent's
    real links (inferred URIs sort after the link they derive from,
    matching the reference's add-after behavior).
    """
    inferred = (
        links.withColumn("__implied", F.regexp_replace(F.col("target"), pattern, template))
        .filter(
            (F.col("__implied") != F.col("target"))
            & F.col("target").rlike(pattern)
        )
        .withColumn("target", F.col("__implied"))
        .withColumn("hop_char", F.lit("I"))
        .withColumn("link_seq", F.col("link_seq") + F.lit(1 << 19))
        .drop("__implied")
    )
    return inferred


def http_header_links(
    url,
    location,
    content_location,
    infer_root_page: bool = False,
):
    """ExtractorHTTP (modules/.../extractor/ExtractorHTTP.java:40-76) —
    the complete header law, not just the Location redirect: Location
    and Content-Location response headers become REFER (``R``) links
    with context ``<HeaderName>:`` (addHeaderLink :58-72), a
    ``/favicon.ico`` INFERRED (``I``) link is always added, and with
    ``inferRootPage`` the site root ``/`` too (:52-56,
    LinkContext.INFERRED_MISC). Header values resolve against the
    fetched URI. Pure Catalyst: returns
    array<struct<uri,context,hop>> (null headers drop out); the caller
    gates on fetch status > 0 and GET/POST (shouldProcess :33-39)."""
    from heritrix_spark.operators.content_extract import resolve_relative

    origin = F.regexp_extract(
        url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)

    def link(uri, context, hop):
        return F.when(
            uri.isNotNull(),
            F.struct(uri.alias("uri"), F.lit(context).alias("context"),
                     F.lit(hop).alias("hop")),
        )

    entries = [
        link(F.when(location.isNotNull(),
                    resolve_relative(url, location)), "Location:", "R"),
        link(F.when(content_location.isNotNull(),
                    resolve_relative(url, content_location)),
             "Content-Location:", "R"),
        link(F.concat(origin, F.lit("/favicon.ico")),
             "=INFERRED_MISC", "I"),
    ]
    if infer_root_page:
        entries.append(
            link(F.concat(origin, F.lit("/")), "=INFERRED_MISC", "I"))
    return F.filter(F.array(*entries), lambda e: e.isNotNull())
