"""Recovery-journal import/export (FrontierJournal analog).

Reference semantics (heritrix3/engine/.../frontier/FrontierJournal.java:54-116
and AbstractFrontier.importRecoverFormat :894-952): the journal is a
replayable log of tags per URI — ``F+`` added, ``Fe`` emitted, ``Fi``
included, ``Fd`` disregarded, ``Fr`` rescheduled, ``Fs`` succeeded,
``Ff`` failed. Replaying a journal can either re-*schedule* the ``F+``
URIs (full recovery) or only mark them *seen* (``includeOnly`` — the
``note`` semantics).

Our lineage table (written per round by plans/round.py) IS this journal;
the functions here re-express import/export:

- :func:`export_recover_log` — lineage → journal lines DataFrame.
- :func:`import_recover_log` — journal → (to_schedule, to_note): the
  ``F+`` set minus already-finished URIs, exactly the reference's
  "'F+' lines rescheduled unless already included" rule
  (FrontierJournal.importRecoverLog :166+).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FINISHED_TAGS = ("Fs", "Ff", "Fd")


def export_recover_log(lineage: DataFrame) -> DataFrame:
    """One journal line per lineage row: '<tag> <canon_url>'."""
    return lineage.select(
        "round",
        F.concat_ws(" ", F.col("tag"), F.col("canon_url")).alias("line"),
    ).orderBy("round", "line")


def parse_recover_log(spark, lines: DataFrame) -> DataFrame:
    """lines(line: string) → (tag, canon_url, via).

    ``via`` is the LAST word of 3+-word lines — exactly how
    RecoveryLogMapper reads F+ lines (RecoveryLogMapper.java:129-152:
    ``args[curLineNumWords - 1]``; 2-word F+ lines are seeds, via
    null)."""
    arr = F.split(F.trim(F.col("line")), r"\s+")
    return (
        lines.select(
            F.get(arr, 0).alias("tag"),
            F.get(arr, 1).alias("canon_url"),
            F.when(F.size(arr) >= 3, F.element_at(arr, -1)).alias("via"),
        )
        .filter(F.col("tag").isNotNull() & (F.col("tag") != ""))
    )


def import_recover_log(
    journal: DataFrame, include_only: bool = False
) -> tuple[DataFrame, DataFrame]:
    """journal(tag, canon_url) → (to_schedule, to_note).

    - finished URIs (Fs/Ff/Fd present) are noted as seen, never
      re-scheduled;
    - remaining F+ URIs are re-scheduled (or, with include_only, also
      just noted — the UriUniqFilter.note path).
    """
    added = journal.filter(F.col("tag") == "F+").select("canon_url").distinct()
    finished = (
        journal.filter(F.col("tag").isin(*FINISHED_TAGS))
        .select("canon_url")
        .distinct()
    )
    pending = added.join(finished, on="canon_url", how="left_anti")
    if include_only:
        empty = pending.limit(0)
        return empty, added
    return pending, finished


def recovery_log_mapper(journal: DataFrame, max_iters: int = 64) -> DataFrame:
    """RecoveryLogMapper (RecoveryLogMapper.java:120-199): attribute
    every discovered URL in a recover log to the seed whose chain of
    F+ vias reaches it, and mark which were successfully crawled.

    Laws kept:
    - 2-word ``F+ <url>`` lines are seeds (:137-147); 3+-word lines'
      LAST word is the via (:149-152);
    - ``dns:`` URIs are skipped entirely (:133-135);
    - attribution collapses transitively to the chain root (:157-173 —
      in a well-formed, causally-ordered log the sequential one-step
      map lookup equals the chain root; this set-based restatement
      assumes that ordering, which FrontierJournal guarantees);
    - a chain root that never had a 2-word seed line is the
      seed-not-found case (:174-186): attribution still records the
      root (``seed``), ``seed_found`` is false, and such URLs are
      excluded from any per-seed discovered rollup — the lenient
      constructor's behavior;
    - ``Fs`` lines mark successfullyCrawledUrls (:191-194), the
      getSeedCrawledUrls filter.

    Scale shape: pointer doubling — ``anc ← anc(anc)`` — so a depth-D
    via chain resolves in O(log D) self-joins of a (url, anc) table
    keyed and shuffled only on the join key, never a sequential driver
    walk; convergence is one tiny changed-row count per iteration
    (same protocol as pipeline/components.py).

    Returns (canon_url, seed, seed_found, crawled) for discovered
    (non-seed) URLs.
    """
    adds = (
        journal.filter(
            (F.col("tag") == "F+") & ~F.col("canon_url").startswith("dns:")
        )
        .filter(
            F.col("via").isNull() | ~F.col("via").startswith("dns:")
        )
        .select("canon_url", "via")
        .dropDuplicates(["canon_url"])
    )
    seeds = adds.filter(F.col("via").isNull()).select("canon_url")
    crawled = (
        journal.filter(F.col("tag") == "Fs").select("canon_url").distinct()
    )
    # anc starts at via; seeds are their own root and drop out of the walk
    m = (
        adds.filter(F.col("via").isNotNull())
        .select("canon_url", F.col("via").alias("anc"))
        .localCheckpoint(eager=True)
    )
    # parent map for doubling: url -> via for non-seed urls only (a seed
    # or unknown anc is a chain root and stays fixed)
    parents = m.select(
        F.col("canon_url").alias("p_url"), F.col("anc").alias("p_anc")
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        stepped = (
            m.join(parents, m["anc"] == parents["p_url"], how="left")
            .select(
                "canon_url",
                F.coalesce("p_anc", "anc").alias("anc"),
                (F.col("p_anc").isNotNull()).alias("__moved"),
            )
        ).localCheckpoint(eager=True)
        moved = stepped.filter(F.col("__moved")).limit(1).count()
        m = stepped.drop("__moved")
        if moved == 0:
            break
        # double the parent pointers too: p_anc <- parent(p_anc)
        parents = (
            parents.alias("a")
            .join(
                parents.select(
                    F.col("p_url").alias("g_url"), F.col("p_anc").alias("g_anc")
                ),
                F.col("a.p_anc") == F.col("g_url"),
                how="left",
            )
            .select(
                F.col("a.p_url").alias("p_url"),
                F.coalesce("g_anc", "a.p_anc").alias("p_anc"),
            )
            .localCheckpoint(eager=True)
        )
    found = seeds.withColumnRenamed("canon_url", "anc").withColumn(
        "__is_seed", F.lit(True)
    )
    return (
        m.join(found, on="anc", how="left")
        .join(
            crawled.withColumn("__crawled", F.lit(True)), on="canon_url", how="left"
        )
        .select(
            "canon_url",
            F.col("anc").alias("seed"),
            F.coalesce("__is_seed", F.lit(False)).alias("seed_found"),
            F.coalesce("__crawled", F.lit(False)).alias("crawled"),
        )
    )
