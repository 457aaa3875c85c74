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
    """lines(line: string) → (tag, canon_url)."""
    return lines.select(
        F.regexp_extract("line", r"^(\S+)\s", 1).alias("tag"),
        F.regexp_extract("line", r"^\S+\s+(\S+)", 1).alias("canon_url"),
    ).filter(F.col("tag") != "")


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
