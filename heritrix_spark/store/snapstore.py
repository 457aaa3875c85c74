"""SnapStore — snapshot-committed parquet tables with an atomic round
manifest (the sandbox stand-in for Iceberg).

The production design targets Iceberg (atomic multi-table round commit =
one snapshot per table + a round manifest committed last, readers key
off the manifest — SURVEY.md §4 "quiescing RW-locks" row; analog of
BdbFrontier.doCheckpoint, heritrix3/engine/.../frontier/BdbFrontier.java:225-273
which syncs the deferred-write BDB then writes a JSON stamp). No Iceberg
runtime jar ships in this sandbox, so SnapStore reproduces the same
commit protocol over plain parquet directories:

- every table version is written to ``<root>/<table>/r<round>/`` first,
- ``MANIFEST.json`` is replaced last via atomic ``os.replace``,
- a reader only ever follows the manifest, so a kill at any point
  leaves the last committed round intact (orphan dirs from a partial
  round are simply overwritten on re-run — writes are idempotent per
  round).

Two table modes:
- ``full``  — the round's directory holds the complete table
  (host_state, future_uris: small per-host / per-seed tables),
- ``delta`` — the table is the union of all committed rounds'
  directories (frontier, url_seen, url_seen_bloom, fetch_log, lineage:
  append-only — at 10^10 scale neither the seen set nor the frontier
  is ever rewritten per round, only appended, mirroring the
  reference's insert-only BdbUriUniqFilter B-tree and in-place
  BdbMultipleWorkQueues mutation). Frontier rows carry a ``tombstone``
  flag: the live view is ``rows LEFT ANTI JOIN tombstones ON (ordinal,
  delta_round)`` (Iceberg merge-on-read positional deletes, flagged
  in-table so a round is one write job); ``write_delta(...,
  reset=True)`` is the periodic compaction (rewrite-data-files).

Resume = read MANIFEST.json and continue from ``round + 1``
(bit-identical: all round inputs are functions of committed state).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "MANIFEST.json"

FULL_TABLES = ("host_state", "future_uris")
DELTA_TABLES = (
    "frontier",  # rows + positional-delete tombstones (tombstone flag)
    "url_seen",
    "url_seen_bloom",
    "fetch_log",
    "lineage",
)
# per-round metrics live in the manifest meta ("metrics_log"), the
# snapshot-summary analog — a 1-row parquet job per round costs more
# scheduling than the data


class SnapStore:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        self._staged: dict[str, str] = {}
        # table writes may run concurrently (crawl loop parallelizes a
        # round's independent write jobs); staging updates are the only
        # shared mutable state
        self._stage_lock = threading.Lock()
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def manifest(self) -> dict[str, Any] | None:
        path = os.path.join(self.root, MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def commit_round(self, round_no: int, meta: dict[str, Any]) -> None:
        """Atomically publish round ``round_no``. Must be called after all
        table writes for the round have finished."""
        prev = self.manifest() or {"tables": {}}
        tables = dict(prev.get("tables", {}))
        for t, mode in list(self._staged.items()):
            if mode == "full":
                tables[t] = {"mode": "full", "round": round_no}
            elif mode == "delta_reset":
                tables[t] = {"mode": "delta", "rounds": [round_no]}
            else:
                entry = tables.get(t, {"mode": "delta", "rounds": []})
                if entry.get("mode") == "full":
                    # delta on top of a full snapshot: the snapshot round
                    # becomes the base delta (a compacted table IS its
                    # only delta)
                    rounds = [entry["round"]]
                else:
                    rounds = [r for r in entry.get("rounds", []) if r < round_no]
                rounds.append(round_no)
                tables[t] = {"mode": "delta", "rounds": rounds}
        manifest = {"round": round_no, "meta": meta, "tables": tables}
        tmp = os.path.join(self.root, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self.root, MANIFEST))
        self._staged = {}

    # -------------------------------------------------------------- tables

    def _dir(self, table: str, round_no: int) -> str:
        return os.path.join(self.root, table, f"r{round_no:06d}")

    def write_full(self, df: DataFrame, table: str, round_no: int) -> None:
        path = self._dir(table, round_no)
        df.write.mode("overwrite").parquet(path)
        with self._stage_lock:
            self._staged[table] = "full"

    def write_delta(
        self,
        df: DataFrame,
        table: str,
        round_no: int,
        partition_by: tuple[str, ...] = (),
        reset: bool = False,
    ) -> None:
        """``partition_by`` (e.g. ``("shard",)`` for url_seen) is the
        plain-parquet analog of Iceberg ``bucket(canon_url)`` partitioning:
        readers joining on the partition column get file-level pruning,
        and at production scale the same layout enables storage-partitioned
        joins (no seen-side shuffle).

        ``reset=True`` marks this write as a compaction: on commit the
        table's delta list collapses to just this round (the Iceberg
        rewrite-data-files / expire-snapshots analog). Readers before the
        commit still follow the old manifest — compaction is atomic."""
        path = self._dir(table, round_no)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        with self._stage_lock:
            self._staged[table] = "delta_reset" if reset else "delta"

    def read(self, table: str) -> DataFrame | None:
        """Read the committed state of a table (manifest-driven)."""
        m = self.manifest()
        if not m or table not in m["tables"]:
            return None
        entry = m["tables"][table]
        if entry["mode"] == "full":
            return self.spark.read.parquet(self._dir(table, entry["round"]))
        paths = [self._dir(table, r) for r in entry["rounds"]]
        # one read per delta dir, unioned: partitioned deltas (url_seen)
        # are each their own partition-discovery root, so a single
        # multi-path scan would refuse mixed roots (KD009). Dirs with no
        # data files (a round that scheduled nothing novel writes an
        # empty partitioned delta) are skipped — they carry no rows and
        # would fail schema inference. Iceberg subsumes all of this with
        # real snapshot/manifest reads at scale.
        paths = [p for p in paths if self._has_data_files(p)]
        if not paths:
            return None
        dfs = [self.spark.read.parquet(p) for p in paths]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    @staticmethod
    def _has_data_files(path: str) -> bool:
        for _, _, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
