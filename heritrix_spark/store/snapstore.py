"""SnapStore — snapshot-committed parquet tables with an atomic round
manifest (the sandbox stand-in for Iceberg).

The production design targets Iceberg (atomic multi-table round commit =
one snapshot per table + a round manifest committed last, readers key
off the manifest — SURVEY.md §4 "quiescing RW-locks" row; analog of
BdbFrontier.doCheckpoint, heritrix3/engine/.../frontier/BdbFrontier.java:225-273
which syncs the deferred-write BDB then writes a JSON stamp). No Iceberg
runtime jar ships in this sandbox, so SnapStore reproduces the same
commit protocol over plain parquet directories:

- ``MANIFEST.json`` is replaced last via atomic ``os.replace``,
- a reader only ever follows the manifest, so a kill at any point
  leaves the last committed round intact (orphan partitions from a
  partial round are excluded by the manifest filter and simply
  overwritten on re-run — writes are idempotent per round).

Two table modes:

- ``full``  — ``<root>/<table>/r<round>/`` holds the complete table
  (host_state, future_uris: small per-host / per-seed tables),
- ``delta`` — ONE hive-partitioned root ``<root>/<table>/`` where each
  round appends a ``__delta_round=N`` partition via dynamic partition
  overwrite (frontier, url_seen, url_seen_bloom, fetch_log, lineage:
  append-only — at 10^10 scale neither the seen set nor the frontier is
  ever rewritten per round, only appended, mirroring the reference's
  insert-only BdbUriUniqFilter B-tree and in-place BdbMultipleWorkQueues
  mutation). The committed state is the root scanned ONCE with
  ``__delta_round IN (manifest rounds)`` — a single relation whose
  partition filter prunes uncommitted/expired rounds, instead of a
  union of per-round relations whose plan (and schema-inference footer
  reads) grew linearly with the round count. Table schemas are pinned
  in a ``_SCHEMA.json`` sidecar written with the first delta, so reads
  never infer. Frontier rows carry a ``tombstone`` flag: the live view
  is ``rows LEFT ANTI JOIN tombstones ON (ordinal, delta_round)``
  (Iceberg merge-on-read positional deletes, flagged in-table so a
  round is one write job); ``write_delta(..., reset=True)`` is the
  periodic compaction (rewrite-data-files) — on commit the delta list
  collapses to the compaction round and superseded partitions are
  vacuumed (expire-snapshots).

Resume = read MANIFEST.json and continue from ``round + 1``
(bit-identical: all round inputs are functions of committed state).

Snapshot history (Iceberg time-travel / rollback analog): every commit
also records itself under ``snapshots/r<round>.json`` —
``read(table, as_of_round=N)`` reads any retained round's committed
state, and ``rollback(N)`` atomically restores the store to round N
(resume then re-crawls N+1 onward; later rounds' partitions are
replaced wholesale by the idempotent per-round writes). Compaction
expires snapshots older than the compaction round — their delta
partitions were vacuumed — exactly Iceberg's expire-snapshots bound on
how far back time travel reaches; an expired read raises
:class:`SnapshotExpiredError` rather than silently returning partial
rows.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST = "MANIFEST.json"
SNAPSHOT_DIR = "snapshots"  # per-round manifest history (time travel)
SCHEMA_SIDECAR = "_SCHEMA.json"  # leading "_": invisible to Spark's file lister
DELTA_COL = "__delta_round"  # partition column; never collides with data cols


class SnapshotExpiredError(LookupError):
    """The requested snapshot (or data it references) was expired by a
    later compaction — the Iceberg expire-snapshots boundary."""

FULL_TABLES = ("host_state", "future_uris")
DELTA_TABLES = (
    "frontier",  # rows + positional-delete tombstones (tombstone flag)
    "url_seen",
    "url_seen_bloom",
    "url_seen_cuckoo",
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
        compacted: list[tuple[str, list[int]]] = []
        for t, mode in list(self._staged.items()):
            if mode == "full":
                tables[t] = {"mode": "full", "round": round_no}
            elif mode == "delta_reset":
                tables[t] = {"mode": "delta", "rounds": [round_no]}
                compacted.append((t, [round_no]))
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
        # snapshot-history entry first (an orphan from a crash here is
        # overwritten when the round re-runs), MANIFEST last — the
        # manifest replace stays the single commit point
        snap_dir = os.path.join(self.root, SNAPSHOT_DIR)
        os.makedirs(snap_dir, exist_ok=True)
        snap_tmp = os.path.join(snap_dir, f"r{round_no:06d}.json.tmp")
        with open(snap_tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(snap_tmp, snap_tmp[: -len(".tmp")])
        tmp = os.path.join(self.root, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self.root, MANIFEST))
        self._staged = {}
        # expire-snapshots analog: superseded partitions of a compacted
        # table are dead to every future reader (the manifest no longer
        # lists them). Expiry is SCOPED to the snapshots that actually
        # reference a compacted table's vacuumed deltas — like Iceberg's
        # per-table expire-snapshots, compacting url_seen_bloom does not
        # destroy time travel for rounds committed before that table
        # first wrote (their manifests don't mention it). A snapshot
        # that does reference any vacuumed delta is expired as a WHOLE
        # (the store's invariant is "retained snapshot => every table it
        # lists is fully intact", which also keeps rollback safe).
        # ORDER MATTERS for the crash window: the expired
        # snapshot-history files are unlinked BEFORE their partitions
        # are vacuumed — a kill in between leaves orphan partitions
        # (harmless: excluded by every manifest, reclaimed by the next
        # compaction) instead of retained snapshots pointing at deleted
        # data (which would read as silently-partial history).
        # Stale future-round snapshots (possible only from a crashed
        # rollback) are likewise invalid by definition once this commit
        # makes round_no the latest — drop them too.
        cur = f"r{round_no:06d}.json"
        for name in os.listdir(snap_dir):
            if not name.endswith(".json") or name == cur:
                continue
            path = os.path.join(snap_dir, name)
            if name > cur:
                os.unlink(path)
                continue
            if compacted and self._references_vacuumed(path, compacted):
                os.unlink(path)
        for t, keep in compacted:
            self._vacuum(t, keep)

    @staticmethod
    def _references_vacuumed(
        snap_path: str, compacted: list[tuple[str, list[int]]]
    ) -> bool:
        """True iff the retained snapshot at ``snap_path`` lists, for any
        table being compacted, a delta round outside that table's kept
        set — i.e. data the accompanying vacuum is about to delete."""
        try:
            with open(snap_path) as f:
                old = json.load(f)
        except (OSError, ValueError):
            return True  # unreadable history is not retainable
        for t, keep in compacted:
            entry = old.get("tables", {}).get(t)
            if not entry or entry.get("mode") != "delta":
                continue  # absent, or full-mode (full dirs never vacuumed)
            if any(r not in keep for r in entry.get("rounds", [])):
                return True
        return False

    # -------------------------------------------------------------- tables

    def _dir(self, table: str, round_no: int) -> str:
        return os.path.join(self.root, table, f"r{round_no:06d}")

    def _delta_root(self, table: str) -> str:
        return os.path.join(self.root, table)

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
        """Append round ``round_no``'s rows as the ``__delta_round=N``
        partition of the table root (dynamic partition overwrite: a
        crashed round's partial partition is replaced wholesale on
        re-run, other rounds untouched).

        ``partition_by`` (e.g. ``("shard",)`` for url_seen) nests below
        the round partition — the plain-parquet analog of Iceberg
        ``bucket(canon_url)`` partitioning: readers joining on the
        partition column get file-level pruning, and at production scale
        the same layout enables storage-partitioned joins (no seen-side
        shuffle).

        ``reset=True`` marks this write as a compaction: on commit the
        table's delta list collapses to just this round and superseded
        partitions are vacuumed (the Iceberg rewrite-data-files /
        expire-snapshots analog). Readers before the commit still follow
        the old manifest — compaction is atomic."""
        root = self._delta_root(table)
        os.makedirs(root, exist_ok=True)
        # true per-round idempotency: a re-run round replaces its
        # partition WHOLESALE, even sub-partitions (e.g. seen shards) a
        # crashed attempt wrote but this attempt doesn't — dynamic
        # overwrite alone only replaces partitions present in new data
        stale = os.path.join(root, f"{DELTA_COL}={round_no}")
        if os.path.isdir(stale):
            shutil.rmtree(stale, ignore_errors=True)
        sidecar = os.path.join(root, SCHEMA_SIDECAR)
        if not os.path.exists(sidecar):
            tmp = sidecar + ".tmp"
            with open(tmp, "w") as f:
                f.write(df.schema.json())
            os.replace(tmp, sidecar)
        if partition_by:
            # co-locate rows with their hive partition BEFORE the write:
            # without this every writer task opens a file in every
            # partition dir (shuffle_partitions × n_shards files per
            # round — measured 4096 url_seen files/round at the 10^7
            # soak, whose read exploded into a 6000+-task wait-bound
            # stage). One shuffle on the partition key caps the table at
            # ~one file per partition value per round.
            df = df.repartition(*[F.col(c) for c in partition_by])
        (
            df.withColumn(DELTA_COL, F.lit(round_no).cast("int"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(DELTA_COL, *partition_by)
            .parquet(root)
        )
        with self._stage_lock:
            self._staged[table] = "delta_reset" if reset else "delta"

    def read(self, table: str, as_of_round: int | None = None) -> DataFrame | None:
        """Read the committed state of a table (manifest-driven).

        Delta tables come back as ONE schema-pinned relation over the
        table root with a partition filter on the committed rounds —
        plan size and read-side planning cost are O(1) in the round
        count (the lister walks only live partitions thanks to the
        commit-time vacuum).

        ``as_of_round`` time-travels: the read follows that round's
        retained snapshot manifest instead of the current one, raising
        :class:`SnapshotExpiredError` if the snapshot was expired by a
        later compaction. A *retained* snapshot's data is guaranteed
        intact: vacuum only ever runs together with the commit that
        deletes the older snapshot files, so expiry is detected at the
        snapshot file — never as silently missing partitions."""
        if as_of_round is None:
            m = self.manifest()
        else:
            m = self._snapshot(as_of_round)
        if not m or table not in m["tables"]:
            return None
        entry = m["tables"][table]
        if entry["mode"] == "full":
            return self.spark.read.parquet(self._dir(table, entry["round"]))
        root = self._delta_root(table)
        sidecar = os.path.join(root, SCHEMA_SIDECAR)
        if not os.path.exists(sidecar):
            return None
        with open(sidecar) as f:
            schema = T.StructType.fromJson(json.load(f))
        if DELTA_COL not in schema.fieldNames():
            schema = schema.add(DELTA_COL, T.IntegerType())
        rounds = list(entry.get("rounds", []))
        if not rounds:
            return None
        df = self.spark.read.schema(schema).parquet(root)
        return df.filter(F.col(DELTA_COL).isin(rounds)).drop(DELTA_COL)

    # ---------------------------------------------------- snapshot history

    def _snapshot(self, round_no: int) -> dict[str, Any]:
        path = os.path.join(self.root, SNAPSHOT_DIR, f"r{round_no:06d}.json")
        if not os.path.exists(path):
            raise SnapshotExpiredError(
                f"no retained snapshot for round {round_no} "
                "(never committed, expired by compaction, or dropped by rollback)"
            )
        with open(path) as f:
            return json.load(f)

    def snapshots(self) -> list[int]:
        """Rounds with retained (time-travelable) snapshots, ascending."""
        snap_dir = os.path.join(self.root, SNAPSHOT_DIR)
        if not os.path.isdir(snap_dir):
            return []
        return sorted(
            int(n[1:-5])
            for n in os.listdir(snap_dir)
            if n.startswith("r") and n.endswith(".json")
        )

    def rollback(self, round_no: int) -> None:
        """Atomically restore the store to round ``round_no``'s committed
        state (Iceberg rollback-to-snapshot). Later rounds' snapshot
        entries are dropped — a resumed crawl re-runs ``round_no + 1``
        onward and its idempotent per-round writes replace their
        partitions wholesale, so the dropped history would reference
        rewritten data."""
        m = self._snapshot(round_no)
        # drop the newer history BEFORE the manifest swap: a kill in
        # between loses only time-travel entries (conservative — as-of
        # reads for them raise) and a re-run completes the rollback; the
        # reverse order could leave rolled-back-round snapshots retained
        # past the swap, to be silently invalidated by later re-crawled
        # rounds' partition rewrites
        snap_dir = os.path.join(self.root, SNAPSHOT_DIR)
        for name in os.listdir(snap_dir):
            if name.endswith(".json") and name > f"r{round_no:06d}.json":
                os.unlink(os.path.join(snap_dir, name))
        tmp = os.path.join(self.root, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, os.path.join(self.root, MANIFEST))
        with self._stage_lock:
            self._staged = {}

    def _vacuum(self, table: str, keep_rounds: list[int]) -> None:
        root = self._delta_root(table)
        if not os.path.isdir(root):
            return
        keep = {f"{DELTA_COL}={r}" for r in keep_rounds}
        for name in os.listdir(root):
            if name.startswith(f"{DELTA_COL}=") and name not in keep:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
