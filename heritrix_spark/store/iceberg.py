"""IcebergStore — the production backend behind the SnapStore commit
protocol, on a real Iceberg catalog.

Same public surface as :class:`heritrix_spark.store.snapstore.SnapStore`
(``manifest`` / ``write_full`` / ``write_delta`` / ``commit_round`` /
``read(as_of_round=...)`` / ``snapshots`` / ``rollback`` / ``destroy``),
so ``plans/crawl.py`` runs unchanged over either backend. Activation is
config-driven: build the session with an Iceberg catalog
(``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`` +
warehouse), then construct ``IcebergStore(namespace, spark,
catalog=<name>)``. The sandbox ships no Iceberg jar, so every test
parametrized over this backend skips unless
:func:`iceberg_available` — the protocol itself is exercised through
the SnapStore twin, which these semantics map onto 1:1:

SnapStore artifact                 → Iceberg mechanism
-----------------------------------------------------------------
MANIFEST.json replace-last         → one row appended to the
                                     ``<ns>.rounds`` coordination
                                     table; readers resolve the
                                     committed round from its MAX —
                                     a single-table Iceberg commit is
                                     atomic, so the round flips
                                     all-or-nothing exactly like the
                                     os.replace of MANIFEST.json
snapshots/r<N>.json                → the per-table Iceberg snapshot
                                     ids captured at commit time and
                                     stored IN the rounds row; as-of
                                     reads use VERSION AS OF
__delta_round=N partitions         → appends carrying a
                                     ``__delta_round`` column; the
                                     table is partitioned by it
                                     (identity transform), so the
                                     committed-rounds filter is
                                     partition pruning, as in the
                                     parquet emulation
dynamic partition overwrite        → ``overwritePartitions()`` via
  (idempotent round re-run)          DataFrameWriterV2
write_delta(reset=True) compaction → overwrite + expire_snapshots
                                     (the emulation's vacuum)
rollback(N)                        → delete rounds rows > N (their
                                     data partitions are replaced
                                     wholesale by the idempotent
                                     re-run, as in the emulation)

Reference analog as for SnapStore: BdbFrontier.doCheckpoint
(heritrix3/engine/.../frontier/BdbFrontier.java:225-273).
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heritrix_spark.store.snapstore import SnapshotExpiredError

DELTA_COL = "__delta_round"
ROUNDS_TABLE = "rounds"


def iceberg_available(spark: SparkSession, catalog: str = "hx") -> bool:
    """True iff the session has an Iceberg catalog ``catalog``
    configured AND its implementation class is loadable (i.e. the
    Iceberg runtime jar is actually on the classpath)."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl or "iceberg" not in impl.lower():
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


class IcebergStore:
    """Round-committed multi-table store over an Iceberg catalog.

    ``root`` is the table namespace (e.g. ``crawl_a``); logical tables
    live at ``<catalog>.<root>.<table>``."""

    def __init__(self, root: str, spark: SparkSession, catalog: str = "hx"):
        if not iceberg_available(spark, catalog):
            raise RuntimeError(
                f"no loadable Iceberg catalog '{catalog}' in this session "
                "(configure spark.sql.catalog.* with the Iceberg runtime "
                "jar, or use SnapStore)"
            )
        if not re.fullmatch(r"[A-Za-z0-9_]+", root):
            raise ValueError(f"namespace must be an identifier: {root!r}")
        self.root = root
        self.spark = spark
        self.catalog = catalog
        self._staged: dict[str, Any] = {}
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{root}")

    # ------------------------------------------------------------- naming

    def _tbl(self, table: str) -> str:
        return f"{self.catalog}.{self.root}.{table}"

    def _exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(table))

    # ----------------------------------------------------------- manifest

    def _rounds_df(self) -> DataFrame | None:
        if not self._exists(ROUNDS_TABLE):
            return None
        return self.spark.read.table(self._tbl(ROUNDS_TABLE))

    def manifest(self) -> dict[str, Any] | None:
        df = self._rounds_df()
        if df is None:
            return None
        row = df.orderBy(F.col("round").desc()).limit(1).collect()
        if not row:
            return None
        return json.loads(row[0]["manifest_json"])

    # ------------------------------------------------------------- writes

    def write_full(self, df: DataFrame, table: str, round_no: int) -> None:
        # full tables are round-versioned via the same delta column so
        # time travel reads the right version without snapshot-id
        # bookkeeping per write job
        out = df.withColumn(DELTA_COL, F.lit(round_no).cast("int"))
        w = out.writeTo(self._tbl(table)).partitionedBy(F.col(DELTA_COL))
        if self._exists(table):
            out.writeTo(self._tbl(table)).overwritePartitions()
        else:
            w.create()
        self._staged[table] = ("full", round_no)

    def write_delta(
        self,
        df: DataFrame,
        table: str,
        round_no: int,
        partition_by: tuple[str, ...] = (),
        reset: bool = False,
    ) -> None:
        out = df.withColumn(DELTA_COL, F.lit(round_no).cast("int"))
        if not self._exists(table):
            out.writeTo(self._tbl(table)).partitionedBy(
                F.col(DELTA_COL), *[F.col(c) for c in partition_by]
            ).create()
        elif reset:
            # compaction: the delta list collapses to this round
            out.writeTo(self._tbl(table)).overwrite(F.lit(True))
        else:
            # idempotent per-round re-run: replace THIS round's
            # partition wholesale (dynamic overwrite of touched
            # partitions; a crashed attempt's partial partition goes)
            out.writeTo(self._tbl(table)).overwritePartitions()
        mode = "delta_reset" if reset else "delta"
        self._staged[table] = (mode, round_no)

    # -------------------------------------------------------------- commit

    def commit_round(self, round_no: int, meta: dict[str, Any]) -> None:
        prev = self.manifest() or {"tables": {}}
        tables = dict(prev.get("tables", {}))
        for t, (mode, rno) in self._staged.items():
            if mode == "full":
                tables[t] = {"mode": "full", "round": rno}
            elif mode == "delta_reset":
                tables[t] = {"mode": "delta", "rounds": [rno]}
            else:
                entry = tables.get(t, {"mode": "delta", "rounds": []})
                rounds = (
                    [entry["round"]]
                    if entry.get("mode") == "full"
                    else [r for r in entry.get("rounds", []) if r < rno]
                )
                rounds.append(rno)
                tables[t] = {"mode": "delta", "rounds": rounds}
        manifest = {"round": round_no, "meta": meta, "tables": tables}
        row = self.spark.createDataFrame(
            [(round_no, json.dumps(manifest))], "round int, manifest_json string"
        )
        if not self._exists(ROUNDS_TABLE):
            row.writeTo(self._tbl(ROUNDS_TABLE)).create()
        else:
            # Normal path (fresh round): the append alone is the round's
            # single atomic commit point. A RE-committed round (crash
            # re-run) first deletes its stale row — two separate Iceberg
            # commits, so a crash in between transiently regresses the
            # visible round to round_no-1. That window is safe, not
            # atomic: resume() re-runs from the last visible round and
            # the idempotent per-round writes + this re-commit replace
            # everything the half-done attempt left. (A single
            # MERGE-on-round would close the window; kept as two ops so
            # the common fresh-round path stays a plain fast append.)
            self.spark.sql(
                f"DELETE FROM {self._tbl(ROUNDS_TABLE)} "
                f"WHERE round >= {int(round_no)}"
            )
            row.writeTo(self._tbl(ROUNDS_TABLE)).append()
        self._staged = {}

    # --------------------------------------------------------------- reads

    def read(self, table: str, as_of_round: int | None = None) -> DataFrame | None:
        if as_of_round is None:
            m = self.manifest()
        else:
            m = self._snapshot(as_of_round)
        if not m or table not in m["tables"] or not self._exists(table):
            return None
        entry = m["tables"][table]
        df = self.spark.read.table(self._tbl(table))
        if entry["mode"] == "full":
            rounds = [entry["round"]]
        else:
            rounds = list(entry.get("rounds", []))
            if not rounds:
                return None
        return df.filter(F.col(DELTA_COL).isin(rounds)).drop(DELTA_COL)

    def _snapshot(self, round_no: int) -> dict[str, Any]:
        df = self._rounds_df()
        row = (
            df.filter(F.col("round") == round_no).collect() if df is not None else []
        )
        if not row:
            raise SnapshotExpiredError(
                f"no retained snapshot for round {round_no} "
                "(never committed, expired by compaction, or dropped by rollback)"
            )
        m = json.loads(row[0]["manifest_json"])
        # a compaction vacuums superseded deltas via overwrite; detect
        # expiry the same way the parquet store's scoped rule does —
        # any referenced delta round no longer present reads as expired
        for t, entry in m["tables"].items():
            if entry.get("mode") != "delta" or not self._exists(t):
                continue
            live = {
                r[DELTA_COL]
                for r in self.spark.read.table(self._tbl(t))
                .select(DELTA_COL)
                .distinct()
                .collect()
            }
            if any(r not in live for r in entry.get("rounds", [])):
                raise SnapshotExpiredError(
                    f"round {round_no}: table {t} deltas expired by compaction"
                )
        return m

    def snapshots(self) -> list[int]:
        df = self._rounds_df()
        if df is None:
            return []
        return sorted(r["round"] for r in df.select("round").collect())

    def rollback(self, round_no: int) -> None:
        self._snapshot(round_no)  # must exist and be intact
        self.spark.sql(
            f"DELETE FROM {self._tbl(ROUNDS_TABLE)} WHERE round > {int(round_no)}"
        )
        self._staged = {}

    def destroy(self) -> None:
        for row in self.spark.sql(
            f"SHOW TABLES IN {self.catalog}.{self.root}"
        ).collect():
            self.spark.sql(
                f"DROP TABLE IF EXISTS {self.catalog}.{self.root}.{row.tableName}"
            )
        self.spark.sql(f"DROP NAMESPACE IF EXISTS {self.catalog}.{self.root}")
