"""Snapshot-table layer: an Iceberg-model table format over parquet —
ordered snapshots of immutable data files, time travel, rollback and
snapshot expiry — for the engine's own state (checkpoint metrics,
lineage, standing sketch tables) and any append-mostly corpus.

The north rule runs the engine "over Iceberg tables ... with
per-partition lineage and metrics persisted to Iceberg". This container
has no Iceberg runtime jar, so the MODEL is implemented from its public
spec shape (Apache Iceberg spec: table state = a chain of snapshots,
each listing immutable data files via manifests; readers pin a
snapshot; writers commit a new manifest and atomically swing the
current pointer): in production the same call sites bind to a real
catalog via `spark.table` / `DataFrameWriterV2` — that binding now
exists as `sources/iceberg_catalog.IcebergTable` (r5): the same API
over a genuine Iceberg catalog, activating wherever the
iceberg-spark-runtime jar is registered (skip-marked integration
tests; loud actionable error here, the lz4/zstd/PIL pattern). What
this layer keeps identical to production semantics:

  - **Immutable data files.** A commit never rewrites an existing file;
    `append` commits parent files + new files, `overwrite` commits new
    files only. Readers of old snapshots are never invalidated.
  - **Atomic current pointer.** `CURRENT` is swung by os.replace (POSIX
    atomic rename) after the manifest is fully written — a crashed
    writer leaves the table at its previous snapshot, never half-moved
    (single-writer; catalog CAS in production).
  - **Time travel / rollback.** `read(snapshot_id=...)` pins any
    retained snapshot; `rollback(id)` commits a new snapshot whose file
    list is the old one's (history is append-only — a rollback is
    itself a snapshot, as in Iceberg).
  - **Expiry.** `expire(keep_last=n)` drops old manifests and deletes
    data files no retained snapshot references.

Scale note: the manifest holds relative FILE paths, not row data —
reading is `spark.read.parquet(*files)`, so plans keep pushdown /
column pruning / split generation exactly as for any parquet scan, and
a snapshot of a 10^12-row table is a few KB of JSON. Row counts come
from parquet footers (a metadata-only count job), never a data scan.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SnapshotTable:
    """`stats_cols` opts into per-file min/max column stats in the
    manifest (the Iceberg manifest-stats model): each commit records,
    for every data file it adds, the min and max of those columns —
    one extra metadata-scale agg job per commit. `read(where=...)`
    then prunes whole FILES from the scan when their [min, max] range
    cannot match, before Spark even opens a footer — the
    manifest-level half of predicate pushdown (row-group pruning
    inside surviving files still applies on top)."""

    root: str
    stats_cols: list[str] | None = None

    # --- layout ----------------------------------------------------------
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "manifests")

    def _manifest(self, sid: int) -> str:
        return os.path.join(self._manifest_dir(), f"snap-{sid:08d}.json")

    def _current_file(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def _data_dir(self, sid: int) -> str:
        return os.path.join(self.root, "data", f"snap-{sid:08d}")

    # --- state -----------------------------------------------------------
    def current_id(self) -> int | None:
        try:
            with open(self._current_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def snapshot_ids(self) -> list[int]:
        out = []
        for p in sorted(glob.glob(os.path.join(self._manifest_dir(), "snap-*.json"))):
            out.append(int(os.path.basename(p)[len("snap-"):-len(".json")]))
        return out

    def manifest(self, sid: int | None = None) -> dict:
        sid = self.current_id() if sid is None else sid
        if sid is None:
            raise ValueError(f"snapshot table at {self.root} has no snapshots")
        try:
            with open(self._manifest(sid)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot {sid} not found (expired or never committed)"
            ) from None

    def history(self) -> list[dict]:
        return [self.manifest(s) for s in self.snapshot_ids()]

    # --- commits ---------------------------------------------------------
    def _commit(
        self,
        spark: SparkSession,
        df: DataFrame | None,
        op: str,
        inherit_files: list[str],
        extra: dict | None = None,
    ) -> int:
        os.makedirs(self._manifest_dir(), exist_ok=True)
        parent = self.current_id()
        sid = (parent or 0) + 1
        new_files: list[str] = []
        added_rows = 0
        if df is not None:
            ddir = self._data_dir(sid)
            df.write.mode("overwrite").parquet(ddir)
            new_files = sorted(
                os.path.relpath(p, self.root)
                for p in glob.glob(os.path.join(ddir, "*.parquet"))
            )
            # footer-stats count: metadata-only, no data scan
            added_rows = (
                spark.read.parquet(ddir).count() if new_files else 0
            )
        file_stats: dict = {}
        if df is not None and new_files and self.stats_cols:
            from pyspark.sql import functions as F

            cols = [c for c in self.stats_cols if c in df.columns]
            if cols:
                aggs = []
                for c in cols:
                    aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
                rows = (
                    spark.read.parquet(self._data_dir(sid))
                    .groupBy(F.input_file_name().alias("_f"))
                    .agg(*aggs)
                    .collect()
                )
                for r in rows:
                    rel = os.path.relpath(
                        r["_f"].removeprefix("file://"), self.root
                    )
                    file_stats[rel] = {
                        c: [r[f"mn_{c}"], r[f"mx_{c}"]] for c in cols
                    }
        files = inherit_files + new_files
        inherited_stats = (
            self.manifest(parent).get("file_stats", {}) if parent else {}
        )
        file_stats = {**{
            f: s for f, s in inherited_stats.items() if f in set(files)
        }, **file_stats}
        man = {
            "snapshot_id": sid,
            "parent_id": parent,
            "operation": op,
            "files": files,
            "added_files": len(new_files),
            "added_rows": added_rows,
            "total_files": len(files),
            "schema": json.loads(df.schema.json()) if df is not None else (
                self.manifest(parent)["schema"] if parent else None
            ),
            "file_stats": file_stats,
        }
        if extra:
            man.update(extra)
        tmp = self._manifest(sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest(sid))
        ctmp = self._current_file() + ".tmp"
        with open(ctmp, "w") as f:
            f.write(str(sid))
        os.replace(ctmp, self._current_file())
        return sid

    def append(self, spark: SparkSession, df: DataFrame, **extra) -> int:
        """Commit a new snapshot = parent's files + df's files."""
        parent = self.current_id()
        inherit = self.manifest(parent)["files"] if parent else []
        return self._commit(spark, df, "append", inherit, extra or None)

    def overwrite(self, spark: SparkSession, df: DataFrame, **extra) -> int:
        """Commit a new snapshot holding ONLY df's files (old snapshots
        stay readable until expired)."""
        return self._commit(spark, df, "overwrite", [], extra or None)

    def rollback(self, spark: SparkSession, sid: int) -> int:
        """Commit a new snapshot whose content is snapshot `sid`'s.
        History is append-only: the rollback is itself a snapshot."""
        old = self.manifest(sid)
        new = self._commit(
            spark, None, "rollback", old["files"], {"rolled_back_to": sid}
        )
        # content schema follows the rolled-back-to snapshot
        man = self.manifest(new)
        man["schema"] = old["schema"]
        with open(self._manifest(new), "w") as f:
            json.dump(man, f)
        return new

    # --- reads -----------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        where: dict | None = None,
    ) -> DataFrame:
        """The table at a snapshot (default: current). A plain parquet
        multi-file scan — pushdown/pruning intact. `where` maps a
        stats column to an inclusive (lo, hi) range (either bound may
        be None): files whose recorded [min, max] cannot overlap are
        dropped from the scan at manifest level, and the residual
        row-level filter is applied to the surviving files — the
        result is exact, the pruning is just fewer files opened. A
        file with no recorded stats for the column is never pruned."""
        man = self.manifest(snapshot_id)
        files = self.scan_files(snapshot_id, where)
        if not files:
            return spark.createDataFrame([], schema=_schema_of(man))
        df = spark.read.parquet(*[os.path.join(self.root, p) for p in files])
        if where:
            from pyspark.sql import functions as F

            for col, (lo, hi) in where.items():
                if lo is not None:
                    df = df.filter(F.col(col) >= lo)
                if hi is not None:
                    df = df.filter(F.col(col) <= hi)
        return df

    def scan_files(
        self, snapshot_id: int | None = None, where: dict | None = None
    ) -> list[str]:
        """The file list `read` would scan (pruning diagnostics)."""
        man = self.manifest(snapshot_id)
        if not where:
            return list(man["files"])
        stats = man.get("file_stats", {})
        out = []
        for f in man["files"]:
            s = stats.get(f, {})
            drop = False
            for col, (lo, hi) in where.items():
                if col not in s or s[col][0] is None:
                    continue
                mn, mx = s[col]
                if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                    drop = True
                    break
            if not drop:
                out.append(f)
        return out

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the current snapshot's content into `target_files`
        files (Iceberg rewrite_data_files): an overwrite commit of the
        coalesced data — readers of old snapshots are untouched, and
        expiry later reclaims the small files. NOTE for incremental
        readers: the file-diff after a compaction is the whole table
        (every file is new); resume incremental chains from the
        compaction snapshot."""
        if target_files < 1:
            raise ValueError(f"target_files must be >= 1, got {target_files}")
        cur = self.read(spark)
        return self.overwrite(
            spark, cur.coalesce(target_files), compacted_from=self.current_id()
        )

    def read_incremental(
        self, spark: SparkSession, from_id: int, to_id: int | None = None
    ) -> DataFrame:
        """Rows ADDED after snapshot `from_id` up to `to_id` (default
        current) — the Iceberg incremental-scan shape: because data
        files are immutable and appends inherit, the delta is exactly
        the files in `to` but not in `from`; only those files are
        scanned (a 10^12-row table's daily delta reads like a small
        table). `from_id=0` means everything. Overwrite/rollback
        commits replace file sets wholesale — the delta then includes
        any file the old snapshot didn't reference."""
        to = self.current_id() if to_id is None else to_id
        if to is None:
            raise ValueError(f"snapshot table at {self.root} has no snapshots")
        if from_id > to:
            raise ValueError(f"from_id {from_id} is after to_id {to}")
        base = set(self.manifest(from_id)["files"]) if from_id else set()
        new = [f for f in self.manifest(to)["files"] if f not in base]
        if not new:
            return spark.createDataFrame([], schema=_schema_of(self.manifest(to)))
        return spark.read.parquet(*[os.path.join(self.root, f) for f in new])

    def merge_into(
        self,
        spark: SparkSession,
        source: DataFrame,
        on: list[str] | str,
        when_matched: str = "update",
        insert_not_matched: bool = True,
    ) -> int:
        """MERGE INTO the current snapshot (Iceberg/SQL MERGE, copy-on-
        write): source rows whose key matches a target row UPDATE it
        (replace the whole row) or DELETE it (`when_matched="delete"`);
        source rows with no match INSERT (unless
        `insert_not_matched=False`); target rows with no match carry
        over unchanged. Commits one new snapshot (operation "merge");
        old snapshots stay readable — time travel across a merge works
        like any other commit.

        MERGE requires the source keys to be unique (the SQL standard's
        cardinality rule, which Iceberg enforces as "a row may not be
        updated by multiple source rows"): enforced here with one
        delta-sized aggregate that raises before anything is written.

        Scale shape: the rewrite is ONE target scan + an anti semi-join
        against the source keys — the source is the delta (orders of
        magnitude smaller than the table), so AQE broadcasts the key
        side and the target never shuffles. Copy-on-write rewrites the
        whole content into the new snapshot's files (the Iceberg COW
        table mode); with `stats_cols` manifest pruning a production
        merge-on-read variant would rewrite only matched files — the
        semantics committed here are identical.
        """
        keys = [on] if isinstance(on, str) else list(on)
        if not keys:
            raise ValueError("merge_into: empty key list")
        if when_matched not in ("update", "delete"):
            raise ValueError(
                f"merge_into: when_matched must be update|delete, got {when_matched!r}"
            )
        from pyspark.sql import functions as F

        dups = (
            source.groupBy(*keys)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dups:
            raise ValueError(
                f"merge_into: source has duplicate keys, e.g. "
                f"{tuple(dups[0][k] for k in keys)}"
            )
        target = self.read(spark)
        if set(source.columns) != set(target.columns):
            raise ValueError(
                f"merge_into: source columns {sorted(source.columns)} != "
                f"target columns {sorted(target.columns)}"
            )
        kept = target.join(source.select(*keys), keys, "left_anti")
        if when_matched == "update":
            incoming = (
                source
                if insert_not_matched
                else source.join(target.select(*keys), keys, "left_semi")
            )
        else:  # delete
            incoming = (
                source.join(target.select(*keys), keys, "left_anti")
                if insert_not_matched
                else None
            )
        merged = (
            kept.unionByName(incoming.select(*target.columns))
            if incoming is not None
            else kept
        )
        return self._commit(spark, merged, "merge", [])

    # --- maintenance -----------------------------------------------------
    def expire(self, keep_last: int = 1) -> list[int]:
        """Drop all but the last `keep_last` snapshots; delete data
        files referenced by NO retained snapshot. Returns expired ids."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        sids = self.snapshot_ids()
        expired, kept = sids[:-keep_last], sids[-keep_last:]
        live = set()
        for s in kept:
            live.update(self.manifest(s)["files"])
        for s in expired:
            dead = [f for f in self.manifest(s)["files"] if f not in live]
            for f in dead:
                try:
                    os.remove(os.path.join(self.root, f))
                except FileNotFoundError:
                    pass
            os.remove(self._manifest(s))
        # drop now-empty data dirs
        for d in glob.glob(os.path.join(self.root, "data", "snap-*")):
            try:
                if not any(p.endswith(".parquet") for p in os.listdir(d)):
                    shutil.rmtree(d, ignore_errors=True)
            except FileNotFoundError:
                pass
        return expired


def _schema_of(man: dict):
    from pyspark.sql.types import StructType

    if man.get("schema") is None:
        raise ValueError("empty snapshot table has no schema to read with")
    return StructType.fromJson(man["schema"])
