"""Iceberg-style snapshot/manifest table layer (SURVEY.md §4.4, §7.5).

The north rule requires jobs "resumable from Iceberg-snapshot checkpoints
with per-partition lineage + row-count/byte metrics". No Iceberg runtime
jar ships in this sandbox (verified absent from $SPARK_HOME/jars), so the
engine provides Iceberg-*style* semantics itself — honest atomic commits,
a snapshot log, manifests of data files with per-partition statistics,
and resume-by-manifest-diff — without claiming wire compatibility.

Layout of a catalog table directory::

    <root>/<table>/
      data/<partition>/part-*.parquet     committed data files
      _staging/<partition>-<nonce>/       in-flight writes (never read)
      snapshots/v{N}.json                 immutable snapshot manifests
      VERSION                             pointer file -> latest N (atomic)

Commit protocol (crash-safe on a POSIX filesystem, same as Iceberg's
version-hint strategy):

1. write data files into ``_staging/...`` (Spark write, any parallelism),
2. ``os.rename`` the staged directory to its final ``data/<partition>``
   path (atomic; partition either fully appears or not at all),
3. write ``snapshots/v{N+1}.json.tmp`` then ``os.replace`` to final name,
4. ``os.replace`` the VERSION pointer.

A reader only ever sees the file list of a committed snapshot, so
half-written partitions are invisible; a crashed job leaves stale
``_staging`` dirs that the next run garbage-collects.

Reference precedent: osm-io's resumability unit is the whole file (its
writer either completes or the output is garbage —
/root/reference/src/osm/pbf/writer.rs:136-206); our unit is the
partition, which is what makes 10^12-row jobs restartable.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

_VERSION_FILE = "VERSION"


def _utcnow_iso() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def _parquet_stats(path: str, stats_columns: list[str] | None = None
                   ) -> tuple[int, int, list[dict], dict]:
    """Footer-only scan of the parquet files under ``path`` → (rows,
    bytes, per-file entries, column min/max). Driver-side and cheap:
    reads metadata footers, never row data — the analogue of Iceberg
    manifest stats. ``stats_columns`` min/max come from row-group
    statistics and power partition pruning in ``read_pruned``."""
    import pyarrow.parquet as pq

    rows = 0
    nbytes = 0
    files: list[dict] = []
    col_stats: dict[str, dict] = {}
    for dirpath, _dirs, fnames in os.walk(path):
        for fn in sorted(fnames):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(dirpath, fn)
            md = pq.read_metadata(fp)
            sz = os.path.getsize(fp)
            rows += md.num_rows
            nbytes += sz
            files.append({
                "path": os.path.relpath(fp, path),
                "rows": md.num_rows,
                "bytes": sz,
                "row_groups": md.num_row_groups,
            })
            if stats_columns:
                name_to_idx = {md.schema.column(i).name: i
                               for i in range(len(md.schema))}
                for col in stats_columns:
                    ci = name_to_idx.get(col)
                    if ci is None:
                        continue
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        if st is None or not st.has_min_max:
                            continue
                        cur = col_stats.setdefault(col, {"min": st.min,
                                                         "max": st.max})
                        cur["min"] = min(cur["min"], st.min)
                        cur["max"] = max(cur["max"], st.max)
    return rows, nbytes, files, col_stats


@dataclass
class Snapshot:
    version: int
    table: str
    created_at: str
    operation: str
    lineage: dict[str, Any]
    partitions: dict[str, dict]          # partition key -> manifest entry
    summary: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({
            "format": "osm-io-spark/snapshot-v1",
            "version": self.version,
            "table": self.table,
            "created_at": self.created_at,
            "operation": self.operation,
            "lineage": self.lineage,
            "partitions": self.partitions,
            "summary": self.summary,
        }, indent=1, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "Snapshot":
        d = json.loads(text)
        return Snapshot(
            version=d["version"], table=d["table"],
            created_at=d["created_at"], operation=d["operation"],
            lineage=d["lineage"], partitions=d["partitions"],
            summary=d.get("summary", {}))


class SnapshotTable:
    """One versioned table inside the catalog root."""

    def __init__(self, root: str, name: str):
        self.name = name
        self.dir = os.path.join(root, name)
        self.data_dir = os.path.join(self.dir, "data")
        self.staging_dir = os.path.join(self.dir, "_staging")
        self.snap_dir = os.path.join(self.dir, "snapshots")
        for d in (self.data_dir, self.staging_dir, self.snap_dir):
            os.makedirs(d, exist_ok=True)

    # -- snapshot log ------------------------------------------------------

    def current_version(self) -> int:
        vf = os.path.join(self.dir, _VERSION_FILE)
        if not os.path.exists(vf):
            return 0
        with open(vf) as fh:
            return int(fh.read().strip())

    def snapshot(self, version: int | None = None) -> Snapshot | None:
        v = self.current_version() if version is None else version
        if v == 0:
            return None
        path = os.path.join(self.snap_dir, f"v{v}.json")
        if not os.path.exists(path):      # expired (expire_snapshots)
            return None
        with open(path) as fh:
            return Snapshot.from_json(fh.read())

    def history(self) -> list[Snapshot]:
        out = []
        for v in range(1, self.current_version() + 1):
            s = self.snapshot(v)
            if s is not None:
                out.append(s)
        return out

    def _commit_snapshot(self, snap: Snapshot) -> None:
        tmp = os.path.join(self.snap_dir, f"v{snap.version}.json.tmp")
        final = os.path.join(self.snap_dir, f"v{snap.version}.json")
        with open(tmp, "w") as fh:
            fh.write(snap.to_json())
        os.replace(tmp, final)
        vtmp = os.path.join(self.dir, _VERSION_FILE + ".tmp")
        with open(vtmp, "w") as fh:
            fh.write(str(snap.version))
        os.replace(vtmp, os.path.join(self.dir, _VERSION_FILE))

    # -- staging / gc ------------------------------------------------------

    def gc_staging(self) -> int:
        """Drop leftovers of crashed writers. Safe: staged dirs are never
        referenced by any committed snapshot."""
        n = 0
        for d in os.listdir(self.staging_dir):
            shutil.rmtree(os.path.join(self.staging_dir, d), ignore_errors=True)
            n += 1
        return n

    # -- write paths -------------------------------------------------------

    def write_partition(self, df: DataFrame, partition: str,
                        lineage: dict[str, Any] | None = None,
                        stats_columns: list[str] | None = None) -> dict:
        """Stage one partition's data; returns its manifest entry. Does
        NOT commit — callers batch entries into commit_partitions so one
        snapshot can cover many partitions. ``stats_columns`` records
        per-partition min/max in the manifest (data-skipping metadata)."""
        nonce = uuid.uuid4().hex[:12]
        staged = os.path.join(self.staging_dir, f"{partition}-{nonce}")
        df.write.mode("overwrite").parquet(staged)
        # drop Spark's _SUCCESS marker; the manifest is the commit record
        marker = os.path.join(staged, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        rows, nbytes, files, col_stats = _parquet_stats(staged, stats_columns)
        # IMMUTABLE data paths (Iceberg-style): the nonce stays in the
        # final directory name and the manifest records it, so a rewrite
        # of the same logical partition lands beside — never on top of —
        # the bytes an older snapshot references. That is what makes
        # read(version=)/read_as_of() actually historical; old files are
        # reclaimed only by expire_snapshots().
        rel = f"{partition}-{nonce}"
        os.rename(staged, os.path.join(self.data_dir, rel))
        entry = {
            "partition": partition,
            "path": rel,
            "rows": rows,
            "bytes": nbytes,
            "files": files,
            "lineage": lineage or {},
            "committed_at": _utcnow_iso(),
        }
        if col_stats:
            entry["column_stats"] = col_stats
        return entry

    def commit_partitions(self, entries: list[dict], operation: str,
                          lineage: dict[str, Any] | None = None,
                          replace: bool = False,
                          drop: list[str] | None = None) -> Snapshot:
        """Fold new partition entries into a new snapshot (append or
        replace semantics) and atomically publish it. ``drop`` removes
        logical partitions from the new snapshot (their data stays on
        disk for time travel until expire_snapshots) — the primitive
        epoch consolidation uses to retire merged micro-batches."""
        prev = self.snapshot()
        parts: dict[str, dict] = {} if (replace or prev is None) else dict(prev.partitions)
        for name in (drop or []):
            parts.pop(name, None)
        for e in entries:
            parts[e["partition"]] = e
        snap = Snapshot(
            version=self.current_version() + 1,
            table=self.name,
            created_at=_utcnow_iso(),
            operation=operation,
            lineage=lineage or {},
            partitions=parts,
            summary={
                "n_partitions": len(parts),
                "total_rows": sum(p["rows"] for p in parts.values()),
                "total_bytes": sum(p["bytes"] for p in parts.values()),
                "parent_version": prev.version if prev else 0,
            })
        self._commit_snapshot(snap)
        return snap

    def write(self, df: DataFrame, operation: str = "overwrite",
              lineage: dict[str, Any] | None = None,
              stats_columns: list[str] | None = None) -> Snapshot:
        """Single-shot table write (one logical partition 'all')."""
        entry = self.write_partition(df, "all", lineage, stats_columns)
        return self.commit_partitions([entry], operation, lineage, replace=True)

    # -- read path ---------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        if snap is None or not snap.partitions:
            raise FileNotFoundError(f"table {self.name} has no committed snapshot")
        paths = [os.path.join(self.data_dir, e.get("path", name))
                 for name, e in sorted(snap.partitions.items())]
        return spark.read.parquet(*paths)

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Reclaim history (the Iceberg expire_snapshots analogue):
        drop all but the newest ``keep_last`` snapshot manifests and
        delete the data directories that only expired manifests
        reference. The reclaim set is (paths referenced by EXPIRED
        manifests) − (paths referenced by RETAINED manifests) — NEVER
        "everything unreferenced": a concurrent writer renames staged
        data into data/ before its batched commit publishes a manifest
        (ResumableJob commits every N partitions), and deleting those
        in-flight dirs would publish manifests over missing files.
        Dirs orphaned by a writer that crashed after rename but before
        commit are likewise left in place (they are unreachable and
        harmless; reclaim them manually if needed). Returns
        {"expired_versions": [...], "deleted_paths": n}."""
        cur = self.current_version()
        keep_from = max(1, cur - max(1, keep_last) + 1)
        retained: set[str] = set()
        expired_refs: set[str] = set()
        expired: list[int] = []
        for s in self.history():
            refs = {e.get("path", name) for name, e in s.partitions.items()}
            if s.version >= keep_from:
                retained |= refs
            else:
                expired_refs |= refs
        for v in range(1, keep_from):
            p = os.path.join(self.snap_dir, f"v{v}.json")
            if os.path.exists(p):
                os.remove(p)
                expired.append(v)
        deleted = 0
        for d in sorted(expired_refs - retained):
            full = os.path.join(self.data_dir, d)
            if os.path.exists(full):
                shutil.rmtree(full, ignore_errors=True)
                deleted += 1
        return {"expired_versions": expired, "deleted_paths": deleted}

    def compact(self, spark: SparkSession,
                target_bytes: int = 128 * 1024 * 1024,
                stats_columns: list[str] | None = None) -> dict:
        """Small-file compaction (the Iceberg rewrite_data_files
        analogue): rewrite every partition that carries more parquet
        files than its byte size needs into ⌈bytes/target_bytes⌉ files,
        and publish ONE new snapshot with operation='compact'. Rows are
        untouched — only the physical layout changes.

        Why it exists: streaming sinks and per-micro-batch checkpoints
        (snapshot_sink.foreachBatch) accrete one small file per batch
        per partition; at 10^12 rows that is millions of KB-files and
        every read pays open/footer costs dwarfing the scan itself.

        Safety at scale: rewrites stage through write_partition, so the
        new layout lands under a NEW nonce dir beside the old bytes —
        time travel to pre-compaction versions keeps working and a
        crash mid-compaction publishes nothing (the old snapshot stays
        current). Old layouts are reclaimed only by expire_snapshots().
        Each selected partition is one independent Spark write — no
        global shuffle; untouched partitions carry over by manifest
        reference (zero data movement). ``stats_columns`` re-records
        data-skipping min/max on the rewritten layout; by default the
        previous entry's column_stats carry over unchanged (same rows).

        Returns {"version", "partitions_compacted", "files_before",
        "files_after"}; version is None when nothing needed compaction
        (no empty snapshot is published)."""
        snap = self.snapshot()
        if snap is None or not snap.partitions:
            raise FileNotFoundError(
                f"table {self.name} has no committed snapshot")
        entries: list[dict] = []
        files_before = files_after = 0
        for name, entry in sorted(snap.partitions.items()):
            need = max(1, -(-int(entry["bytes"]) // target_bytes))
            n_files = len(entry["files"])
            if n_files <= need:
                continue
            files_before += n_files
            src = os.path.join(self.data_dir, entry.get("path", name))
            df = spark.read.parquet(src).repartition(need)
            new = self.write_partition(
                df, name,
                lineage={"op": "compact", "source_path": entry["path"],
                         "source_version": snap.version},
                stats_columns=stats_columns)
            if stats_columns is None and "column_stats" in entry:
                new["column_stats"] = entry["column_stats"]
            if new["rows"] != entry["rows"]:     # paranoia: rewrite must
                raise RuntimeError(              # never change the data
                    f"compact({self.name}/{name}): rewrote "
                    f"{new['rows']} rows != manifest {entry['rows']}")
            files_after += len(new["files"])
            entries.append(new)
        if not entries:
            return {"version": None, "partitions_compacted": 0,
                    "files_before": 0, "files_after": 0}
        out = self.commit_partitions(
            entries, operation="compact",
            lineage={"source_version": snap.version,
                     "target_bytes": target_bytes})
        return {"version": out.version,
                "partitions_compacted": len(entries),
                "files_before": files_before, "files_after": files_after}

    def compact_epochs(self, spark: SparkSession, prefix: str = "epoch=",
                       keep_last: int = 2,
                       target_bytes: int = 128 * 1024 * 1024,
                       stats_columns: list[str] | None = None) -> dict:
        """Consolidate streaming micro-batch partitions: greedy-bucket
        the ``prefix``-named epoch partitions (oldest first, cumulative
        size ≤ target_bytes per bucket), rewrite each bucket as one
        ``epochs=<first>..<last>`` partition, and publish ONE snapshot
        that adds the consolidated partitions and DROPS the merged
        epochs. The file-count fix compact() can't deliver for
        streaming sinks: each micro-batch is one tiny PARTITION (one
        manifest entry + one file), so per-partition rewriting is a
        no-op — the partition count itself is the metadata+open-cost
        problem at 10^6 epochs.

        Exactly-once safety: the newest ``keep_last`` epochs are never
        touched. foreachBatch replay after a crash re-writes only the
        LAST uncommitted epoch (offset checkpointing), so consolidating
        older epochs can never race a replay into duplicating rows —
        the replayed epoch's partition name still exists and is simply
        overwritten in the manifest. Consolidated partitions keep full
        lineage (the merged epoch names + source version). Rows are
        check-summed: a consolidated bucket must re-read exactly the
        rows its manifests promised."""
        snap = self.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"table {self.name} has no committed snapshot")
        epochs = [n for n in snap.partitions if n.startswith(prefix)]
        # order NUMERICALLY when every suffix is an integer (the
        # exactly-once guarantee below needs the true newest epochs,
        # and lexicographic order breaks on unpadded names: epoch=12
        # sorts before epoch=2); otherwise a suffix we can't order is
        # a hard error, not a silent mis-merge
        suffixes = [n[len(prefix):] for n in epochs]
        if all(s.lstrip("-").isdigit() for s in suffixes):
            epochs.sort(key=lambda n: int(n[len(prefix):]))
        elif not suffixes or all(len(s) == len(suffixes[0])
                                 for s in suffixes):
            epochs.sort()
        else:
            raise ValueError(
                f"compact_epochs({self.name}): cannot order epoch "
                f"partitions with non-numeric, mixed-width suffixes "
                f"{sorted(suffixes)[:4]}... — newest-epoch protection "
                "requires integer or fixed-width epoch names")
        cands = epochs[:max(0, len(epochs) - max(0, keep_last))]
        if len(cands) < 2:
            return {"version": None, "epochs_merged": 0, "buckets": 0}
        buckets: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        for name in cands:
            b = int(snap.partitions[name]["bytes"])
            if cur and cur_bytes + b > target_bytes:
                buckets.append(cur)
                cur, cur_bytes = [], 0
            cur.append(name)
            cur_bytes += b
        if cur:
            buckets.append(cur)
        buckets = [g for g in buckets if len(g) >= 2]
        if not buckets:
            return {"version": None, "epochs_merged": 0, "buckets": 0}
        entries: list[dict] = []
        dropped: list[str] = []
        for g in buckets:
            paths = [os.path.join(self.data_dir,
                                  snap.partitions[n]["path"]) for n in g]
            want_rows = sum(int(snap.partitions[n]["rows"]) for n in g)
            want_bytes = sum(int(snap.partitions[n]["bytes"]) for n in g)
            need = max(1, -(-want_bytes // target_bytes))
            df = spark.read.parquet(*paths).repartition(need)
            first = g[0][len(prefix):]
            last = g[-1][len(prefix):]
            new = self.write_partition(
                df, f"epochs={first}..{last}",
                lineage={"op": "compact_epochs", "merged": list(g),
                         "source_version": snap.version},
                stats_columns=stats_columns)
            if new["rows"] != want_rows:
                raise RuntimeError(
                    f"compact_epochs({self.name}): bucket {g[0]}..{g[-1]} "
                    f"rewrote {new['rows']} rows != manifest {want_rows}")
            entries.append(new)
            dropped.extend(g)
        out = self.commit_partitions(
            entries, operation="compact-epochs",
            lineage={"source_version": snap.version,
                     "target_bytes": target_bytes},
            drop=dropped)
        return {"version": out.version, "epochs_merged": len(dropped),
                "buckets": len(entries)}

    def version_as_of(self, ts: str) -> int:
        """Time travel (the Iceberg `TIMESTAMP AS OF` analogue): the
        latest committed version whose ``created_at`` ≤ ``ts``.
        Timestamps are second-resolution ISO-8601 UTC strings
        (_utcnow_iso), which compare correctly as strings. Raises
        FileNotFoundError when no snapshot existed at ``ts`` — same
        contract as reading an empty table."""
        cands = [s.version for s in self.history() if s.created_at <= ts]
        if not cands:
            raise FileNotFoundError(
                f"table {self.name} has no snapshot at or before {ts}")
        return max(cands)

    def read_as_of(self, spark: SparkSession, ts: str) -> DataFrame:
        """Read the table as it existed at ``ts`` (ISO-8601 UTC)."""
        return self.read(spark, self.version_as_of(ts))

    def read_pruned(self, spark: SparkSession, column: str,
                    lo, hi, version: int | None = None
                    ) -> tuple[DataFrame, list[str]]:
        """Manifest-level data skipping (Iceberg-style): read ONLY the
        partitions whose recorded [min, max] for ``column`` overlaps
        [lo, hi] — partitions without recorded stats are conservatively
        kept. Returns (DataFrame, selected partition names); the caller
        still applies the exact row filter (pruning is file-level).
        At 100 TB this is the difference between listing thousands of
        files and a handful — the manifest scan is O(#partitions) JSON,
        no filesystem listing at all.

        Single-range form of ``read_pruned_multi`` (one sweep loop
        lives there; keeping two hand-synced copies already diverged
        once on rows==0 handling)."""
        return self.read_pruned_multi(spark, column, [(lo, hi)], version)

    def read_pruned_multi(self, spark: SparkSession, column: str,
                          ranges: list[tuple], version: int | None = None
                          ) -> tuple[DataFrame, list[str]]:
        """Manifest-level data skipping for a SET of [lo, hi] ranges in
        one manifest pass and one read — the shape an S2 region cover
        produces (each cover cell = one descendant-id range; Hilbert
        locality makes the ranges compact, so a cell-sorted table
        skips almost every partition). Partitions without stats are
        conservatively kept; the caller applies the exact row filter."""
        snap = self.snapshot(version)
        if snap is None or not snap.partitions:
            raise FileNotFoundError(
                f"table {self.name} has no committed snapshot")
        keep: list[str] = []
        keep_paths: list[str] = []
        for name, entry in sorted(snap.partitions.items()):
            if entry.get("rows") == 0:
                continue  # empty partition: nothing to read, no stats
            st = entry.get("column_stats", {}).get(column)
            if st is None or any(not (st["max"] < lo or st["min"] > hi)
                                 for lo, hi in ranges):
                keep.append(name)
                keep_paths.append(entry.get("path", name))
        if not keep:
            return self.read(spark, version).limit(0), []
        paths = [os.path.join(self.data_dir, p) for p in keep_paths]
        return spark.read.parquet(*paths), keep

    def completed_partitions(self) -> set[str]:
        snap = self.snapshot()
        return set(snap.partitions) if snap else set()


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.root, name)


# ---------------------------------------------------------------------------
# resumable partitioned job
# ---------------------------------------------------------------------------

class ResumableJob:
    """Checkpoint-resumable bulk job: a *plan* of named partitions, each
    produced by ``task_fn(partition_key) -> DataFrame``.

    Each completed partition is committed into the target table's
    snapshot log with lineage (job name, inputs, partition key) and
    row/byte metrics. ``run`` skips partitions already present in the
    latest snapshot — re-running after a crash reprocesses ONLY the
    missing partitions, then publishes one final snapshot.

    ``commit_every`` bounds the re-work window: a snapshot is published
    every K partitions, so a crash loses at most K-1 partitions of work
    (they are staged or even renamed, but the manifest is the truth).
    """

    def __init__(self, table: SnapshotTable, job_name: str,
                 inputs: dict[str, Any] | None = None,
                 commit_every: int = 8,
                 stats_columns: list[str] | None = None):
        self.table = table
        self.job_name = job_name
        self.inputs = inputs or {}
        self.commit_every = max(1, commit_every)
        self.stats_columns = stats_columns

    def pending(self, plan: list[str]) -> list[str]:
        done = self.table.completed_partitions()
        return [p for p in plan if p not in done]

    def run(self, plan: list[str],
            task_fn: Callable[[str], DataFrame],
            on_partition: Callable[[dict], None] | None = None) -> Snapshot:
        self.table.gc_staging()
        todo = self.pending(plan)
        lineage_base = {"job": self.job_name, "inputs": self.inputs}
        batch: list[dict] = []
        for pk in todo:
            df = task_fn(pk)
            entry = self.table.write_partition(
                df, pk, lineage={**lineage_base, "partition_key": pk},
                stats_columns=self.stats_columns)
            batch.append(entry)
            if on_partition:
                on_partition(entry)
            if len(batch) >= self.commit_every:
                self.table.commit_partitions(batch, f"{self.job_name}:progress",
                                             lineage_base)
                batch = []
        if batch or todo or self.table.snapshot() is None:
            return self.table.commit_partitions(batch, f"{self.job_name}:complete",
                                                lineage_base)
        return self.table.snapshot()


# ---------------------------------------------------------------------------
# incremental reads (time travel over the snapshot log)
# ---------------------------------------------------------------------------

def changes(table: SnapshotTable, spark: SparkSession,
            from_version: int, to_version: int | None = None
            ) -> tuple[DataFrame, list[str]]:
    """Incremental read: the rows of partitions added or rewritten
    between two snapshot versions (manifest diff — no file listing, no
    re-read of unchanged partitions). The consumer pattern at 10^12
    scale: downstream jobs checkpoint the last version they processed
    and re-aggregate only `changes(...)` since then.

    A partition counts as changed if it is absent from ``from_version``
    or its committed_at/rows/bytes differ. Returns (DataFrame over the
    changed partitions at ``to_version``, their names)."""
    to_version = table.current_version() if to_version is None else to_version
    new = table.snapshot(to_version)
    if new is None:
        raise FileNotFoundError(f"table {table.name}: no snapshot v{to_version}")
    old = table.snapshot(from_version) if from_version > 0 else None
    if from_version > 0 and old is None:
        # a missing base is NEVER "nothing processed" — that would
        # silently re-emit every partition and double-count rows in
        # the consumer's aggregate. Distinguish a bogus checkpoint
        # (version never existed) from a genuinely expired manifest.
        if from_version > table.current_version():
            raise FileNotFoundError(
                f"table {table.name}: snapshot v{from_version} does "
                f"not exist (current is v{table.current_version()}) — "
                f"the consumer checkpoint looks wrong")
        raise FileNotFoundError(
            f"table {table.name}: snapshot v{from_version} has been "
            f"expired — incremental base lost; re-read the full table "
            f"and checkpoint a retained version")
    old_parts = old.partitions if old else {}
    changed = [
        name for name, entry in sorted(new.partitions.items())
        if name not in old_parts
        or old_parts[name]["committed_at"] != entry["committed_at"]
        or old_parts[name]["rows"] != entry["rows"]
        or old_parts[name]["bytes"] != entry["bytes"]
    ]
    if not changed:
        return table.read(spark, to_version).limit(0), []
    paths = [os.path.join(table.data_dir,
                          new.partitions[p].get("path", p))
             for p in changed]
    return spark.read.parquet(*paths), changed
