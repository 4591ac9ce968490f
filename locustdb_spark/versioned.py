"""Manifest-based atomic table versions: a minimal Delta-style commit
log over plain parquet files.

Why this exists: a parquet *directory* is not a table. Directory-listing
reads race with writers — a reader that lists files while `compact()`
swaps the directory (rmtree + rename) sees missing or duplicate rows,
and object stores make rename non-atomic to begin with. The reference
solves the same problem with its meta store: partitions are immutable
segments and the `meta` blob names the live set, updated atomically
(reference src/disk_store/meta_store.rs:16-102, storage.rs:49-230).
This module is that idea on Spark terms:

- layout: ``<root>/data/<files>.parquet`` + ``<root>/_manifests/v{N}.json``
- a manifest is THE table: an explicit file list + schema JSON
- ``append(df)`` writes new immutable files via a staging dir, then
  commits manifest N+1 = manifest N + new files (tmp + atomic rename)
- ``compact()`` writes replacement files and commits a manifest that
  drops the small ones — old files are NOT deleted, so a reader
  pinned to version N keeps a consistent view mid-compaction
- ``read(version=k)`` is time travel; ``read()`` is the latest commit
- ``vacuum(keep_last)`` deletes files no kept manifest references —
  including orphans from a crashed append, which never became visible
  because their manifest was never committed
- manifests also carry per-file column [min,max] (collected once from
  the footers at write time); ``read(where={col: (lo, hi)})`` prunes
  non-overlapping files from the manifest alone — Delta-style data
  skipping with no footer reads or directory listing at query time

Scale shape: manifests hold file names only (KB per thousand files);
reads pass the explicit list to the parquet source, so Catalyst still
does pushdown/pruning per file; appends and compaction never rewrite
live data in place, which is exactly the contract object stores need.

Concurrency: optimistic. A manifest is created with the commit store's
atomic put-if-absent, so racing writers cannot overwrite each other's
commit; losing appenders re-read and re-commit on top (their files are
still valid), while a losing compact()/cluster() raises CommitConflict
because its rewrite was computed from a stale live set. The primitive
is pluggable: PosixCommitStore (fails-if-exists os.link) for local/NFS
roots, ConditionalPutCommitStore for object-store semantics (S3
If-None-Match / GCS if-generation-match:0 conditional PUT, mocked
locally with a flock held across check+rename).

Storage: data-file layout operations go through a pluggable
TableStorage (storage.py) — LocalStorage for plain paths, or
HadoopStorage (Spark's own FileSystem stack: s3a://, gs://, abfs://,
hdfs://, file:) auto-selected for URI roots, mirroring the reference's
file/Azure/GCS writer dispatch (storage.rs:49-230).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _promote_struct(a: T.StructType, b: T.StructType) -> T.StructType:
    """Field-union of two schemas with the engine's Int<Float<String
    promotion lattice on kind conflicts (the batch-time promotion the
    reference does in raw_col.rs:58-106, applied at table level)."""
    from .engine import _promote, _same_kind

    out: dict[str, T.DataType] = {}
    order: list[str] = []
    for f in list(a.fields) + list(b.fields):
        if f.name not in out:
            out[f.name] = f.dataType
            order.append(f.name)
        elif not _same_kind(out[f.name], f.dataType):
            out[f.name] = _promote(out[f.name], f.dataType)
    return T.StructType(
        [T.StructField(n, out[n], True) for n in order])


class CommitConflict(Exception):
    """A concurrent commit invalidated a compact()/cluster() rewrite;
    re-run against the new latest version (appends retry internally)."""


class CommitStore:
    """The single primitive the commit protocol needs: atomically
    create a small blob at `path` iff nothing exists there, reporting
    which writer won. Everything else (data files, manifest reads) is
    plain immutable-file I/O that any backend provides."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        raise NotImplementedError


class PosixCommitStore(CommitStore):
    """Local/NFS filesystems: write a temp file, then `os.link` it to
    the final name — link fails with EEXIST if another writer already
    committed, and the link itself is atomic (the shared primitive in
    storage.py)."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        from .storage import posix_put_if_absent

        return posix_put_if_absent(path, data)


class ConditionalPutCommitStore(CommitStore):
    """Object-store-shaped backend: models a conditional PUT (S3
    `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`, Azure
    `If-None-Match: *`) where the STORE serializes the exists-check
    with the write — there is no hard link to lean on. This mock
    reproduces that contract locally with an advisory `flock` held
    across check+rename, so it is race-correct across threads AND
    processes; a real backend would swap the body for one HTTP PUT.
    Running the full concurrency suite under both stores is what keeps
    the protocol honest about which primitive it actually requires."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        import fcntl

        lockpath = os.path.join(os.path.dirname(path), ".commit.lock")
        with open(lockpath, "ab") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if os.path.exists(path):
                    return False
                tmp = f"{path}.{uuid.uuid4().hex}.tmp"
                with open(tmp, "wb") as fh:
                    fh.write(data)
                os.rename(tmp, path)
                return True
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str,
                 stats_cols: list[str] | None = None,
                 commit_store: CommitStore | None = None,
                 storage=None):
        """`stats_cols` narrows manifest statistics collection to the
        listed columns (None = every leaf column). On 1000-column
        tables, stats for columns nobody range-filters on are pure
        manifest bloat — name the handful that gate queries (event
        time, ids, partitioning keys).

        `commit_store` overrides the atomic put-if-absent the commit
        protocol rides on (e.g. ConditionalPutCommitStore); by default
        the storage backend's own primitive is used.

        `storage` selects the layout backend (storage.py): LocalStorage
        for plain paths, HadoopStorage — Spark's own FileSystem stack,
        covering s3a/gs/abfs/hdfs and `file:` — auto-selected when
        `root` is a URI."""
        from .storage import HadoopStorage, LocalStorage, TableStorage

        self.spark = spark
        self.root = root
        self.stats_cols = set(stats_cols) if stats_cols else None
        if storage is not None:
            self.fs: TableStorage = storage
        elif "://" in root or root.startswith("file:"):
            self.fs = HadoopStorage(spark)
        else:
            self.fs = LocalStorage()
        self.commit_store = commit_store
        self._put_if_absent = (commit_store.put_if_absent if commit_store
                               else self.fs.put_if_absent)
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifests")
        self.fs.mkdirs(self.data_dir)
        self.fs.mkdirs(self.manifest_dir)
        # per-file column [min,max] collected at write, committed with
        # the next manifest
        self._pending_stats: dict[str, dict] = {}
        # per-file write schema (json), committed alongside — lets
        # read() group heterogeneous files and promote across them
        self._pending_schema: dict[str, str] = {}

    # -- manifest bookkeeping ------------------------------------------

    def versions(self) -> list[int]:
        out = []
        for f in self.fs.list(self.manifest_dir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version}.json")

    def _load_manifest(self, version: int) -> dict:
        path = self._manifest_path(version)
        if not self.fs.exists(path):
            raise ValueError(
                f"version {version} does not exist "
                f"(have: {self.versions()})")
        return json.loads(self.fs.read_bytes(path))

    def _commit(self, base_version: int | None, files: list[str],
                schema_json: str,
                txn_id: int | None = None) -> int | None:
        """Attempt to commit version base_version+1. The manifest blob
        is created through the commit store's put-if-absent, so two
        writers racing for the same version cannot overwrite each
        other — the loser gets None back and must re-read and retry
        (optimistic concurrency; a plain rename would silently drop
        the winner's commit)."""
        prev_m = self._load_manifest(base_version) if base_version else {}
        prev_stats = prev_m.get("stats", {})
        stats = {}
        for f in files:
            s = self._pending_stats.get(f, prev_stats.get(f))
            if s:
                stats[f] = s
        new_version = (base_version or 0) + 1
        last_txn = prev_m.get("last_txn")
        if txn_id is not None:
            last_txn = txn_id
        # per-file write schemas (deduplicated): carried forward for
        # surviving files, added for newly written ones
        prev_schemas: list[str] = prev_m.get("schemas", [])
        prev_fschema: dict[str, int] = prev_m.get("fschema", {})
        schemas: list[str] = []
        fschema: dict[str, int] = {}
        for f in files:
            sj = self._pending_schema.get(f)
            if sj is None and f in prev_fschema:
                sj = prev_schemas[prev_fschema[f]]
            if sj is None:
                continue  # legacy manifest entry: falls back to schema
            if sj not in schemas:
                schemas.append(sj)
            fschema[f] = schemas.index(sj)
        manifest = {"version": new_version, "files": sorted(files),
                    "schema": schema_json, "stats": stats,
                    "schemas": schemas, "fschema": fschema,
                    "last_txn": last_txn}
        if not self._put_if_absent(
                self._manifest_path(new_version),
                json.dumps(manifest).encode()):
            return None  # another writer won this version
        self._pending_stats.clear()
        self._pending_schema.clear()
        return new_version

    # -- writes --------------------------------------------------------

    def _write_files(self, df: DataFrame) -> list[str]:
        """Write df as new immutable files in data/ (via staging so a
        crash leaves only orphans no manifest references). Collects
        per-file column min/max from the parquet footers ONCE at write
        time into `_stats` for manifest-level file skipping — reading
        a KB of manifest instead of every footer at query time."""
        staging = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(staging)
        names = []
        for f in self.fs.list(staging):
            if not f.endswith(".parquet"):
                continue
            name = f"{uuid.uuid4().hex}.parquet"
            src = os.path.join(staging, f)
            md = self.fs.parquet_metadata(src)
            stats: dict[str, list] = {}
            for ci in range(md.num_columns):
                cname = md.schema.column(ci).name
                if self.stats_cols is not None and \
                        cname not in self.stats_cols:
                    continue
                mins, maxs = [], []
                for g in range(md.num_row_groups):
                    s = md.row_group(g).column(ci).statistics
                    if s is None or not s.has_min_max:
                        break
                    if not isinstance(s.min, (int, float, str)):
                        break  # JSON-safe scalar stats only
                    mins.append(s.min)
                    maxs.append(s.max)
                else:
                    if mins:
                        stats[cname] = [min(mins), max(maxs)]
            self.fs.rename(src, os.path.join(self.data_dir, name))
            names.append(name)
            self._pending_stats[name] = stats
            self._pending_schema[name] = df.schema.json()
        self.fs.delete_dir(staging)
        return names

    def append(self, df: DataFrame, txn_id: int | None = None) -> int:
        """Atomically append: new files become visible only when the
        next manifest commits. Returns the new version.

        `txn_id` makes the append exactly-once: a monotonically
        increasing writer transaction id (e.g. a Structured Streaming
        batchId) recorded in the manifest — an append whose txn_id is
        <= the last committed one is a replay and becomes a no-op, so
        a foreachBatch writer that crashed between sink write and
        checkpoint commit cannot double-append (the Delta txnVersion
        idempotent-writer pattern).

        Schema conflicts promote instead of failing: appending a
        string column where earlier versions hold ints (or vice versa)
        casts the NEW batch to the engine's promoted type
        (Int<Float<String lattice) and commits the promoted UNION
        schema; already-written files keep their old types on disk and
        are promoted at read time (reference raw_col.rs:58-106 does
        the same in memory at batch time — rewriting 100 TB of history
        on a type widening would be the wrong trade)."""
        new_files: list[str] | None = None
        written_schema: T.StructType = df.schema
        while True:
            latest = self.latest_version()
            prev_m = self._load_manifest(latest) if latest else {}
            if txn_id is not None:
                last_txn = prev_m.get("last_txn")
                if last_txn is not None and txn_id <= last_txn:
                    return latest  # replayed batch: already committed
            target = written_schema
            if prev_m.get("schema"):
                prev_schema = T.StructType.fromJson(
                    json.loads(prev_m["schema"]))
                target = _promote_struct(prev_schema, written_schema)
            if new_files is None:
                from .engine import _same_kind

                cols = []
                changed = False
                for f in df.schema.fields:
                    t = target[f.name].dataType
                    if not _same_kind(f.dataType, t) or isinstance(
                            f.dataType, T.NullType):
                        cols.append(F.col(f.name).cast(t).alias(f.name))
                        changed = True
                    else:
                        cols.append(F.col(f.name))
                if changed:
                    df = df.select(*cols)
                written_schema = df.schema
                target = _promote_struct(
                    prev_schema, written_schema) if prev_m.get("schema") \
                    else written_schema
                new_files = self._write_files(df)
            v = self._commit(latest, prev_m.get("files", []) + new_files,
                             target.json(), txn_id=txn_id)
            if v is not None:
                return v
            # lost the commit race: re-read and re-commit on top of the
            # winner — the already-written files are still valid

    def append_if_absent(self, df: DataFrame, key: str) -> int:
        """Idempotent append: commit only rows whose `key` is not
        already in the table (left-anti join against the current
        version). Replaying a failed ingestion batch therefore cannot
        duplicate rows — the batch-level analog of the streaming
        checkpoint's exactly-once append. The anti-join's build side is
        only the key column of the live table; at scale Catalyst plans
        it as a shuffle join on the key, never a corpus broadcast.

        Concurrency note: the absent-check reads a snapshot, so two
        writers appending the SAME keys simultaneously can both pass
        it — key uniqueness is guaranteed against committed data, not
        against in-flight writers. Serialize same-key writers (or use
        `txn_id` for replay protection, which IS race-safe)."""
        latest = self.latest_version()
        if latest is None:
            return self.append(df)
        existing = self.read(latest).select(key)
        fresh = df.join(existing, on=key, how="left_anti")
        return self.append(fresh)

    def compact(self, target_file_mb: int = 128,
                small_file_mb: float | None = None) -> int:
        """Incremental compaction: rewrite only files smaller than
        `small_file_mb` (default target/4 — the reference's
        combine-when-each-part-<-combined/4 policy, table.rs:248-298)
        into right-sized files; already-right-sized files are carried
        into the new manifest untouched. Work is O(small-file bytes),
        not O(table) — at 100 TB this is the difference between a
        nightly maintenance job and a full rewrite. Old files stay on
        disk until vacuum(), so concurrent readers of any committed
        version are never broken (the fix for the rmtree+rename race a
        directory-swap compaction has)."""
        latest = self.latest_version()
        if latest is None:
            raise ValueError("nothing to compact")
        m = self._load_manifest(latest)
        cutoff = (small_file_mb if small_file_mb is not None
                  else target_file_mb / 4) * 1024 * 1024
        sizes = {f: self.fs.size(os.path.join(self.data_dir, f))
                 for f in m["files"]}
        small = [f for f, s in sizes.items() if s < cutoff]
        keep = [f for f in m["files"] if f not in set(small)]
        if len(small) < 2:
            return latest  # nothing worth combining
        n = max(1, int(sum(sizes[f] for f in small)
                       // (target_file_mb * 1024 * 1024)))
        # group-aware read: compacting across a type promotion rewrites
        # the old-typed small files into the promoted schema
        df = self._read_file_set(
            m, small, T.StructType.fromJson(json.loads(m["schema"]))
        ).repartition(n)
        new_files = self._write_files(df)
        v = self._commit(latest, keep + new_files, m["schema"])
        if v is None:
            # a concurrent commit changed the live set this rewrite was
            # computed from — the rewrite is stale, caller must retry
            raise CommitConflict(
                "table changed during compact(); re-run against the "
                "new latest version")
        return v

    def cluster(self, cols: list[str], num_files: int = 16,
                bits: int = 16, equi_depth: bool = False) -> int:
        """OPTIMIZE-ZORDER analog: rewrite the live file set clustered
        on a Morton curve over `cols` and commit. Afterward every
        file is a small hyper-cube in the curve columns' space, so the
        manifest [min,max] stats become tight on EVERY curve column
        and `read(where=...)` skips most files for range filters on
        any of them — not just a single sort key. Same reader-safety
        as compact(): old files live until vacuum()."""
        from .functions import build_zorder_key

        latest = self.latest_version()
        if latest is None:
            raise ValueError("nothing to cluster")
        m = self._load_manifest(latest)
        df = self.read(latest)
        morton = build_zorder_key(df, cols, bits=bits,
                                  equi_depth=equi_depth)
        clustered = (
            df.withColumn("_z", morton)
            .repartitionByRange(num_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
        new_files = self._write_files(clustered)
        v = self._commit(latest, new_files, m["schema"])
        if v is None:
            raise CommitConflict(
                "table changed during cluster(); re-run against the "
                "new latest version")
        return v

    def vacuum(self, keep_last: int = 1,
               retention_seconds: float = 600.0) -> list[str]:
        """Delete data files referenced by none of the kept (most
        recent `keep_last`) manifests — dropped by compaction or
        orphaned by a crashed append — and retire older manifests.
        Returns the deleted file names.

        `retention_seconds` (Delta-style retention window): files whose
        mtime is within the window are NEVER deleted even if no kept
        manifest references them. An in-flight append moves its files
        into data/ BEFORE committing the manifest that makes them
        live — without the window a concurrent vacuum would delete
        them and the append would then commit a manifest pointing at
        missing files, corrupting that version. Pass 0 only when no
        writer can be in flight (tests, single-process maintenance)."""
        import time as _time

        vs = self.versions()
        keep = vs[-keep_last:] if keep_last else []
        live: set[str] = set()
        for v in keep:
            live.update(self._load_manifest(v)["files"])
        now = _time.time()
        deleted = []
        for f in self.fs.list(self.data_dir):
            if f.endswith(".parquet") and f not in live:
                p = os.path.join(self.data_dir, f)
                try:
                    age = now - self.fs.mtime(p)
                except Exception:  # noqa: BLE001 — already gone
                    continue       # (concurrent vacuum)
                if age < retention_seconds:
                    continue  # possibly an in-flight append's file
                self.fs.delete(p)
                deleted.append(f)
        for v in vs[:-keep_last] if keep_last else vs:
            self.fs.delete(self._manifest_path(v))
        return sorted(deleted)

    def history(self) -> list[dict]:
        """Commit log view (the DESCRIBE HISTORY shape): one entry per
        retained version with file count, total bytes (for files still
        on disk), committed-at mtime, and the last writer txn id."""
        out = []
        for v in self.versions():
            m = self._load_manifest(v)
            total = 0
            for f in m["files"]:
                p = os.path.join(self.data_dir, f)
                if self.fs.exists(p):
                    total += self.fs.size(p)
            out.append({
                "version": v,
                "num_files": len(m["files"]),
                "bytes": total,
                "committed_at": self.fs.mtime(self._manifest_path(v)),
                "last_txn": m.get("last_txn"),
            })
        return out

    # -- reads ---------------------------------------------------------

    def read(self, version: int | None = None,
             where: dict[str, tuple] | None = None) -> DataFrame:
        """DataFrame over exactly the files the manifest names. Passing
        the explicit list (not the directory) is what makes readers
        immune to concurrent appends/compactions — and uncommitted
        orphan files are invisible by construction.

        `where={col: (lo, hi)}` additionally prunes files whose
        manifest [min,max] for `col` cannot overlap the range — Delta-
        style data skipping from the manifest alone (no footer reads,
        no file listing; at 100 TB the planner touches KBs of JSON to
        discard most of the scan). The range predicate itself is NOT
        applied to surviving rows — add the real `.filter()` on top;
        files without stats for `col` are conservatively kept."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise ValueError("table has no committed version")
        m = self._load_manifest(v)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        files = m["files"]
        if where:
            stats = m.get("stats", {})
            for col, (lo, hi) in where.items():
                files = [
                    f for f in files
                    if col not in stats.get(f, {})
                    or (stats[f][col][1] >= lo and stats[f][col][0] <= hi)
                ]
        if not files:
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.data_dir, f) for f in files]
        missing = [p for p in paths if not self.fs.exists(p)]
        if missing:
            raise ValueError(
                f"version {v} references vacuumed files "
                f"(e.g. {os.path.basename(missing[0])}); "
                f"only {self.latest_version()} is guaranteed readable")
        return self._read_file_set(m, files, schema)

    def _read_file_set(self, m: dict, files: list[str],
                       target: T.StructType) -> DataFrame:
        """Read manifest files grouped by their recorded write schema.
        One group (the common case) is a plain mergeSchema scan; after
        a type-promoting append, old-typed file groups are scanned
        separately, promoted (engine._union_promote) and aligned to
        the manifest's promoted union schema — parquet cannot
        mergeSchema an int file with a string file, and rewriting
        history at append time would be O(table)."""
        sl: list[str] = m.get("schemas", [])
        fs: dict[str, int] = m.get("fschema", {})
        groups: dict[str, list[str]] = {}
        for f in files:
            sj = sl[fs[f]] if f in fs else m["schema"]
            groups.setdefault(sj, []).append(f)
        if len(groups) <= 1:
            return (self.spark.read.option("mergeSchema", "true")
                    .parquet(*[os.path.join(self.data_dir, f)
                               for f in files]))
        from .engine import _union_promote

        parts = [
            self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.data_dir, f) for f in grp])
            for grp in groups.values()
        ]
        out = _union_promote(parts)
        have = set(out.columns)
        return out.select(*[
            (F.col(f.name).cast(f.dataType) if f.name in have
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in target.fields
        ])
