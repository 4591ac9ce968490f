"""Storage backends for versioned tables.

The reference dispatches its partition/meta writes across file, Azure
and GCS backends behind one interface (reference
src/disk_store/storage.rs:49-230, azure_writer.rs, gcs_writer.rs).
Spark already reads and writes the parquet BYTES on any supported
filesystem (s3a://, gs://, abfs://, hdfs://, file:) natively — what a
versioned table additionally needs is the small layout plumbing this
module abstracts:

- moving staged files into ``data/`` and deleting vacuumed ones
- listing, sizing and mtime-ing files
- reading parquet footers once at write time for manifest stats
- the atomic put-if-absent that the commit protocol rides on

Two implementations:

- :class:`LocalStorage` — plain ``os`` calls; put-if-absent via the
  POSIX fails-if-exists ``os.link`` (atomic on local/NFS mounts).
- :class:`HadoopStorage` — the JVM Hadoop ``FileSystem`` API through
  the active SparkSession, so the SAME credentials/configuration Spark
  uses for the parquet scan drive the layout operations; put-if-absent
  via ``FileSystem.create(path, overwrite=false)``. Locally testable
  with ``file:`` URIs (the real Hadoop LocalFileSystem code path, i.e.
  everything but the network differs from s3a only in scheme).

A ``CommitStore`` (versioned.py) can still override just the commit
primitive — e.g. ConditionalPutCommitStore — independent of where the
data files live.
"""

from __future__ import annotations

import io
import os
import shutil
import uuid


def posix_put_if_absent(path: str, data: bytes) -> bool:
    """The shared POSIX commit primitive: write a temp file, then
    hard-link it to the final name — the link is atomic and fails
    with EEXIST if another writer already committed. Used by
    LocalStorage, HadoopStorage's file:-scheme dispatch, and
    versioned.PosixCommitStore."""
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def strip_file_uri(path: str) -> str:
    """file:-URI -> local path. Handles file:/p, file:///p, and
    file://localhost/p; a file:// URI with a real remote authority
    has no local path and is rejected."""
    if not path.startswith("file:"):
        return path
    rest = path[len("file:"):]
    if rest.startswith("//"):
        authority, sep, tail = rest[2:].partition("/")
        if authority not in ("", "localhost"):
            raise ValueError(
                f"file URI with remote authority {authority!r} has "
                "no local path")
        return "/" + tail if sep else "/"
    return rest


class TableStorage:
    """Layout operations for one table root. Paths are joined with
    '/' so the same code serves POSIX paths and URIs."""

    def join(self, *parts: str) -> str:
        return "/".join(p.rstrip("/") for p in parts[:-1]) + "/" + parts[-1]

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list(self, path: str) -> list[str]:
        """Child FILE/DIR names (not paths) of a directory; empty list
        if the directory does not exist."""
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_dir(self, path: str) -> None:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError

    def parquet_metadata(self, path: str):
        """pyarrow FileMetaData for footer-stats collection."""
        import pyarrow.parquet as pq

        return pq.ParquetFile(io.BytesIO(self.read_bytes(path))).metadata

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Atomically create `path` iff absent; True if this writer
        won. The commit protocol's only primitive."""
        raise NotImplementedError


class LocalStorage(TableStorage):
    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def delete(self, path: str) -> None:
        os.remove(path)

    def delete_dir(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def parquet_metadata(self, path: str):
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata  # stream, don't slurp

    def put_if_absent(self, path: str, data: bytes) -> bool:
        return posix_put_if_absent(path, data)


class HadoopStorage(TableStorage):
    """Hadoop FileSystem-backed layout ops, resolved per-path from the
    session's Hadoop configuration — one class covers s3a/gs/abfs/hdfs
    and local ``file:`` URIs.

    Commit caveat (same one the Hadoop community documents): `create
    (path, overwrite=false)` is atomic on HDFS and local file systems;
    classic S3 implements it as check-then-write, so for S3 roots
    prefer a DynamoDB/conditional-put CommitStore override (S3 now has
    `If-None-Match` PUTs; Hadoop's s3a wires them as
    fs.s3a.create.conditional.enabled in recent releases)."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _fs_path(self, path: str):
        p = self._jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(self._conf), p

    def mkdirs(self, path: str) -> None:
        fs, p = self._fs_path(path)
        fs.mkdirs(p)

    def exists(self, path: str) -> bool:
        fs, p = self._fs_path(path)
        return fs.exists(p)

    def list(self, path: str) -> list[str]:
        fs, p = self._fs_path(path)
        if not fs.exists(p):
            return []
        return [s.getPath().getName() for s in fs.listStatus(p)]

    def read_bytes(self, path: str) -> bytes:
        fs, p = self._fs_path(path)
        stream = fs.open(p)
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream)
            return bytes(data)
        finally:
            stream.close()

    def rename(self, src: str, dst: str) -> None:
        fs, s = self._fs_path(src)
        _, d = self._fs_path(dst)
        if not fs.rename(s, d):
            raise OSError(f"rename failed: {src} -> {dst}")

    def delete(self, path: str) -> None:
        fs, p = self._fs_path(path)
        fs.delete(p, False)

    def delete_dir(self, path: str) -> None:
        fs, p = self._fs_path(path)
        if fs.exists(p):
            fs.delete(p, True)

    def size(self, path: str) -> int:
        fs, p = self._fs_path(path)
        return fs.getFileStatus(p).getLen()

    def mtime(self, path: str) -> float:
        fs, p = self._fs_path(path)
        return fs.getFileStatus(p).getModificationTime() / 1000.0

    # Schemes where FileSystem.rename(src, dst) is serialized by a
    # central metadata service and FAILS (returns false) when dst
    # already exists — the classic HDFS atomic-commit primitive.
    _RENAME_ATOMIC = {"hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs",
                      "o3fs"}
    # Object stores where rename is copy+delete and create(overwrite=
    # false) is check-then-write: only a server-side conditional PUT
    # (S3 `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`,
    # Azure `If-None-Match: *`) is race-free.
    _OBJECT_STORES = {"s3", "s3a", "s3n", "gs", "abfs", "abfss",
                      "wasb", "wasbs", "oss", "cos", "cosn", "swift"}

    @staticmethod
    def _scheme(path: str) -> str:
        head, sep, _ = path.partition(":")
        if not sep or "/" in head:
            return ""
        return head.lower()

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Atomic create-iff-absent, dispatched per scheme.

        `FileSystem.create(path, overwrite=false)` is NOT the right
        primitive everywhere: on the local (Raw/ChecksumFileSystem)
        path it is an exists-check followed by an open, so two racing
        writers both "succeed" and one manifest silently overwrites
        the other. Per-scheme:

        - ``file:`` / bare paths -> POSIX hard link (write temp,
          ``os.link`` to the final name; link is atomic and fails
          with EEXIST if another writer already committed).
        - HDFS-like schemes -> write temp, then ``rename`` to the
          final name; the namenode serializes renames and refuses an
          existing destination, so exactly one writer's rename
          returns true.
        - Object stores -> a real conditional PUT. The Hadoop
          connectors expose this through the createFile() builder's
          ``fs.option.create.conditional.overwrite`` option (s3a
          maps it to an ``If-None-Match: *`` PUT); if the connector
          does not support it we refuse to run the unsafe
          check-then-create and tell the caller to supply a
          conditional-put CommitStore instead.
        """
        scheme = self._scheme(path)
        if scheme in ("", "file"):
            return self._put_if_absent_posix(path, data)
        if scheme in self._RENAME_ATOMIC:
            return self._put_if_absent_rename(path, data)
        if scheme in self._OBJECT_STORES:
            return self._put_if_absent_conditional(path, data)
        # Unknown scheme: FAIL SAFE. The Hadoop FileSystem contract
        # does not guarantee no-clobber rename, so assuming rename
        # semantics for an arbitrary connector could let two racing
        # writers both "win" — the exact lost-commit bug this method
        # exists to prevent. Try the conditional-create builder
        # (correct wherever supported) and otherwise raise with
        # guidance, rather than maybe losing commits silently.
        return self._put_if_absent_conditional(path, data)

    def _put_if_absent_posix(self, path: str, data: bytes) -> bool:
        return posix_put_if_absent(strip_file_uri(path), data)

    def _put_if_absent_rename(self, path: str, data: bytes) -> bool:
        fs, p = self._fs_path(path)
        tmp_path = f"{path}.{uuid.uuid4().hex}.tmp"
        _, t = self._fs_path(tmp_path)
        out = fs.create(t, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        try:
            if fs.rename(t, p):
                return True
            # rename refused: either dst exists (lost the race) or a
            # genuine failure — distinguish so errors don't masquerade
            # as losses.
            if fs.exists(p):
                return False
            raise OSError(f"commit rename failed: {tmp_path} -> {path}")
        finally:
            if fs.exists(t):
                fs.delete(t, False)

    def _put_if_absent_conditional(self, path: str, data: bytes) -> bool:
        fs, p = self._fs_path(path)
        try:
            builder = fs.createFile(p).overwrite(False)
            # Hadoop 3.4.1+ (HADOOP-19256): s3a honors this builder
            # option with a server-side If-None-Match:* conditional
            # PUT surfaced at close() time.
            builder = builder.must(
                "fs.option.create.conditional.overwrite", False)
            out = builder.build()
        except Exception as e:  # noqa: BLE001 — py4j-wrapped Java
            msg = str(e)
            if ("Unsupported" in msg or "unknown" in msg.lower()
                    or "must(" in msg):
                raise OSError(
                    f"{self._scheme(path)}: connector does not support "
                    "conditional create; plain create(overwrite=false) "
                    "is check-then-write on object stores and loses "
                    "racing commits. Pass a conditional-put CommitStore "
                    "(e.g. ConditionalPutCommitStore) to VersionedTable "
                    "instead.") from e
            if "AlreadyExists" in msg or "already exists" in msg:
                return False
            raise
        try:
            out.write(bytearray(data))
            try:
                out.close()
            except Exception as e:  # noqa: BLE001
                # Conditional failure (remote 412) surfaces at close.
                msg = str(e)
                if ("AlreadyExists" in msg or "already exists" in msg
                        or "PreconditionFailed" in msg or "412" in msg):
                    return False
                raise
            return True
        except Exception:
            try:
                out.close()
            except Exception:  # noqa: BLE001
                pass
            raise
