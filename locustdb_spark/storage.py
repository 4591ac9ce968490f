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

    def put_if_absent(self, path: str, data: bytes) -> bool:
        fs, p = self._fs_path(path)
        try:
            out = fs.create(p, False)  # overwrite=false: fails if exists
        except Exception as e:  # noqa: BLE001 — py4j wraps the Java
            # FileAlreadyExistsException; anything else re-raises
            if "AlreadyExists" in str(e) or "already exists" in str(e):
                return False
            raise
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        return True
