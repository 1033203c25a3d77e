"""Filesystem abstraction for index manifest/commit IO.

The IndexBuilder's checkpoint protocol needs seven small operations
(exists / read / atomic-write / rename / delete / list / usage). The POSIX
implementations (os.walk, os.replace) silently pin the index layout to a
local filesystem; at the 10^12-turn posture the index lives on HDFS or an
object store, so every manifest/commit file op routes through this
abstraction instead:

- LocalFS: the exact os/shutil calls the builder always used.
- HadoopFS: org.apache.hadoop.fs.FileSystem via the live SparkSession's
  JVM — the same FileSystem Spark's own writers use, so any scheme Spark
  can write parquet to (hdfs://, file://, s3a://, ...) works here too.

Atomicity caveat (documented, not hidden): `rename` maps to
FileSystem.rename, which is atomic on HDFS and local file:// but is a
COPY+DELETE on S3A — on S3, the commit point degrades from "atomic rename"
to "last-writer-wins with a visible window". The manifest protocol is
single-writer per index directory, so the window only matters for
concurrent out-of-contract writers; for a multi-writer S3 deployment use
an HDFS/consistent-rename staging layer for the manifest directory (the
data files themselves are immutable-once-written either way).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


def is_remote(path: str) -> bool:
    return "://" in path


def fs_for(spark, path: str):
    """Pick the FS implementation for a path: URI schemes go through
    Hadoop, plain paths through os/shutil."""
    return HadoopFS(spark) if is_remote(path) else LocalFS()


class LocalFS:
    """POSIX implementation — byte-for-byte the builder's original ops."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def rename(self, src: str, dst: str) -> None:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)

    def remove(self, path: str) -> None:
        if os.path.exists(path):
            os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path) if os.path.isdir(path) else []

    def walk_files(self, base: str) -> list[str]:
        """All file paths under base, relative to base."""
        out = []
        for root, _dirs, files in os.walk(base):
            for f in files:
                out.append(os.path.relpath(os.path.join(root, f), base))
        return out

    def dir_bytes(self, path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total


class HadoopFS:
    """org.apache.hadoop.fs.FileSystem-backed implementation (via the
    SparkSession's JVM). Handles every scheme Spark itself can write to."""

    def __init__(self, spark):
        self._jvm = spark.sparkContext._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._path(path).getFileSystem(self._conf)

    def exists(self, path: str) -> bool:
        return bool(self._fs(path).exists(self._path(path)))

    def makedirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def read_text(self, path: str) -> str:
        fs = self._fs(path)
        stream = fs.open(self._path(path))
        try:
            # IOUtils drains the stream fully regardless of block size
            out = self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return out

    def _rename_overwrite(self, src: str, dst: str) -> None:
        """Rename src over dst in ONE primitive where the filesystem has
        one. FileSystem.rename does not overwrite on HDFS, so a naive
        delete+rename leaves a crash window in which NEITHER manifest
        exists (r4 ADVICE, fs.py:133). FileContext.rename(...,
        Options.Rename.OVERWRITE) is the HDFS/file:// atomic
        rename-with-overwrite; if FileContext is unavailable for the
        scheme (some object-store connectors), fall back to delete+rename
        — on those stores rename is already copy+delete, so the module
        docstring's S3 caveat applies regardless."""
        try:
            rename_cls = getattr(
                self._jvm.org.apache.hadoop.fs.Options, "Rename"
            )
            opts = self._gateway.new_array(rename_cls, 1)
            opts[0] = rename_cls.OVERWRITE
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._path(dst).toUri(), self._conf
            )
            fc.rename(self._path(src), self._path(dst), opts)
        except Exception:
            fs = self._fs(dst)
            fs.delete(self._path(dst), False)
            if not fs.rename(self._path(src), self._path(dst)):
                raise IOError(f"rename {src} -> {dst} failed")

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        fs = self._fs(path)
        stream = fs.create(self._path(tmp), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        self._rename_overwrite(tmp, path)

    def rename(self, src: str, dst: str) -> None:
        fs = self._fs(src)
        parent = self._path(dst).getParent()
        if parent is not None:
            fs.mkdirs(parent)
        self._rename_overwrite(src, dst)

    def remove(self, path: str) -> None:
        self._fs(path).delete(self._path(path), False)

    def rmtree(self, path: str) -> None:
        self._fs(path).delete(self._path(path), True)

    def listdir(self, path: str) -> list[str]:
        fs = self._fs(path)
        if not fs.exists(self._path(path)):
            return []
        return [st.getPath().getName() for st in fs.listStatus(self._path(path))]

    def walk_files(self, base: str) -> list[str]:
        fs = self._fs(base)
        if not fs.exists(self._path(base)):
            return []
        out = []
        it = fs.listFiles(self._path(base), True)  # recursive
        base_uri = self._path(base).toUri().getPath()
        while it.hasNext():
            p = it.next().getPath().toUri().getPath()
            out.append(os.path.relpath(p, base_uri))
        return out

    def dir_bytes(self, path: str) -> int:
        fs = self._fs(path)
        if not fs.exists(self._path(path)):
            return 0
        return int(fs.getContentSummary(self._path(path)).getLength())


def read_json(fs, path: str) -> dict | None:
    if not fs.exists(path):
        return None
    return json.loads(fs.read_text(path))


def write_json_atomic(fs, path: str, obj: dict) -> None:
    fs.write_text_atomic(path, json.dumps(obj, indent=1, default=str))
