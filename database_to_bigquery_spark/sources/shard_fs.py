"""Driver-side filesystem seam for the WebDataset shard source/sink.

The shard DataSource needs four metadata operations on the driver —
list a directory's tar shards, rename a staged shard to its committed
name, delete a stale shard, make the staging directory — and those are
exactly the operations that differ between a local disk and an object
store. This module isolates them behind one interface:

  * ``LocalShardFS`` — plain ``os`` calls for scheme-less paths.
  * ``HadoopShardFS`` — routes through Hadoop's ``FileSystem`` via the
    active ``SparkSession``'s JVM gateway, so ``file:/``, ``hdfs://``
    and (cluster-configured) ``s3a://`` URIs all resolve through the
    same connector stack Spark's own committers use. Driver-side only:
    Python workers have no JVM gateway, which is why the *staging
    write* (executor-side) stays a local ``open()`` — see
    ``webdataset_source.py`` for the contract.

Hidden-file convention: names starting with ``.`` or ``_`` are never
listed as data (the same rule Hadoop's FileInputFormat applies), so
in-flight staging shards under ``.staging/`` are invisible to readers
even if a path filter is misconfigured.
"""

from __future__ import annotations

import os
import re

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://|^file:/")


def _is_hidden(name: str) -> bool:
    return name.startswith((".", "_"))


class LocalShardFS:
    """``os``-backed implementation for plain local paths."""

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_tars(self, path: str) -> list[str]:
        """Committed (non-hidden) ``*.tar`` names directly under path."""
        if not os.path.isdir(path):
            return []
        return sorted(
            f
            for f in os.listdir(path)
            if f.endswith(".tar") and not _is_hidden(f)
        )

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename_over(self, src: str, dst: str) -> None:
        """Atomic move, replacing dst if present (commit semantics)."""
        os.replace(src, dst)

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)


class HadoopShardFS:
    """Hadoop-``FileSystem``-backed implementation for URI paths.

    Resolved from the active SparkSession's JVM, so whatever
    connectors the cluster ships (s3a, abfss, gs, hdfs) are reachable
    without any Python-side cloud SDK. ``rename_over`` is
    delete-then-rename because Hadoop's rename does not overwrite.
    """

    def __init__(self, spark=None):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "HadoopShardFS needs an active SparkSession (driver-side)"
            )
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._jpath(path).getFileSystem(self._conf)

    def is_dir(self, path: str) -> bool:
        p = self._jpath(path)
        fs = p.getFileSystem(self._conf)
        return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())

    def exists(self, path: str) -> bool:
        p = self._jpath(path)
        return bool(p.getFileSystem(self._conf).exists(p))

    def list_tars(self, path: str) -> list[str]:
        p = self._jpath(path)
        fs = p.getFileSystem(self._conf)
        if not fs.exists(p) or not fs.getFileStatus(p).isDirectory():
            return []
        names = []
        for st in fs.listStatus(p):
            n = st.getPath().getName()
            if st.isFile() and n.endswith(".tar") and not _is_hidden(n):
                names.append(n)
        return sorted(names)

    def mkdirs(self, path: str) -> None:
        p = self._jpath(path)
        p.getFileSystem(self._conf).mkdirs(p)

    def rename_over(self, src: str, dst: str) -> None:
        s, d = self._jpath(src), self._jpath(dst)
        fs = s.getFileSystem(self._conf)
        if fs.exists(d):
            fs.delete(d, False)
        if not fs.rename(s, d):
            raise IOError(f"rename {src} -> {dst} failed")

    def delete(self, path: str) -> None:
        p = self._jpath(path)
        fs = p.getFileSystem(self._conf)
        if fs.exists(p):
            fs.delete(p, True)

    def join(self, *parts: str) -> str:
        out = parts[0]
        for part in parts[1:]:
            out = out.rstrip("/") + "/" + part
        return out


def has_uri_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def fs_for(path: str, spark=None):
    """Pick the implementation by path shape: URI → Hadoop, else local."""
    if has_uri_scheme(path):
        return HadoopShardFS(spark)
    return LocalShardFS()


def strip_file_scheme(path: str) -> str:
    """``file:/x`` / ``file:///x`` → ``/x`` (local open() compatibility)."""
    if path.startswith("file://"):
        rest = path[len("file://") :]
        return rest if rest.startswith("/") else "/" + rest
    if path.startswith("file:/"):
        return path[len("file:") :]
    return path
