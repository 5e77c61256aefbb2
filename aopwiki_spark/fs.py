"""Sidecar-file I/O routed through the Hadoop FileSystem API.

Spark already writes every big table (parquet) through Hadoop, so any URI
the cluster's connectors resolve (hdfs://, s3a://, gs://, abfs://,
file://) works for the data. The KB-sized sidecar files around the data —
checkpoint ``_SUCCESS`` probes, ``fingerprint.json``, ``manifest.json``,
``VoID.ttl``/``ServiceDescription.ttl``, ``label-coverage-report.json``,
and the corpus fingerprint walk — previously used ``os``/``open`` and
silently constrained the resumable runner to POSIX paths (round-3 closed
the ADVICE hole by *rejecting* remote URIs up front; this module is the
real fix the rejection note pointed at). Routing those few reads/writes
through the same ``org.apache.hadoop.fs.FileSystem`` the JVM has
configured means a ``spark-submit`` deployment on an object store gets
resume / delta-guard / metadata emission with zero extra Python
dependencies — the py4j round-trips are per-sidecar-file, never per-row.

Bare local paths keep a no-JVM ``os`` fast path, so oracle tools and
tests that never touch py4j are unaffected. Paths with a URI scheme
(including ``file://``, which Hadoop's RawLocalFileSystem serves — the
test route that exercises this module end-to-end without an object
store) go through the JVM.

Reference parity note: the reference pipeline assumes a local working
directory throughout (e.g. ``scripts/aopwikirdf.py`` writes Turtle and
reports with plain ``open``); object-store capability is a
deployment-surface extension, required by the north rule's Iceberg /
multi-executor framing rather than by reference semantics.
"""

from __future__ import annotations

import io as _pyio
import json
import os
import posixpath
import shutil
from typing import Iterator, Tuple


def _has_scheme(path: str) -> bool:
    # "scheme://..." only — a Windows drive letter ("C:\\") or a bare
    # relative path never matches; every Hadoop URI does.
    head, sep, _ = path.partition("://")
    return bool(sep) and head.isalnum()


def join(base: str, *parts: str) -> str:
    """Path join that preserves URI schemes (os.path.join would also work
    on POSIX, but posixpath keeps the separator explicit and predictable
    for remote URIs on any host OS)."""
    if _has_scheme(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


class LocalIO:
    """os/shutil-backed sidecar I/O: the zero-JVM fast path for bare
    paths (oracle tools, tests, and single-box runs never pay a py4j
    round-trip)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(data)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)

    def walk_stats(self, root: str) -> Iterator[Tuple[str, int, int]]:
        """Sorted (relpath, size_bytes, mtime_ns) for every non-dot file
        under root — the fingerprint walk. Lazy walk so the dot-dir prune
        applies before descent."""
        for dirpath, dirs, files in os.walk(root):
            dirs[:] = sorted(d for d in dirs if not d.startswith("."))
            for f in sorted(files):
                if f.startswith("."):
                    continue
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                yield (os.path.relpath(p, root).replace(os.sep, "/"),
                       st.st_size, st.st_mtime_ns)

    def open_read(self, path: str):
        return open(path, "rb")


class HadoopIO:
    """Sidecar I/O over ``org.apache.hadoop.fs.FileSystem`` via the py4j
    gateway — one FileSystem handle per (scheme, authority), resolved and
    cached by Hadoop itself. Works with whatever connectors the cluster
    classpath carries (s3a, gs, abfs, hdfs, file)."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _fs_path(self, path: str):
        jpath = self._jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(self._conf), jpath

    def exists(self, path: str) -> bool:
        fs, p = self._fs_path(path)
        return fs.exists(p)

    def isdir(self, path: str) -> bool:
        fs, p = self._fs_path(path)
        return fs.exists(p) and fs.getFileStatus(p).isDirectory()

    def isfile(self, path: str) -> bool:
        fs, p = self._fs_path(path)
        return fs.exists(p) and fs.getFileStatus(p).isFile()

    def read_bytes(self, path: str) -> bytes:
        fs, p = self._fs_path(path)
        stream = fs.open(p)
        try:
            # commons-io ships with Spark; one array copy for KB sidecars
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream)
            return bytes(data)
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        fs, p = self._fs_path(path)
        out = fs.create(p, True)  # overwrite; creates parents
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def makedirs(self, path: str) -> None:
        fs, p = self._fs_path(path)
        fs.mkdirs(p)

    def rmtree(self, path: str) -> None:
        fs, p = self._fs_path(path)
        fs.delete(p, True)

    def walk_stats(self, root: str) -> Iterator[Tuple[str, int, int]]:
        """Sorted (relpath, size_bytes, mtime_ns) via one recursive
        listFiles call (object stores serve this as a flat LIST — far
        cheaper than per-directory listStatus recursion). Hadoop mtimes
        are milliseconds; scaled to ns so a corpus fingerprinted locally
        and re-read through file:// hashes file-identically only when the
        filesystem truncates to whole ms — the fingerprint is an equality
        key, not a clock, so per-filesystem granularity is fine (the
        manifest records the mode)."""
        fs, p = self._fs_path(root)
        root_uri = fs.getFileStatus(p).getPath().toString().rstrip("/")
        it = fs.listFiles(p, True)
        entries = []
        while it.hasNext():
            st = it.next()
            uri = st.getPath().toString()
            rel = uri[len(root_uri):].lstrip("/")
            base = rel.rsplit("/", 1)[-1]
            if base.startswith(".") or any(
                    seg.startswith(".") for seg in rel.split("/")[:-1]):
                continue
            entries.append((rel, int(st.getLen()),
                            int(st.getModificationTime()) * 1_000_000))
        entries.sort()
        return iter(entries)

    def open_read(self, path: str):
        return _pyio.BytesIO(self.read_bytes(path))


_LOCAL = LocalIO()


def get_io(path: str, spark=None):
    """Route a path: bare local paths → LocalIO; any ``scheme://`` URI →
    HadoopIO over the active session's JVM. Raises if a remote URI is used
    with no JVM to serve it (a driver-side tool running without Spark)."""
    if not _has_scheme(path):
        return _LOCAL
    if spark is None:
        from pyspark.sql import SparkSession
        # getActiveSession is thread-local; runner worker threads fall
        # back to the process-wide instantiated session
        spark = (SparkSession.getActiveSession()
                 or getattr(SparkSession, "_instantiatedSession", None))
    if spark is None:
        raise ValueError(
            f"remote path {path!r} needs an active SparkSession (the "
            "Hadoop FileSystem lives in the JVM); start the session "
            "before touching remote sidecar files")
    return HadoopIO(spark)


# ---------------------------------------------------------------------------
# convenience wrappers used by the runners (text/JSON sidecars)
# ---------------------------------------------------------------------------

def read_json(path: str, spark=None) -> dict:
    return json.loads(get_io(path, spark).read_bytes(path).decode("utf-8"))


def write_json(path: str, obj: dict, spark=None, indent: int = 2,
               sort_keys: bool = False) -> None:
    text = json.dumps(obj, indent=indent, sort_keys=sort_keys) + "\n"
    get_io(path, spark).write_bytes(path, text.encode("utf-8"))


def write_text(path: str, text: str, spark=None) -> None:
    get_io(path, spark).write_bytes(path, text.encode("utf-8"))
