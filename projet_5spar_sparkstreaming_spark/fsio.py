"""Filesystem-abstracted small-file I/O for index metadata.

Index *data* (parquet sigs/bands/cells) always travels through Spark's
Hadoop-backed writers, so it works identically on file://, HDFS and
S3. Index *metadata* (``_meta.json``, ``_centroids.json``) written with
plain ``open()`` and probed with ``os.walk`` does NOT: on object
storage the driver-local check silently reports "no index", and a
streaming guard would skip cross-batch dedup entirely. These helpers
route the small JSON files through the same Hadoop ``FileSystem``
abstraction as the data (via the JVM gateway), so index existence and
parameters are consistent with wherever the parquet actually lives.

Absent in the reference — its only persistence was JDBC appends
(reference: src/spark_stream.py:107-144); required here by the
persistable dedup/ANN indexes (operators/dedup.py:build_minhash_index,
operators/similarity.py:build_ivf_index) and the streaming ingest
guards (streaming/dedup.py).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for ``path`` under the session's
    Hadoop configuration — resolves file://, hdfs://, s3a://, ... by
    scheme."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its OWN filesystem (not the
    driver's local disk)."""
    fs, hpath = _fs_path(spark, path)
    return bool(fs.exists(hpath))


def write_json(spark: SparkSession, path: str, obj: Any) -> None:
    """Serialize ``obj`` as UTF-8 JSON at ``path``, overwriting.

    Written to a ``.tmp`` sibling, the live file renamed aside to
    ``.old``, the ``.tmp`` renamed into place, then the aside copy
    dropped — every rename's boolean result is CHECKED (Hadoop's
    ``FileSystem.rename`` reports failure by returning false, not by
    throwing), and a false raises ``IOError`` with the old content
    still recoverable at ``.old`` instead of silently losing the
    metadata update. A reader never observes a torn file; it can
    observe "no file" for the instant between the two renames (on S3
    rename is copy+delete, so the window is wider there)."""
    fs, hpath = _fs_path(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    tmp = jpath(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()
    old = jpath(path + ".old")
    if fs.exists(old):
        # Stale aside from a prior crash — drop it UNCONDITIONALLY: after
        # a crash between rename(live, old) and rename(tmp, live) the live
        # file is absent, and cleaning only under `if exists(live)` would
        # leave a .old older than the new content behind forever.
        fs.delete(old, False)
    had_old = False
    if fs.exists(hpath):
        if not fs.rename(hpath, old):
            raise IOError(f"rename {path} -> {path}.old failed")
        had_old = True
    if not fs.rename(tmp, hpath):
        if had_old:
            fs.rename(old, hpath)  # best-effort restore
        raise IOError(f"rename {path}.tmp -> {path} failed")
    if had_old:
        fs.delete(old, False)


def read_json(spark: SparkSession, path: str) -> Any | None:
    """Parse the JSON at ``path``; None when the file does not exist."""
    fs, hpath = _fs_path(spark, path)
    if not fs.exists(hpath):
        return None
    inp = fs.open(hpath)
    try:
        s = spark._jvm.org.apache.commons.io.IOUtils.toString(inp, "UTF-8")
    finally:
        inp.close()
    return json.loads(s)


def delete_path(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete ``path`` (optionally recursively); False if absent."""
    fs, hpath = _fs_path(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, recursive))


def rename_path(spark: SparkSession, src: str, dst: str) -> bool:
    """Rename/move ``src`` to ``dst`` on their shared filesystem."""
    fs, hsrc = _fs_path(spark, src)
    hdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    return bool(fs.rename(hsrc, hdst))


def replace_path(spark: SparkSession, src: str, dst: str) -> None:
    """Replace directory/file ``dst`` with ``src`` via rename-aside:
    ``dst`` is first renamed to ``dst + "__old"`` (so a crash midway
    leaves the previous data recoverable under a well-known name, never
    deleted-but-not-yet-replaced), then ``src`` is renamed into place
    and the aside copy dropped. Every rename result is checked; a
    failed final rename restores the aside copy and raises.

    NOT atomic for concurrent readers: there is a window where ``dst``
    is absent, and on S3 a directory rename is a per-object copy+delete
    — run compaction offline / between micro-batches only."""
    fs, hdst = _fs_path(spark, dst)
    old = dst + "__old"
    delete_path(spark, old)  # stale aside from a prior crash
    had_old = False
    if fs.exists(hdst):
        if not rename_path(spark, dst, old):
            raise IOError(f"rename {dst} -> {old} failed")
        had_old = True
    if not rename_path(spark, src, dst):
        if had_old:
            rename_path(spark, old, dst)  # best-effort restore
        raise IOError(f"rename {src} -> {dst} failed")
    if had_old:
        delete_path(spark, old)
