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

    Written to a ``.tmp`` sibling then renamed, so a concurrent reader
    never observes a half-written file (rename is atomic on HDFS and
    posix; on S3 it is copy+delete — still never a torn file)."""
    fs, hpath = _fs_path(spark, path)
    tmp = spark._jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()
    if fs.exists(hpath):
        fs.delete(hpath, False)
    fs.rename(tmp, hpath)


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
