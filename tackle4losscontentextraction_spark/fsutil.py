"""Filesystem helper for the COW-merge / lineage layers.

The storage operators (operators/merge.py, sources/lineage.py) need
three tiny metadata operations: "does this directory exist", "list a
directory", "delete a directory tree". Using ``os.path``/``shutil``
for those works only on a local filesystem; on a real cluster the
table lives on HDFS/S3/GCS. This module routes all three through the
JVM's Hadoop FileSystem API (``spark._jvm.org.apache.hadoop.fs``), so
the exact same code runs against ``file:``, ``hdfs:``, ``s3a:`` etc. —
the scheme is resolved per-path from the active Hadoop configuration.

All calls are driver-side, O(1) or O(dir entries) metadata RPCs — never
data movement.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory ([] if it doesn't exist)."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]

def delete_dir(spark: SparkSession, path: str) -> bool:
    """Recursive delete, ignore-missing (shutil.rmtree ignore_errors
    analog). Returns True if something was deleted."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, True))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_and_path(spark, path)
    fs.mkdirs(p)


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create (overwrite) a small text file — manifest-sized payloads
    only; goes through FSDataOutputStream so it works on any scheme."""
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        jvm = spark._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic rename (no overwrite: returns False if dst exists on
    HDFS/file:) — the commit primitive of the snapshot publish."""
    fs, p_src = _fs_and_path(spark, src)
    _, p_dst = _fs_and_path(spark, dst)
    if fs.exists(p_dst):
        return False
    return bool(fs.rename(p_src, p_dst))
