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
    HDFS/file:) — the commit primitive of the snapshot publish.

    NOTE the ``file:`` caveat: Hadoop's local rename is File.renameTo,
    which on POSIX silently REPLACES an existing dst, so the exists()
    pre-check here is a TOCTOU window.  Single-writer callers (lineage
    markers, job state publish) are fine; anything that needs a real
    concurrent-writer guarantee must commit through
    :func:`publish_file` instead."""
    fs, p_src = _fs_and_path(spark, src)
    _, p_dst = _fs_and_path(spark, dst)
    if fs.exists(p_dst):
        return False
    return bool(fs.rename(p_src, p_dst))


def publish_file(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomically publish a fully-written file at ``dst`` with
    create-no-overwrite semantics: returns True and ``dst`` appears
    with complete content, or returns False because ``dst`` already
    exists (the optimistic-concurrency loss signal).  Never partially
    publishes.

    - resolved FS ``file:`` — java.nio ``Files.createLink`` (POSIX
      link(2)): kernel-atomic EEXIST, no TOCTOU, dst carries src's full
      content the instant it exists; src is unlinked afterwards.
    - other resolved schemes — ``FileSystem.rename``: atomic and
      no-overwrite on HDFS (and object-store committers emulate it);
      the local TOCTOU caveat of :func:`rename` does not apply there.
    """
    fs, p_src = _fs_and_path(spark, src)
    _, p_dst = _fs_and_path(spark, dst)
    # Dispatch on the RESOLVED filesystem's scheme, not the raw path's:
    # a scheme-less path ("/warehouse/t") has URI scheme None even when
    # fs.defaultFS routes it to HDFS/S3 — the raw scheme would wrongly
    # take the local-link branch there and fail every publish.
    scheme = fs.getUri().getScheme()
    if scheme == "file":
        # local paths may still be scheme-less; qualify before toUri()
        p_src = fs.makeQualified(p_src)
        p_dst = fs.makeQualified(p_dst)
        jvm = spark._jvm
        # java.io.File(...).toPath() instead of Paths.get: Py4J cannot
        # dispatch the latter's (String, String...) varargs signature
        try:
            jvm.java.nio.file.Files.createLink(
                jvm.java.io.File(p_dst.toUri().getPath()).toPath(),
                jvm.java.io.File(p_src.toUri().getPath()).toPath(),
            )
        except Exception as e:  # Py4JJavaError wrapping the nio exception
            if "FileAlreadyExistsException" in str(e):
                return False
            raise
        fs.delete(p_src, False)
        return True
    if fs.exists(p_dst):
        return False
    return bool(fs.rename(p_src, p_dst))
