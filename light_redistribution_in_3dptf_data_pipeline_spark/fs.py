"""Filesystem helpers routed through the Hadoop FileSystem API.

The plans layer needs a handful of tiny control-plane operations —
"does this stage output exist", "list the committed batch manifests",
"write this manifest file last" — and doing them with ``os.path`` only
works on the local filesystem. At the 100 TB deployment scale the
corpus root is an object store (s3a://, abfss://, gs://, hdfs://), so
every existence check and manifest write here resolves the path
through ``org.apache.hadoop.fs.FileSystem`` instead: the same resolver
Spark's own readers and writers use, so any path Spark can read, these
helpers can probe.

All helpers take the live ``SparkSession`` (the Hadoop configuration —
credentials, endpoints, committers — lives on its context). They are
driver-side, O(1)-or-tiny control-plane calls, never data-plane: the
data itself always moves through DataFrame reads/writes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def path_exists(spark: SparkSession, path: str) -> bool:
    """FS-agnostic ``os.path.exists``."""
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` if present; True if anything was
    removed. Used only for crash-recovery cleanup of an UNCOMMITTED
    batch's leftovers — committed data is never deleted."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, True))


def list_dir(spark: SparkSession, path: str) -> list[str]:
    """Child names (not full paths) of ``path``; [] if it's absent."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs(spark, path)
    fs.mkdirs(p)


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Atomically-enough publish a small text file: a single
    ``create(overwrite=True)`` + close. On HDFS the file becomes
    visible complete-on-close; on object stores the PUT is atomic.
    This is what makes a write-marker-last commit protocol sound."""
    fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()
