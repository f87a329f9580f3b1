"""Scheme-aware filesystem primitives for driver-side state metadata.

The incremental-linkage state and the streaming epoch markers live next to
Spark-written parquet, which on a real deployment is an HDFS / S3A / ABFS
path — ``os.path`` silently answers "does not exist" for every such URI,
which would make a remote state dir read as empty on every batch (the
writes succeed, the reads miss — a silent-divergence failure mode, not a
crash).  These helpers route all existence / small-text I/O through the
SAME Hadoop ``FileSystem`` the executors write with, so ``file:``,
``hdfs:``, ``s3a:`` and plain local paths all behave identically.

Only driver-side METADATA goes through here (existence probes, the state
manifest, epoch markers, the checkpoint binding) — bulk data always moves
through ``spark.read`` / ``DataFrame.write``.
"""
from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_path(spark, path)
    return bool(fs.exists(jpath))


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, jpath = _fs_path(spark, path)
    fs.mkdirs(jpath)


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` (no error when absent).  Needed by
    retraction: dynamic partition overwrite only replaces partitions
    PRESENT in the payload, so a state partition whose every row was
    retracted must be removed explicitly or stale rows silently survive."""
    fs, jpath = _fs_path(spark, path)
    return bool(fs.delete(jpath, True))


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create-or-overwrite a small UTF-8 text file (markers, manifests)."""
    fs, jpath = _fs_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark: SparkSession, path: str) -> str:
    fs, jpath = _fs_path(spark, path)
    stream = fs.open(jpath)
    try:
        jvm = spark._jvm
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
        return "\n".join(lines)
    finally:
        stream.close()


def fs_glob(spark: SparkSession, pattern: str) -> list:
    """Paths matching a Hadoop glob (e.g. ``.../_epochs/intent-*``) —
    used by the streaming fold's crash detection to find stale
    write-intent markers regardless of filesystem scheme."""
    fs, jpath = _fs_path(spark, pattern)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    return [s.getPath().toString() for s in statuses]


def fs_qualified(spark: SparkSession, path: str) -> str:
    """Fully-qualified URI for ``path`` (scheme + authority resolved
    against the session's default FS) — the canonical form for identity
    checks like the stream-checkpoint binding, where ``os.path.abspath``
    would mangle a remote URI."""
    fs, jpath = _fs_path(spark, path)
    return fs.makeQualified(jpath).toString()
