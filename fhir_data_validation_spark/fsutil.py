"""Hadoop FileSystem helpers via the JVM bridge.

One home for the ``spark._jvm`` Path/FileSystem plumbing shared by the
Iceberg table format (:mod:`.sources.iceberg_py`) and the dedup scratch
management (:mod:`.pipeline.dedup`) — works on any scheme Spark can reach
(local, HDFS, s3a, …).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def jfs(spark: SparkSession, path: str):
    """(FileSystem, Path, jvm) for a path's scheme."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def write_bytes(spark: SparkSession, path: str, data: bytes,
                overwrite: bool = True) -> None:
    fs, hpath, _ = jfs(spark, path)
    out = fs.create(hpath, overwrite)
    try:
        out.write(bytearray(data))
    finally:
        # close on failure too: a leaked FSDataOutputStream holds the
        # HDFS lease on the half-written file and blocks a retrying
        # writer of the same path until lease expiry
        out.close()


def read_bytes(spark: SparkSession, path: str) -> bytes:
    fs, hpath, jvm = jfs(spark, path)
    stream = fs.open(hpath)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = jfs(spark, path)
    return fs.exists(hpath)


def delete(spark: SparkSession, path: str, recursive: bool = True,
           best_effort: bool = False) -> bool:
    """Recursive delete; ``best_effort=True`` swallows failures (cleanup
    paths that must never mask the real error)."""
    try:
        fs, hpath, _ = jfs(spark, path)
        return fs.delete(hpath, recursive)
    except Exception:
        if best_effort:
            return False
        raise


def list_files(spark: SparkSession, path: str, suffix: str = "") -> list[dict]:
    """Recursive file listing → [{path, length, mtime}] (mtime in epoch
    ms — the orphan sweep's staleness signal)."""
    fs, hpath, _ = jfs(spark, path)
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.endswith(suffix):
            out.append({"path": p, "length": st.getLen(),
                        "mtime": st.getModificationTime()})
    return out
