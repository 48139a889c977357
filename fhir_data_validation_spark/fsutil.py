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


def write_bytes_atomic(spark: SparkSession, path: str,
                       data: bytes) -> None:
    """Write-then-RENAME: ``write_bytes`` truncates the target on
    ``create`` before any byte lands, so a crash mid-write leaves a
    corrupt file that shadows recovery fallbacks (round-5 review —
    the SnapshotMonitor cursor). The temp+rename pattern leaves either
    the old content or the new, never a partial write, on any
    rename-atomic filesystem (local, HDFS; object stores approximate)."""
    tmp = f"{path}.tmp"
    write_bytes(spark, tmp, data, overwrite=True)
    fs, hpath, jvm = jfs(spark, path)
    tpath = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(hpath):
        fs.delete(hpath, False)
    if not fs.rename(tpath, hpath):
        raise IOError(f"rename {tmp} -> {path} failed")


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
