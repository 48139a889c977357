"""Iceberg snapshot ingest + MERGE-based lineage (S1 executed path).

The reference's input contract is snapshot ingest
(``Core/ValidationPipeline.cs:486-604``: one immutable bundle in, issue
list out); at 10^12 rows the immutable-input analog is an **Iceberg
snapshot scan** — time-travel by ``snapshot-id`` pins the exact table
state a run validated, and the lineage table records that id so a resumed
run re-reads the identical data even while writers append.

Everything here uses only the public Iceberg-Spark runtime surface
(``org.apache.iceberg.spark.SparkCatalog``, the ``snapshot-id`` read
option, the ``<table>.snapshots`` metadata table, SQL ``MERGE INTO``).
The container this repo is built in has no Iceberg runtime jar, so every
entry point probes :func:`iceberg_available` first and the integration
test self-skips — the snapshot contract still runs for real here through
:mod:`.iceberg_py`, a pure-Python implementation of the Iceberg v2 table
format (same layout on disk, executed in ``tests/test_iceberg_py.py``).
On a cluster, submit with

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
        --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \\
        --conf spark.sql.catalog.local.type=hadoop \\
        --conf spark.sql.catalog.local.warehouse=<path> ...

and the same code runs unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"


class IcebergUnavailableError(RuntimeError):
    pass


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg-Spark runtime is on the session classpath."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — classpath probe needs the JVM
        jvm.java.lang.Class.forName(ICEBERG_CATALOG_IMPL)
        return True
    except Exception:
        return False


def configure_local_catalog(spark: SparkSession, name: str = "local",
                            warehouse: str = "/tmp/iceberg-warehouse"
                            ) -> None:
    """Register a Hadoop-catalog Iceberg catalog on a live session.

    V2 catalog configs resolve lazily at first use, so this works at
    runtime — no session restart needed."""
    if not iceberg_available(spark):
        raise IcebergUnavailableError(
            f"{ICEBERG_CATALOG_IMPL} not on the classpath; submit with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-…")
    spark.conf.set(f"spark.sql.catalog.{name}", ICEBERG_CATALOG_IMPL)
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse", warehouse)


def write_table(df: DataFrame, table: str, partition_col: str | None = None,
                mode: str = "append") -> None:
    """Create-or-append the token table, partitioned by ``source`` so the
    per-batch resume filter prunes at the manifest level (lineage.py's
    never-re-scan-completed-partitions contract)."""
    writer = df.writeTo(table)
    if partition_col:
        from pyspark.sql import functions as F
        writer = writer.partitionedBy(F.col(partition_col))
    if mode == "append":
        writer.append()
    else:
        writer.createOrReplace()


def create_table(df: DataFrame, table: str,
                 partition_col: str | None = None) -> None:
    writer = df.writeTo(table)
    if partition_col:
        from pyspark.sql import functions as F
        writer = writer.partitionedBy(F.col(partition_col))
    writer.createOrReplace()


def read_snapshot(spark: SparkSession, table: str,
                  snapshot_id: int | str | None = None) -> DataFrame:
    """Snapshot-pinned scan: the immutable input of one validation run."""
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.table(table)


def snapshots(spark: SparkSession, table: str) -> DataFrame:
    """The table's snapshot log (``<table>.snapshots`` metadata table)."""
    return spark.read.table(f"{table}.snapshots")


def current_snapshot_id(spark: SparkSession, table: str) -> int:
    row = (snapshots(spark, table)
           .orderBy("committed_at", ascending=False).limit(1)
           .select("snapshot_id").collect())
    if not row:
        raise ValueError(f"table {table} has no snapshots")
    return row[0][0]


LINEAGE_DDL = ("(run_id string, partition_key string, rule_id string, "
               "rows bigint, violations bigint, errors bigint, "
               "passed boolean, wall_ms bigint, completed_at double)")


class IcebergLineageStore:
    """Iceberg-backed lineage with idempotent MERGE upsert.

    Same contract as ``lineage.LineageStore`` (read / append /
    completed_partitions / metrics) but the append is a ``MERGE INTO``
    keyed ``(run_id, partition_key, rule_id)`` — re-running an interrupted
    batch *updates* its marker rows instead of duplicating them, which
    makes the marker write itself idempotent (parquet append relies on the
    at-least-once + idempotent-output argument instead)."""

    def __init__(self, table: str):
        self.table = table

    def ensure(self, spark: SparkSession) -> None:
        spark.sql(f"CREATE TABLE IF NOT EXISTS {self.table} {LINEAGE_DDL} "
                  "USING iceberg PARTITIONED BY (run_id)")

    def read(self, spark: SparkSession) -> DataFrame:
        self.ensure(spark)
        return spark.read.table(self.table)

    def completed_partitions(self, spark: SparkSession, run_id: str
                             ) -> set[str]:
        from pyspark.sql import functions as F
        rows = (self.read(spark).where(F.col("run_id") == run_id)
                .select("partition_key").distinct().collect())
        return {r["partition_key"] for r in rows}

    def append(self, spark: SparkSession, records: list[tuple]) -> None:
        self.ensure(spark)
        src = spark.createDataFrame(
            records, LINEAGE_DDL.strip("()").replace(" bigint", " long"))
        # unique per-call view name: concurrent batch threads must not
        # replace each other's source view between registration and MERGE
        import uuid as _uuid
        view = f"_lineage_src_{_uuid.uuid4().hex}"
        src.createOrReplaceTempView(view)
        try:
            spark.sql(f"""
                MERGE INTO {self.table} t
                USING {view} s
                ON t.run_id = s.run_id AND t.partition_key = s.partition_key
                   AND t.rule_id <=> s.rule_id
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""")
        finally:
            spark.catalog.dropTempView(view)

    def metrics(self, spark: SparkSession, run_id: str) -> DataFrame:
        from pyspark.sql import functions as F
        return self.read(spark).where(F.col("run_id") == run_id)
