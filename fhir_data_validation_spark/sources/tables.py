"""Parquet table loaders for the driver-generated testdata.

Stands in for the Iceberg catalog scan of the production design (SURVEY §1.1
S1: ``spark.read.table('cat.db.tokens')``): same declarative scan, so
predicate pushdown / column pruning behave identically; only the catalog
differs. Swap ``load_table`` for ``spark.read.table`` when an Iceberg
catalog is configured.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
