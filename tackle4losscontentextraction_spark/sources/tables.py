"""Testdata/table readers with explicit schemas (scan operators S1-S5).

Explicit schemas keep the scan plan stable and let Catalyst prune
columns + push filters into the parquet reader (check .explain for
PushedFilters / ReadSchema)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for n in TABLE_NAMES:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)
