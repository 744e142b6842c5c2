"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship extraction pipeline over sf0.001.
queries()     : every implemented operator (SURVEY.md §2 + training-data
                pipeline extensions) as (spark, sf_dir) -> DataFrame.
oracle_sql()  : DuckDB-runnable equivalents (see
                tackle4losscontentextraction_spark/plans/oracle_catalog.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tackle4losscontentextraction_spark.plans.oracle_catalog import ORACLES
from tackle4losscontentextraction_spark.plans.queries import SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synth span corpus from sf0.001 documents -> full
    extraction (clean, media-preserve, classify) -> per-doc results."""
    return SPARK_QUERIES["extract_meta"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
