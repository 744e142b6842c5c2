"""Explicit skew handling (north rule: "explicit salting/repartitioning
for skewed hot domains").

Crawled corpora are Zipfian by domain (the synthetic corpus gives
espn.com ~30% of docs). A plain groupBy(domain) funnels the hot key
into one reducer; the two-phase salted aggregate below bounds any
reducer's share to 1/salt_buckets of the hot key:

    phase 1: groupBy(domain, salt = xxhash64(row_key) % S)  -- partial
    phase 2: groupBy(domain)                                 -- tiny

AQE's skew-join splitting handles the join case at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); this helper is
the aggregation-side counterpart you opt into for known-hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, row_key: str, buckets: int = 16) -> DataFrame:
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(row_key)), F.lit(buckets)).cast("int"))


def salted_count(
    df: DataFrame, group_col: str | Column, row_key: str = "doc_id", buckets: int = 16
) -> DataFrame:
    """count(*) by group_col via the two-phase salted aggregate."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    phase1 = (
        with_salt(df, row_key, buckets)
        .groupBy(g.alias("grp"), F.col("_salt"))
        .agg(F.count("*").alias("c"))
    )
    return phase1.groupBy("grp").agg(F.sum("c").cast("bigint").alias("n"))
