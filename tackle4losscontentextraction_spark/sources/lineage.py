"""Per-partition lineage / checkpoint-resume (north rule: a killed job
resumes without reprocessing completed partitions).

Reference analog: per-article commit + ``isProcessed`` flag + anti-join
scan of unprocessed rows (fetch_unprocessed_articles.py:59,
article_processor.py:109-141, SURVEY §2.10 R6 / §2.4 J6).

Spark design: work is split into deterministic *buckets*
(``pmod(xxhash64(doc_id), n_buckets)``). Each bucket is processed and
written independently; a lineage record (bucket id, row count, status)
is appended ONLY AFTER the bucket's output parquet is fully committed
(write-audit-publish ordering — the lineage write is the publish).
Restart = anti-join of the bucket list against the lineage table, so
completed buckets are never recomputed and a half-written bucket (no
lineage row) is overwritten idempotently via dynamic partition
overwrite of that bucket's directory.

At 100 TB the bucket count is sized so each bucket is a few GB
(thousands of buckets); the anti-join is against a tiny lineage table
(broadcast), and bucket assignment is a pure projection — no extra
shuffle beyond the partitioned write itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_bucket(df: DataFrame, key: str = "doc_id", n_buckets: int = 16) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, lineage_dir: str) -> DataFrame:
    schema = "bucket int, n_rows bigint, status string"
    if not os.path.exists(lineage_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(lineage_dir)
    ):
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema).parquet(lineage_dir)
        .where(F.col("status") == "done")
        .select("bucket", "n_rows", "status")
        .distinct()
    )


def pending_buckets(
    spark: SparkSession, df: DataFrame, lineage_dir: str, n_buckets: int = 16, key: str = "doc_id"
) -> list[int]:
    done = {r.bucket for r in completed_buckets(spark, lineage_dir).collect()}
    return [b for b in range(n_buckets) if b not in done]


def run_with_resume(
    spark: SparkSession,
    df: DataFrame,
    transform,
    out_dir: str,
    lineage_dir: str,
    n_buckets: int = 16,
    key: str = "doc_id",
) -> dict:
    """Process only not-yet-done buckets; write output partitioned by
    bucket; publish a lineage row per bucket after its data commits.

    Returns {"processed": [...], "skipped": [...], "rows": n}.
    """
    bucketed = with_bucket(df, key, n_buckets)
    pending = pending_buckets(spark, df, lineage_dir, n_buckets, key)
    skipped = [b for b in range(n_buckets) if b not in pending]
    total = 0
    os.makedirs(lineage_dir, exist_ok=True)
    for b in pending:
        part = transform(bucketed.where(F.col("bucket") == b))
        # data commit first ...
        part.write.mode("overwrite").parquet(os.path.join(out_dir, f"bucket={b}"))
        n = spark.read.parquet(os.path.join(out_dir, f"bucket={b}")).count()
        # ... lineage publish second (write-audit-publish)
        spark.createDataFrame(
            [(b, n, "done")], "bucket int, n_rows bigint, status string"
        ).write.mode("append").parquet(lineage_dir)
        total += n
    return {"processed": pending, "skipped": skipped, "rows": total}
