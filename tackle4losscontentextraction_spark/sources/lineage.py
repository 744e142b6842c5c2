"""Per-partition lineage / checkpoint-resume (north rule: a killed job
resumes without reprocessing completed partitions).

Reference analog: per-article commit + ``isProcessed`` flag + anti-join
scan of unprocessed rows (fetch_unprocessed_articles.py:59,
article_processor.py:109-141, SURVEY §2.10 R6 / §2.4 J6).

Spark design: work is split into deterministic *buckets*
(``pmod(xxhash64(doc_id), n_buckets)``). All pending buckets are
processed and written in ONE ``partitionBy("bucket")`` job (dynamic
partition overwrite); lineage records (bucket id, row count, status)
are appended ONLY AFTER that job commits, with counts taken from an
Observation on the write itself (write-audit-publish ordering — the
lineage write is the publish). Restart = anti-join of the bucket list
against the lineage table, so completed buckets are never recomputed
and half-written buckets (no lineage rows) are overwritten
idempotently by the next run's single job.

At 100 TB the bucket count is sized so each bucket is a few GB
(thousands of buckets); the anti-join is against a tiny lineage table
(broadcast), and bucket assignment is a pure projection — no extra
shuffle beyond the partitioned write itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil


def with_bucket(df: DataFrame, key: str = "doc_id", n_buckets: int = 16) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, lineage_dir: str) -> DataFrame:
    schema = "bucket int, n_rows bigint, status string"
    if not any(
        f.endswith(".parquet") for f in fsutil.list_names(spark, lineage_dir)
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
    """Process only not-yet-done buckets in ONE Spark job; publish the
    lineage rows for all of them after the data commit.

    ``transform`` must preserve the ``key`` column (the bucket is
    re-derived from it on the output side).

    The whole pending set is written as a single
    ``partitionBy("bucket")`` job with dynamic partition overwrite —
    the previous per-bucket loop of tiny jobs left a large cluster idle
    between scheduling waves and re-read every bucket for its count.
    Per-bucket row counts now come from an ``Observation`` on the SAME
    write job (write metrics, not a second scan). Ordering is still
    write-audit-publish: a job killed mid-write leaves old partition
    data intact (the overwrite commits at job completion) and no
    lineage rows, so the next run redoes exactly those buckets.

    At thousands of buckets (the 100 TB sizing) the observation is one
    conditional-sum column per pending bucket — wide but constant-space
    per task; beyond ~10k pending buckets batch the run into waves.

    Returns {"processed": [...], "skipped": [...], "rows": n}.
    """
    pending = pending_buckets(spark, df, lineage_dir, n_buckets, key)
    skipped = [b for b in range(n_buckets) if b not in pending]
    fsutil.mkdirs(spark, lineage_dir)
    if not pending:
        return {"processed": [], "skipped": skipped, "rows": 0}

    # a pending bucket's directory, if present, is by definition an
    # uncommitted leftover from a crashed attempt (done buckets are
    # never pending). Clear them up front: dynamic overwrite only
    # replaces partitions PRESENT in the new output, so a transform
    # legitimately yielding 0 rows for a bucket would otherwise leave
    # the garbage in place under a fresh 'done' lineage row. The delete
    # goes through the Hadoop FileSystem API (fsutil), so it works
    # unchanged on HDFS/S3 table locations — or is simply unnecessary
    # with Iceberg, where uncommitted files are not in any snapshot.
    for b in pending:
        fsutil.delete_dir(spark, f"{out_dir}/bucket={b}")

    bucketed = with_bucket(df, key, n_buckets)
    part = transform(bucketed.where(F.col("bucket").isin(pending)))
    part = with_bucket(part, key, n_buckets)

    from pyspark.sql import Observation

    obs = Observation("lineage_counts")
    # The write is CLUSTERED by bucket (Iceberg write.distribution-mode=
    # hash): without the repartition every input task opened a writer
    # for every bucket — input_partitions x n_buckets small files (2048
    # at 100k docs/32 buckets, measured 24.5s for the stage) — and every
    # downstream scan paid the listing + open tax. One exchange of the
    # extracted rows buys one file per bucket and a 32-task write. The
    # observe rides ABOVE the repartition so AQE's empty-relation
    # propagation cannot drop the CollectMetrics node when a transform
    # yields zero rows (see merge.merge_write).
    part = part.repartition(n_buckets, F.col("bucket")).observe(
        obs,
        *[
            F.sum((F.col("bucket") == b).cast("long")).alias(f"b{b}")
            for b in pending
        ],
    )
    # data commit first (one job, only pending partitions replaced) ...
    (
        part.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    metrics = obs.get
    counts = {b: int(metrics[f"b{b}"] or 0) for b in pending}
    # ... lineage publish second (write-audit-publish)
    spark.createDataFrame(
        [(b, counts[b], "done") for b in pending],
        "bucket int, n_rows bigint, status string",
    ).write.mode("append").parquet(lineage_dir)
    return {"processed": pending, "skipped": skipped, "rows": sum(counts.values())}
