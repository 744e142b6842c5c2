"""Streaming MERGE sink: continuously upsert a stream into the
hash-bucketed copy-on-write table (operators/merge.py).

Reference analog: the pipeline upserts every processed article back to
the store as it completes (db_access.py:291-317 batch upsert inside the
hourly run). The Spark-native rendition is ``foreachBatch``: each
micro-batch becomes one bucket-pruned MERGE, so

- a micro-batch only rewrites the buckets its keys touch (same I/O
  profile as an Iceberg streaming MERGE sink);
- re-delivered micro-batches (restart replay) are idempotent — upsert
  of the same rows is a no-op (tests/test_merge.py property);
- exactly-once = file-source checkpoint + idempotent merge. Each
  micro-batch commits as ONE table snapshot (merge.py's atomic
  manifest publish); a kill mid-batch leaves the previous snapshot
  readable and the replayed batch recommits cleanly.

At 10^12-doc scale the bucket count is sized in the thousands; each
micro-batch touches only the buckets of its (typically recent, skewed)
keys, so the sink's work tracks the stream rate, not the table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import merge


def start_merge_sink(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str = "doc_id",
    n_buckets: int = 16,
    expire_every: int = 50,
    keep_snapshots: int = 10,
) -> StreamingQuery:
    """Start a foreachBatch upsert of ``stream`` into ``table_dir``.

    Each micro-batch commits one table snapshot, so a long-running sink
    accretes history; every ``expire_every`` batches the sink expires
    all but the newest ``keep_snapshots`` manifests (data dirs still
    serving current buckets survive — see merge.expire_snapshots).
    Pass ``expire_every=0`` to keep unbounded history."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        merge.merge_write(
            spark, table_dir, batch_df, key=key, n_buckets=n_buckets,
        )
        if expire_every and batch_id > 0 and batch_id % expire_every == 0:
            merge.expire_snapshots(spark, table_dir, keep_last=keep_snapshots)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
