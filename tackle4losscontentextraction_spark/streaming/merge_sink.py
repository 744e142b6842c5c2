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
) -> StreamingQuery:
    """Start a foreachBatch upsert of ``stream`` into ``table_dir``."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge.merge_write(
            batch_df.sparkSession, table_dir, batch_df,
            key=key, n_buckets=n_buckets,
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
