"""Streaming deduplication (SURVEY §2.9 extension; the streaming twin
of operators/dedup.exact_duplicates).

A crawl stream re-delivers documents — retried fetches, republished
URLs, syndicated copies. The batch engine dedups with one hash
aggregate; the stream needs STATE: a digest seen in an earlier
micro-batch must suppress later arrivals. Structured Streaming's
``dropDuplicatesWithinWatermark`` is exactly that operator:

- keys: the content digest (md5 of the normalized text — identical to
  the batch ``dup_key``, so batch and stream agree on what "duplicate"
  means);
- state bound: the event-time watermark. State for a digest is kept
  only ``delay`` past its event time, so the state store is
  O(docs-per-delay-window), not O(all docs ever) — the property that
  makes this runnable forever at crawl scale. (Plain
  ``dropDuplicates`` without watermark grows state unboundedly —
  never deploy that variant.)

At 100 TB-equivalent stream rates the state store shuffles by digest
(uniform — no skew), and RocksDB state backend
(``spark.sql.streaming.stateStore.providerClass``) keeps it off-heap;
the operator itself is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import exact_dup_key


def dedup_key(text_col: str = "text") -> F.Column:
    """The batch digest, shared by import — ONE definition of what a
    duplicate is (operators/dedup.exact_dup_key)."""
    return exact_dup_key(F.col(text_col))


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    delay: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins streaming dedup: later rows with the same
    content digest within the watermark window are dropped."""
    keyed = stream.withColumn("dup_key", dedup_key(text_col))
    return keyed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["dup_key"]
    )
