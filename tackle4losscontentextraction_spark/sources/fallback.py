"""Fallback source combinator (SURVEY §2.1 S7).

Reference: when the primary crawl yields nothing usable, a direct HTTP
re-fetch supplies the payload (``_http_get``,
``src/modules/extraction/extractContent.py:138-154``, used by the AMP /
raw-body enrichment chain at :156-171). This sandbox has no network, so
the *fetch* is out of scope — but the OPERATOR the fallback implements
is a dataflow shape, not an HTTP call: rows whose primary payload is
missing or error-marked take their payload from a secondary source
keyed by the same id. On a real deployment the secondary table is the
raw-fetch capture (a crawler sink); here it is any DataFrame with the
primary's schema.

Scale design: one anti-split (a filter, no shuffle) + one equi-join on
the key restricted to the MISSING rows only — the join probe side is
the failure subset (typically a small fraction), so the join is
broadcast-able when failures are rare and degrades gracefully when not.
No row explosion; output schema == primary schema + a ``source_used``
tag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_missing_predicate() -> Column:
    """A span-table row needing fallback: NULL/empty spans, or the
    single error span (the crawl error sentinel, extraction.py F6)."""
    return (
        F.col("spans").isNull()
        | (F.size("spans") == 0)
        | (
            (F.size("spans") == 1)
            & F.get(F.col("spans"), 0)["text"].startswith("Extraction error:")
        )
    )


def with_fallback(
    primary: DataFrame,
    secondary: DataFrame,
    key: str = "doc_id",
    is_missing: Column | None = None,
) -> DataFrame:
    """Rows of ``primary`` failing ``is_missing`` pass through; failing
    rows are replaced by the ``secondary`` row with the same key (rows
    missing from secondary too are kept from primary, tagged
    'primary_failed' — the reference also gives up after the fallback).

    Returns primary's columns + ``source_used`` in
    ('primary', 'fallback', 'primary_failed').
    """
    if is_missing is None:
        is_missing = default_missing_predicate()
    flagged = primary.withColumn("__miss", is_missing)
    ok = flagged.where(~F.col("__miss")).drop("__miss").withColumn(
        "source_used", F.lit("primary")
    )
    need = flagged.where(F.col("__miss")).drop("__miss")
    # a raw-fetch capture naturally holds several rows per key (retried
    # fetches) — keep exactly ONE deterministically (min by the full
    # row-struct, i.e. lexicographically first) so the output never
    # duplicates a doc_id
    sec_cols = [c for c in secondary.columns if c != key]
    sec_one = (
        secondary.groupBy(key)
        .agg(F.min(F.struct(*sec_cols)).alias("__r"))
        .select(key, *[F.col(f"__r.{c}").alias(c) for c in sec_cols])
    )
    fb = (
        need.select(key)
        .join(sec_one, key, "inner")
        .select(*primary.columns)
        .withColumn("source_used", F.lit("fallback"))
    )
    still_missing = (
        need.join(secondary.select(key), key, "left_anti")
        .withColumn("source_used", F.lit("primary_failed"))
    )
    return ok.unionByName(fb).unionByName(still_missing)
