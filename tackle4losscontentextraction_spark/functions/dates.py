"""Publication-date normalization.

Reference ``clean_publication_date`` (extractContent.py:111-117) does
``dateutil.parser.parse(s, fuzzy=True).isoformat()`` returning None on
failure. Two tiers here:

- :func:`parse_date_formats` — JVM-side ``coalesce(try_to_timestamp...)``
  over an explicit format list. Deterministic, codegen-able, covers the
  formats the corpus actually contains. This is the hot path.
- :func:`fuzzy_parse_date_udf` — Arrow-vectorized pandas UDF wrapping
  ``dateutil`` fuzzy parsing for arbitrary free-text dates (the slow
  path; only applied to rows the format list missed).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import TimestampType

# Formats seen in the reference fixtures ("Aug 26, 2025",
# "Aug 27, 2025, 06:30 AM ET") plus ISO variants.
DATE_FORMATS = [
    "MMM d, yyyy",
    "MMMM d, yyyy",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
]


def parse_date_formats(col: Column, formats: list[str] | None = None) -> Column:
    """First format that parses wins; NULL when none do."""
    candidates = [
        F.try_to_timestamp(col, F.lit(fmt)) for fmt in (formats or DATE_FORMATS)
    ]
    return F.coalesce(*candidates)


# DataType object (not a DDL string) so the UDF can be declared without
# an active SparkSession (module import time).
@pandas_udf(TimestampType())
def fuzzy_parse_date_udf(s: pd.Series) -> pd.Series:
    """Vectorized dateutil fuzzy parse; NaT on failure (ref :111-117)."""
    from dateutil import parser as date_parser

    def _parse(x):
        if x is None or x == "":
            return None
        try:
            return date_parser.parse(x, fuzzy=True)
        except Exception:
            return None

    return s.map(_parse)


def normalize_publication_date(col: Column) -> Column:
    """Format-list fast path with fuzzy-UDF fallback for the misses."""
    fast = parse_date_formats(col)
    return F.when(fast.isNotNull() | (F.length(col) == 0), fast).otherwise(
        fuzzy_parse_date_udf(col)
    )
