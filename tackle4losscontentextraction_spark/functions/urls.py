"""URL normalization (reference article_processor.py:40-41,
extractContent.py:577-578 — the repo's 'original bug' regression:
URLs must be percent-decoded before use)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import spec


def normalize_url(col: Column) -> Column:
    """unquote(url); prepend https://www. when no http prefix."""
    decoded = F.try_url_decode(col)
    decoded = F.coalesce(decoded, col)
    return F.when(
        decoded.startswith("http"), decoded
    ).otherwise(F.concat(F.lit("https://www."), decoded))


def url_domain(url: Column) -> Column:
    """Hostname of an already-normalized URL (for skew-aware partitioning)."""
    return F.parse_url(url, F.lit("HOST"))


def is_roundup_url(url_norm: Column) -> Column:
    """Roundup classifier shortcut (extractContent.py:462-463)."""
    return F.lower(url_norm).rlike(spec.ROUNDUP_URL_REGEX)
