"""URL normalization (reference article_processor.py:40-41,
extractContent.py:577-578 — the repo's 'original bug' regression:
URLs must be percent-decoded before use)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import spec


def normalize_url(col: Column) -> Column:
    """unquote(url); prepend https://www. when no http prefix.

    Unified decode semantics across the Catalyst, Arrow and pyoracle
    paths (they must be row-for-row equal):

    - '+' is PRESERVED (urllib.parse.unquote semantics, matching the
      reference's unquote at article_processor.py:40-41) — java.net
      URLDecoder would turn it into a space, so it is protected as
      %2B before try_url_decode;
    - a malformed escape ('%zz', trailing '%') stays LITERAL while
      valid escapes elsewhere still decode ('a%zz%20b' -> 'a%zz b') —
      exactly urllib.parse.unquote: each invalid '%' is protected as
      '%25' before try_url_decode, so the decoder never sees it (the
      old rendition bailed on the whole string, diverging from the
      reference's unquote);
    - invalid UTF-8 percent-sequences decode to U+FFFD (both engines
      already agree on this).
    """
    protected = F.regexp_replace(col, r"%(?![0-9A-Fa-f]{2})", "%25")
    protected = F.replace(protected, F.lit("+"), F.lit("%2B"))
    decoded = F.try_url_decode(protected)
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
