"""Enrichment fallback selection (F8/F9, reference
extractContent.py:220-249, 610-611).

When the primary extraction is short (< 800 chars) the reference tries
AMP / JSON-LD / Readability alternates and accepts the best alternate
only if it beats max(len(primary), 400); among alternates the longest
wins (:237-244). Network fetching is out of scope; the selection
combinators are the rebuilt operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ENRICH_TRIGGER_LEN = 800   # extractContent.py:226
ENRICH_ACCEPT_MIN = 400    # extractContent.py:246-248


def needs_enrichment(primary: Column) -> Column:
    return F.length(primary) < ENRICH_TRIGGER_LEN


def best_candidate(*candidates: Column) -> Column:
    """Longest candidate wins (greatest over (length, text) structs)."""
    structs = [F.struct(F.length(c).alias("l"), c.alias("t")) for c in candidates]
    return F.greatest(*structs)["t"] if len(structs) > 1 else structs[0]["t"]


def choose(primary: Column, *alternates: Column) -> Column:
    """The full F8+F9 rule: if the primary is short, take the longest
    alternate when it beats max(len(primary), ENRICH_ACCEPT_MIN)."""
    best_alt = best_candidate(*alternates)
    accept = needs_enrichment(primary) & (
        F.length(best_alt) > F.greatest(F.length(primary), F.lit(ENRICH_ACCEPT_MIN))
    )
    return F.when(accept, best_alt).otherwise(primary)
