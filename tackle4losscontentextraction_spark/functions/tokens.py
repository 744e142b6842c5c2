"""Token counting and text chunking.

Reference ``num_tokens``/``chunk_text`` (extractContent.py:120-133) use
tiktoken. tiktoken is not in this environment, so:

- :func:`token_count_ws` — whitespace tokens (JVM-side).
- :func:`token_count_bpe_regex` — BPE-ish regex token count (the GPT-2
  pre-tokenizer word/number/punct split), JVM-side via ``regexp_count``.
- :func:`token_count_proxy` — chars/4 heuristic for chunk planning.
- :func:`chunk_text_by_tokens` — windowed slices of ~max_tokens words
  (array of chunks; per-row, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer classes: contractions, letter runs, digit
# runs, punctuation runs (kept RE2/Java compatible — no \p{L} lookaheads).
BPE_TOKEN_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_count_ws(col: Column) -> Column:
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_bpe_regex(col: Column) -> Column:
    return F.regexp_count(col, F.lit(BPE_TOKEN_REGEX))


def token_count_proxy(col: Column) -> Column:
    """length/4 — the classic planning proxy (ceil)."""
    return F.ceil(F.length(col) / F.lit(4.0)).cast("int")


def chunk_text_by_tokens(col: Column, max_tokens: int) -> Column:
    """Split into chunks of <= max_tokens whitespace tokens.

    Returns array<string>. Per-row (higher-order functions only) — the
    Spark analog of the reference's chunk_text (extractContent.py:127-133)
    minus the LLM context-limit motivation.
    """
    words = F.split(F.trim(col), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(max_tokens)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.array_join(
            F.slice(words, i * max_tokens + 1, max_tokens), " "
        ),
    )
