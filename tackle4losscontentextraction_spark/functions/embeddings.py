"""Deterministic hashed text embeddings (L4 rebuild target).

The reference calls text-embedding-3-small (1536-d) and L2-normalizes
(create_embeddings.py:73-115). The deterministic stand-in preserves the
shape — fixed-dim, L2-normalized float vector — via feature hashing:

    for each distinct token t:
        h       = md5(t)
        bucket  = first md5 hex chunk   mod dim
        sign    = parity of another hex nibble (+1 / -1)
        v[bucket] += sign
    v <- v / ||v||   (zero vector unchanged)

Everything is md5/substr/mod arithmetic — bit-identical in DuckDB and
plain Python, so the embedding operator itself sits under the oracle
correctness gate (rare for an 'ML' stage). JVM-side only, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import vectors as vec_fn

DEFAULT_DIM = 64


def _bucket(h: Column, dim: int) -> Column:
    # first 8 hex chars -> int via conv; conv returns string -> bigint
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(dim))


def _sign(h: Column) -> Column:
    # low bit of the 9th nibble: +1 / -1
    return (
        F.pmod(F.instr(F.lit("0123456789abcdef"), F.substring(h, 9, 1)) - 1, F.lit(2)) * 2 - 1
    ).cast("double")


def hash_embed(text: Column, dim: int = DEFAULT_DIM) -> Column:
    """array<double> hashed-token embedding, L2-normalized.

    Single fold over the token list with a dim-long array accumulator:
    md5 runs ONCE per token.  (The first version transposed the loops —
    transform over positions, aggregate over tokens inside — which
    re-evaluated the md5 contribution list per position, dim×, and
    worse, inlined the INPUT expression dim× too: hash_embed over a
    derived column like main_content(extracted) ballooned from seconds
    to unbounded.  Values are unchanged: per bucket the signs still
    add in token order, and ±1.0 sums are exact in doubles.)"""
    tokens = F.array_distinct(F.split(F.lower(F.trim(text)), r"\s+"))
    hashes = F.transform(tokens, lambda t: F.md5(t))
    contribs = F.transform(
        hashes, lambda h: F.struct(_bucket(h, dim).alias("b"), _sign(h).alias("s"))
    )
    vec = F.aggregate(
        contribs,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, c: F.transform(
            acc, lambda v, j: v + F.when(c["b"] == j.cast("bigint"), c["s"]).otherwise(F.lit(0.0))
        ),
    )
    return vec_fn.l2_normalize(vec)


def embed_documents(docs: DataFrame, text_col: str = "text", dim: int = DEFAULT_DIM) -> DataFrame:
    return docs.withColumn("embedding", hash_embed(F.col(text_col), dim))
