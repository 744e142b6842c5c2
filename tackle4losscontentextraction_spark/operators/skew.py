"""Explicit skew handling (north rule: "explicit salting/repartitioning
for skewed hot domains").

Crawled corpora are Zipfian by domain (the synthetic corpus gives
espn.com ~30% of docs). A plain groupBy(domain) funnels the hot key
into one reducer; the two-phase salted aggregate below bounds any
reducer's share to 1/salt_buckets of the hot key:

    phase 1: groupBy(domain, salt = xxhash64(row_key) % S)  -- partial
    phase 2: groupBy(domain)                                 -- tiny

AQE's skew-join splitting handles the join case at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); this helper is
the aggregation-side counterpart you opt into for known-hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, row_key: str, buckets: int = 16) -> DataFrame:
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(row_key)), F.lit(buckets)).cast("int"))


def salted_count(
    df: DataFrame, group_col: str | Column, row_key: str = "doc_id", buckets: int = 16
) -> DataFrame:
    """count(*) by group_col via the two-phase salted aggregate."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    phase1 = (
        with_salt(df, row_key, buckets)
        .groupBy(g.alias("grp"), F.col("_salt"))
        .agg(F.count("*").alias("c"))
    )
    return phase1.groupBy("grp").agg(F.sum("c").cast("bigint").alias("n"))


_PARTIAL = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    group_col: str | Column,
    aggs: dict[str, tuple[str, str | Column]],
    row_key: str = "doc_id",
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregate for any set of DECOMPOSABLE aggregates
    (count/sum/min/max — the algebraic aggs whose partials combine).

    ``aggs``: out_alias -> (fn_name, input column), e.g.
    ``{"n": ("count", "*"), "chars": ("sum", "n_chars")}``.

    Same plan shape as :func:`salted_count` (which is the ``count``
    special case): phase 1 groups on (key, salt) so the hot key's rows
    split across ``buckets`` reducers; phase 2 combines the per-salt
    partials — ``buckets`` rows per key, trivially small. avg is
    expressible as sum/count by the caller; distinct-style aggs are NOT
    decomposable this way (their state, not their input, is the skew).
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    partials = []
    finals = []
    for alias, (fn, col) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"non-decomposable aggregate: {fn}")
        p_fn, f_fn = _PARTIAL[fn]
        c = F.lit(1) if (fn == "count" and col == "*") else (
            F.col(col) if isinstance(col, str) else col)
        partials.append(p_fn(c).alias(f"__p_{alias}"))
        finals.append(f_fn(F.col(f"__p_{alias}")).alias(alias))
    phase1 = (
        with_salt(df, row_key, buckets)
        .groupBy(g.alias("grp"), F.col("_salt"))
        .agg(*partials)
    )
    return phase1.groupBy("grp").agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    row_key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of a Zipfian ``big`` side against a ``small``
    side too large to broadcast outright.

    The classic salt: the big side's hot key would funnel into one
    reducer of a shuffled join, so each big row gets a deterministic
    salt (hash of its row_key, NOT a random — keeps the plan
    re-executable/resumable), and the small side is exploded ``buckets``
    ways so every (key, salt) pair still finds its match. The hot key's
    rows now spread across ``buckets`` reducers; small pays a
    buckets-fold replication, which is the explicit trade.

    Use when AQE's runtime skew-join split can't help: e.g. the skew is
    in an aggregation-feeding join that AQE sees only after a merge of
    already-oversized partitions, or the join is bucketed/sort-merge
    where split points are pinned. Otherwise prefer plain join + AQE
    (on in session.py).

    Result is row-identical to ``big.join(small, key, how)`` (oracle:
    `salted_domain_join`). Supports inner and left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salted_big = with_salt(big, row_key, buckets)
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_big.join(replicated, [key, "_salt"], how).drop("_salt")
