"""Vector math over ``array<float|double>`` columns.

Reference semantics (vector_utils.py:16-120, create_embeddings.py:98-115):
string-encoded embedding parse, L2 normalize (zero vector unchanged),
cosine similarity with the stride-2 downsample rule (dims differing by
exactly 2x -> downsample the longer with ``v[::2]``), dimension
normalization to a target via stride sampling.

Everything is JVM-side higher-order array functions — per-row, no
shuffle, codegen-friendly. A pandas-UDF variant of cosine exists for
wide fan-out cases where Arrow batching beats expression trees.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_embedding_string(col: Column) -> Column:
    """Parse '[1.0, 2.0]' or '1.0 2.0' into array<double>; NULL elements
    for unparseable tokens (reference raises ValueError; we surface
    NULLs so the caller can filter error rows)."""
    stripped = F.trim(F.regexp_replace(col, r"[\[\]]", ""))
    sep = F.when(stripped.contains(","), F.lit(",")).otherwise(F.lit(" "))
    parts = F.split(stripped, r",\s*|\s+")
    parts = F.filter(parts, lambda x: F.length(x) > 0)
    _ = sep  # split pattern covers both encodings
    return F.transform(parts, lambda x: x.try_cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def bind_once(col: Column, f) -> Column:
    """Evaluate ``col`` ONCE and pass it to ``f`` as a higher-order-
    function lambda variable.  Column expressions have no let-binding:
    referencing the same Column twice inlines (and re-executes) its
    whole tree at every site — and a reference from inside a transform
    lambda re-executes it PER ELEMENT.  A lambda variable, by contrast,
    is a materialized value.  ``transform(array(col), f)[0]`` is that
    let-binding: one wrapper array per row buys expression-DAG sharing
    Catalyst doesn't otherwise provide (CollapseProject/codegen do no
    runtime CSE inside HOF lambdas — same economics as barrier.py, but
    at expression rather than plan granularity)."""
    return F.get(F.transform(F.array(col), f), 0)


def l2_normalize(a: Column) -> Column:
    """v / ||v||; zero vector returned unchanged (create_embeddings.py:98-115).

    ``a`` is bound once (see bind_once): when the input is a derived
    expression (hash_embed's fold, a HOF chain), the naive form
    re-evaluated it per output element via the norm inside the divide
    lambda — O(dim²·cost(a)) — which turned the pipeline's embed stage
    from seconds into a hang at 30k docs."""
    return bind_once(
        a,
        lambda v: bind_once(
            l2_norm(v),
            lambda n: F.when(n == 0.0, v.cast("array<double>")).otherwise(
                F.transform(v, lambda x: x / n)
            ),
        ),
    )


def stride_downsample(a: Column, factor: int = 2) -> Column:
    """v[::factor] — the reference's 1536->768 rule (vector_utils.py:97-120)."""
    return F.filter(a, lambda x, i: i % factor == 0)


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) with the reference's edge rules (vector_utils.py:42-95):

    - empty arrays -> 0.0 (size-1 vectors get a REAL cosine, ±1 — the
      reference only zeroes ndim-0/empty inputs)
    - zero-norm either side -> 0.0
    - dims differing by exactly 2x -> stride-2 downsample the longer
    - other dim mismatches -> NULL (reference raises ValueError)
    """
    a2 = F.when(F.size(a) == F.size(b) * 2, stride_downsample(a)).otherwise(a)
    b2 = F.when(F.size(b) == F.size(a) * 2, stride_downsample(b)).otherwise(b)
    na, nb = l2_norm(a2), l2_norm(b2)
    raw = dot(a2, b2) / (na * nb)
    return (
        F.when((F.size(a2) == 0) | (F.size(b2) == 0), F.lit(0.0))
        .when(F.size(a2) != F.size(b2), F.lit(None).cast("double"))
        .when((na == 0.0) | (nb == 0.0), F.lit(0.0))
        .otherwise(raw)
    )


def running_mean_update(centroid: Column, v: Column, n: Column) -> Column:
    """(centroid*n + v) / (n+1) — greedy-assign update (cluster_manager.py:81)."""
    return F.zip_with(centroid, v, lambda c, x: (c * n + x) / (n + 1))


def weighted_merge(c1: Column, n1: Column, c2: Column, n2: Column) -> Column:
    """(c1*n1 + c2*n2) / (n1+n2) — cluster merge (cluster_manager.py:239-241)."""
    return F.zip_with(c1, c2, lambda x, y: (x * n1 + y * n2) / (n1 + n2))
