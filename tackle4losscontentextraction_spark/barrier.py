"""Projection-collapse barrier.

Catalyst's CollapseProject merges adjacent deterministic projections,
inlining an expensive expression into EVERY downstream column that
references it (measured 5-10x wall-clock blowups for the extraction and
minhash operators, whose column trees contain regex chains / md5 passes
over arrays). A bare nondeterministic column does not survive: column
pruning removes it (it is unused), after which the projects collapse.

The barrier that holds is:  nondeterministic column + a filter that
references it + drop afterwards.

- the Filter keeps the column alive through pruning,
- predicates cannot be pushed below a projection whose referenced
  field is nondeterministic, and
- CollapseProject never merges across a Filter.

`monotonically_increasing_id() >= 0` is always true (the id is a
non-negative partition/offset composite), so semantics are unchanged;
the optimizer has no rule to prove it, so the filter survives.

Cost: one extra long per row in the materialized projection — nothing.
This is a pure plan-shape device; it adds no shuffle and no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BARRIER_COL = "__collapse_barrier__"


def barrier(df: DataFrame) -> DataFrame:
    """Force the current projection to materialize before any further
    derived columns are added. Columns computed in `df`'s final select
    are evaluated exactly once per row."""
    return (
        df.withColumn(_BARRIER_COL, F.monotonically_increasing_id())
        .where(F.col(_BARRIER_COL) >= 0)
        .drop(_BARRIER_COL)
    )
