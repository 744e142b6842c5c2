"""Round-5 physical-plan pins for the remaining scale-critical
operators (complements tests/test_plans.py).

Each test pins the plan property that makes the operator survive a
100x scale-up: projection paths must stay exchange-free and JVM-side,
bucketed dedup must keep its designed shuffle count (no posting
self-join creep), salted ops must keep the two-phase / replicated
shape, and nothing may regress into a CartesianProduct or an
unintended SortMergeJoin.
"""

from __future__ import annotations

import pytest

from planutil import SF, final_plan as _final_plan  # noqa: F401 (shared helper, ADVICE r5)


def _q(spark, name):
    from tackle4losscontentextraction_spark.plans.queries import SPARK_QUERIES

    return SPARK_QUERIES[name](spark, SF)


def test_hash_embeddings_is_pure_projection(spark):
    """Embedding synthesis (L4) is a per-row arithmetic projection: a
    KEYED exchange or a Python worker here multiplies by corpus size.
    (A round-robin repartition for fan-out over the single-file test
    parquet is allowed — it is data-independent and disappears under a
    many-file production scan.)"""
    final = _final_plan(_q(spark, "hash_embeddings"))
    assert final.count("FileScan") == 1
    assert "Exchange hashpartitioning" not in final
    assert "Exchange rangepartitioning" not in final
    assert "EvalPython" not in final


def test_extract_spans_explode_is_shuffle_free(spark):
    """extract_spans = extraction + explode to one row per kept span —
    still a narrow per-row pipeline: no keyed shuffle end-to-end."""
    final = _final_plan(_q(spark, "extract_spans"))
    assert final.count("FileScan") == 1
    assert "Exchange hashpartitioning" not in final
    assert "Exchange rangepartitioning" not in final
    assert "EvalPython" not in final


def test_simhash_signatures_stay_narrow(spark):
    """Per-doc simhash signatures are computed in one narrow pass over
    the corpus (the banding shuffle only exists in the PAIR query)."""
    final = _final_plan(_q(spark, "dedup_simhash"))
    assert final.count("FileScan") == 1
    assert "Exchange hashpartitioning" not in final
    assert "EvalPython" not in final


def test_minhash_keeps_designed_shuffle_count(spark):
    """Banded MinHash+LSH: ONE source scan, exactly two wide exchanges
    (band/bucket grouping + candidate-pair aggregation). A join or a
    third exchange means the posting self-join crept back in."""
    final = _final_plan(_q(spark, "dedup_minhash"))
    assert final.count("FileScan") == 1, "signatures derived twice"
    assert final.count("Exchange hashpartitioning") == 2  # exact count pinned against Spark 4.1.2; on a Spark upgrade a spurious failure here means re-audit, not a regression
    assert "Join" not in final
    assert "CartesianProduct" not in final


def test_salted_aggregate_is_two_phase(spark):
    """Skew-salted aggregation: salt-key partial agg + final agg = two
    exchanges over one scan; no join anywhere."""
    final = _final_plan(_q(spark, "domain_counts_salted"))
    assert final.count("FileScan") == 1
    assert final.count("Exchange hashpartitioning") == 2  # exact count pinned against Spark 4.1.2; on a Spark upgrade a spurious failure here means re-audit, not a regression
    assert "Join" not in final


def test_salted_join_replicates_small_side(spark):
    """Skew-salted join: the replicated (small) side must broadcast —
    a SortMergeJoin here re-introduces the skewed-key hot partition
    the salting exists to kill."""
    final = _final_plan(_q(spark, "salted_domain_join"))
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_broadcast_lookup_never_sort_merges(spark):
    """id->url dim lookup (J2): both dim joins must be broadcast."""
    final = _final_plan(_q(spark, "broadcast_lookup"))
    assert final.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in final


@pytest.mark.parametrize("name", ["ann_search", "cluster_assign"])
def test_similarity_paths_have_no_unbounded_products(spark, name):
    """ANN / centroid assignment: the only nested-loop joins allowed
    are broadcast-bounded (tiny query set / centroid set on the
    broadcast side); a CartesianProduct or SortMergeJoin means the
    bounded working-set contract broke."""
    final = _final_plan(_q(spark, name))
    assert "CartesianProduct" not in final
    assert "SortMergeJoin" not in final
    # every nested-loop occurrence must be the broadcast variant
    assert final.count("NestedLoopJoin") == final.count(
        "BroadcastNestedLoopJoin")
