"""End-to-end clustering plan over a controlled vector set."""

from __future__ import annotations

import pytest

from tackle4losscontentextraction_spark.plans import cluster_pipeline


def test_cold_start_forms_pair_clusters(spark):
    vectors = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]), (2, [0.99, 0.05, 0.0]),     # pair A
            (3, [0.0, 1.0, 0.0]), (4, [0.02, 0.99, 0.0]),     # pair B
            (5, [0.5, 0.5, 0.7]),                              # loner
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = cluster_pipeline.run_clustering(spark, vectors)
    clusters = out["clusters"].collect()
    assigns = {r.vec_id: r.cluster_id for r in out["assignments"].collect()}
    pending = {r.vec_id for r in out["pending"].collect()}
    assert len(clusters) == 2
    assert assigns[1] == assigns[2]
    assert assigns[3] == assigns[4]
    assert assigns[1] != assigns[3]
    assert pending == {5}


def test_assign_to_existing_then_merge(spark):
    vectors = spark.createDataFrame(
        [(10, [1.0, 0.01]), (11, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    clusters = spark.createDataFrame(
        [("cA", [1.0, 0.0], 2), ("cA2", [0.995, 0.05], 2), ("cB", [0.0, 1.0], 3)],
        "cluster_id string, centroid array<double>, member_count bigint",
    )
    out = cluster_pipeline.run_clustering(spark, vectors, clusters)
    final = {r.cluster_id: r for r in out["clusters"].collect()}
    # cA and cA2 (cos > 0.9) merge; both incoming vectors assigned
    assert "cA" in final and "cA2" not in final
    assigns = {r.vec_id: r.cluster_id for r in out["assignments"].collect()}
    assert assigns[10] in ("cA", "cA2")
    assert assigns[11] == "cB"


def test_sweep_old_clusters(spark):
    from datetime import datetime

    clusters = spark.createDataFrame(
        [("a", [1.0], 2, datetime(2025, 1, 1), "NEW"),
         ("b", [1.0], 2, datetime(2025, 1, 5, 12), "NEW")],
        "cluster_id string, centroid array<double>, member_count bigint, updated_at timestamp, status string",
    )
    out = {r.cluster_id: r.status for r in
           cluster_pipeline.sweep_old_clusters(clusters, "2025-01-06 00:00:00").collect()}
    assert out == {"a": "OLD", "b": "NEW"}


def test_run_maintenance(spark):
    """count fixer (keep + unassign) + zero-centroid repair in one pass."""
    from tackle4losscontentextraction_spark.plans import cluster_pipeline

    clusters = spark.createDataFrame(
        [("a", [0.0, 0.0], 99), ("b", [1.0, 0.0], 1), ("c", [2.0, 2.0], 2)],
        "cluster_id string, centroid array<double>, member_count bigint",
    )
    memberships = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "c")],
        "vec_id bigint, cluster_id string",
    )
    vectors = spark.createDataFrame(
        [(1, [2.0, 6.0]), (2, [4.0, 2.0]), (3, [1.0, 1.0]), (4, [5.0, 5.0]), (5, [7.0, 7.0])],
        "vec_id bigint, embedding array<double>",
    )
    out = cluster_pipeline.run_maintenance(clusters, memberships, vectors)
    kept = {r.cluster_id: r for r in out["clusters"].collect()}
    # 'b' dropped (1 member), counts fixed, zero centroid of 'a' repaired
    assert set(kept) == {"a", "c"}
    assert kept["a"].member_count == 2 and kept["a"].centroid == [3.0, 4.0]
    assert kept["a"].repaired and not kept["c"].repaired
    unassign = [(r.vec_id, r.old_cluster_id) for r in out["unassign"].collect()]
    assert unassign == [(3, "b")]
