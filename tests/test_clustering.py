"""Clustering batch-dataflow semantics (reference
tests/test_cluster_process.py + test_pipeline_functional.py analogs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tackle4losscontentextraction_spark.operators import clustering


def test_assign_above_threshold(spark):
    vectors = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.5, 0.5])],
        "vec_id bigint, embedding array<double>",
    )
    clusters = spark.createDataFrame(
        [("cA", [1.0, 0.0], 3), ("cB", [0.0, 1.0], 2)],
        "cluster_id string, centroid array<double>, member_count bigint",
    )
    out = {r.vec_id: (r.cluster_id, r.cosine) for r in
           clustering.assign_to_clusters(vectors, clusters).collect()}
    assert out[1][0] == "cA" and out[1][1] == pytest.approx(1.0)
    assert out[2][0] == "cA"
    assert out[3][0] == "cB"
    # vec 4 has cos ~0.707 to both — below 0.82, unassigned
    assert 4 not in out


def test_two_similar_vectors_form_pair_cluster(spark):
    """Reference test_cluster_process.py: two near-identical vectors +
    empty cluster set -> one new 2-member cluster."""
    pending = spark.createDataFrame(
        [(10, [0.6, 0.8]), (11, [0.61, 0.79]), (12, [-1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    out = clustering.new_clusters_from_pairs(pending).collect()
    assert len(out) == 1
    row = out[0]
    assert {row.member_a, row.member_b} == {10, 11}
    assert row.member_count == 2
    mid = [(0.6 + 0.61) / 2, (0.8 + 0.79) / 2]
    assert list(row.centroid) == pytest.approx(mid)


def test_weighted_merge_fixpoint(spark):
    """Two centroids with cos > 0.9 merge with the weighted mean
    (test_pipeline_functional.py:159-192 analog)."""
    clusters = spark.createDataFrame(
        [("a", [1.0, 0.0], 1), ("b", [0.98, 0.05], 3), ("c", [0.0, 1.0], 2)],
        "cluster_id string, centroid array<double>, member_count bigint",
    )
    out = {r.cluster_id: r for r in clustering.merge_clusters_fixpoint(clusters).collect()}
    assert set(out) == {"a", "c"}
    merged = out["a"]
    assert merged.member_count == 4
    expect = [(1.0 * 1 + 0.98 * 3) / 4, (0.0 * 1 + 0.05 * 3) / 4]
    assert list(merged.centroid) == pytest.approx(expect)


def test_recount_members_drops_small_clusters(spark):
    clusters = spark.createDataFrame(
        [("a", [1.0], 99), ("b", [1.0], 1), ("c", [1.0], 5)],
        "cluster_id string, centroid array<double>, member_count bigint",
    )
    memberships = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")],
        "vec_id bigint, cluster_id string",
    )
    out = {r.cluster_id: r.member_count for r in
           clustering.recount_members(clusters, memberships).collect()}
    # a: fixed 99 -> 2; b: 1 member -> dropped; c: 1 member -> dropped
    assert out == {"a": 2}


def test_update_centroids_running_mean(spark):
    clusters = spark.createDataFrame(
        [("a", [1.0, 1.0], 2)],
        "cluster_id string, centroid array<double>, member_count bigint",
    )
    vectors = spark.createDataFrame(
        [(7, [4.0, 4.0]), (8, [4.0, 4.0])], "vec_id bigint, embedding array<double>"
    )
    assignments = spark.createDataFrame(
        [(7, "a"), (8, "a")], "vec_id bigint, cluster_id string"
    )
    out = clustering.update_centroids(clusters, vectors, assignments).collect()[0]
    # (c*2 + [8,8]) / 4 = [2.5, 2.5]
    assert list(out.centroid) == pytest.approx([2.5, 2.5])
    assert out.member_count == 4
