"""Round-6 physical-plan pins for the shapes this optimization round
introduced (complements test_plans.py / test_plans_round5.py).

Pinned against Spark 4.1.2 (see ADVICE r5 note on version-sensitive
exact-count pins — these use presence/absence, not counts).
"""

from __future__ import annotations

from planutil import SF, final_plan as _final_plan  # noqa: F401 (shared helper, ADVICE r5)


def _q(spark, name):
    from tackle4losscontentextraction_spark.plans.queries import SPARK_QUERIES

    return SPARK_QUERIES[name](spark, SF)


def test_cluster_assign_is_windowless_projection(spark):
    """r6: the nearest-centroid argmax is an array_min projection over
    the broadcast centroid array — a row_number Window (sort + keyed
    shuffle of the N x k scored expansion) must not creep back."""
    final = _final_plan(_q(spark, "cluster_assign"))
    assert "Window" not in final
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final


def test_extract_spans_has_no_inferred_generate_filter(spark):
    """r6: InferFiltersFromGenerate is excluded — the explode of the
    computed extraction array must not re-derive the whole extraction
    tree inside a pushed-down size() filter (the query itself has no
    predicates, so ANY Filter here is the duplicated derivation)."""
    final = _final_plan(_q(spark, "extract_spans"))
    # match the Filter OPERATOR ("+- Filter (" / "*(n) Filter (") —
    # scan nodes always print a "PushedFilters:" attribute, which must
    # not trip the assertion
    assert " Filter (" not in final, "inferred generate filter crept back"


def test_ivf_probe_join_broadcasts(spark):
    """r6: the probe side of the IVF cell join is broadcast; a
    SortMergeJoin here shuffles every cell-assigned vector by the
    nlist-valued key (the skewed payload shuffle IVF exists to avoid).
    Covered for ann_search by test_plans_round5; this pins the
    kmeans-fed variant too."""
    final = _final_plan(_q(spark, "ann_ivf_kmeans"))
    assert "SortMergeJoin" not in final
    assert "BroadcastHashJoin" in final


def test_bucketed_writes_are_clustered(spark, tmp_path):
    """r6: lineage.run_with_resume writes ONE file per bucket (the
    write is repartitioned by bucket) — the input_tasks x n_buckets
    small-file explosion must not return."""
    import os

    from tackle4losscontentextraction_spark.sources import lineage, synth

    docs = synth.synth_docs(spark, 2000, partitions=8)
    out_dir, lin_dir = str(tmp_path / "out"), str(tmp_path / "lin")
    res = lineage.run_with_resume(
        spark, docs, lambda d: d, out_dir, lin_dir, n_buckets=4)
    assert len(res["processed"]) == 4
    for b in range(4):
        parts = [f for f in os.listdir(f"{out_dir}/bucket={b}")
                 if f.startswith("part-")]
        assert len(parts) == 1, f"bucket {b} has {len(parts)} files"
