"""spark-submit entry point for the clustering pipeline — the batch
rendition of the reference's ``scripts/cluster_pipeline.py`` (SURVEY
§3.3): age sweep, assign, centroid update, pending pairing, merge
fixpoint, and the maintenance pass (recount + unassign + zero-centroid
repair).

Usage:

    spark-submit --master local[32] --py-files /tmp/t4l.zip \
        jobs/run_clustering.py \
        --vectors /root/testdata/sf0.01/embeddings.parquet \
        --out /tmp/t4l_clusters [--clusters <prior clusters parquet>] \
        [--assign-threshold 0.82] [--merge-threshold 0.9]

Writes ``<out>/clusters``, ``<out>/assignments``, ``<out>/pending``,
``<out>/unassign`` and prints a one-line JSON summary. Rerunning with
``--clusters <out>/clusters --memberships <accumulated assignments>``
continues from the previous state — the reference's nightly
incremental mode. (The maintenance pass needs the complete membership
table; incremental runs without ``--memberships`` skip it.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", required=True, help="embeddings parquet (vec_id, embedding)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--clusters", default=None, help="prior clusters parquet (incremental mode)")
    ap.add_argument("--memberships", default=None,
                    help="prior assignments parquet (vec_id, cluster_id); "
                         "REQUIRED with --clusters for the maintenance pass — "
                         "recount/unassign need the COMPLETE membership table, "
                         "not just this batch's assignments")
    ap.add_argument("--assign-threshold", type=float, default=None)
    ap.add_argument("--merge-threshold", type=float, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("t4l-clustering").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from tackle4losscontentextraction_spark.operators import clustering
    from tackle4losscontentextraction_spark.plans import cluster_pipeline

    vectors = spark.read.parquet(args.vectors).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    prior = spark.read.parquet(args.clusters) if args.clusters else None
    kw = {}
    if args.assign_threshold is not None:
        kw["assign_threshold"] = args.assign_threshold
    if args.merge_threshold is not None:
        kw["merge_threshold"] = args.merge_threshold
    out = cluster_pipeline.run_clustering(spark, vectors, prior, **kw)

    # maintenance (recount + unassign + zero-centroid repair) is only
    # valid against the COMPLETE membership table: on an incremental
    # run this batch's assignments alone would make every idle prior
    # cluster recount to 0 (and be wrongly dropped/unassigned). Union
    # prior memberships when given; skip maintenance when incremental
    # without them.
    memberships = out["assignments"].select("vec_id", "cluster_id")
    if args.memberships:
        memberships = cluster_pipeline.reconcile_memberships(
            memberships,
            spark.read.parquet(args.memberships),
            out["merge_mapping"],
        )
    run_maint = args.clusters is None or args.memberships is not None
    if run_maint:
        maint = cluster_pipeline.run_maintenance(out["clusters"], memberships, vectors)
        clusters_out, unassign_out = maint["clusters"], maint["unassign"]
    else:
        clusters_out = out["clusters"]
        unassign_out = spark.createDataFrame([], "vec_id bigint, old_cluster_id string")

    paths = {
        "clusters": clusters_out,
        "assignments": out["assignments"],
        "pending": out["pending"],
        "unassign": unassign_out,
    }
    counts = {}
    for name, df in paths.items():
        p = os.path.join(args.out, name)
        df.write.mode("overwrite").parquet(p)
        counts[name] = spark.read.parquet(p).count()
    print(json.dumps({"counts": counts, "out": args.out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
