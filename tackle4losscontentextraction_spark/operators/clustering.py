"""Clustering stage rebuilt as batch dataflow.

Reference (src/modules/clustering/cluster_articles.py:38-142 +
cluster_manager.py): greedy sequential assignment of each unclustered
article to the best cosine-matching cluster (> 0.82), running-mean
centroid updates, pairwise cluster merging (> 0.9, <= 10 passes),
member-count recount.

The reference's assignment is order-dependent (each assignment mutates
the centroids seen by later articles — SURVEY §3.3). The faithful batch
rendition here:

- :func:`assign_to_clusters` — one pass: every vector scored against
  the CURRENT (broadcast) centroid set; argmax > threshold assigned.
  This is the reference semantics with centroids frozen per pass.
- :func:`update_centroids` — batch running-mean: new centroid =
  (old*n + sum(assigned)) / (n + k)  — the k-step composition of the
  reference's per-row update (cluster_manager.py:81), exact for the
  same membership set.
- :func:`merge_clusters_fixpoint` — repeated best-pair merging above
  the merge threshold with the reference's weighted mean
  (cluster_manager.py:239-241), driver-iterated <= max_passes (:128).
- :func:`recount_members` — the count fixer
  (sql/recalculate_all_cluster_member_counts.sql): recount, delete
  0/1-member clusters, unassign their members.

Scale: centroids are O(clusters) — broadcast; vectors never shuffle
for scoring (map-side broadcast join + window over doc only when
ranking; the rank is per-vector so AQE handles skew)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import vectors as vec_fn

ASSIGN_THRESHOLD = 0.82  # cluster_manager.py:41
MERGE_THRESHOLD = 0.9    # cluster_pipeline.py:62
MAX_MERGE_PASSES = 10    # cluster_articles.py:128-130


def assign_to_clusters(
    vectors: DataFrame,
    clusters: DataFrame,
    threshold: float = ASSIGN_THRESHOLD,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster_id, cosine) for vectors whose best centroid
    clears the threshold. clusters: (cluster_id, centroid, member_count).

    The per-vector argmax is a hash aggregate over min(struct(-cos,
    cluster_id)) rather than a window rank: partial (map-side) combine
    reduces the N×k scored rows to N before the shuffle, which a
    window cannot do. Tie-break matches ORDER BY cos DESC, id ASC."""
    sim = vec_fn.cosine_similarity(
        F.col(vec_col).cast("array<double>"), F.col("centroid").cast("array<double>")
    )
    scored = (
        vectors.crossJoin(F.broadcast(clusters.select("cluster_id", "centroid")))
        .select(
            vec_id,
            F.struct((-sim).alias("neg_cs"), F.col("cluster_id").alias("cluster_id")).alias("sc"),
        )
    )
    return (
        # NULL cosines (dim-mismatch centroids) must not win the min —
        # struct ordering puts NULL fields first, unlike DESC NULLS LAST
        scored.where(F.col("sc.neg_cs").isNotNull())
        .groupBy(vec_id)
        .agg(F.min("sc").alias("best"))
        .select(vec_id, F.col("best.cluster_id").alias("cluster_id"),
                (-F.col("best.neg_cs")).alias("cosine"))
        .where(F.col("cosine") > threshold)
    )


def update_centroids(
    clusters: DataFrame, vectors: DataFrame, assignments: DataFrame,
    vec_id: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Batch running-mean update: (old*n + sum(new members)) / (n + k)."""
    joined = assignments.join(vectors, vec_id).select(
        "cluster_id", F.col(vec_col).cast("array<double>").alias("v")
    )
    sums = (
        joined.select("cluster_id", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster_id", "pos")
        .agg(F.sum("val").alias("s"), F.count("*").alias("k"))
        .groupBy("cluster_id")
        .agg(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda p: p["s"]).alias("vsum"),
            F.first("k").alias("k"),
        )
    )
    return (
        clusters.join(sums, "cluster_id", "left")
        .select(
            "cluster_id",
            F.when(
                F.col("vsum").isNotNull(),
                F.zip_with(
                    F.col("centroid").cast("array<double>"), F.col("vsum"),
                    lambda c, s: (c * F.col("member_count") + s) / (F.col("member_count") + F.col("k")),
                ),
            ).otherwise(F.col("centroid").cast("array<double>")).alias("centroid"),
            (F.col("member_count") + F.coalesce(F.col("k"), F.lit(0))).alias("member_count"),
        )
    )


MAX_PENDING_PAIRING = 1000  # db_access.py:93-94 (LIMIT 1000 working set)


def new_clusters_from_pairs(
    pending: DataFrame, threshold: float = ASSIGN_THRESHOLD,
    vec_id: str = "vec_id", vec_col: str = "embedding",
    max_pending: int = MAX_PENDING_PAIRING,
) -> DataFrame:
    """J4 analog: best pending-x-pending pair above threshold seeds a
    2-member cluster (centroid = pair mean). Greedy matching done as:
    rank pairs globally by similarity, keep pairs whose both members
    are not claimed by a better pair (one matching pass).

    The pairing self-join is quadratic, so the working set is capped at
    ``max_pending`` rows exactly as the reference caps its fetch
    (db_access.py:93-94, LIMIT 1000 most-recent): top-k by descending
    id (the corpus' recency proxy) via TakeOrderedAndProject — never a
    global sort. Overflow rows stay pending for the next pipeline run,
    which is the reference's behavior too."""
    if max_pending is not None:
        pending = pending.orderBy(F.desc(vec_id)).limit(max_pending)
    v = pending.select(F.col(vec_id).alias("vid"), F.col(vec_col).cast("array<double>").alias("v"))
    o = v.select(F.col("vid").alias("vid_b"), F.col("v").alias("v_b"))
    sim = vec_fn.cosine_similarity(F.col("v"), F.col("v_b"))
    pairs = (
        v.crossJoin(o)
        .where(F.col("vid") < F.col("vid_b"))
        .withColumn("cos_raw", sim)
        .where(F.col("cos_raw") > threshold)
    )
    # DISJOINT matching (each pending vector seeds at most one pair) —
    # mutual-best, see _mutual_best_pairs for why two one-sided window
    # ranks are NOT disjoint
    mutual = _mutual_best_pairs(
        pairs.select(F.col("vid").alias("ca"), F.col("vid_b").alias("cb"),
                     F.col("cos_raw").alias("s"))
    ).select(F.col("ca").alias("vid"), F.col("cb").alias("vid_b"))
    best = mutual.join(v, "vid").join(o, "vid_b")
    from ..functions.ids import deterministic_uuid

    return best.select(
        # C10: the reference's uuid4 (db_access.py:249) rendered
        # deterministic — a name-based UUID over the seed pair, so a
        # retried/replayed batch mints the SAME cluster id
        deterministic_uuid(
            F.concat_ws("#", F.col("vid").cast("string"), F.col("vid_b").cast("string"))
        ).alias("cluster_id"),
        F.zip_with("v", "v_b", lambda a, b: (a + b) / 2).alias("centroid"),
        F.lit(2).alias("member_count"),
        F.col("vid").alias("member_a"),
        F.col("vid_b").alias("member_b"),
    )


def merge_clusters_fixpoint(
    clusters: DataFrame, threshold: float = MERGE_THRESHOLD, max_passes: int = MAX_MERGE_PASSES,
    return_mapping: bool = False,
):
    """Driver-iterated pairwise merging (weighted mean), <= max_passes.

    Each pass merges disjoint best pairs above threshold; the centroid
    set shrinks geometrically so the loop is short. Working sets are
    cluster-sized (small) — collected state is bounded.

    Each pass starts from a localCheckpoint of the current cluster set:
    a pass references ``cur`` three times (two self-join sides plus the
    anti-join) and ends with ``isEmpty()`` (a full job), so without the
    checkpoint pass k re-executes the whole k-deep lineage and the work
    roughly doubles per pass — invisible at fixture scale, a scale-
    killer at real cluster counts. The checkpointed state is
    O(clusters) rows (small); eager=True materializes it as the pass's
    single upstream job.

    With ``return_mapping=True`` also returns (clusters, mapping) where
    mapping = (old_cluster_id, new_cluster_id) for every ABSORBED id,
    transitively resolved across passes — the UPDATE set callers apply
    to their membership table (the reference likewise re-points members
    when clusters merge); without remapping, members recorded under an
    absorbed id would reference a nonexistent cluster."""
    spark = clusters.sparkSession
    cur = clusters.select("cluster_id", F.col("centroid").cast("array<double>").alias("centroid"), "member_count")
    mapping = spark.createDataFrame([], "old_cluster_id string, new_cluster_id string")
    for _ in range(max_passes):
        cur = cur.localCheckpoint(eager=True)
        a = cur.select(F.col("cluster_id").alias("ca"), F.col("centroid").alias("va"), F.col("member_count").alias("na"))
        b = cur.select(F.col("cluster_id").alias("cb"), F.col("centroid").alias("vb"), F.col("member_count").alias("nb"))
        sim = vec_fn.cosine_similarity(F.col("va"), F.col("vb"))
        pairs = a.crossJoin(b).where(F.col("ca") < F.col("cb")).withColumn("s", sim).where(F.col("s") > threshold)
        chosen = _mutual_best_pairs(pairs).join(a, "ca").join(b, "cb")
        if chosen.isEmpty():
            break
        merged = chosen.select(
            F.col("ca").alias("cluster_id"),
            F.zip_with("va", "vb", lambda x, y: (x * F.col("na") + y * F.col("nb")) / (F.col("na") + F.col("nb"))).alias("centroid"),
            (F.col("na") + F.col("nb")).alias("member_count"),
        )
        if return_mapping:
            # this pass absorbs cb into ca: append the new edges and
            # redirect earlier edges whose target was just absorbed
            step = chosen.select(
                F.col("cb").alias("o"), F.col("ca").alias("n")
            )
            redirected = (
                mapping.join(step, mapping.new_cluster_id == step.o, "left")
                .select(
                    "old_cluster_id",
                    F.coalesce(step.n, mapping.new_cluster_id).alias("new_cluster_id"),
                )
            )
            mapping = redirected.unionByName(
                step.select(F.col("o").alias("old_cluster_id"), F.col("n").alias("new_cluster_id"))
            ).localCheckpoint(eager=True)
        absorbed = chosen.select(F.col("ca").alias("cluster_id")).union(
            chosen.select(F.col("cb").alias("cluster_id"))
        )
        survivors = cur.join(absorbed, "cluster_id", "left_anti")
        cur = survivors.unionByName(merged)
    if return_mapping:
        return cur, mapping
    return cur


def _mutual_best_pairs(pairs: DataFrame) -> DataFrame:
    """DISJOINT greedy matching over weighted pairs (ca < cb, score s):
    keep (a, b) iff b is a's best partner AND a is b's — each node ends
    up in at most one kept pair, the parallel analog of the reference's
    sequential greedy pairing.

    (The previous two-window rendition ranked within the DIRECTED pair
    set — partition by ca and by cb separately — so a node could win as
    ca in one pair and as cb in another; merging both double-counts its
    members. Found by the round-3 convergence test.)

    Physical shape: symmetrize the edges, per-node argmax as a hash
    aggregate (min(struct(-s, partner)) — map-side combine, no window
    over the edge set), then one count-2 aggregate on the undirected
    key. Edge- and node-cardinality work only; no centroid payload.
    """
    sym = pairs.select("ca", "cb", "s").unionAll(
        pairs.select(F.col("cb").alias("ca"), F.col("ca").alias("cb"), "s")
    )
    best = (
        sym.groupBy("ca")
        .agg(F.min(F.struct((-F.col("s")).alias("neg_s"), F.col("cb").alias("cb"))).alias("b"))
        .select("ca", F.col("b.cb").alias("cb"))
    )
    return (
        best.groupBy(
            F.least("ca", "cb").alias("ca"), F.greatest("ca", "cb").alias("cb")
        )
        .agg(F.count("*").alias("nn"))
        .where(F.col("nn") == 2)  # both endpoints chose each other
        .select("ca", "cb")
    )


def recount_members(clusters: DataFrame, memberships: DataFrame) -> DataFrame:
    """The count fixer, keep side: true counts per cluster; 0/1-member
    clusters are dropped. The matching unassignment set for the dropped
    clusters' members is :func:`unassigned_members` — together they are
    the full fixer (sql/recalculate_all_cluster_member_counts.sql:14-85)."""
    counts = memberships.groupBy("cluster_id").agg(F.count("*").alias("true_count"))
    return (
        clusters.join(counts, "cluster_id", "left")
        .withColumn("true_count", F.coalesce("true_count", F.lit(0)))
        .where(F.col("true_count") >= 2)
        .select("cluster_id", "centroid", F.col("true_count").alias("member_count"))
    )


def unassigned_members(
    memberships: DataFrame, member_id: str = "vec_id"
) -> DataFrame:
    """The count fixer, unassign side
    (sql/recalculate_all_cluster_member_counts.sql:14-85 +
    db_access.py:408-523): members of clusters with < 2 true members
    get ``cluster_id`` nulled. Emits (member_id, old_cluster_id) — the
    UPDATE set the storage layer applies (merge.update_columns with a
    NULL cluster_id, or Iceberg MERGE ... SET cluster_id = NULL).

    One window count over the membership table, no join: the per-key
    count is computed alongside the rows that need it."""
    w = Window.partitionBy("cluster_id")
    return (
        memberships.withColumn("_n", F.count("*").over(w))
        .where(F.col("_n") < 2)
        .select(F.col(member_id), F.col("cluster_id").alias("old_cluster_id"))
    )


def repair_zero_centroids(
    clusters: DataFrame,
    memberships: DataFrame,
    vectors: DataFrame,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Zero-centroid repair (db_access.py:319-406): clusters whose
    stored centroid is NULL or all-zero get it recomputed as the MEAN
    of their members' embeddings; healthy clusters pass through.

    Dataflow: filter the (small) broken cluster set, semi-join the
    membership table down to just their members, posexplode+avg the
    member embeddings (the same elementwise-mean shape as
    update_centroids), and left-join the repairs back. Clusters with a
    broken centroid and no members stay broken (the reference skips
    them too) — flagged by ``repaired = false``.
    """
    is_zero = F.col("centroid").isNull() | ~F.exists(
        F.col("centroid"), lambda x: x != 0.0
    )
    flagged = clusters.withColumn("_broken", is_zero)
    broken_ids = flagged.where("_broken").select("cluster_id")
    member_vecs = (
        memberships.join(F.broadcast(broken_ids), "cluster_id")
        .join(vectors.select(F.col(vec_id), F.col(vec_col)), vec_id)
        .select("cluster_id", F.col(vec_col).cast("array<double>").alias("v"))
    )
    means = (
        member_vecs.select("cluster_id", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster_id", "pos")
        .agg(F.avg("val").alias("cv"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pairs"))
        .select(
            "cluster_id",
            F.transform("pairs", lambda p: p["cv"]).alias("repaired_centroid"),
        )
    )
    return (
        flagged.join(means, "cluster_id", "left")
        .select(
            "cluster_id",
            F.when(
                F.col("_broken") & F.col("repaired_centroid").isNotNull(),
                F.col("repaired_centroid"),
            ).otherwise(F.col("centroid").cast("array<double>")).alias("centroid"),
            "member_count",
            (F.col("_broken") & F.col("repaired_centroid").isNotNull()).alias("repaired"),
        )
    )
