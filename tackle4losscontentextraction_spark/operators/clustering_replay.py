"""Exact-replay twin of the reference's SEQUENTIAL greedy clusterer.

The reference assigns articles one at a time, and every assignment
mutates the centroid that later articles are scored against
(cluster_articles.py:70-120: match -> running-mean update -> next
article sees the drifted centroid; cluster_manager.py:61-88
update_cluster, :113-135 find_best_cluster_match, :137-155
find_best_pending_match, :200-276 check_and_merge_similar_clusters).
That order-dependence cannot be expressed as a set-oriented Spark plan,
so the repo's production path is the documented BATCH variant
(operators/clustering.py, SURVEY §3.3: all articles score the same
epoch of centroids, then centroids update once).

This module closes the remaining semantic delta: the reference's
working set is hard-capped at 1000 rows (db_access.py:94
``.limit(1000)``, ordered ``created_at`` DESC :93), so a
driver-sequenced faithful replay is cheap and BOUNDED — the Spark job
collects the capped working set, runs the sequential kernel on the
driver (numpy running means, the one place imperative state is the
actual spec), and returns DataFrames so everything downstream (MERGE
sink, recounts) stays distributed.  This is the same collect-bounded
pattern as the reference's own DB round trip, not a scale path —
``max_articles`` enforces the cap explicitly.

Replay rules (each cited to the reference):
- scores must be STRICTLY greater than the threshold, and among equal
  maxima the EARLIEST candidate in iteration order wins (best_score
  starts AT the threshold and only ``>`` replaces it,
  cluster_manager.py:124-131);
- cluster match wins over pending match (articles only pair up when no
  cluster fits, cluster_articles.py:72-94);
- an assignment updates the centroid IN PLACE (same list position,
  count+1 running mean, cluster_articles.py:88-91); a pending pair
  creates a NEW cluster APPENDED to the list (order matters for later
  ties, :114);
- cosine follows vector_utils.cosine_similarity:72-96 — empty/zero
  norm -> 0.0, 2x dimension mismatch -> stride-2 downsample of the
  longer side;
- merge passes scan (i, j>i) pairs in list order, merge the FIRST pair
  above merge_threshold (weighted mean, larger count primary, tie ->
  earlier cluster primary), restart, at most 10 merges
  (cluster_articles.py:123-134, cluster_manager.py:219-276); merged
  members are reassigned to the primary.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.ids import deterministic_uuid_py

_EPS_DIM_NOTE = "2x mismatch downsamples the longer side (ref :77-83)"


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    """cosine_similarity twin (ref vector_utils.py:72-96)."""
    if a.size == 0 or b.size == 0:
        return 0.0
    if a.size != b.size:
        if a.size == b.size * 2:
            a = a[::2]
        elif b.size == a.size * 2:
            b = b[::2]
        else:
            raise ValueError(f"Incompatible dimensions: {a.size} and {b.size}")
    na = float(np.linalg.norm(a))
    nb = float(np.linalg.norm(b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def _norm_dims(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """normalize_vector_dimensions twin (ref vector_utils.py:109-120)."""
    if a.shape[0] == b.shape[0]:
        return a, b
    if a.shape[0] == b.shape[0] * 2:
        return a[::2], b
    if b.shape[0] == a.shape[0] * 2:
        return a, b[::2]
    raise ValueError(f"Incompatible dimensions: {a.shape[0]} and {b.shape[0]}")


def _default_id_fn(pending_id, article_id) -> str:
    """Deterministic, replay-stable cluster id for a new pair (the
    reference gets a DB-generated uuid, db_access.create_cluster_in_db;
    replays need the SAME id for the same pair)."""
    return deterministic_uuid_py(f"pair:{pending_id}:{article_id}")


def replay_kernel(
    articles: list[tuple],
    clusters: list[tuple],
    similarity_threshold: float = 0.82,
    merge_threshold: float = 0.9,
    id_fn=None,
):
    """The sequential kernel over plain Python/numpy state.

    articles: [(article_id, vec)] in processing order (the caller
    provides created_at DESC, ref db_access.py:93).
    clusters: [(cluster_id, centroid, count)] in fetch order.

    Returns (assignments, clusters, pending) where assignments is
    [(article_id, cluster_id)] in the order the reference would batch
    them (merges reassign members at merge time).
    """
    if merge_threshold <= similarity_threshold:
        # ref run_clustering_process docstring: merge_threshold must
        # exceed similarity_threshold
        raise ValueError("merge_threshold must be > similarity_threshold")
    id_fn = id_fn or _default_id_fn
    clus: list[list] = [[cid, np.asarray(c, dtype=np.float64), int(n)]
                        for cid, c, n in clusters]
    pending: dict = {}  # insertion-ordered, like the ref's dict
    assignments: list[tuple] = []
    members: dict[str, list] = {}  # cluster_id -> article_ids assigned THIS run

    for article_id, vec in articles:
        v = np.asarray(vec, dtype=np.float64)
        # step 1: best existing cluster (strict >, earliest max)
        best_score, best_i = similarity_threshold, -1
        for i, (_cid, centroid, _n) in enumerate(clus):
            s = _cos(v, centroid)
            if s > best_score:
                best_score, best_i = s, i
        if best_i >= 0:
            cid, centroid, n = clus[best_i]
            c2, v2 = _norm_dims(centroid, v)
            clus[best_i] = [cid, (c2 * n + v2) / (n + 1), n + 1]
            assignments.append((article_id, cid))
            members.setdefault(cid, []).append(article_id)
            continue
        # step 2: best pending article (strict >, earliest max in
        # insertion order)
        best_score, best_pid = similarity_threshold, None
        for pid, pvec in pending.items():
            s = _cos(v, pvec)
            if s > best_score:
                best_score, best_pid = s, pid
        if best_pid is not None:
            pvec = pending.pop(best_pid)
            p2, v2 = _norm_dims(np.asarray(pvec, dtype=np.float64), v)
            centroid = np.mean(np.vstack([p2, v2]), axis=0)
            cid = id_fn(best_pid, article_id)
            clus.append([cid, centroid, 2])
            assignments.append((best_pid, cid))
            assignments.append((article_id, cid))
            members[cid] = [best_pid, article_id]
            continue
        # step 3: pend
        pending[article_id] = v

    # merge passes: one merge per pass, first-pair-wins, max 10
    # (cluster_articles.py:123-134)
    if len(clus) >= 2:
        for _pass in range(10):
            merged = False
            for i in range(len(clus)):
                for j in range(i + 1, len(clus)):
                    cid1, c1, n1 = clus[i]
                    cid2, c2, n2 = clus[j]
                    if _cos(c1, c2) > merge_threshold:
                        if n1 >= n2:
                            pi, si = i, j
                        else:
                            pi, si = j, i
                        pid_, pc, pn = clus[pi]
                        sid_, sc, sn = clus[si]
                        pc2, sc2 = _norm_dims(pc, sc)
                        total = pn + sn
                        clus[pi] = [pid_, (pc2 * pn + sc2 * sn) / total, total]
                        # reassign the secondary's members (ref :245-249
                        # reassigns from the DB; the replay only knows
                        # this run's assignments)
                        for aid in members.pop(sid_, []):
                            assignments.append((aid, pid_))
                            members.setdefault(pid_, []).append(aid)
                        del clus[si]
                        merged = True
                        break
                if merged:
                    break
            if not merged:
                break

    return (
        assignments,
        [(cid, c.tolist(), n) for cid, c, n in clus],
        list(pending.keys()),
    )


def replay_clustering(
    spark: SparkSession,
    articles: DataFrame,
    clusters: DataFrame,
    similarity_threshold: float = 0.82,
    merge_threshold: float = 0.9,
    max_articles: int = 1000,
    max_clusters: int = 100_000,
    id_fn=None,
) -> dict[str, DataFrame]:
    """Spark surface: collect the BOUNDED working set (the reference's
    own 1000-row cap, db_access.py:94), run :func:`replay_kernel` on
    the driver, return DataFrames for the distributed downstream.

    articles: (article_id, vec array, created_at) — ordered internally
    by created_at DESC then article_id DESC (deterministic tiebreak;
    the ref inherits whatever the DB returns).
    clusters: (cluster_id, centroid array, n_members), fetch order =
    cluster_id ascending for determinism.

    ``max_clusters`` bounds the cluster-side driver collect (the
    reference's fetch_existing_clusters is uncapped, but an uncapped
    ``collect()`` on the driver is exactly the failure mode guide §5
    warns about): exceeding it raises instead of silently pulling an
    unbounded table — the sequential twin is only faithful for working
    sets a driver can hold anyway.
    """
    n_clusters = clusters.limit(max_clusters + 1).count()
    if n_clusters > max_clusters:
        raise ValueError(
            f"replay_clustering: cluster table exceeds max_clusters="
            f"{max_clusters}; the sequential replay twin is driver-side "
            "by design — raise the cap deliberately or use the batch "
            "clusterer (operators/clustering.py) for sets this large"
        )
    art_rows = (
        articles.orderBy(articles.created_at.desc(), articles.article_id.desc())
        .limit(max_articles)
        .select("article_id", "vec")
        .collect()
    )
    clu_rows = clusters.orderBy("cluster_id").select(
        "cluster_id", "centroid", "n_members"
    ).collect()
    assigns, clus, pending = replay_kernel(
        [(r.article_id, r.vec) for r in art_rows],
        [(r.cluster_id, r.centroid, r.n_members) for r in clu_rows],
        similarity_threshold,
        merge_threshold,
        id_fn,
    )
    assign_schema = T.StructType([
        T.StructField("seq", T.IntegerType()),
        T.StructField("article_id", T.LongType()),
        T.StructField("cluster_id", T.StringType()),
    ])
    clus_schema = T.StructType([
        T.StructField("cluster_id", T.StringType()),
        T.StructField("centroid", T.ArrayType(T.DoubleType())),
        T.StructField("n_members", T.IntegerType()),
    ])
    return {
        "assignments": spark.createDataFrame(
            [(i, int(a), c) for i, (a, c) in enumerate(assigns)], assign_schema
        ),
        "clusters": spark.createDataFrame(clus, clus_schema),
        "pending": spark.createDataFrame(
            [(int(p),) for p in pending], "article_id bigint"
        ),
    }
