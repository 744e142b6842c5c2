"""Exact-replay greedy clustering twin (VERDICT r4 task 4).

The comparison oracle here is an INDEPENDENT, line-by-line pure-Python
port of the reference's ClusterManager + run_clustering_process loop
(cluster_manager.py:61-276, cluster_articles.py:70-134) — scalar
loops, same control flow, no shared code with the operator under test
(operators/clustering_replay.py, which vectorizes differently).
Equality on a drift-heavy fixture proves the running-mean ORDER
dependence is reproduced: each assignment mutates the centroid later
articles score against, so any epoch-batching shortcut diverges.
"""
from __future__ import annotations

import random

import numpy as np
import pytest

from tackle4losscontentextraction_spark.operators import clustering_replay as cr


# ---------------------------------------------------------------------------
# the reference port (test-local, independent of the operator)
# ---------------------------------------------------------------------------

def _ref_cos(a, b):
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    if a.size == 0 or b.size == 0:
        return 0.0
    if a.size != b.size:
        if a.size == b.size * 2:
            a = a[::2]
        elif b.size == a.size * 2:
            b = b[::2]
        else:
            raise ValueError("incompatible")
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def _ref_norm_dims(a, b):
    if a.shape[0] == b.shape[0]:
        return a, b
    if a.shape[0] == b.shape[0] * 2:
        return a[::2], b
    if b.shape[0] == a.shape[0] * 2:
        return a, b[::2]
    raise ValueError("incompatible")


class _RefManager:
    """cluster_manager.ClusterManager port (db calls dropped)."""

    def __init__(self, similarity_threshold):
        self.similarity_threshold = similarity_threshold
        self.pending_articles = {}
        self.clusters = []
        self.members = {}

    def update_cluster(self, cluster_id, old_centroid, old_count, new_vector):
        old_centroid, new_vector = _ref_norm_dims(old_centroid, new_vector)
        new_centroid = (old_centroid * old_count + new_vector) / (old_count + 1)
        return new_centroid, old_count + 1

    def create_cluster(self, vectors, cluster_id):
        centroid = np.mean(np.vstack(vectors), axis=0)
        return cluster_id, centroid, len(vectors)

    def find_best_cluster_match(self, article_vec):
        best_score = self.similarity_threshold
        best_match = None
        for cluster_id, centroid, count in self.clusters:
            score = _ref_cos(article_vec, centroid)
            if score > best_score:
                best_score = score
                best_match = (cluster_id, centroid, count, score)
        return best_match

    def find_best_pending_match(self, article_vec):
        best_score = self.similarity_threshold
        best_match = None
        for article_id, vector in self.pending_articles.items():
            score = _ref_cos(article_vec, vector)
            if score > best_score:
                best_score = score
                best_match = (article_id, vector, score)
        return best_match

    def check_and_merge_similar_clusters(self, merge_threshold, assignments):
        if len(self.clusters) < 2:
            return False
        clusters_to_check = list(self.clusters)
        for i, (cid1, c1, n1) in enumerate(clusters_to_check):
            for cid2, c2, n2 in clusters_to_check[i + 1:]:
                if _ref_cos(c1, c2) > merge_threshold:
                    if n1 >= n2:
                        pid, pc, pn = cid1, c1, n1
                        sid, sc, sn = cid2, c2, n2
                    else:
                        pid, pc, pn = cid2, c2, n2
                        sid, sc, sn = cid1, c1, n1
                    pc, sc = _ref_norm_dims(pc, sc)
                    total = pn + sn
                    new_centroid = (pc * pn + sc * sn) / total
                    for aid in self.members.pop(sid, []):
                        assignments.append((aid, pid))
                        self.members.setdefault(pid, []).append(aid)
                    self.clusters = [
                        (cid, c, n) for cid, c, n in self.clusters if cid != sid
                    ]
                    self.clusters = [
                        (cid, new_centroid if cid == pid else c,
                         total if cid == pid else n)
                        for cid, c, n in self.clusters
                    ]
                    return True
        return False


def ref_run(articles, clusters, sim=0.82, mrg=0.9):
    """run_clustering_process port (cluster_articles.py:70-134)."""
    m = _RefManager(sim)
    m.clusters = [(cid, np.asarray(c, dtype=np.float64), n)
                  for cid, c, n in clusters]
    assignments = []
    for article_id, vec in articles:
        vec = np.asarray(vec, dtype=np.float64)
        best = m.find_best_cluster_match(vec)
        if best:
            cid, centroid, count, _ = best
            nc, nn = m.update_cluster(cid, centroid, count, vec)
            assignments.append((article_id, cid))
            m.members.setdefault(cid, []).append(article_id)
            m.clusters = [
                (c_id, nc, nn) if c_id == cid else (c_id, c, ct)
                for c_id, c, ct in m.clusters
            ]
            continue
        bestp = m.find_best_pending_match(vec)
        if bestp:
            pid, pvec, _ = bestp
            cid, nc, nn = m.create_cluster(
                list(_ref_norm_dims(pvec, vec)), cr._default_id_fn(pid, article_id)
            )
            assignments.extend([(pid, cid), (article_id, cid)])
            m.members[cid] = [pid, article_id]
            del m.pending_articles[pid]
            m.clusters.append((cid, nc, nn))
            continue
        m.pending_articles[article_id] = vec
    if len(m.clusters) >= 2:
        merged_count = 0
        while m.check_and_merge_similar_clusters(mrg, assignments):
            merged_count += 1
            if merged_count >= 10:
                break
    return (
        assignments,
        [(cid, np.asarray(c).tolist(), n) for cid, c, n in m.clusters],
        list(m.pending_articles.keys()),
    )


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _drift_fixture(n_articles=240, dim=16, seed=4):
    """A fixture engineered so ORDER matters: tight article chains that
    start outside every cluster's threshold and drift centroids toward
    (or away from) later articles, plus near-tie scores, pending pairs,
    a 2x-dim article, a zero vector, and merge-close clusters."""
    rng = random.Random(seed)
    nprng = np.random.RandomState(seed)

    def unit(v):
        n = np.linalg.norm(v)
        return v / n if n else v

    anchors = [unit(nprng.randn(dim)) for _ in range(8)]
    clusters = []
    for i, a in enumerate(anchors[:4]):
        # two centroids made deliberately close for the merge phase
        centroid = unit(a + 0.05 * nprng.randn(dim))
        clusters.append((f"seed-{i}", centroid.tolist(), rng.randint(2, 5)))

    articles = []
    aid = 1000
    for k in range(n_articles):
        a = anchors[k % len(anchors)]
        # drift chain: progressively rotated copies — early ones match,
        # drag the centroid, and decide whether later ones still match
        step = (k // len(anchors)) % 7
        v = unit(a + (0.12 + 0.05 * step) * nprng.randn(dim))
        articles.append((aid, v.tolist()))
        aid += 1
    # hostile rows
    articles.append((aid, np.zeros(dim).tolist()))
    articles.append((aid + 1, unit(nprng.randn(dim * 2)).tolist()))  # 2x dim
    return articles, clusters


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_kernel_equals_reference_port_drift_fixture():
    articles, clusters = _drift_fixture()
    got = cr.replay_kernel(articles, clusters)
    want = ref_run(articles, clusters)
    assert got[0] == want[0], "assignment sequence (incl. merge reassigns)"
    assert got[2] == want[2], "pending set + order"
    assert len(got[1]) == len(want[1])
    for (gc, gcent, gn), (wc, wcent, wn) in zip(got[1], want[1]):
        assert gc == wc and gn == wn
        np.testing.assert_allclose(gcent, wcent, rtol=0, atol=1e-12)


def test_order_dependence_is_real():
    """Scrambling the article order must change the outcome on the
    drift fixture — otherwise the fixture wouldn't be pinning the
    sequential semantics at all."""
    articles, clusters = _drift_fixture()
    a = cr.replay_kernel(articles, clusters)
    b = cr.replay_kernel(list(reversed(articles)), clusters)
    assert (sorted(a[0]) != sorted(b[0])) or (a[1] != b[1]) or (
        sorted(a[2]) != sorted(b[2]))


@pytest.mark.parametrize("seed", [7, 11, 13])
def test_kernel_equals_reference_port_random(seed):
    articles, clusters = _drift_fixture(n_articles=120, seed=seed)
    got = cr.replay_kernel(articles, clusters)
    want = ref_run(articles, clusters)
    assert got[0] == want[0]
    assert [c[0] for c in got[1]] == [c[0] for c in want[1]]
    assert got[2] == want[2]


def test_threshold_is_strict_and_ties_take_earliest():
    v = [1.0, 0.0]
    # score exactly AT the threshold must NOT match (ref :124 ``>``)
    a, c, p = cr.replay_kernel(
        [(1, v)], [("c0", v, 2)],
        similarity_threshold=1.0, merge_threshold=1.01)
    assert a == [] and p == [1]
    # two clusters with identical centroids: earliest in list wins
    a, c, p = cr.replay_kernel(
        [(1, v)], [("cA", [0.9, 0.1], 2), ("cB", [0.9, 0.1], 2)])
    assert a == [(1, "cA")]


def test_merge_threshold_must_exceed_similarity():
    with pytest.raises(ValueError):
        cr.replay_kernel([], [], similarity_threshold=0.9, merge_threshold=0.9)


def test_spark_surface_round_trip(spark):
    """replay_clustering orders by created_at DESC (ref db_access:93),
    caps the working set, and returns the kernel's result as frames."""
    articles, clusters = _drift_fixture(n_articles=60)
    rows = [(int(aid), [float(x) for x in v], i) for i, (aid, v) in enumerate(articles)]
    adf = spark.createDataFrame(
        rows, "article_id bigint, vec array<double>, created_at bigint")
    cdf = spark.createDataFrame(
        [(cid, [float(x) for x in c], int(n)) for cid, c, n in clusters],
        "cluster_id string, centroid array<double>, n_members int")
    out = cr.replay_clustering(spark, adf, cdf)
    # created_at DESC == reversed fixture order
    want = ref_run(list(reversed(articles)), clusters)
    got_assigns = [(r.article_id, r.cluster_id)
                   for r in out["assignments"].orderBy("seq").collect()]
    assert got_assigns == [(a, c) for a, c in want[0]]
    got_pending = {r.article_id for r in out["pending"].collect()}
    assert got_pending == set(want[2])
    got_clusters = {r.cluster_id: r.n_members for r in out["clusters"].collect()}
    assert got_clusters == {cid: n for cid, _c, n in want[1]}


def test_spark_surface_respects_cap(spark):
    articles, clusters = _drift_fixture(n_articles=60)
    rows = [(int(aid), [float(x) for x in v], i) for i, (aid, v) in enumerate(articles)]
    adf = spark.createDataFrame(
        rows, "article_id bigint, vec array<double>, created_at bigint")
    cdf = spark.createDataFrame(
        [(cid, [float(x) for x in c], int(n)) for cid, c, n in clusters],
        "cluster_id string, centroid array<double>, n_members int")
    out = cr.replay_clustering(spark, adf, cdf, max_articles=10)
    want = ref_run(list(reversed(articles))[:10], clusters)
    assert [(r.article_id, r.cluster_id)
            for r in out["assignments"].orderBy("seq").collect()] == want[0]


def test_replay_cluster_collect_is_bounded(spark):
    """An over-limit cluster table must raise, not silently collect
    (r6: the driver-side working set is provably bounded)."""
    import pytest
    from pyspark.sql import functions as F

    from tackle4losscontentextraction_spark.operators import clustering_replay as cr

    arts = spark.createDataFrame(
        [(1, [1.0, 0.0], "2026-01-01")],
        "article_id long, vec array<double>, created_at string",
    )
    clus = spark.range(0, 10).select(
        F.concat(F.lit("c"), F.col("id")).alias("cluster_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("centroid"),
        F.lit(1).alias("n_members"),
    )
    with pytest.raises(ValueError, match="max_clusters"):
        cr.replay_clustering(spark, arts, clus, max_clusters=5)
    out = cr.replay_clustering(spark, arts, clus, max_clusters=50)
    assert out["assignments"].count() == 1
