"""Dedup operator semantics on controlled micro-corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tackle4losscontentextraction_spark.operators import dedup

DOC = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different text about spark shuffles and partition pruning"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, DOC), (2, DOC), (3, NEAR), (4, OTHER),
        (5, "the   QUICK brown fox jumps over the lazy dog again and again today"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_groups(docs):
    out = {r.dup_key: r for r in dedup.exact_duplicates(docs).collect()}
    groups = sorted((r.n_docs, r.keeper) for r in out.values())
    # docs 1,2,5 identical after ws/case normalization; 3 and 4 singles
    assert groups == [(1, 3), (1, 4), (3, 1)]


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_candidates(docs).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs  # identical docs always collide
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_jaccard_exact(docs, spark):
    out = {(r.id_a, r.id_b): r.jaccard for r in
           dedup.jaccard_pairs(docs, threshold=0.2).collect()}
    assert out[(1, 2)] == pytest.approx(1.0)
    assert 0.5 < out[(1, 3)] < 1.0  # near dup: most shingles shared
    assert (1, 4) not in out


def test_simhash_identical_and_near(docs):
    sh = {r.doc_id: r.simhash for r in docs.select(
        "doc_id", dedup.simhash16(F.col("text")).alias("simhash")).collect()}
    assert sh[1] == sh[2] == sh[5]
    assert 0 <= sh[1] < 2 ** 16
    # near-dup differs in few bits
    hamming = bin(sh[1] ^ sh[3]).count("1")
    assert hamming <= 6


def test_embedding_near_duplicates(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {(r.id_a, r.id_b): r.cosine for r in
           dedup.embedding_near_duplicates(vecs, threshold=0.95).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.99
    assert (1, 3) not in out


# ---------------------------------------------------------------------------
# survivorship property (VERDICT r4 task 8): union-find closure
# ---------------------------------------------------------------------------

def _uf_components(n_docs, pairs):
    """Pure-Python union-find oracle: doc -> component min-id."""
    parent = list(range(n_docs))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for x in range(n_docs):
        comp.setdefault(find(x), []).append(x)
    return comp


def test_keep_survivors_union_find_property(spark):
    """Random pair graphs (chains, stars, cliques, isolated nodes):
    keep_survivors keeps EXACTLY the min id of every component and
    never drops an unpaired doc — equal to the union-find closure."""
    import random

    rng = random.Random(20260818)
    for trial in range(12):
        n = rng.randint(2, 60)
        n_edges = rng.randint(0, min(80, n * 2))
        pairs = set()
        while len(pairs) < n_edges:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        # adversarial shapes the random fill can miss
        if trial == 0 and n >= 6:
            pairs = {(1, 3), (2, 3)}        # the drop-the-max trap
        if trial == 1 and n >= 10:
            pairs = {(i, i + 1) for i in range(9)}   # long chain
        pairs = sorted(pairs)

        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(n)], "doc_id bigint, text string")
        pdf = spark.createDataFrame(
            pairs or [(None, None)], "id_a bigint, id_b bigint"
        ).where(F.col("id_a").isNotNull())
        kept = {r.doc_id for r in
                dedup.keep_survivors(docs, pdf).collect()}

        comp = _uf_components(n, pairs)
        want = {min(members) for members in comp.values()}
        assert kept == want, (trial, sorted(pairs))
        # every unpaired doc survives
        paired = {x for p in pairs for x in p}
        assert set(range(n)) - paired <= kept


def test_connected_components_labels(spark):
    pairs = spark.createDataFrame(
        [(1, 3), (2, 3), (10, 11), (11, 12), (12, 13)],
        "id_a bigint, id_b bigint")
    got = {r.node: r.comp for r in
           dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}
