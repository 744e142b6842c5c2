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
