"""Vector-math semantics (reference vector_utils.py / create_embeddings.py
edge cases, FIXTURES.md §5)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tackle4losscontentextraction_spark.functions import vectors as vec_fn


def _one(spark, expr, **cols):
    return spark.createDataFrame([cols]).select(expr.alias("v")).collect()[0].v


def test_l2_normalize_34(spark):
    v = _one(spark, vec_fn.l2_normalize(F.col("a")), a=[3.0, 4.0])
    assert v == pytest.approx([0.6, 0.8])


def test_l2_normalize_zero_vector_unchanged(spark):
    v = _one(spark, vec_fn.l2_normalize(F.col("a")), a=[0.0, 0.0, 0.0])
    assert v == [0.0, 0.0, 0.0]


def test_cosine_identical(spark):
    v = _one(spark, vec_fn.cosine_similarity(F.col("a"), F.col("b")),
             a=[1.0, 2.0, 3.0, 4.0], b=[1.0, 2.0, 3.0, 4.0])
    assert v == pytest.approx(1.0)


def test_cosine_zero_norm_is_zero(spark):
    v = _one(spark, vec_fn.cosine_similarity(F.col("a"), F.col("b")),
             a=[0.0, 0.0], b=[1.0, 1.0])
    assert v == 0.0


def test_cosine_single_element_is_real_cosine(spark):
    """The reference zeroes only empty/ndim-0 inputs; 1-element vectors
    get a true cosine (vector_utils.py:63-76)."""
    v = _one(spark, vec_fn.cosine_similarity(F.col("a"), F.col("b")), a=[2.0], b=[1.0])
    assert v == 1.0
    v = _one(spark, vec_fn.cosine_similarity(F.col("a"), F.col("b")), a=[2.0], b=[-1.0])
    assert v == -1.0


def test_cosine_empty_is_zero(spark):
    # typed empty array via slice (bare [] infers as array<void>)
    v = _one(spark, vec_fn.cosine_similarity(F.slice(F.col("a"), 1, 0), F.col("b")),
             a=[1.0], b=[1.0])
    assert v == 0.0


def test_cosine_stride2_downsample(spark):
    # 4-dim vs 2-dim: longer side sampled at [::2] (vector_utils.py:77-84)
    a = [1.0, 9.0, 2.0, 9.0]  # downsampled -> [1.0, 2.0]
    b = [1.0, 2.0]
    v = _one(spark, vec_fn.cosine_similarity(F.col("a"), F.col("b")), a=a, b=b)
    assert v == pytest.approx(1.0)


def test_cosine_dim_mismatch_null(spark):
    v = _one(spark, vec_fn.cosine_similarity(F.col("a"), F.col("b")),
             a=[1.0, 2.0, 3.0], b=[1.0, 2.0])
    assert v is None


def test_parse_embedding_bracket_and_space(spark):
    v = _one(spark, vec_fn.parse_embedding_string(F.col("s")), s="[1.0, 2.5, 3.0]")
    assert v == pytest.approx([1.0, 2.5, 3.0])
    v = _one(spark, vec_fn.parse_embedding_string(F.col("s")), s="1.0 2.5 3.0")
    assert v == pytest.approx([1.0, 2.5, 3.0])


def test_parse_embedding_invalid_gives_nulls(spark):
    v = _one(spark, vec_fn.parse_embedding_string(F.col("s")), s="not a vector")
    assert any(x is None for x in v)


def test_running_mean_update(spark):
    # (c*n + v)/(n+1) with n=2: ([1,1]*2 + [4,4])/3 = [2,2]
    v = _one(
        spark,
        vec_fn.running_mean_update(F.col("c"), F.col("v"), F.lit(2)),
        c=[1.0, 1.0], v=[4.0, 4.0],
    )
    assert v == pytest.approx([2.0, 2.0])


def test_weighted_merge(spark):
    v = _one(
        spark,
        vec_fn.weighted_merge(F.col("a"), F.lit(1), F.col("b"), F.lit(3)),
        a=[0.0, 0.0], b=[4.0, 8.0],
    )
    assert v == pytest.approx([3.0, 6.0])


def test_stride_downsample(spark):
    v = _one(spark, vec_fn.stride_downsample(F.col("a")), a=[1.0, 2.0, 3.0, 4.0, 5.0])
    assert v == [1.0, 3.0, 5.0]
