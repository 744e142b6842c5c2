"""Multimodal plumbing: media-ref projection and the (stubbed)
Arrow-batched decode kernel — schema, batch shape, determinism."""

from __future__ import annotations

from tackle4losscontentextraction_spark.operators import extraction, multimodal
from tackle4losscontentextraction_spark.sources import synth


def test_media_pipeline(spark):
    docs = synth.synth_docs(spark, 150, partitions=2)
    extracted = extraction.extract(docs)
    media = multimodal.synth_media_table(extracted)
    rows = media.collect()
    assert len(rows) > 10
    assert all(r.mime in ("image/jpeg", "video/mp4") for r in rows)

    feats = multimodal.decode_image_batch(media, partitions=2).collect()
    assert len(feats) == len(rows)
    assert all(r.ok for r in feats)
    assert all(len(r.feature) == multimodal.FEATURE_DIM for r in feats)

    # deterministic: same payload -> same feature
    again = {r.media_id: r.feature for r in
             multimodal.decode_image_batch(media, partitions=4).collect()}
    for r in feats:
        assert again[r.media_id] == r.feature
