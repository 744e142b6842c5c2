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
    assert all(r.mime in ("application/octet-stream", "video/mp4") for r in rows)

    feats = multimodal.decode_image_batch(media, partitions=2).collect()
    assert len(feats) == len(rows)
    assert all(r.ok for r in feats)
    assert all(len(r.feature) == multimodal.FEATURE_DIM for r in feats)

    # deterministic: same payload -> same feature
    again = {r.media_id: r.feature for r in
             multimodal.decode_image_batch(media, partitions=4).collect()}
    for r in feats:
        assert again[r.media_id] == r.feature


def test_frame_sampling_fans_out_videos_only(spark):
    docs = synth.synth_docs(spark, 150, partitions=2)
    media = multimodal.synth_media_table(extraction.extract(docs))
    vids = {r.media_id: r for r in media.where("media_kind = 'video'").collect()}
    frames = multimodal.sample_frames_batch(media, every_ms=1000, max_frames=4).collect()
    assert frames and all(f.media_id in vids for f in frames)
    by_vid = {}
    for f in frames:
        by_vid.setdefault(f.media_id, []).append(f)
    for mid, fs in by_vid.items():
        want = min(4, max(1, vids[mid].duration_ms // 1000))
        assert sorted(x.frame_idx for x in fs) == list(range(want))
        assert all(x.ts_ms == x.frame_idx * 1000 for x in fs)
        assert all(x.ok and len(x.frame) == multimodal.FEATURE_DIM for x in fs)
    # deterministic across repartitioning
    again = {(f.media_id, f.frame_idx): f.frame for f in
             multimodal.sample_frames_batch(media, every_ms=1000, max_frames=4,
                                            partitions=3).collect()}
    for f in frames:
        assert again[(f.media_id, f.frame_idx)] == f.frame


def test_resize_updates_images_in_place(spark):
    docs = synth.synth_docs(spark, 100, partitions=2)
    media = multimodal.synth_media_table(extraction.extract(docs))
    before = {r.media_id: r for r in media.collect()}
    out = {r.media_id: r for r in
           multimodal.resize_image_batch(media, width=32, height=32).collect()}
    assert set(out) == set(before)
    for mid, r in out.items():
        if r.media_kind == "image":
            assert (r.width, r.height) == (32, 32)
            assert r.payload != before[mid].payload and len(r.payload) == 16
        else:
            assert r.payload == before[mid].payload
            assert (r.width, r.height) == (before[mid].width, before[mid].height)
