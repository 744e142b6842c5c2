"""ISO BMFF container kernel (operators/mp4.py) and the real
sample_frames_batch path: box walk, sample-table expansion, true
byte-range extraction, timestamp seek, hostile rejection, and the
parse-or-fallback contract of the Spark sampler."""

from __future__ import annotations

import struct

import pytest

from tackle4losscontentextraction_spark.operators import mp4, multimodal


def _samples(n: int = 12) -> list[bytes]:
    return [bytes([i]) * (10 + 3 * i) for i in range(n)]


def test_container_round_trip():
    samples = _samples()
    blob = mp4.encode_mp4(samples, timescale=1000, sample_duration=500)
    info = mp4.parse_mp4(blob)
    assert info["timescale"] == 1000
    assert info["duration_ms"] == 6000
    assert info["codec"] == "mp4v"
    assert (info["width"], info["height"]) == (64, 64)
    assert len(info["samples"]) == len(samples)
    for i, s in enumerate(samples):
        assert mp4.extract_sample(blob, info, i) == s
    assert [t for _, _, t in info["samples"]] == [500 * i for i in range(12)]


def test_timestamp_seek_semantics():
    blob = mp4.encode_mp4(_samples(8), timescale=1000, sample_duration=500)
    info = mp4.parse_mp4(blob)
    assert mp4.sample_at(info, 0) == 0
    assert mp4.sample_at(info, 499) == 0
    assert mp4.sample_at(info, 500) == 1
    assert mp4.sample_at(info, 1_000_000) == 7  # clamps to last


def test_nonstandard_timescale():
    blob = mp4.encode_mp4(_samples(4), timescale=90_000, sample_duration=3_000)
    info = mp4.parse_mp4(blob)
    # 3000/90000 s per sample = 33 ms (integer floor)
    assert [t for _, _, t in info["samples"]] == [0, 33, 66, 100]


@pytest.mark.parametrize("payload", [
    None, b"", b"ftypnonsense" * 4, b"\x00" * 64,
])
def test_hostile_inputs_raise(payload):
    with pytest.raises(ValueError):
        mp4.parse_mp4(payload)


def test_truncated_and_corrupt_boxes_raise():
    blob = mp4.encode_mp4(_samples(), timescale=1000, sample_duration=500)
    with pytest.raises(ValueError):
        mp4.parse_mp4(blob[: len(blob) // 2])
    # corrupt stco so a sample points past the payload
    b = bytearray(blob)
    p = b.find(b"stco")
    b[p + 8:p + 12] = struct.pack(">I", len(blob) + 1000)
    with pytest.raises(ValueError):
        mp4.parse_mp4(bytes(b))
    # absurd stts run count
    b = bytearray(blob)
    p = b.find(b"stts")
    b[p + 8:p + 12] = struct.pack(">I", 2_000_000)
    with pytest.raises(ValueError):
        mp4.parse_mp4(bytes(b))


def test_spark_sampler_real_container(spark):
    """Real-MP4 rows: frame count follows the CONTAINER duration, each
    frame's feature is the hash of the TRUE sample bytes at that
    timestamp (computable without parsing, by construction of
    synth_mp4_payloads)."""
    from tackle4losscontentextraction_spark.operators import extraction
    from tackle4losscontentextraction_spark.sources import synth

    docs = synth.synth_docs(spark, 120, partitions=2)
    media = multimodal.synth_mp4_payloads(
        multimodal.synth_media_table(extraction.extract(docs)),
        n_samples=10, sample_duration_ms=500)
    vids = [r.media_id for r in media.where("media_kind = 'video'").collect()]
    assert vids, "corpus must contain video refs"

    frames = multimodal.sample_frames_batch(
        media, every_ms=1000, max_frames=4).collect()
    by_vid = {}
    for f in frames:
        by_vid.setdefault(f.media_id, []).append(f)
    assert set(by_vid) == set(vids)
    for mid, fs in by_vid.items():
        # container duration 10*500 = 5000 ms -> min(4, 5000//1000) = 4
        assert sorted(f.frame_idx for f in fs) == [0, 1, 2, 3]
        for f in fs:
            # grid time i*1000 seeks to sample 2*i (500 ms cadence)
            want_sample = f"{mid}/frame{2 * f.frame_idx}".encode() * (2 * f.frame_idx + 1)
            assert f.ok
            assert f.frame == multimodal._fake_decode(want_sample)


def test_spark_sampler_fallback_for_ref_bytes(spark):
    """Non-container payloads (the ref-bytes fetch stand-in) keep the
    legacy whole-blob stand-in: same fan-out, same features as before
    the mp4 upgrade — the parse-or-fallback contract."""
    from tackle4losscontentextraction_spark.operators import extraction
    from tackle4losscontentextraction_spark.sources import synth

    docs = synth.synth_docs(spark, 120, partitions=2)
    media = multimodal.synth_media_table(extraction.extract(docs))
    vids = {r.media_id: r for r in media.where("media_kind = 'video'").collect()}
    frames = multimodal.sample_frames_batch(media, every_ms=1000, max_frames=4).collect()
    assert frames
    for f in frames:
        payload = bytes(vids[f.media_id].payload)
        assert f.frame == multimodal._fake_decode(
            payload + f.frame_idx.to_bytes(2, "big"))


def test_mid_field_truncation_is_valueerror_not_struct_error():
    """A box can pass _walk's bounds check yet end mid-field (stsd that
    claims 1 entry but stops at the payload boundary). The contract is
    ValueError for EVERY malformed input — struct.error would kill the
    Spark task instead of producing an ok=false row."""
    stsd = mp4._full(b"stsd", 0, 0, struct.pack(">I", 1))  # count=1, no entry
    stbl = mp4._box(b"stbl", stsd)
    vmhd = mp4._full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = mp4._box(b"minf", vmhd + stbl)
    mdhd = mp4._full(b"mdhd", 0, 0,
                     struct.pack(">IIIIHH", 0, 0, 1000, 1000, 0x55C4, 0))
    hdlr = mp4._full(b"hdlr", 0, 0,
                     struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"video\x00")
    mdia = mp4._box(b"mdia", mdhd + hdlr + minf)
    trak = mp4._box(b"trak", mdia)
    blob = mp4._box(b"ftyp", b"isom") + mp4._box(b"moov", trak)
    with pytest.raises(ValueError):
        mp4.parse_mp4(blob)


def test_every_truncation_point_raises_valueerror():
    """Exhaustive: parse_mp4 of every prefix of a valid file raises
    ValueError (never struct.error / IndexError)."""
    blob = mp4.encode_mp4(_samples(4), timescale=1000, sample_duration=500)
    for cut in range(len(blob)):
        with pytest.raises(ValueError):
            mp4.parse_mp4(blob[:cut])


def test_hostile_chunk_tables_parse_in_linear_time():
    """stsc expansion must be O(n_chunks + n_stsc), not a rescan of the
    whole stsc table per chunk — attacker-controlled counts would turn
    a ~1.5 MB file into ~10^10 Python iterations otherwise."""
    import time

    n_chunks, n_stsc = 200_000, 50_000
    stsd_entry = (
        struct.pack(">I4s", 86, b"mp4v") + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", 8, 8)
        + struct.pack(">II", 0x00480000, 0x00480000) + struct.pack(">I", 0)
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = mp4._full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = mp4._full(b"stts", 0, 0, struct.pack(">III", 1, n_chunks, 1))
    stsc = mp4._full(b"stsc", 0, 0, struct.pack(">I", n_stsc) + b"".join(
        struct.pack(">III", 4 * i + 1, 1, 1) for i in range(n_stsc)))
    stsz = mp4._full(b"stsz", 0, 0, struct.pack(">II", 1, n_chunks))
    stco = mp4._full(b"stco", 0, 0, struct.pack(">I", n_chunks)
                     + struct.pack(">I", 8) * n_chunks)
    stbl = mp4._box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = mp4._full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = mp4._box(b"minf", vmhd + stbl)
    mdhd = mp4._full(b"mdhd", 0, 0,
                     struct.pack(">IIIIHH", 0, 0, 1000, n_chunks, 0x55C4, 0))
    hdlr = mp4._full(b"hdlr", 0, 0,
                     struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"video\x00")
    mdia = mp4._box(b"mdia", mdhd + hdlr + minf)
    trak = mp4._box(b"trak", mdia)
    blob = mp4._box(b"ftyp", b"isom") + mp4._box(b"moov", trak)

    t0 = time.monotonic()
    info = mp4.parse_mp4(blob)
    elapsed = time.monotonic() - t0
    assert len(info["samples"]) == n_chunks
    assert elapsed < 30  # quadratic form needs hours here


def test_encode_rejects_unpackable_dimensions():
    with pytest.raises(ValueError):
        mp4.encode_mp4([b"x"], width=70_000)
    with pytest.raises(ValueError):
        mp4.encode_mp4([b"x"], height=0)
