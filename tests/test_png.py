"""PNG kernel (operators/png.py) — the compressed-mime upgrade of the
multimodal decode tier (VERDICT r4 task 2).

Pure-kernel tests pin the encode -> decode round trip across every
scanline filter and the hostile-input contract (malformed payloads
raise ValueError, which the Spark surface maps to ok=false rows —
never a task failure); Spark tests pin the mixed bmp/png dispatch the
`media_decode` oracle query exercises at sf0.01.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tackle4losscontentextraction_spark.operators import bmp, png


def _rand(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, "adaptive"])
def test_round_trip_every_filter(mode):
    for shape in [(1, 1), (16, 16), (7, 13), (48, 31)]:
        px = _rand(*shape, seed=sum(shape))
        assert (png.decode_png(png.encode_png(px, filter_mode=mode)) == px).all()


def test_round_trip_synth_pattern_and_compression_wins():
    px = bmp.synth_pattern(32, 32, seed=42)
    data = png.encode_png(px)
    assert (png.decode_png(data) == px).all()
    # the adaptive filter + DEFLATE actually compress the gradient
    # pattern (this is what makes PNG a *compressed* mime, not a
    # container swap): well under the raw pixel size
    assert len(data) < px.size // 2


def test_resize_round_trip():
    px = _rand(16, 16, seed=3)
    small = bmp.resize_nearest(px, 8, 8)
    assert (png.decode_png(png.encode_png(small)) == small).all()


def test_rgba_decodes_alpha_dropped():
    h, w = 5, 6
    pix = np.random.RandomState(1).randint(0, 256, (h, w, 4)).astype(np.uint8)
    raw = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))
    data = (png._SIGNATURE
            + png._chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + png._chunk(b"IDAT", zlib.compress(raw))
            + png._chunk(b"IEND", b""))
    assert (png.decode_png(data) == pix[:, :, :3]).all()


def test_ancillary_chunks_skipped_and_split_idat():
    px = _rand(4, 4, seed=9)
    whole = png.encode_png(px, filter_mode=0)
    # rebuild with a tEXt chunk and the IDAT split in two — both legal
    sig = png._SIGNATURE
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    raw = zlib.compress(
        b"".join(b"\x00" + px[y].tobytes() for y in range(4)))
    data = (sig + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"tEXt", b"Comment\x00hi")
            + png._chunk(b"IDAT", raw[: len(raw) // 2])
            + png._chunk(b"IDAT", raw[len(raw) // 2:])
            + png._chunk(b"IEND", b""))
    assert (png.decode_png(data) == png.decode_png(whole)).all()


# ---------------------------------------------------------------------------
# hostile inputs -> ValueError (the ok=false contract)
# ---------------------------------------------------------------------------

def _good():
    return png.encode_png(bmp.synth_pattern(8, 8, seed=1))


def _ihdr_png(w, h, depth=8, color=2, interlace=0, idat=b"x"):
    return (png._SIGNATURE
            + png._chunk(b"IHDR",
                         struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                                     interlace))
            + png._chunk(b"IDAT", zlib.compress(idat))
            + png._chunk(b"IEND", b""))


@pytest.mark.parametrize("payload", [
    None,
    b"",
    b"GIF89a" + bytes(64),                      # wrong magic
    png._SIGNATURE,                             # signature only
])
def test_hostile_trivial(payload):
    with pytest.raises(ValueError):
        png.decode_png(payload)


def test_hostile_truncations_and_crc():
    good = _good()
    with pytest.raises(ValueError):
        png.decode_png(good[:30])               # truncated mid-IHDR
    with pytest.raises(ValueError):
        png.decode_png(good[:-6])               # IEND lost
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF                         # flip an IHDR byte -> CRC
    with pytest.raises(ValueError):
        png.decode_png(bytes(corrupt))
    body = bytearray(good)
    body[45] ^= 0xFF                            # flip inside IDAT -> CRC
    with pytest.raises(ValueError):
        png.decode_png(bytes(body))


def test_hostile_headers():
    with pytest.raises(ValueError):
        png.decode_png(_ihdr_png(2**20, 2**20))  # absurd dims (zip bomb)
    with pytest.raises(ValueError):
        png.decode_png(_ihdr_png(0, 4))          # zero width
    with pytest.raises(ValueError):
        png.decode_png(_ihdr_png(4, 4, depth=16))
    with pytest.raises(ValueError):
        png.decode_png(_ihdr_png(4, 4, color=3))  # palette
    with pytest.raises(ValueError):
        png.decode_png(_ihdr_png(4, 4, interlace=1))  # Adam7


def test_hostile_stream_contents():
    # IDAT inflates to the wrong length for the declared dims
    with pytest.raises(ValueError):
        png.decode_png(_ihdr_png(4, 4, idat=bytes(7)))
    # bad filter byte (5) on the first scanline
    raw = b"\x05" + bytes(4 * 3) + b"".join(
        b"\x00" + bytes(4 * 3) for _ in range(3))
    with pytest.raises(ValueError):
        png.decode_png(_ihdr_png(4, 4, idat=raw))
    # valid zlib header, garbage stream
    data = (png._SIGNATURE
            + png._chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
            + png._chunk(b"IDAT", b"\x78\x9c" + bytes(20))
            + png._chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        png.decode_png(data)


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        png.encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        png.encode_png(np.zeros((4, 4, 3), dtype=np.int32))


# ---------------------------------------------------------------------------
# Spark surface: mixed bmp/png dispatch
# ---------------------------------------------------------------------------

def test_decode_batch_mixed_mimes_and_hostile(spark):
    from tackle4losscontentextraction_spark.operators import multimodal

    px = bmp.synth_pattern(16, 16, seed=7)
    rows = [
        ("p1", "d1", "image", "image/png", 16, 16, 0,
         bytearray(png.encode_png(px))),
        ("b1", "d1", "image", "image/bmp", 16, 16, 0,
         bytearray(bmp.encode_bmp(px))),
        ("p2", "d1", "image", "image/png", 16, 16, 0,
         bytearray(png.encode_png(px)[:40])),           # truncated
        ("p3", "d1", "image", "image/png", 16, 16, 0, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           multimodal.decode_image_batch(media).collect()}
    assert out["p1"].ok and out["b1"].ok
    assert not out["p2"].ok and not out["p3"].ok
    # same pixels -> same features regardless of container
    assert out["p1"].feature == out["b1"].feature


def test_resize_batch_png_real_resample(spark):
    from tackle4losscontentextraction_spark.operators import multimodal

    px = bmp.synth_pattern(16, 16, seed=5)
    media = spark.createDataFrame(
        [("p1", "d1", "image", "image/png", 16, 16, 0,
          bytearray(png.encode_png(px)))],
        multimodal.MEDIA_SCHEMA)
    row = multimodal.resize_image_batch(media, width=8, height=8).first()
    assert (row.width, row.height) == (8, 8)
    got = png.decode_png(bytes(row.payload))
    assert (got == bmp.resize_nearest(px, 8, 8)).all()


def test_synth_payload_mix_covers_both_formats(spark):
    """The corpus synth alternates BMP/PNG by seed parity, so the
    media_decode oracle proves both round trips on every run."""
    from tackle4losscontentextraction_spark.operators import multimodal
    from tackle4losscontentextraction_spark.operators import extraction
    from tackle4losscontentextraction_spark.sources import synth

    docs = synth.synth_docs(spark, 200)
    media = multimodal.synth_bmp_payloads(
        multimodal.synth_media_table(extraction.extract(docs)))
    mimes = {r.mime for r in media.where("media_kind = 'image'")
             .select("mime").distinct().collect()}
    assert mimes == {"image/bmp", "image/png"}
    feats = multimodal.decode_image_batch(media)
    assert feats.where("ok = false").join(
        media.where("media_kind = 'image'"), "media_id").count() == 0


def test_zip_bomb_idat_is_capped_not_materialized():
    """zlib.decompress(bufsize=N) is only an initial size hint — the
    real cap is decompressobj(max_length): an IDAT that inflates far
    past the declared dims must be rejected after at most expected+1
    bytes, never fully materialized in executor memory."""
    bomb = _ihdr_png(8, 8, idat=bytes(10_000_000))  # needs only 200 raw bytes
    with pytest.raises(ValueError, match="past declared"):
        png.decode_png(bomb)
    # and a stream that inflates to exactly the declared size still works
    ok = bmp.synth_pattern(8, 8, 3)
    assert np.array_equal(png.decode_png(png.encode_png(ok)), ok)
