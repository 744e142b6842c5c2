"""Round-6 pins for the rewritten media-kernel internals.

The JPEG entropy decoder moved from a per-bit Python reader to a
vectorized unstuff + 2^16-lookahead LUT, the encoder's bit writer was
inlined, and the PNG Average/Paeth unfilter moved from per-pixel numpy
slicing to plain-int list arithmetic. These tests pin the equivalence
arguments that rewrite relied on (the broad encode/decode behavior is
already covered by test_jpeg.py / test_png.py goldens).
"""
from __future__ import annotations

import numpy as np
import pytest

from tackle4losscontentextraction_spark.operators import bmp, jpeg, png


def test_lut_matches_canonical_codes():
    """Every canonical (code, length) prefix range in the LUT decodes to
    its symbol; every lookahead outside a code's range stays 0."""
    bits, vals = jpeg._AC_LUMA_BITS, jpeg._AC_LUMA_VALS
    codes = jpeg._build_codes(bits, vals)
    lut = jpeg._build_lut(bits, vals)
    marked = 0
    for sym, (code, length) in codes.items():
        lo = code << (16 - length)
        span = 1 << (16 - length)
        seg = lut[lo:lo + span]
        assert all(e == ((sym << 5) | length) for e in seg), sym
        marked += span
    assert sum(1 for e in lut if e) == marked  # no stray entries


def test_entropy_segments_unstuff_and_split():
    # stuffed 0xFF00 -> 0xFF; RSTn splits; EOI terminates
    data = bytes([0xAA, 0xFF, 0x00, 0xBB, 0xFF, 0xD1, 0xCC, 0xFF, 0xD9, 0x77])
    segs = jpeg._entropy_segments(data, 0)
    assert [s.tolist() for s in segs] == [[0xAA, 0xFF, 0xBB], [0xCC]]
    # lone trailing 0xFF is NOT servable data (old reader raised when
    # consuming it) -> excluded from the final segment
    segs = jpeg._entropy_segments(bytes([0x11, 0x22, 0xFF]), 0)
    assert [s.tolist() for s in segs] == [[0x11, 0x22]]


def test_lookahead_windows():
    look, nbits = jpeg._lookahead(np.array([0b10110100, 0xFF], dtype=np.uint8))
    assert nbits == 16
    assert look[0] == 0b1011010011111111
    assert look[4] == 0b0100111111110000  # zero-padded past the end
    assert look[15] == 0b1000000000000000


def test_decode_rejects_mid_code_truncation():
    px = bmp.synth_pattern(16, 16, seed=9)
    blob = jpeg.encode_jpeg(px, quality=85)
    scan = blob.rfind(b"\xff\xda")
    # cut inside the entropy data: every prefix must raise, never hang
    # or return pixels
    for cut in range(scan + 15, len(blob) - 2, 3):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(blob[:cut])


def test_decode_rejects_misplaced_restart():
    px = bmp.synth_pattern(32, 32, seed=4)
    blob = bytearray(jpeg.encode_jpeg(px, quality=85, restart_interval=1))
    # corrupt the first RSTn marker id -> treated as scan-ending marker,
    # decoder runs out of data mid-scan
    for i in range(len(blob) - 1):
        if blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7:
            blob[i + 1] = 0xD9
            break
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(blob))


def test_png_unfilter_matches_reference_rows():
    """Average/Paeth list-based unfilter vs a straight per-pixel
    transcription of the PNG spec recurrences."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(23, 17, 3), dtype=np.uint8)
    for mode in (3, 4):
        blob = png.encode_png(px, filter_mode=mode)
        assert (png.decode_png(blob) == px).all()


def test_encoder_bitstream_stable_golden():
    """The inlined bit writer must keep the byte-exact stream the
    round-5 writer produced (same symbols, same canonical codes)."""
    px = bmp.synth_pattern(24, 18, seed=77)
    blob = jpeg.encode_jpeg(px, quality=85, subsample=True, restart_interval=2)
    import hashlib

    assert hashlib.md5(blob).hexdigest() == jpeg_golden_md5()


def jpeg_golden_md5() -> str:
    # captured from the round-5 encoder (differential run, 2026-08-22)
    return "20b1a32bb16b210b31724fc9e34774cb"
