"""Real media decode kernel: baseline sequential JPEG (JFIF).

Rounds 3-4 upgraded BMP (raw raster) and PNG (DEFLATE) from the
documented hash stand-in to genuine pixel kernels; JPEG was left
stubbed because it needs an entropy coder AND a transform stage. Both
are stdlib+numpy feasible: canonical Huffman over (run, size) symbols
and an 8x8 type-II DCT as a single orthonormal matrix product. This
module implements the full baseline codec — encode and decode — so
``image/jpeg`` payloads run through real quantized-DCT pixels like the
other two mimes:

- encoder: RGB -> JFIF YCbCr, optional 4:2:0 chroma subsampling, 8x8
  forward DCT, Annex-K quantization scaled by quality, zigzag, DC
  difference + AC run-length coding with the K.3 Huffman tables,
  byte-stuffed bitstream, optional restart intervals.
- decoder: marker walk (DQT/SOF0/DHT/SOS/DRI, APPn/COM skipped),
  canonical Huffman decode with the tables READ FROM THE FILE (not
  assumed), dequantize, batch inverse DCT, chroma upsample for any
  sampling factors 1..2, YCbCr -> RGB, crop to the true dimensions.
  Grayscale (single-component) scans decode to replicated-channel RGB.
  Anything non-baseline (progressive SOF2, 12-bit precision,
  arithmetic coding) raises ValueError, as do truncated or absurd
  payloads — callers map that to ok=false rows.

Unlike BMP/PNG the transform is LOSSY, so the DuckDB oracle cannot
reproduce features analytically from the synth seed; JPEG correctness
is pytest-gated instead (tests/test_jpeg.py): encode->decode error
bounded by the quantization step, a golden pixel hash pinning decoder
determinism, and hostile-input rejection. The ``media_decode`` oracle
corpus therefore stays BMP/PNG.

Kernels are plain (bytes/ndarray) functions; the Spark surface stays
in operators/multimodal.py (Arrow-batched mapInPandas), same contract
as bmp.py/png.py. The decoder's bitstream stage is table-driven: the
entropy region is unstuffed/segmented in one vectorized pass, a 2^16
lookahead LUT turns each Huffman symbol into a single list index, and
the batch stages (DCT, color, upsample) are vectorized numpy — the
round-5 per-bit Python reader spent 83-96% of decode wall time (and
grew an unbounded accumulator int, going superlinear past ~256px; see
BENCH/media.json).

Reference context: the crawler strips <img> tags outright
(extractContent.py:272); the rebuild preserves media refs and grades
the decode tier first-class, hence real kernels per mime.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64_000_000

# zigzag index -> natural (row-major) index, ITU T.81 figure A.6
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K base quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# K.3 Huffman table specs: (BITS[1..16], HUFFVAL). Embedded in DHT by
# the encoder and read back by the decoder — the decoder never assumes
# them, so external baseline JPEGs with custom tables also decode.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis T: forward = T @ B @ T.T,
    inverse = T.T @ F @ T (T is orthogonal)."""
    k = np.arange(8)
    t = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    t[0] /= np.sqrt(2.0)
    return t


_DCT = _dct_matrix()


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> per-coefficient divisors 1..255."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per T.81 F.1.2.3


def _magnitude(v: int) -> tuple[int, int]:
    """Value -> (size, amplitude bits) per T.81 table F.1/F.2."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) float plane (multiple of 8) -> (n_blocks, 64) quantized
    zigzag coefficients, blocks in raster order. Batch DCT."""
    h, w = plane.shape
    blocks = (plane - 128.0).reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(-1, 8, 8)
    coef = _DCT @ blocks @ _DCT.T
    q = np.round(coef.reshape(-1, 64) / qt[None, :]).astype(np.int64)
    return q[:, ZIGZAG]  # natural -> zigzag stream order


def _entropy_encode_block(w: _BitWriter, zzl: list[int], pred: int,
                          dc_codes: dict, ac_codes: dict) -> int:
    """One block's DC diff + AC run-length symbols, bit-packed with
    local-int state that is pushed back to the writer at block end.
    Takes the block as a plain list: per-symbol ``write`` method calls
    and the per-block numpy nonzero/max reductions were 2/3 of encode
    wall time (see BENCH/media.json). Bitstream is byte-identical to
    the round-5 writer — same symbols, same canonical codes."""
    acc, n, buf = w.acc, w.n, w.buf
    dc = zzl[0]
    v = dc - pred
    size, amp = _magnitude(v)
    code, length = dc_codes[size]
    acc = (acc << length) | code
    n += length
    if size:
        acc = (acc << size) | amp
        n += size
    last_nz = 63  # last nonzero AC index (0 when every AC is zero)
    while last_nz and zzl[last_nz] == 0:
        last_nz -= 1
    run = 0
    for i in range(1, last_nz + 1):
        v = zzl[i]
        if v == 0:
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]  # ZRL
                acc = (acc << length) | code
                n += length
                run = 0
            continue
        if v > 0:
            size = v.bit_length()
            amp = v
        else:
            size = (-v).bit_length()
            amp = v + (1 << size) - 1
        code, length = ac_codes[(run << 4) | size]
        acc = (acc << (length + size)) | (code << size) | amp
        n += length + size
        run = 0
        if n >= 32:  # drain so acc stays a machine-word-sized int
            while n >= 8:
                n -= 8
                byte = (acc >> n) & 0xFF
                buf.append(byte)
                if byte == 0xFF:
                    buf.append(0x00)
            acc &= (1 << n) - 1
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        acc = (acc << length) | code
        n += length
    while n >= 8:
        n -= 8
        byte = (acc >> n) & 0xFF
        buf.append(byte)
        if byte == 0xFF:
            buf.append(0x00)
    w.acc = acc & ((1 << n) - 1)
    w.n = n
    return dc


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate pad to a multiple of `mult` in both dims (the
    padding JPEG encoders use so block edges don't ring)."""
    h, w = plane.shape
    ph, pw = (-h) % mult, (-w) % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes. ``subsample``
    selects 4:2:0 (2x2-mean chroma); ``restart_interval`` > 0 emits DRI
    + RSTn markers every that many MCUs (the resync points a parallel
    decoder or a corruption-tolerant reader keys on)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("need (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    # SOF0 stores dims as >H — beyond 65535 the pack would raise
    # struct.error AFTER the full DCT, breaking the ValueError contract
    if h == 0 or w == 0 or h * w > MAX_PIXELS or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]

    qt_l, qt_c = _scaled_qt(QT_LUMA, quality), _scaled_qt(QT_CHROMA, quality)
    if subsample:
        y = _pad_to(y, 16)
        # 2x2 mean; chroma planes then pad to 8 (already multiples of 8
        # because luma was padded to 16)
        cbp, crp = _pad_to(cb, 16), _pad_to(cr, 16)
        cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        hs, vs = 2, 2
    else:
        y, cb, cr = _pad_to(y, 8), _pad_to(cb, 8), _pad_to(cr, 8)
        hs, vs = 1, 1

    zz_y = _encode_plane_blocks(y, qt_l).tolist()
    zz_cb = _encode_plane_blocks(cb, qt_c).tolist()
    zz_cr = _encode_plane_blocks(cr, qt_c).tolist()

    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    yw = y.shape[1] // 8  # luma blocks per row
    cw = cb.shape[1] // 8
    mcus_x = y.shape[1] // (8 * hs)
    mcus_y = y.shape[0] // (8 * vs)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    idx = (my * vs + by) * yw + (mx * hs + bx)
                    preds[0] = _entropy_encode_block(bw, zz_y[idx], preds[0], dc_l, ac_l)
            preds[1] = _entropy_encode_block(bw, zz_cb[my * cw + mx], preds[1], dc_c, ac_c)
            preds[2] = _entropy_encode_block(bw, zz_cr[my * cw + mx], preds[2], dc_c, ac_c)
            mcu_count += 1
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(int(v) for v in qt[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hs << 4) | vs, 0])  # Y
    out += bytes([2, 0x11, 1])            # Cb
    out += bytes([3, 0x11, 1])            # Cr
    for tc, tid, bits, vals in ((0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
                                (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
                                (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
                                (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | tid)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _build_lut(bits: list[int], vals: list[int]) -> list[int]:
    """Canonical table -> flat 2^16 lookup: entry ``(sym << 5) | len``
    for every 16-bit lookahead whose prefix is that code (0 = no code
    matches). Replaces the per-bit tree walk with ONE list index per
    symbol. Overlong canonical assignments (hostile BITS counts) shift
    past 2^16 and stay unreachable, same as the old dict lookup."""
    lut = np.zeros(1 << 16, dtype=np.int64)
    for sym, (code, length) in _build_codes(bits, vals).items():
        lo = code << (16 - length)
        lut[lo:lo + (1 << (16 - length))] = (sym << 5) | length
    return lut.tolist()


def _entropy_segments(payload: bytes, pos: int) -> list[np.ndarray]:
    """Split the entropy-coded region into restart-delimited, unstuffed
    byte arrays in one vectorized pass (np.flatnonzero over the 0xFF
    positions; the Python loop runs once per 0xFF, ~payload/256 times).

    Segment i+1 exists only when segment i was terminated by an RSTn
    marker; the region ends at the first non-RST marker, end-of-data,
    or a lone trailing 0xFF (whose bits the old per-byte reader also
    refused to serve). Reads past a segment's end raise in the decode
    loop — the same outcomes the _BitReader produced byte-by-byte."""
    arr = np.frombuffer(payload, dtype=np.uint8)[pos:]
    segs: list[np.ndarray] = []
    drops: list[int] = []
    start = 0
    done = False
    for f in np.flatnonzero(arr == 0xFF):
        if f < start:
            continue  # consumed as part of the previous RSTn marker
        if f + 1 >= arr.size:  # lone trailing 0xFF: not servable data
            segs.append(np.delete(arr[start:f], [d - start for d in drops]))
            done = True
            break
        nxt = arr[f + 1]
        if nxt == 0x00:  # stuffed data byte: keep 0xFF, drop the 0x00
            drops.append(f + 1)
            continue
        segs.append(np.delete(arr[start:f], [d - start for d in drops]))
        drops = []
        if 0xD0 <= nxt <= 0xD7:  # restart: next segment follows
            start = f + 2
        else:  # any other marker ends the entropy region
            done = True
            break
    if not done:
        segs.append(np.delete(arr[start:], [d - start for d in drops]))
    return segs


def _lookahead(seg: np.ndarray) -> tuple[list[int], int]:
    """(look, nbits) where ``look[p]`` is the 16-bit MSB-first window
    starting at bit p (zero-padded past the segment end — consumers
    bound every read by ``nbits``). Built vectorized: one 24-bit word
    per byte, shifted to all 8 in-byte offsets at once; .tolist() so
    the decode loop pays plain-list indexing, not numpy scalar boxing."""
    b = np.empty(seg.size + 2, dtype=np.uint32)
    b[:seg.size] = seg
    b[seg.size:] = 0
    w = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
    shifts = (8 - np.arange(8, dtype=np.uint32))[None, :]
    look = ((w[:, None] >> shifts) & 0xFFFF).astype(np.int64).reshape(-1)
    return look.tolist(), seg.size * 8


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_scan(payload: bytes, pos: int, comps: list, scan_map: list,
                 huff: dict, restart_interval: int, mcus_x: int,
                 mcus_y: int, planes: list[np.ndarray]) -> None:
    """Entropy-decode every MCU into ``planes`` (zigzag coefficient
    rows). Per-symbol cost is one LUT list index + int arithmetic; the
    bitstream itself was unstuffed/segmented vectorized up front."""
    tbls = []
    for ci, dc_id, ac_id in scan_map:
        dc_lut, ac_lut = huff.get((0, dc_id)), huff.get((1, ac_id))
        if dc_lut is None or ac_lut is None:
            raise ValueError("scan references missing huffman table")
        tbls.append((ci, comps[ci][1], comps[ci][2], dc_lut, ac_lut))

    segs = _entropy_segments(payload, pos)
    seg_i = 0
    look, nbits = _lookahead(segs[0])
    p = 0
    preds = [0] * len(comps)
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            # byte-align: only the tail of the current byte may remain
            # unread before the marker (T.81 F.2.1.3.1); a full spare
            # byte means the marker was not where the stream promised
            if nbits - p >= 8 or seg_i + 1 >= len(segs):
                raise ValueError("expected restart marker")
            seg_i += 1
            look, nbits = _lookahead(segs[seg_i])
            p = 0
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, hs, vs, dc_lut, ac_lut in tbls:
            plane = planes[ci]
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    # --- DC ---
                    if p >= nbits:
                        raise ValueError("truncated entropy data")
                    e = dc_lut[look[p]]
                    ln = e & 31
                    if ln == 0:
                        raise ValueError(
                            "truncated entropy data" if nbits - p < 16
                            else "invalid huffman code")
                    if p + ln > nbits:
                        raise ValueError("truncated entropy data")
                    p += ln
                    size = e >> 5
                    if size:
                        if p + size > nbits:
                            raise ValueError("truncated entropy data")
                        if size <= 16:
                            v = look[p] >> (16 - size)
                            p += size
                        else:  # hostile DHT: DC size category > 16
                            v = 0
                            rem = size
                            while rem > 16:
                                v = (v << 16) | look[p]
                                p += 16
                                rem -= 16
                            v = (v << rem) | (look[p] >> (16 - rem))
                            p += rem
                        preds[ci] += _extend(v, size)
                    zz[0] = preds[ci]
                    # --- AC ---
                    i = 1
                    while i < 64:
                        if p >= nbits:
                            raise ValueError("truncated entropy data")
                        e = ac_lut[look[p]]
                        ln = e & 31
                        if ln == 0:
                            raise ValueError(
                                "truncated entropy data" if nbits - p < 16
                                else "invalid huffman code")
                        if p + ln > nbits:
                            raise ValueError("truncated entropy data")
                        p += ln
                        sym = e >> 5
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            i += 16
                            continue
                        i += sym >> 4
                        size = sym & 0xF
                        if i >= 64 or size == 0:
                            raise ValueError("AC coefficient overrun")
                        if p + size > nbits:
                            raise ValueError("truncated entropy data")
                        zz[i] = _extend(look[p] >> (16 - size), size)
                        p += size
                        i += 1
                    plane[my * vs + by, mx * hs + bx] = zz


def decode_jpeg(payload: bytes | None) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB. ValueError on
    anything that is not well-formed baseline sequential 8-bit."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("bad magic")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list[int]] = {}
    frame = None          # (h, w, [(cid, hs, vs, qt_id)])
    scan_map = None       # [(comp_idx, dc_id, ac_id)]
    restart_interval = 0
    try:
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("marker desync")
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker id — encoders legally pad with them between segments
            while payload[pos + 1] == 0xFF:
                pos += 1
                if pos + 4 > len(payload):
                    raise ValueError("truncated after fill bytes")
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                raise ValueError("no scan data")
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: standalone
                pos += 2
                continue
            seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
            seg = payload[pos + 4:pos + 2 + seg_len]
            if len(seg) != seg_len - 2:
                raise ValueError("truncated segment")
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0xF
                    if pq != 0:
                        raise ValueError("16-bit quant tables unsupported")
                    tbl = np.zeros(64, dtype=np.int64)
                    tbl[ZIGZAG] = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                    qts[tq] = tbl
                    p += 65
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(f"non-baseline SOF 0x{marker:02x} unsupported")
            elif marker == 0xC0:  # SOF0
                prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8:
                    raise ValueError("only 8-bit precision supported")
                if nc not in (1, 3):
                    raise ValueError(f"unsupported component count {nc}")
                if fh == 0 or fw == 0 or fh * fw > MAX_PIXELS:
                    raise ValueError("bad dimensions")
                comps = []
                for i in range(nc):
                    cid, sf, qid = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                    hs, vs = sf >> 4, sf & 0xF
                    if not (1 <= hs <= 2 and 1 <= vs <= 2):
                        raise ValueError(f"sampling factors {hs}x{vs} unsupported")
                    comps.append((cid, hs, vs, qid))
                frame = (fh, fw, comps)
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 0xF
                    bits = list(seg[p + 1:p + 17])
                    n = sum(bits)
                    vals = list(seg[p + 17:p + 17 + n])
                    huff[(tc, th)] = _build_lut(bits, vals)
                    p += 17 + n
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:  # SOS
                if frame is None:
                    raise ValueError("SOS before SOF")
                ns = seg[0]
                if ns != len(frame[2]):
                    raise ValueError("interleave mismatch")
                scan_map = []
                for i in range(ns):
                    cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                    idx = next((j for j, c in enumerate(frame[2]) if c[0] == cs), None)
                    if idx is None:
                        raise ValueError("scan names unknown component")
                    scan_map.append((idx, tt >> 4, tt & 0xF))
                pos += 2 + seg_len
                break
            # APPn / COM / others: skip
            pos += 2 + seg_len
        else:
            raise ValueError("no SOS marker")

        fh, fw, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = -(-fw // (8 * hmax))
        mcus_y = -(-fh // (8 * vmax))
        planes = []
        for _, hs, vs, _ in comps:
            planes.append(np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64))

        _decode_scan(payload, pos, comps, scan_map, huff,
                     restart_interval, mcus_x, mcus_y, planes)

        # dequantize + batch IDCT + reassemble + upsample per component
        out_planes = []
        for ci, (_, hs, vs, qid) in enumerate(comps):
            qt = qts.get(qid)
            if qt is None:
                raise ValueError("frame references missing quant table")
            by, bx, _ = planes[ci].shape
            nat = np.zeros((by * bx, 64), dtype=np.float64)
            # coefficients arrive in zigzag stream order; the quant
            # table is natural order — align before multiplying
            nat[:, ZIGZAG] = planes[ci].reshape(-1, 64) * qt[ZIGZAG][None, :]
            blocks = _DCT.T @ nat.reshape(-1, 8, 8) @ _DCT
            plane = (blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                     .reshape(by * 8, bx * 8) + 128.0)
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
            out_planes.append(plane[:fh, :fw])

        if len(out_planes) == 1:
            g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
            return np.stack([g, g, g], axis=2)
        y, cb, cr = out_planes
        r_ = y + 1.402 * (cr - 128.0)
        g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b_ = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r_, g_, b_], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed jpeg: {e}") from e
