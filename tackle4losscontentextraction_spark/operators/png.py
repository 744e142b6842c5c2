"""Real media decode kernel #2: PNG (8-bit RGB/RGBA, non-interlaced).

Round 4 made ``image/bmp`` a genuine pixel pipeline (operators/bmp.py)
while compressed mimes kept the documented hash stand-in. PNG is the
one compressed raster format fully decodable with the stdlib: DEFLATE
via ``zlib``, chunk framing + CRC via ``struct``/``zlib.crc32``, and
the five scanline filters (None/Sub/Up/Average/Paeth) as pure
arithmetic. This module upgrades ``image/png`` to a real decode the
same way — encode, decode, filters, hostile-input rejection — so the
multimodal path exercises a genuinely compressed mime end-to-end
(ref context: the reference's crawler handles fetched article pages
whose media are jpeg/png, extractContent.py:272 strips ``img`` tags;
our north rule preserves media refs, so the decode tier is a
from-scratch rebuild, not a port).

Kernels are plain (bytes/ndarray) functions; the Spark surface stays
in operators/multimodal.py (Arrow-batched mapInPandas). Feature
extraction reuses bmp.bmp_features — features are a property of the
PIXELS, not the container, which is exactly what lets the analytic
DuckDB oracle stay format-blind.

Scope (everything else raises ValueError -> ok=false rows):
  bit depth 8; color types 2 (RGB) and 6 (RGBA, alpha dropped);
  compression 0, filter method 0, interlace 0 (no Adam7).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# same per-image guard as bmp.py: reject absurd header dims before
# allocating (decode runs inside executor memory shared by a whole
# Arrow batch)
MAX_PIXELS = 64_000_000


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _filter_row(mode: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter ``mode`` to one unfiltered scanline (encoder side).
    row/prev are int32 copies so the mod-256 arithmetic never wraps
    mid-expression."""
    a = np.zeros_like(row)
    a[bpp:] = row[:-bpp]
    if mode == 0:
        out = row
    elif mode == 1:
        out = row - a
    elif mode == 2:
        out = row - prev
    elif mode == 3:
        out = row - (a + prev) // 2
    else:  # 4 Paeth
        c = np.zeros_like(prev)
        c[bpp:] = prev[:-bpp]
        out = row - _paeth(a, prev, c)
    return out & 0xFF


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_mode: int | str = "adaptive") -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit color type 2).

    ``filter_mode``: 0..4 forces that filter on every scanline (the
    decode tests sweep all five); "adaptive" picks per row by the
    minimum-sum-of-absolute-deltas heuristic libpng uses."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("need (h, w, 3) uint8 RGB array")
    h, w, _ = pixels.shape
    bpp = 3
    flat = pixels.reshape(h, w * bpp).astype(np.int32)
    prev = np.zeros(w * bpp, dtype=np.int32)
    raw = bytearray()
    for y in range(h):
        row = flat[y]
        if filter_mode == "adaptive":
            best_mode, best = 0, None
            for m in range(5):
                cand = _filter_row(m, row, prev, bpp)
                # sum of absolute signed deltas, the libpng heuristic
                score = int(np.minimum(cand, 256 - cand).sum())
                if best is None or score < best:
                    best_mode, best, filt = m, score, cand
            mode = best_mode
        else:
            mode = int(filter_mode)
            filt = _filter_row(mode, row, prev, bpp)
        raw.append(mode)
        raw += filt.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes | None) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB. Raises ValueError on anything
    outside the supported profile or malformed (bad signature, chunk
    CRC mismatch, truncated/missing IDAT, bad filter byte, absurd or
    inconsistent dimensions, interlace, 16-bit, palette) — callers map
    that to ok=false rows, never a task failure."""
    if payload is None or len(payload) < len(_SIGNATURE) + 25:
        raise ValueError("truncated")
    if payload[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("bad signature")
    pos = len(_SIGNATURE)
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        if length > len(payload) - pos - 12:
            raise ValueError("truncated chunk")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            if ihdr is not None:
                raise ValueError("duplicate IHDR")
            ihdr = data
        elif tag == b"IDAT":
            if ihdr is None:
                raise ValueError("IDAT before IHDR")
            idat += data
        elif tag == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
        pos += 12 + length
    if ihdr is None or not seen_iend:
        raise ValueError("missing IHDR/IEND")
    if len(ihdr) != 13:
        raise ValueError("bad IHDR length")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if color not in (2, 6):
        raise ValueError(f"unsupported color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("bad compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise ValueError("bad dimensions")
    if not idat:
        raise ValueError("no IDAT")
    bpp = 3 if color == 2 else 4
    # zlib.decompress(bufsize=N) is only an INITIAL buffer size, not an
    # output cap — a zip-bomb IDAT would balloon fully into executor
    # memory before the length check. decompressobj(max_length) is the
    # real cap: inflate at most expected+1 bytes, and any pending tail
    # means the stream is bigger than the declared dims allow.
    # exact raw size for the declared dims; bounded by ~5*MAX_PIXELS
    # via the w*h guard above, so this is also the memory cap
    expected = (w * bpp + 1) * h
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from None
    stride = w * bpp
    if len(raw) > expected or dec.unconsumed_tail:
        raise ValueError("IDAT decompresses past declared dimensions")
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length does not match dimensions")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    modes = lines[:, 0]
    if (modes > 4).any():
        raise ValueError("bad filter byte")
    out = np.empty((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        mode = int(modes[y])
        row = lines[y, 1:].astype(np.int32)
        if mode == 0:
            cur = row
        elif mode == 2:
            cur = (row + prev) & 0xFF
        elif mode == 1:
            # Sub is a prefix sum over bpp-strided lanes: x_i = raw_i +
            # x_{i-bpp}  =>  cumsum per lane, mod 256 at the end
            lanes = row.reshape(w, bpp)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).reshape(stride)
        else:
            # Average/Paeth depend on the just-reconstructed left pixel
            # -> sequential across the row. Plain-int list arithmetic:
            # per-element numpy slicing paid ~2 us/px in boxing alone
            # (the whole decode was 2.1 s at 512px, see BENCH/media.json)
            rowl = row.tolist()
            prevl = prev.tolist()
            curl = [0] * stride
            if mode == 3:
                for i in range(stride):
                    a = curl[i - bpp] if i >= bpp else 0
                    # values are 0..255 so (a + b) // 2 == >> 1
                    curl[i] = (rowl[i] + ((a + prevl[i]) >> 1)) & 0xFF
            else:  # 4 Paeth
                for i in range(stride):
                    if i >= bpp:
                        a, c = curl[i - bpp], prevl[i - bpp]
                    else:
                        a = c = 0
                    b = prevl[i]
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    curl[i] = (rowl[i] + pred) & 0xFF
            cur = np.array(curl, dtype=np.int32)
        out[y] = cur
        prev = cur
    rgb = out.astype(np.uint8).reshape(h, w, bpp)
    return rgb[:, :, :3]  # RGBA -> drop alpha
