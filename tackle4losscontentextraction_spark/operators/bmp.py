"""Real media decode kernel: 24-bit uncompressed BMP (BI_RGB).

Round 3 shipped the multimodal *plumbing* with a documented hash
stand-in for the decode kernel (multimodal._fake_decode) because no
image libraries exist in this container. BMP needs none: the format is
a fixed header + raw bottom-up BGR rows, parseable with stdlib struct
+ numpy. This module upgrades one mime ("image/bmp") to a genuine
pixel pipeline — encode, decode, feature-extract, resize — while the
compressed mimes (jpeg/mp4) keep the documented stand-in.

Functions are plain (bytes/ndarray) kernels; the Spark surface stays
in operators/multimodal.py (Arrow-batched mapInPandas) — kernels never
touch the DataFrame API, so swapping PIL in on a real cluster changes
nothing about the dataflow.

Feature vector (FEATURE_DIM floats, all derived from exact integer
sums so every engine reproduces them bit-for-bit after 6 dp rounding):
  [0..2]  per-channel mean / 255 (R, G, B)
  [3..6]  quadrant luma means / 255 (TL, TR, BL, BR; luma = (r+g+b)/3)
  [7]     global luma mean / 255
  [8]     min luma / 255
  [9]     max luma / 255
  [10]    width / 1024
  [11]    height / 1024
  [12..]  zero padding to FEATURE_DIM
"""

from __future__ import annotations

import struct

import numpy as np

FEATURE_DIM = 16

_FILE_HDR = struct.Struct("<2sIHHI")     # magic, size, res1, res2, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # biSize..biClrImportant

# reject absurd dimensions before allocating (a hostile header can
# claim gigapixel sizes; cap is per-image, decode runs inside executor
# memory shared by a whole Arrow batch)
MAX_PIXELS = 64_000_000


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp BI_RGB bytes (bottom-up, BGR,
    rows padded to 4 bytes) — the classic Windows 3.x layout."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("need (h, w, 3) RGB array")
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    offset = _FILE_HDR.size + _INFO_HDR.size
    out = bytearray()
    out += _FILE_HDR.pack(b"BM", offset + img_size, 0, 0, offset)
    out += _INFO_HDR.pack(_INFO_HDR.size, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    if pad:
        padded = np.zeros((h, row + pad), dtype=np.uint8)
        padded[:, :row] = bgr.reshape(h, row)
        out += padded.tobytes()
    else:
        out += bgr.tobytes()
    return bytes(out)


def decode_bmp(payload: bytes | None) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Raises ValueError on anything
    that is not a well-formed 24bpp uncompressed BMP (wrong magic,
    truncated header/pixels, unsupported bpp/compression, absurd
    dimensions) — callers map that to ok=false rows."""
    if payload is None or len(payload) < _FILE_HDR.size + _INFO_HDR.size:
        raise ValueError("truncated header")
    magic, _, _, _, offset = _FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("bad magic")
    (bi_size, w, h, planes, bpp, compression,
     _, _, _, _, _) = _INFO_HDR.unpack_from(payload, _FILE_HDR.size)
    if bi_size < _INFO_HDR.size or planes != 1:
        raise ValueError("bad info header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w * h > MAX_PIXELS:
        raise ValueError("bad dimensions")
    row = w * 3
    stride = row + ((-row) % 4)
    if offset + stride * h > len(payload):
        raise ValueError("truncated pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    bgr = rows.reshape(h, stride)[:, :row].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


def bmp_features(pixels: np.ndarray) -> list[float]:
    """Pixel array -> FEATURE_DIM floats (see module doc). Integer
    sums + one division each, so the closed-form SQL oracle reproduces
    them exactly."""
    h, w, _ = pixels.shape
    p = pixels.astype(np.int64)
    n = h * w
    feats = [float(p[:, :, c].sum()) / (n * 255.0) for c in range(3)]
    luma = p.sum(axis=2)  # per-pixel r+g+b (divide by 3 at the end)
    hh, hw = h // 2, w // 2
    for ys, xs in ((slice(0, hh), slice(0, hw)), (slice(0, hh), slice(hw, w)),
                   (slice(hh, h), slice(0, hw)), (slice(hh, h), slice(hw, w))):
        q = luma[ys, xs]
        feats.append(float(q.sum()) / (q.size * 3 * 255.0) if q.size else 0.0)
    feats.append(float(luma.sum()) / (n * 3 * 255.0))
    feats.append(float(luma.min()) / (3 * 255.0))
    feats.append(float(luma.max()) / (3 * 255.0))
    feats.append(w / 1024.0)
    feats.append(h / 1024.0)
    feats += [0.0] * (FEATURE_DIM - len(feats))
    return feats


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pure index math — deterministic)."""
    h, w, _ = pixels.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return pixels[ys][:, xs]


def synth_pattern(width: int, height: int, seed: int) -> np.ndarray:
    """The deterministic test pattern both engines know in closed form:
    p(x, y, c) = (x + 2*y + 37*c + seed) % 256."""
    x = np.arange(width).reshape(1, width, 1)
    y = np.arange(height).reshape(height, 1, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((x + 2 * y + 37 * c + seed) % 256).astype(np.uint8)
