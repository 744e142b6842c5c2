"""Real media container kernel: ISO BMFF / MP4 box structure.

Round 4 made BMP/PNG/PDF decode real; round 5 adds JPEG (jpeg.py) and
this module, which upgrades the VIDEO path from "hash the whole blob"
to a genuine container walk. What is real here:

- box tree parse (size/type headers, nested moov/trak/mdia/minf/stbl),
- the sample tables: stts (decode timestamps, run-length), stsz
  (sizes), stsc + stco (chunk layout -> absolute byte offsets),
- true per-sample byte-range extraction out of mdat,
- a writer (``encode_mp4``) producing a structurally valid single-trak
  video file (ftyp + mdat + moov) that any BMFF reader can walk.

What stays a documented stand-in: decoding the CODEC payload inside a
sample (H.264 etc. — no video codec in this container; swap ffmpeg in
on a real cluster). sample_frames_batch (operators/multimodal.py)
therefore extracts REAL sample bytes at REAL container timestamps and
hashes those bytes into the feature vector.

Kernels are plain (bytes/ndarray-free) functions; hostile payloads
(truncated boxes, absurd sizes, missing tables) raise ValueError,
which the Spark surface maps to ok=false rows / legacy fallback.
"""

from __future__ import annotations

import struct

MAX_SAMPLES = 1_000_000
MAX_BOX_DEPTH = 16


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def encode_mp4(samples: list[bytes], timescale: int = 1000,
               sample_duration: int = 40, width: int = 64,
               height: int = 64) -> bytes:
    """Per-frame codec payloads -> minimal valid single-trak video MP4
    (ftyp + mdat + moov; all samples in one chunk). ``sample_duration``
    is in timescale units (default 40/1000 s = 25 fps)."""
    if not samples:
        raise ValueError("need at least one sample")
    if not (1 <= width <= 65535 and 1 <= height <= 65535):
        raise ValueError("bad dimensions")  # stsd stores dims as >H
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    # absolute offset of the first sample: ftyp + mdat header
    chunk_offset = len(ftyp) + 8
    n = len(samples)
    duration = n * sample_duration

    stsd_entry = (
        struct.pack(">I4s", 86, b"mp4v") + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000) + struct.pack(">I", 0)
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_duration))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url_ = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"video\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", duration)
                 + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8
                 + matrix + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(payload: bytes, start: int, end: int, depth: int = 0):
    """Yield (tag, body_start, body_end) for each box in [start, end)."""
    if depth > MAX_BOX_DEPTH:
        raise ValueError("box nesting too deep")
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = struct.unpack_from(">I", payload, pos)[0]
        tag = payload[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize")
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {tag!r} size out of range")
        yield tag, body, pos + size
        pos += size


def _find(payload: bytes, start: int, end: int, tag: bytes,
          depth: int = 0) -> tuple[int, int]:
    for t, b, e in _walk(payload, start, end, depth):
        if t == tag:
            return b, e
    raise ValueError(f"missing {tag!r} box")


def parse_mp4(payload: bytes | None) -> dict:
    """MP4 bytes -> {timescale, duration_ms, codec, width, height,
    samples: [(offset, size, ts_ms)]}. ValueError on malformed input —
    callers treat that as 'not a real container' and fall back.

    The ValueError contract holds for EVERY malformed input: a box that
    passes the _walk bounds check can still end mid-field (e.g. an stsd
    that claims one entry but stops at the payload boundary), so the
    whole parse is wrapped and struct.error/IndexError from any unpack
    are converted — a hostile row must map to ok=false, never kill the
    Spark task."""
    if payload is None or len(payload) < 16:
        raise ValueError("truncated")
    try:
        return _parse_mp4(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed: {e}") from e


def _parse_mp4(payload: bytes) -> dict:
    top = list(_walk(payload, 0, len(payload)))
    tags = [t for t, _, _ in top]
    if b"ftyp" not in tags or b"moov" not in tags:
        raise ValueError("not an ISO BMFF file")
    moov_b, moov_e = _find(payload, 0, len(payload), b"moov")
    # first video trak
    stbl_b = stbl_e = None
    mdhd_ts, mdhd_dur = None, None
    codec, width, height = "", 0, 0
    for t, b, e in _walk(payload, moov_b, moov_e, 1):
        if t != b"trak":
            continue
        try:
            mdia_b, mdia_e = _find(payload, b, e, b"mdia", 2)
            hdlr_b, _ = _find(payload, mdia_b, mdia_e, b"hdlr", 3)
            if payload[hdlr_b + 8:hdlr_b + 12] != b"vide":
                continue
            mdhd_b, _ = _find(payload, mdia_b, mdia_e, b"mdhd", 3)
            ver = payload[mdhd_b]
            if ver == 0:
                mdhd_ts, mdhd_dur = struct.unpack_from(">II", payload, mdhd_b + 12)
            else:
                mdhd_ts = struct.unpack_from(">I", payload, mdhd_b + 20)[0]
                mdhd_dur = struct.unpack_from(">Q", payload, mdhd_b + 24)[0]
            minf_b, minf_e = _find(payload, mdia_b, mdia_e, b"minf", 3)
            stbl_b, stbl_e = _find(payload, minf_b, minf_e, b"stbl", 4)
        except (ValueError, struct.error, IndexError):
            continue  # malformed trak: skip it, later traks may be fine
        break
    if stbl_b is None or not mdhd_ts:
        raise ValueError("no video track with sample tables")

    stsd_b, _ = _find(payload, stbl_b, stbl_e, b"stsd", 5)
    if struct.unpack_from(">I", payload, stsd_b + 4)[0] >= 1:
        codec = payload[stsd_b + 12:stsd_b + 16].decode("latin1")
        width, height = struct.unpack_from(">HH", payload, stsd_b + 40)

    stts_b, stts_e = _find(payload, stbl_b, stbl_e, b"stts", 5)
    n_runs = struct.unpack_from(">I", payload, stts_b + 4)[0]
    if stts_b + 8 + 8 * n_runs > stts_e:
        raise ValueError("truncated stts")
    ts_units: list[int] = []
    t_acc = 0
    for i in range(n_runs):
        cnt, delta = struct.unpack_from(">II", payload, stts_b + 8 + 8 * i)
        if cnt > MAX_SAMPLES or len(ts_units) + cnt > MAX_SAMPLES:
            raise ValueError("absurd sample count")
        for _ in range(cnt):
            ts_units.append(t_acc)
            t_acc += delta

    stsz_b, stsz_e = _find(payload, stbl_b, stbl_e, b"stsz", 5)
    fixed, n_samples = struct.unpack_from(">II", payload, stsz_b + 4)
    if n_samples > MAX_SAMPLES:
        raise ValueError("absurd sample count")
    if fixed:
        sizes = [fixed] * n_samples
    else:
        if stsz_b + 12 + 4 * n_samples > stsz_e:
            raise ValueError("truncated stsz")
        sizes = list(struct.unpack_from(f">{n_samples}I", payload, stsz_b + 12))

    stsc_b, stsc_e = _find(payload, stbl_b, stbl_e, b"stsc", 5)
    n_stsc = struct.unpack_from(">I", payload, stsc_b + 4)[0]
    if stsc_b + 8 + 12 * n_stsc > stsc_e:
        raise ValueError("truncated stsc")
    stsc = [struct.unpack_from(">III", payload, stsc_b + 8 + 12 * i)
            for i in range(n_stsc)]

    stco_b, stco_e = _find(payload, stbl_b, stbl_e, b"stco", 5)
    n_chunks = struct.unpack_from(">I", payload, stco_b + 4)[0]
    if stco_b + 8 + 4 * n_chunks > stco_e:
        raise ValueError("truncated stco")
    chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", payload, stco_b + 8))

    # expand stsc runs: chunk index -> samples_per_chunk. stsc is sorted
    # by first_chunk (ISO 14496-12 8.7.4), so one forward pointer covers
    # all chunks in O(n_chunks + n_stsc) — a rescan per chunk would be
    # quadratic on attacker-controlled table sizes (a ~2 MB file can
    # declare ~500k chunks x ~170k stsc entries).
    samples: list[tuple[int, int, int]] = []
    si = 0
    spc = 0
    sti = 0
    for ci in range(n_chunks):
        while sti < len(stsc) and stsc[sti][0] <= ci + 1:
            spc = stsc[sti][1]
            sti += 1
        off = chunk_offsets[ci]
        for _ in range(spc):
            if si >= n_samples:
                break
            sz = sizes[si]
            ts_ms = (ts_units[si] * 1000) // mdhd_ts if si < len(ts_units) else 0
            if off + sz > len(payload):
                raise ValueError("sample range beyond payload")
            samples.append((off, sz, ts_ms))
            off += sz
            si += 1
    if si != n_samples:
        raise ValueError("chunk layout does not cover all samples")

    return {
        "timescale": mdhd_ts,
        "duration_ms": (mdhd_dur * 1000) // mdhd_ts,
        "codec": codec,
        "width": width,
        "height": height,
        "samples": samples,
    }


def extract_sample(payload: bytes, info: dict, idx: int) -> bytes:
    """True byte-range slice of sample ``idx`` out of mdat."""
    off, size, _ = info["samples"][idx]
    return payload[off:off + size]


def sample_at(info: dict, ts_ms: int) -> int:
    """Index of the last sample whose decode time <= ts_ms (the frame a
    seek-to-timestamp lands on), clamped to the first sample."""
    idx = 0
    for i, (_, _, t) in enumerate(info["samples"]):
        if t <= ts_ms:
            idx = i
        else:
            break
    return idx
