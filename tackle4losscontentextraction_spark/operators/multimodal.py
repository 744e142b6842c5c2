"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Decode kernels, per mime:

- ``image/bmp`` — REAL decode (operators/bmp.py): header parse,
  bottom-up BGR row extraction, pixel-derived features, numpy resize.
  No image library needed; malformed payloads yield ok=false rows.
- ``image/png`` — REAL decode (operators/png.py): chunk walk with CRC
  checks, stdlib zlib inflate, all five scanline filters unfiltered
  (None/Sub/Up/Average/Paeth) — a genuinely COMPRESSED mime through
  real pixels; features shared with BMP (a property of the pixels,
  not the container).
- ``image/jpeg`` — REAL decode (operators/jpeg.py): baseline
  sequential JFIF — marker walk, canonical Huffman entropy decode,
  dequantize, batch inverse DCT, chroma upsample, YCbCr->RGB.
  Lossy transform, so correctness is pytest-gated (tests/test_jpeg.py)
  rather than analytic-oracle-gated like BMP/PNG.
- ``video/mp4`` — the CONTAINER is real (operators/mp4.py: ISO BMFF
  box walk, stts/stsz/stco sample tables, true sample byte-range
  extraction in sample_frames_batch); the codec payload decode inside
  each sample stays the deterministic hash stand-in (no H.264 decoder
  in this container — swap ffmpeg in on a real cluster). NOTE:
  decode_image_batch's video rows keep the plain payload-hash
  stand-in unchanged — that path is analytic-oracle-mirrored
  (oracle_catalog media_decode/vfeat) and must stay reproducible in
  SQL.

Scale notes: media bytes ride in their own column so Parquet column
pruning skips them unless the stage needs them; decode fan-out uses
mapInPandas (Arrow batches, ~10k rows) with ``repartition`` sized so a
batch of decoded frames fits executor memory; metadata-only stages
never touch the binary column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, doc_id string, media_kind string, mime string, "
    "width int, height int, duration_ms int, payload binary"
)

FEATURE_DIM = 16


def attach_media_refs(extracted: DataFrame) -> DataFrame:
    """Project the media spans of an extraction result into a media
    table (doc_id, media_kind, media_ref, offset) — the join key side
    for payload fetch (the fetch itself is out of scope, as in the
    reference's crawler)."""
    return (
        extracted.select("doc_id", F.explode("extracted").alias("s"))
        .where(F.col("s.media_ref") != "")
        .select(
            "doc_id",
            F.col("s.kind").alias("media_kind"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
    )


def _fake_decode(payload: bytes | None) -> list[float]:
    """Deterministic stand-in for an image decoder: hash bytes into a
    FEATURE_DIM vector. NotImplementedError would be raised by a real
    kernel on unsupported mime; the fake never fails."""
    if payload is None:
        payload = b""
    h = 2166136261
    out = []
    for j in range(FEATURE_DIM):
        acc = h ^ j
        for byte in payload[:256]:
            acc = (acc * 16777619 + byte) & 0xFFFFFFFF
        out.append((acc % 10_000) / 10_000.0)
    return out


def decode_image_batch(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """mapInPandas decode: (media_id, feature array<float>, ok bool).

    Dispatches on mime: ``image/bmp`` and ``image/png`` run the real
    pixel kernels (decode + shared feature extraction, malformed ->
    ok=false); the remaining compressed mimes run the documented hash
    stand-in. The Arrow batch shape and output schema are what a
    PIL/ffmpeg swap-in keeps."""
    out_schema = "media_id string, feature array<double>, ok boolean"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import bmp, jpeg, png

        decoders = {"image/bmp": bmp.decode_bmp, "image/png": png.decode_png,
                    "image/jpeg": jpeg.decode_jpeg}
        for pdf in batches:
            feats, oks = [], []
            for payload, kind, mime in zip(
                pdf["payload"], pdf["media_kind"], pdf["mime"]
            ):
                if kind not in ("image", "video"):
                    feats.append(None)
                    oks.append(False)
                    continue
                if mime in decoders:
                    try:
                        feats.append(bmp.bmp_features(decoders[mime](payload)))
                        oks.append(True)
                    except ValueError:
                        feats.append(None)
                        oks.append(False)
                    continue
                try:
                    feats.append(_fake_decode(payload))
                    oks.append(True)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "ok": oks}
            )

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(fn, schema=out_schema)


def sample_frames_batch(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Frame sampling: video rows FAN OUT to one row per sampled frame
    (media_id, frame_idx, ts_ms, frame array<double>, ok) — the
    row-count-changing mapInPandas shape a real ffmpeg kernel keeps
    (one input batch yields a larger output batch; non-video rows yield
    nothing). Frames per video = min(max_frames, duration/every_ms),
    the memory bound a real sampler also needs (an unbounded explode of
    a long video is the OOM).

    Payloads that parse as REAL MP4 containers (operators/mp4.py) get
    the genuine sampler: duration from the mdhd box, each grid time
    seeked to the last sample at-or-before it via the stts table, the
    TRUE sample bytes sliced out of mdat, and the feature vector
    derived from those sample bytes (the codec decode inside the
    sample is the documented stand-in — no H.264 codec here). Payloads
    that do not parse keep the legacy whole-blob stand-in, so synthetic
    ref-bytes corpora keep working."""
    out_schema = "media_id string, frame_idx int, ts_ms int, frame array<double>, ok boolean"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import mp4

        for pdf in batches:
            mids, idxs, tss, frames, oks = [], [], [], [], []
            for mid, kind, dur, payload in zip(
                pdf["media_id"], pdf["media_kind"], pdf["duration_ms"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                info = None
                try:
                    info = mp4.parse_mp4(payload)
                    dur = info["duration_ms"]
                except ValueError:
                    pass
                # NULL duration arrives as NaN (pandas int->float
                # coercion) which is TRUTHY — guard explicitly or
                # int(dur) raises and fails the task
                if pd.isna(dur) or not dur:
                    continue
                n = min(max_frames, max(1, int(dur) // every_ms))
                for i in range(n):
                    mids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    try:
                        if info is not None:
                            s = mp4.extract_sample(
                                payload, info, mp4.sample_at(info, i * every_ms))
                            frames.append(_fake_decode(s))
                        else:
                            frames.append(_fake_decode(
                                (payload or b"") + i.to_bytes(2, "big")))
                        oks.append(True)
                    except NotImplementedError:
                        frames.append(None)
                        oks.append(False)
            # a batch with no videos yields nothing: an empty DataFrame
            # defaults its list column to float64, which Arrow cannot
            # convert to array<double>
            if mids:
                yield pd.DataFrame(
                    {"media_id": mids, "frame_idx": idxs, "ts_ms": tss,
                     "frame": frames, "ok": oks}
                )

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(fn, schema=out_schema)


def resize_image_batch(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize: binary -> binary Pandas UDF keeping the media schema
    (payload replaced, width/height metadata updated) — the in-place
    transform shape of a PIL thumbnail kernel. ``image/bmp``,
    ``image/png`` and ``image/jpeg`` payloads get a REAL
    nearest-neighbor resample (decode -> index-math resize ->
    re-encode in the same container); undecodable payloads pass
    through unchanged. Unrecognized image mimes keep the md5 stand-in
    payload: deterministic, size-dependent."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from . import bmp, jpeg, png

        codecs = {
            "image/bmp": (bmp.decode_bmp, bmp.encode_bmp),
            "image/png": (png.decode_png, png.encode_png),
            "image/jpeg": (jpeg.decode_jpeg, jpeg.encode_jpeg),
        }

        def one(payload, kind, mime):
            if kind != "image":
                return payload, False
            if mime in codecs:
                dec, enc = codecs[mime]
                try:
                    px = bmp.resize_nearest(dec(payload), width, height)
                    return enc(px), True
                except ValueError:
                    return payload, False
            return hashlib.md5((payload or b"") + f"{width}x{height}".encode()).digest(), True

        for pdf in batches:
            out = pdf.copy()
            res = [one(p, k, m) for p, k, m in
                   zip(pdf["payload"], pdf["media_kind"], pdf["mime"])]
            out["payload"] = [p for p, _ in res]
            out["width"] = [width if ok else w
                            for (_, ok), w in zip(res, pdf["width"])]
            out["height"] = [height if ok else h
                             for (_, ok), h in zip(res, pdf["height"])]
            yield out

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def synth_bmp_payloads(media: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Upgrade image rows to REAL encoded rasters of the closed-form
    test pattern (bmp.synth_pattern, seed = (doc_int * 31 + offset * 7)
    % 256 derived from media_id 'd%08d#offset'). Even seeds encode as
    BMP, odd seeds as PNG (adaptive-filtered DEFLATE) — both real
    kernels run on every corpus, and because the DuckDB oracle computes
    features analytically from (seed, w, h) without ever seeing bytes,
    the SAME oracle proves BOTH encode -> decode round trips.
    Non-image rows pass through."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import bmp, png

        for pdf in batches:
            pays, mimes, ws, hs = [], [], [], []
            for mid, kind, pay, mime, w0, h0 in zip(
                pdf["media_id"], pdf["media_kind"], pdf["payload"],
                pdf["mime"], pdf["width"], pdf["height"],
            ):
                if kind == "image":
                    did, off = mid.split("#")
                    seed = (int(did[1:]) * 31 + int(off) * 7) % 256
                    px = bmp.synth_pattern(width, height, seed)
                    if seed % 2:
                        pays.append(png.encode_png(px))
                        mimes.append("image/png")
                    else:
                        pays.append(bmp.encode_bmp(px))
                        mimes.append("image/bmp")
                    ws.append(width)
                    hs.append(height)
                else:
                    pays.append(pay)
                    mimes.append(mime)
                    ws.append(w0)
                    hs.append(h0)
            out = pdf.copy()
            out["payload"] = pays
            out["mime"] = mimes
            out["width"] = ws
            out["height"] = hs
            yield out

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def synth_media_table(extracted: DataFrame) -> DataFrame:
    """Deterministic fake payload bytes for every media ref (test/bench
    stand-in for the fetch stage)."""
    refs = attach_media_refs(extracted)
    return refs.select(
        F.concat_ws("#", "doc_id", F.col("offset").cast("string")).alias("media_id"),
        "doc_id",
        "media_kind",
        # the fetch stand-in carries ref-string bytes, not real image
        # payloads — label them honestly so the real image codecs
        # (bmp/png/jpeg) are only dispatched on rows whose payloads a
        # synth_*_payloads upgrade (or a real fetch) made decodable
        F.when(F.col("media_kind") == "image", F.lit("application/octet-stream"))
        .otherwise(F.lit("video/mp4")).alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.when(F.col("media_kind") == "video", F.lit(5000)).otherwise(F.lit(0)).alias("duration_ms"),
        F.encode(F.col("media_ref"), "utf-8").alias("payload"),
    )


def synth_jpeg_payloads(media: DataFrame, width: int = 16,
                        height: int = 16, quality: int = 90) -> DataFrame:
    """Upgrade image rows to REAL baseline JPEG payloads of the
    closed-form test pattern (same seed derivation as
    synth_bmp_payloads; seed parity picks 4:4:4 vs 4:2:0). JPEG is
    lossy, so unlike the BMP/PNG synth this one is NOT analytic-oracle
    mirrored — it feeds the pytest-gated jpeg path (tests/test_jpeg.py).
    Non-image rows pass through."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import bmp, jpeg

        for pdf in batches:
            pays, mimes, ws, hs = [], [], [], []
            for mid, kind, mime, pay, w0, h0 in zip(
                pdf["media_id"], pdf["media_kind"], pdf["mime"],
                pdf["payload"], pdf["width"], pdf["height"]
            ):
                if kind == "image":
                    doc_int = int(mid.split("#")[0][1:])
                    offset = int(mid.split("#")[1])
                    seed = (doc_int * 31 + offset * 7) % 256
                    px = bmp.synth_pattern(width, height, seed)
                    pays.append(jpeg.encode_jpeg(px, quality=quality,
                                                 subsample=bool(seed % 2)))
                    mimes.append("image/jpeg")
                    ws.append(width)
                    hs.append(height)
                else:
                    pays.append(pay)
                    mimes.append(mime)
                    ws.append(w0)
                    hs.append(h0)
            out = pdf.copy()
            out["payload"] = pays
            out["mime"] = mimes
            out["width"] = ws
            out["height"] = hs
            yield out

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def synth_mp4_payloads(media: DataFrame, n_samples: int = 10,
                       sample_duration_ms: int = 500) -> DataFrame:
    """Upgrade video rows to REAL single-trak MP4 containers
    (operators/mp4.py) whose per-frame codec payloads are deterministic
    bytes derived from (media_id, frame index) — so a test can compute
    the expected sample bytes without parsing. duration_ms metadata is
    updated to the container's true mdhd duration. Non-video rows pass
    through."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import mp4

        for pdf in batches:
            pays, durs = [], []
            for mid, kind, pay, dur in zip(
                pdf["media_id"], pdf["media_kind"], pdf["payload"],
                pdf["duration_ms"]
            ):
                if kind == "video":
                    samples = [f"{mid}/frame{i}".encode() * (i + 1)
                               for i in range(n_samples)]
                    pays.append(mp4.encode_mp4(
                        samples, timescale=1000,
                        sample_duration=sample_duration_ms))
                    durs.append(n_samples * sample_duration_ms)
                else:
                    pays.append(pay)
                    durs.append(dur)
            out = pdf.copy()
            out["payload"] = pays
            out["duration_ms"] = durs
            yield out

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)
