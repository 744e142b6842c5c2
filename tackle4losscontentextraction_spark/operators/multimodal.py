"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED (image/audio libs are not in
this container): ``decode_image_batch`` produces a deterministic fake
feature vector from the bytes so the Spark-side plumbing — schema,
batch shape, partitioning, UDF signature — is real and tested; swap the
kernel for PIL/ffmpeg on a real cluster.

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

    Real kernel would decode/resize/frame-sample here; the Arrow batch
    shape and output schema are what a swap-in implementation keeps."""
    out_schema = "media_id string, feature array<double>, ok boolean"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["media_kind"]):
                if kind not in ("image", "video"):
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
    a long video is the OOM). Frame payload decode is the deterministic
    stub (kernel swap point, see module docstring)."""
    out_schema = "media_id string, frame_idx int, ts_ms int, frame array<double>, ok boolean"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, tss, frames, oks = [], [], [], [], []
            for mid, kind, dur, payload in zip(
                pdf["media_id"], pdf["media_kind"], pdf["duration_ms"], pdf["payload"]
            ):
                # NULL duration arrives as NaN (pandas int->float
                # coercion) which is TRUTHY — guard explicitly or
                # int(dur) raises and fails the task
                if kind != "video" or pd.isna(dur) or not dur:
                    continue
                n = min(max_frames, max(1, int(dur) // every_ms))
                for i in range(n):
                    mids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    try:
                        frames.append(_fake_decode((payload or b"") + i.to_bytes(2, "big")))
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
    transform shape of a PIL thumbnail kernel. The stub payload is an
    md5 of (payload, target size): deterministic, size-dependent."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                hashlib.md5((p or b"") + f"{width}x{height}".encode()).digest()
                if k == "image" else p
                for p, k in zip(pdf["payload"], pdf["media_kind"])
            ]
            out["width"] = [width if k == "image" else w for w, k in zip(pdf["width"], pdf["media_kind"])]
            out["height"] = [height if k == "image" else h for h, k in zip(pdf["height"], pdf["media_kind"])]
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
        F.when(F.col("media_kind") == "image", F.lit("image/jpeg")).otherwise(F.lit("video/mp4")).alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.when(F.col("media_kind") == "video", F.lit(5000)).otherwise(F.lit(0)).alias("duration_ms"),
        F.encode(F.col("media_ref"), "utf-8").alias("payload"),
    )
