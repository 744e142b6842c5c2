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
