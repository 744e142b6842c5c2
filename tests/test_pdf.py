"""PDF render/parse kernel: byte-level round trip, hostile inputs,
and the full layout path over real binary documents."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from tackle4losscontentextraction_spark.operators import layout, pdf

BOXES = [
    (0, 0, 20.0, 40.0, 260.0, 200.0, "hello (world) \\ test"),
    (1, 0, 320.0, 40.0, 260.0, 200.0, "col two"),
    (2, 1, 20.0, 40.0, 260.0, 200.0, "page 2"),
    (3, 1, 24.0, 290.0, 260.0, 200.0, ""),
]


def test_pdf_round_trip_pure_python():
    blob = pdf.render_pdf_bytes(BOXES)
    assert blob.startswith(b"%PDF-1.4")
    assert b"/FlateDecode" in blob and b"/Type /Page" in blob
    assert pdf.parse_pdf_bytes(blob) == BOXES


def test_pdf_render_is_deterministic():
    assert pdf.render_pdf_bytes(BOXES) == pdf.render_pdf_bytes(BOXES)


def test_pdf_xref_offsets_are_real_byte_positions():
    blob = pdf.render_pdf_bytes(BOXES)
    xref_at = int(blob.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert blob[xref_at:xref_at + 4] == b"xref"
    # first object's recorded offset must point at "1 0 obj"
    first = blob[xref_at:].split(b"\n")[3]
    off = int(first.split(b" ")[0])
    assert blob[off:off + 7] == b"1 0 obj"


@pytest.mark.parametrize("mutate", [
    lambda b: b"",                                  # empty
    lambda b: b"not a pdf at all",                  # wrong magic
    lambda b: b[:150],                              # truncated mid-object
    lambda b: b.replace(b"/FlateDecode", b"/LZWDecode", 1),  # unknown filter
    lambda b: b.replace(b"stream\n", b"stream\nXX", 1),      # corrupt deflate
])
def test_pdf_hostile_inputs_rejected(mutate):
    blob = pdf.render_pdf_bytes(BOXES)
    with pytest.raises((ValueError, zlib.error)):
        pdf.parse_pdf_bytes(mutate(blob))


def test_pdf_spark_round_trip_feeds_linearize(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn("n_chars", F.length("text")).limit(60)
    )
    boxes = layout.synth_layout_boxes(docs).cache()
    parsed = pdf.parse_pdf(pdf.render_pdf(boxes))
    assert sorted(map(tuple, boxes.collect())) == sorted(map(tuple, parsed.collect()))
    l_direct = {r.doc_id: r.linearized for r in layout.linearize_layout(boxes).collect()}
    l_binary = {r.doc_id: r.linearized for r in layout.linearize_layout(parsed).collect()}
    assert l_direct == l_binary


def test_pdf_parse_isolates_bad_docs(spark):
    good = pdf.render_pdf_bytes(BOXES)
    rows = [(1, bytearray(good)), (2, bytearray(b"junk")), (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, pdf binary")
    out = pdf.parse_pdf(df)
    assert {r.doc_id for r in out.collect()} == {1}
