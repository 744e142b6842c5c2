"""Hostile-input regression tests for the extraction operator: NULL
spans arrays, NULL span texts, malformed URLs, unicode. Found via
runtime probing — NULLs must not propagate into metrics/classification."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from tackle4losscontentextraction_spark.operators import extraction

SCHEMA = (
    "doc_id string, url string, lang string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


@pytest.fixture(scope="module")
def hostile(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id="empty", url="https://x.com/a", lang="en", spans=[]),
            Row(doc_id="nullspans", url="https://x.com/a", lang="en", spans=None),
            Row(
                doc_id="nulltext", url="https://x.com/a", lang="en",
                spans=[
                    Row(kind="article_body", text=None, media_ref="", offset=0),
                    Row(kind="headline", text="ok title", media_ref="", offset=1),
                ],
            ),
            Row(
                doc_id="badurl", url="not a url at all %%%", lang="en",
                spans=[Row(kind="main_content", text="x " * 150, media_ref="", offset=0)],
            ),
            Row(
                doc_id="unicode", url="https://x.com/%E2%9C%93", lang="en",
                spans=[Row(kind="headline", text="émoji ✓ é [l](u)", media_ref="", offset=0)],
            ),
        ],
        schema=SCHEMA,
    )
    return {r.doc_id: r for r in extraction.extract(df).collect()}


def test_no_null_metrics(hostile):
    for doc_id, r in hostile.items():
        assert r.error is not None, doc_id
        assert r.spans_in is not None, doc_id
        assert r.spans_kept is not None, doc_id
        assert r.content_type is not None, doc_id


def test_null_spans_is_empty_content(hostile):
    r = hostile["nullspans"]
    assert r.spans_in == 0 and r.spans_kept == 0
    assert r.content_type == "empty_content"
    assert r.error is False


def test_null_text_span_dropped_not_poisoning(hostile):
    r = hostile["nulltext"]
    assert r.title == "ok title"
    assert r.spans_kept == 1


def test_bad_url_normalized_like_reference(hostile):
    assert hostile["badurl"].url_norm.startswith("https://www.not a url")


def test_unicode_roundtrip(hostile):
    r = hostile["unicode"]
    assert r.title == "émoji ✓ é l"
    assert r.url_norm == "https://x.com/✓"
