"""The Arrow (mapInPandas) extraction path must equal the Catalyst
higher-order-function path row-for-row on the full sf0.001 corpus."""

from __future__ import annotations

import pytest

from tackle4losscontentextraction_spark.operators import extraction, extraction_arrow
from tackle4losscontentextraction_spark.sources import synth


@pytest.fixture(scope="module")
def both(spark):
    docs = synth.docs_from_documents(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    a = {r.doc_id: r for r in extraction.extract(docs, date_formats=["MMM d, yyyy"]).collect()}
    b = {r.doc_id: r for r in extraction_arrow.extract_arrow(docs, date_formats=["MMM d, yyyy"]).collect()}
    return a, b


def test_same_docs(both):
    a, b = both
    assert set(a) == set(b) and len(a) == 500


def test_identical_rows(both):
    a, b = both
    fields = [
        "url_norm", "lang", "spans_in", "error", "title", "author",
        "publication_date", "cleaned_date", "content_chars", "headline_cnt",
        "team_cnt", "news_cnt", "spans_kept", "content_type", "type_confidence",
    ]
    for doc_id, ra in a.items():
        rb = b[doc_id]
        for f in fields:
            assert getattr(ra, f) == getattr(rb, f), f"{doc_id}.{f}"
        assert [tuple(s) for s in ra.extracted] == [tuple(s) for s in rb.extracted], doc_id


HOSTILE_SCHEMA = (
    "doc_id string, url string, lang string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _hostile_docs(spark):
    span = ("text", "Quarterback throws for three hundred yards in the big game again today", "", 0)
    rows = [
        # '+' in URL: unquote preserves it, URLDecoder would eat it
        ("u1", "https://www.espn.com/nfl/a+b%20c", "en", [span]),
        # malformed escape: whole string must stay undecoded
        ("u2", "https://site0.example.com/x%zz%20y", "en", [span]),
        # trailing bare '%'
        ("u3", "https://site1.example.com/y%", "en", [span]),
        # invalid UTF-8 escape -> U+FFFD on both paths
        ("u4", "https://site2.example.com/z%e9", "en", [span]),
        # NULL lang: must NOT classify as wrong_content on either path
        ("u5", "https://site3.example.com/nfl/story/id/5", None, [span]),
    ]
    return spark.createDataFrame(rows, HOSTILE_SCHEMA)


def test_twin_parity_hostile_urls_and_null_lang(spark):
    docs = _hostile_docs(spark)
    a = {r.doc_id: r for r in extraction.extract(docs, date_formats=["MMM d, yyyy"]).collect()}
    b = {r.doc_id: r for r in extraction_arrow.extract_arrow(docs, date_formats=["MMM d, yyyy"]).collect()}
    for doc_id in a:
        ra, rb = a[doc_id], b[doc_id]
        assert ra.url_norm == rb.url_norm, f"{doc_id}: {ra.url_norm!r} != {rb.url_norm!r}"
        assert ra.content_type == rb.content_type, doc_id
        assert ra.type_confidence == rb.type_confidence, doc_id
    # pinned expectations, not just twin agreement:
    assert a["u1"].url_norm == "https://www.espn.com/nfl/a+b c"
    # urllib.parse.unquote semantics (ADVICE r2): the invalid %zz stays
    # literal but the VALID %20 elsewhere still decodes
    assert a["u2"].url_norm == "https://site0.example.com/x%zz y"
    assert a["u3"].url_norm == "https://site1.example.com/y%"
    assert a["u4"].url_norm == "https://site2.example.com/z�"
    assert a["u5"].content_type != "wrong_content"
