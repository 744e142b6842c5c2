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
