"""Golden end-to-end test: the Spark synth+extraction pipeline must match
the independent pure-Python oracle doc-for-doc — span-sequence equality
on (kind, text, media_ref, order) plus all metadata columns (the
BASELINE.json per-row invariant)."""

from __future__ import annotations

import duckdb
import pytest

from tackle4losscontentextraction_spark.operators import extraction
from tackle4losscontentextraction_spark.sources import synth

import pyoracle

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    docs = synth.docs_from_documents(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    out = extraction.extract(docs).collect()
    rows = duckdb.sql(
        f"select doc_id, text, lang, n_chars from '{SF_DIR}/documents.parquet' order by doc_id"
    ).fetchall()
    expected = {
        pyoracle.synth_doc(r[0], r[1], r[2], r[3])["doc_id"]: pyoracle.extract_doc(
            pyoracle.synth_doc(r[0], r[1], r[2], r[3])
        )
        for r in rows
    }
    return {r.doc_id: r for r in out}, expected


def test_all_docs_covered(results):
    got, expected = results
    assert set(got) == set(expected)
    assert len(got) == 500


def test_span_sequence_equality(results):
    got, expected = results
    for doc_id, exp in expected.items():
        g = got[doc_id]
        g_seq = [(s.kind, s.text, s.media_ref, s.offset) for s in g.extracted]
        e_seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["extracted"]]
        assert g_seq == e_seq, f"span mismatch for {doc_id}"


def test_metadata_equality(results):
    got, expected = results
    for doc_id, exp in expected.items():
        g = got[doc_id]
        assert g.title == exp["title"], doc_id
        assert g.author == exp["author"], doc_id
        assert g.publication_date == exp["publication_date"], doc_id
        if exp["cleaned_date"] is None:
            assert g.cleaned_date is None, doc_id
        else:
            assert g.cleaned_date == exp["cleaned_date"], doc_id
        assert g.content_type == exp["content_type"], doc_id
        assert g.type_confidence == pytest.approx(exp["type_confidence"]), doc_id
        assert g.error == exp["error"], doc_id
        assert g.spans_in == exp["spans_in"], doc_id
        assert g.spans_kept == exp["spans_kept"], doc_id
        assert g.content_chars == exp["content_chars"], doc_id


def test_media_preserved(results):
    """Media-rich docs keep image/video spans with refs, empty text."""
    got, _ = results
    n_media = 0
    for g in got.values():
        for s in g.extracted:
            if s.kind in ("image", "video"):
                n_media += 1
                assert s.media_ref.startswith("https://")
                assert s.text == ""
    assert n_media > 50  # archetype A5 + inline images must actually occur


def test_error_docs_flagged(results):
    got, _ = results
    flagged = [g for g in got.values() if g.error]
    assert len(flagged) > 0
    for g in flagged:
        assert all(not s.text.startswith("Extraction error") for s in g.extracted)


def test_offsets_reindexed(results):
    got, _ = results
    for g in got.values():
        assert [s.offset for s in g.extracted] == list(range(len(g.extracted)))


def test_content_type_distribution(results):
    """All rule branches must actually fire on the 500-doc corpus."""
    got, _ = results
    seen = {g.content_type for g in got.values()}
    assert {"news_article", "empty_content", "wrong_content",
            "news-round-up", "topic_collection"} <= seen
