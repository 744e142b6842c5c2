"""Property-based testing (hypothesis): random span tables through the
Spark extraction operator must equal the pure-Python oracle — for ANY
input shape, not just the synthetic corpus' archetypes."""

from __future__ import annotations

import pyoracle
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tackle4losscontentextraction_spark import spec
from tackle4losscontentextraction_spark.operators import extraction

ALL_KINDS = (
    spec.CONTENT_KINDS + spec.BOILERPLATE_KINDS + spec.MEDIA_KINDS
    + spec.AMBIGUOUS_KINDS + ["unknown_kind"]
)

# text fragments that exercise every clean_text branch + thresholds
FRAGMENTS = [
    "plain words here",
    "![img](https://cdn.x/a.png)",
    "[anchor](https://x.com/l)",
    "<b>bold</b><i>it</i>",
    'esc \\\\ and \\" quotes',
    "   lots\t\nof   space  ",
    "word " * 60,                     # pushes 'text' kind over wc>=50
    "[a](u)[b](u)[c](u)",             # high link density
    "Extraction error: boom",
    "",
    "Aug 26, 2025",
]

span_st = st.fixed_dictionaries({
    "kind": st.sampled_from(ALL_KINDS),
    "text": st.lists(st.sampled_from(FRAGMENTS), min_size=0, max_size=3).map(" ".join),
    "media_ref": st.sampled_from(["", "https://cdn.example.com/m.jpg"]),
})

doc_st = st.lists(span_st, min_size=0, max_size=12)

SCHEMA = (
    "doc_id string, url string, lang string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(doc_st, min_size=1, max_size=8),
       lang=st.sampled_from(["en", "de"]),
       url=st.sampled_from([
           "https://www.espn.com/nfl/story/1",
           "https://x.com/nfl-news-round-up/2",
           "https%3A//site0.example.com/a",
       ]))
def test_extraction_matches_pyoracle(spark, docs, lang, url):
    rows = []
    expected = {}
    for i, spans in enumerate(docs):
        doc_id = f"p{i:04d}"
        sp = [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": j}
            for j, s in enumerate(spans)
        ]
        rows.append((doc_id, url, lang, [tuple(x.values()) for x in sp]))
        expected[doc_id] = pyoracle.extract_doc(
            {"doc_id": doc_id, "url": url, "lang": lang, "spans": sp}
        )
    df = spark.createDataFrame(rows, schema=SCHEMA)
    got = {r.doc_id: r for r in
           extraction.extract(df, date_formats=["MMM d, yyyy"]).collect()}
    for doc_id, exp in expected.items():
        g = got[doc_id]
        g_seq = [(s.kind, s.text, s.media_ref, s.offset) for s in g.extracted]
        e_seq = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["extracted"]]
        assert g_seq == e_seq, doc_id
        assert g.title == exp["title"], doc_id
        assert g.content_type == exp["content_type"], doc_id
        assert g.type_confidence == pytest.approx(exp["type_confidence"]), doc_id
        assert g.error == exp["error"], doc_id
