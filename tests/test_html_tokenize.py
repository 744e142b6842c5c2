"""Raw-HTML -> span tokenizer (operators/html_tokenize.py).

The driver oracle proves the render->parse round trip on the synthetic
corpus; these tests pin the parser's behavior on the hostile HTML the
corpus never produces (script injection, malformed nesting, truncated
pages) — the reference's entry surface deals in fetched web pages, so
robustness IS the contract (extractContent.py:208-217 wraps its parse
in a broad try/except for the same reason).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from tackle4losscontentextraction_spark.operators import html_tokenize as ht
from tackle4losscontentextraction_spark.sources import synth


def spans(html: str) -> list[tuple]:
    return [(d["kind"], d["text"], d["media_ref"], d["offset"])
            for d in ht.parse_html_to_spans(html)]


# ---------------------------------------------------------------------------
# pure-Python parser behavior (no Spark)
# ---------------------------------------------------------------------------

def test_basic_blocks_and_order():
    got = spans('<h1>Title</h1><p>Body text</p><footer>(c) site</footer>')
    assert got == [("headline", "Title", "", 0),
                   ("article_body", "Body text", "", 1),
                   ("footer", "(c) site", "", 2)]


def test_class_routing():
    got = spans('<div class="main">m</div><div class="share">s</div>'
                '<div class="banner other">t</div><p class="intro">i</p>')
    assert [s[0] for s in got] == ["main_content", "share", "text", "introduction"]


def test_entities_unescaped():
    got = spans("<p>a &amp; b &lt;tag&gt; &#65;</p>")
    assert got == [("article_body", "a & b <tag> A", "", 0)]


def test_script_style_never_leak():
    html = ('<head><title>x</title><script>var a="<p>fake</p>";</script></head>'
            '<p>real<script>inject()</script>body</p>'
            '<style>.x{}</style><noscript>no</noscript>')
    got = spans(html)
    assert got == [("article_body", "realbody", "", 0)]


def test_media_interleaved_inside_block():
    html = '<p>before <img src="u1"> after</p><img src="u2"><video src="v1">fallback</video>'
    got = spans(html)
    # image emitted at point of occurrence, enclosing text flushed at
    # its close; video fallback content suppressed
    assert got == [("image", "", "u1", 0),
                   ("article_body", "before  after", "", 1),
                   ("image", "", "u2", 2),
                   ("video", "", "v1", 3)]


def test_self_closing_media():
    assert spans('<img src="a"/><video src="b"/>') == [
        ("image", "", "a", 0), ("video", "", "b", 1)]


def test_nested_same_tag_and_anchor_text():
    got = spans('<div>a<div>b</div>c</div><p>x <a href="u">link</a> y</p>')
    assert got == [("text", "abc", "", 0), ("article_body", "x link y", "", 1)]


def test_unclosed_inner_tag_recovers():
    # browser-style: </div> closes the block even though <p> never closed
    assert spans("<div><p>x</div><h1>t</h1>") == [
        ("text", "x", "", 0), ("headline", "t", "", 1)]


def test_unclosed_block_flushes_at_eof():
    assert spans("<p>dangling tail") == [("article_body", "dangling tail", "", 0)]


def test_stray_end_tags_and_comments_ignored():
    assert spans("</p></div><!-- <p>ghost</p> --><p>ok</p>") == [
        ("article_body", "ok", "", 0)]


def test_inter_element_junk_ignored():
    assert spans("\n  stray text \n<h1>t</h1>\n trailing") == [("headline", "t", "", 0)]


def test_empty_element_still_emits_span():
    assert spans("<p></p>") == [("article_body", "", "", 0)]


def test_img_without_src_and_empty_input():
    assert spans("<img>") == [("image", "", "", 0)]
    assert spans("") == []
    assert spans(None) == []


def test_menu_list_items_accumulate():
    assert spans('<ul class="menu"><li>Home</li><li>News</li></ul>') == [
        ("menu", "HomeNews", "", 0)]


def test_truncated_page_mid_tag():
    # parser must not raise; complete blocks before the cut survive
    got = spans('<h1>t</h1><p>body</p><div class="ma')
    assert got[:2] == [("headline", "t", "", 0), ("article_body", "body", "", 1)]


# ---------------------------------------------------------------------------
# Spark round trip (the oracle proves this at sf0.01 too; here at tiny
# scale so the suite stays fast)
# ---------------------------------------------------------------------------

def test_render_tokenize_round_trip(spark):
    docs = synth.synth_docs(spark, 120).select("doc_id", "spans")
    parsed = ht.tokenize_html(ht.render_html(docs))
    a = docs.select("doc_id", F.explode("spans").alias("s")).select("doc_id", "s.*")
    b = parsed.select("doc_id", F.explode("spans").alias("s")).select("doc_id", "s.*")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_rendered_html_is_parseable_chrome(spark):
    row = ht.render_html(synth.synth_docs(spark, 3).select("doc_id", "spans")).first()
    assert row.html.startswith("<!DOCTYPE html>")
    assert "<script>" in row.html and "</body></html>" in row.html


def test_extract_composes_on_tokenized_html(spark):
    """The full pipeline runs end-to-end from raw HTML: tokenize ->
    extract, matching extraction over the original span table."""
    from tackle4losscontentextraction_spark.operators import extraction

    docs = synth.synth_docs(spark, 80)
    via_html = ht.tokenize_html(ht.render_html(docs)).join(
        docs.select("doc_id", "url", "lang"), "doc_id")
    a = extraction.extract(docs).select("doc_id", "content_type", "content_chars")
    b = extraction.extract(via_html).select("doc_id", "content_type", "content_chars")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_round_trip_hostile_media_refs(spark):
    """ADVICE r4 #3: refs containing '&', '"', '<', '>' — and the
    double-escape trap '&amp;' — must survive render -> tokenize
    (attribute values are entity-escaped on render; HTMLParser
    unescapes them symmetrically on parse)."""
    refs = ['u?a=1&b=2', 'u"quoted"', 'u<tag>', 'pre&amp;post', 'plain']
    rows = [(f"d{i}", [{"kind": "image", "text": "", "media_ref": r,
                        "offset": 0}]) for i, r in enumerate(refs)]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    parsed = ht.tokenize_html(ht.render_html(docs))
    got = {r.doc_id: r.spans[0].media_ref for r in parsed.collect()}
    assert got == {f"d{i}": r for i, r in enumerate(refs)}
