"""Tests for escalation title fallback, salted aggregation, hash
embeddings, chunking, section join, fuzzy dates."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from tackle4losscontentextraction_spark.functions import dates as date_fn
from tackle4losscontentextraction_spark.functions import embeddings as emb_fn
from tackle4losscontentextraction_spark.functions import tokens as tok_fn
from tackle4losscontentextraction_spark.operators import extraction, skew
from tackle4losscontentextraction_spark.sources import synth

SCHEMA = (
    "doc_id string, url string, lang string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def test_title_escalation_fallback(spark):
    """No headline + content < 500 chars -> title from first text span
    (the deterministic analog of extractContent.py:394-399)."""
    body = "word " * 60  # ~300 chars, kept as article_body
    df = spark.createDataFrame(
        [Row(doc_id="x", url="https://a.com/x", lang="en",
             spans=[Row(kind="article_body", text=body, media_ref="", offset=0)])],
        schema=SCHEMA,
    )
    r = extraction.extract(df).collect()[0]
    assert r.title != ""
    assert r.title == body.strip()[:80]

    # with a headline present the fallback must NOT engage
    df2 = spark.createDataFrame(
        [Row(doc_id="y", url="https://a.com/y", lang="en",
             spans=[Row(kind="headline", text="Real Title", media_ref="", offset=0),
                    Row(kind="article_body", text=body, media_ref="", offset=1)])],
        schema=SCHEMA,
    )
    assert extraction.extract(df2).collect()[0].title == "Real Title"


def test_salted_count_equals_plain(spark):
    docs = synth.synth_docs(spark, 500, partitions=4)
    from tackle4losscontentextraction_spark.functions import urls as url_fn

    domains = docs.select(
        "doc_id", url_fn.url_domain(url_fn.normalize_url(F.col("url"))).alias("domain")
    )
    salted = {r.grp: r.n for r in skew.salted_count(domains, "domain").collect()}
    plain = {r.domain: r.c for r in domains.groupBy("domain").agg(F.count("*").alias("c")).collect()}
    assert salted == plain
    # the corpus really is skewed: espn.com holds ~30%
    assert plain["www.espn.com"] > 0.2 * 500


def test_hash_embed_properties(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zeta eta theta iota kappa")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.embedding for r in emb_fn.embed_documents(df, dim=32).collect()}
    assert len(out[1]) == 32
    assert out[1] == out[2]          # deterministic
    assert out[1] != out[3]
    norm = sum(x * x for x in out[1]) ** 0.5
    assert norm == pytest.approx(1.0)


def test_chunking(spark):
    df = spark.createDataFrame([(1, " ".join(f"w{i}" for i in range(95)),)], "id bigint, text string")
    chunks = df.select(tok_fn.chunk_text_by_tokens(F.col("text"), 40).alias("c")).collect()[0].c
    assert len(chunks) == 3
    assert len(chunks[0].split(" ")) == 40
    assert len(chunks[2].split(" ")) == 15
    assert " ".join(chunks).split(" ") == [f"w{i}" for i in range(95)]


def test_main_content_join(spark):
    docs = synth.synth_docs(spark, 50, partitions=2)
    out = extraction.extract(docs).select(
        "doc_id", extraction.main_content(F.col("extracted")).alias("mc"), "content_chars"
    )
    for r in out.collect():
        if r.content_chars > 0:
            assert len(r.mc) >= r.content_chars  # separators add length
            assert "\n\n" in r.mc or r.mc != ""


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Aug 26, 2025", "2025-08-26 00:00:00"),
        ("Aug 27, 2025, 06:30 AM ET", "2025-08-27 06:30:00"),
        ("Published on May 5, 2024 by staff", "2024-05-05 00:00:00"),
        ("not a date at all, nope", None),
        ("", None),
    ],
)
def test_fuzzy_date(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "s string")
    v = df.select(
        F.date_format(date_fn.fuzzy_parse_date_udf(F.col("s")), "yyyy-MM-dd HH:mm:ss").alias("v")
    ).collect()[0].v
    assert v == expected


def test_normalize_publication_date_fast_path_and_fallback(spark):
    df = spark.createDataFrame(
        [("Aug 26, 2025",), ("around Aug 27, 2025 somewhere",)], "s string"
    )
    out = [r.v for r in df.select(
        F.date_format(date_fn.normalize_publication_date(F.col("s")), "yyyy-MM-dd").alias("v")
    ).collect()]
    assert out == ["2025-08-26", "2025-08-27"]
