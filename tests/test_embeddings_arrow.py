"""The Arrow embed twin must be BIT-identical to the Catalyst
hash_embed fold — the pipeline swaps implementations freely, so any
drift would make a resumed run disagree with a fresh one."""

from __future__ import annotations

import pyspark.sql.functions as F

from tackle4losscontentextraction_spark.functions import embeddings as emb_fn


def _pairs(df):
    return {r.doc_id: r.embedding for r in df.collect()}


def test_embed_arrow_equals_catalyst_on_corpus(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )
    for dim in (16, 64):
        a = _pairs(emb_fn.embed_documents(docs, dim=dim).select("doc_id", "embedding"))
        b = _pairs(emb_fn.embed_select_arrow(docs, "doc_id", "text", dim=dim))
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == b[k], f"doc {k} dim {dim}: {a[k]} != {b[k]}"


def test_embed_arrow_equals_catalyst_hostile(spark):
    rows = [
        ("t1", ""),                      # empty -> [""] token
        ("t2", "   "),                   # spaces only (Spark trim strips ' ')
        ("t3", "\ta  b\n\nc\r"),         # ASCII control whitespace
        ("t4", "word " * 200),           # heavy repetition (memo path)
        ("t5", "MiXeD CaSe TOKENS"),
        ("t6", None),                    # NULL text -> NULL embedding
        ("t7", "a\x0bb\x0cc"),           # \v \f are Java \s members
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    a = _pairs(emb_fn.embed_documents(docs).select("doc_id", "embedding"))
    b = _pairs(emb_fn.embed_select_arrow(docs, "doc_id", "text"))
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], f"doc {k}: {a[k]} != {b[k]}"
