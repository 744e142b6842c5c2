"""Deterministic synthetic span-corpus builder (Spark-native).

Builds the ``docs`` input table of the BASELINE.json ``input_hint`` shape

    doc_id: string, spans: array<struct<kind,text,media_ref,offset:int>>
    (+ auxiliary url/lang columns for classification & skew tests)

from either the driver-provided ``documents`` parquet (sf dirs) or a
``spark.range`` of any size (bench corpora, 1e5+ docs). All randomness
is integer arithmetic on (doc_id, n_chars) — see ``spec.py`` — so the
pure-Python oracle and the DuckDB oracle SQL generate bit-identical
corpora. No RNG, no wall clock, no Python in the data path: the whole
builder is one per-row projection (zero shuffle, codegen end-to-end),
so corpus synthesis itself scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import spec

# ---------------------------------------------------------------------------
# word-soup text generator (for spark.range-based bench corpora)
# ---------------------------------------------------------------------------

WORDS = [
    "the", "a", "table", "row", "value", "scan", "join", "group", "order",
    "window", "part", "line", "batch", "stream", "merge", "sort", "hash",
    "filter", "agg", "query", "data", "column", "key", "fast", "slow",
    "big", "small", "spark", "vector", "customer",
]


def _soup_text(idcol: Column) -> Column:
    n_words = (F.pmod(idcol * 7 + 3, F.lit(80)) + 24).cast("int")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda j: F.element_at(
                F.array(*[F.lit(w) for w in WORDS]),
                F.pmod(idcol * 31 + j * 7 + 11, F.lit(len(WORDS))).cast("int") + 1,
            ),
        ),
        " ",
    )


def synth_documents(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """documents(doc_id bigint, text, lang, source, n_chars) of any size."""
    langs = F.array(*[F.lit(x) for x in ["en", "en", "en", "en", "en", "es", "de", "zh"]])
    rng = spark.range(0, n_docs, 1, partitions or max(32, n_docs // 50_000))
    return (
        rng.withColumnRenamed("id", "doc_id")
        .withColumn("text", _soup_text(F.col("doc_id")))
        .withColumn("lang", F.element_at(langs, F.pmod(F.col("doc_id"), F.lit(8)).cast("int") + 1))
        .withColumn("source", F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(10))))
        .withColumn("n_chars", F.length("text"))
    )


# ---------------------------------------------------------------------------
# documents -> docs (span table)
# ---------------------------------------------------------------------------

def _kind_expr(arch: Column, i: Column) -> Column:
    """ARCHETYPES[arch][i % len] via nested array literals."""
    tmpls = F.array(*[
        F.array(*[F.lit(k) for k in tmpl]) for tmpl in spec.ARCHETYPES
    ])
    tmpl = F.element_at(tmpls, (arch + 1).cast("int"))
    return F.element_at(tmpl, F.pmod(i, F.size(tmpl)).cast("int") + 1)


def _span_struct(doc_id: Column, did: Column, text: Column, n_chars: Column, i: Column) -> Column:
    """One synthesized span (kind,text,media_ref,offset) for index i."""
    is_error = spec_is_error(n_chars)
    arch = F.pmod(n_chars, F.lit(7))
    kind = _kind_expr(arch, i)

    start = (F.pmod(i * 37, F.greatest(n_chars - 80, F.lit(1))) + 1).cast("int")
    ln = (
        F.when(kind.isin("headline", "author"), F.lit(spec.LEN_SHORT))
        .when(
            kind == "text",
            F.when(F.pmod(i, F.lit(2)) == 0, F.lit(spec.LEN_TEXT_SHORT)).otherwise(
                F.lit(spec.LEN_TEXT_LONG)
            ),
        )
        .otherwise(F.lit(spec.LEN_BODY) + F.pmod(i, F.lit(3)).cast("int") * 40)
    ).cast("int")
    base = text.substr(start, ln)

    # decorations exercising the clean_text chain
    with_link = F.when(
        F.pmod(i, F.lit(spec.DECOR_LINK_MOD)) == 0,
        F.concat(base, F.lit(" [read more](https://www.example.com/more/"), i.cast("string"), F.lit(")")),
    ).otherwise(base)
    with_img = F.when(
        F.pmod(i, F.lit(spec.DECOR_IMG_MOD)) == 1,
        F.concat(
            F.lit("![pic](https://img.example.com/p/"), did, F.lit("_"),
            i.cast("string"), F.lit(".png) "), with_link,
        ),
    ).otherwise(with_link)
    decorated = F.when(
        F.pmod(i, F.lit(spec.DECOR_HTML_MOD)) == 2,
        F.concat(with_img, F.lit(" <b>Key stat "), i.cast("string"), F.lit("</b>")),
    ).otherwise(with_img)

    date_text = F.date_format(
        F.date_add(F.lit(spec.DATE_BASE).cast("date"), F.pmod(n_chars + i, F.lit(365)).cast("int")),
        "MMM d, yyyy",
    )

    media_ref = (
        F.when(kind == "image",
               F.concat(F.lit("https://cdn.example.com/img/"), did, F.lit("/"), i.cast("string"), F.lit(".jpg")))
        .when(kind == "video",
              F.concat(F.lit("https://cdn.example.com/vid/"), did, F.lit("/"), i.cast("string"), F.lit(".mp4")))
        .otherwise(F.lit(""))
    )
    span_text = (
        F.when(kind.isin("image", "video"), F.lit(""))
        .when(kind == "time", date_text)
        .otherwise(decorated)
    )

    return F.when(
        is_error,
        F.struct(
            F.lit("text").alias("kind"),
            F.lit(spec.ERROR_SPAN_TEXT).alias("text"),
            F.lit("").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    ).otherwise(
        F.struct(
            kind.alias("kind"),
            span_text.alias("text"),
            media_ref.alias("media_ref"),
            i.cast("int").alias("offset"),
        )
    )


def spec_is_error(n_chars: Column) -> Column:
    return F.pmod(n_chars, F.lit(spec.ERROR_DOC_MOD)) == 0


def _url_expr(doc_id: Column, n_chars: Column) -> Column:
    domain = F.when(
        F.pmod(doc_id, F.lit(spec.ESPN_DOC_MOD)) < 3, F.lit("www.espn.com")
    ).otherwise(
        F.concat(F.lit("site"), F.pmod(doc_id, F.lit(spec.N_COLD_DOMAINS)).cast("string"), F.lit(".example.com"))
    )
    path = F.when(
        F.pmod(n_chars, F.lit(spec.ROUNDUP_URL_MOD)) == 0,
        F.concat(F.lit("nfl-news-round-up/"), doc_id.cast("string")),
    ).otherwise(F.concat(F.lit("nfl/story/id/"), doc_id.cast("string")))
    url = F.concat(F.lit("https://"), domain, F.lit("/"), path)
    return F.when(
        F.pmod(doc_id, F.lit(spec.ENCODED_URL_MOD)) == 0,
        F.replace(url, F.lit("https://"), F.lit("https%3A//")),
    ).otherwise(url)


# Column-expression memo: the span-synthesis tree is a large immutable
# expression (hundreds of nodes, each an F.* py4j round trip to build).
# Re-building it on every query invocation cost ~0.3 s of pure driver-
# side construction per call (measured); the tree itself depends only
# on input column NAMES, so one instance can be reused by every
# DataFrame in the process. This memoizes the Column OBJECT — a query
# plan fragment — never data or results: every invocation still plans,
# optimizes and executes from the parquet inputs.
_COLS_MEMO: dict[str, list] = {}


def _docs_projection() -> list[Column]:
    cols = _COLS_MEMO.get("docs_cols")
    if cols is not None:
        return cols
    idn, nc, did = F.col("_idn"), F.col("_nc"), F.col("_did")
    tmpl_lens = F.array(*[F.lit(len(t)) for t in spec.ARCHETYPES])
    arch = F.pmod(nc, F.lit(7))
    tmpl_len = F.element_at(tmpl_lens, arch.cast("int") + 1)
    n_spans = F.when(spec_is_error(nc), F.lit(1)).otherwise(
        tmpl_len + F.pmod(nc, F.lit(7)).cast("int")
    )
    spans = F.transform(
        F.sequence(F.lit(0).cast("bigint"), (n_spans - 1).cast("bigint")),
        lambda i: _span_struct(idn, did, F.col("_text"), nc, i),
    )
    cols = [
        did.alias("doc_id"),
        _url_expr(idn, nc).alias("url"),
        F.col("lang"),
        spans.alias("spans"),
    ]
    _COLS_MEMO["docs_cols"] = cols
    return cols


def docs_from_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id,text,lang,source,n_chars) -> docs span table.

    Output: doc_id string, url string, lang string,
            spans array<struct<kind,text,media_ref,offset:int>>.
    Pure projection — no shuffle.
    """
    # Two projections with unambiguous intermediate names: reusing the
    # name 'doc_id' for the formatted string inside one select would let
    # lateral-column-alias resolution rebind inner references to the
    # aliased output (observed under Spark 4 ANSI). Catalyst collapses
    # the projections afterwards, so this costs nothing at runtime.
    base = documents.select(
        F.col("doc_id").cast("bigint").alias("_idn"),
        F.col("n_chars").cast("bigint").alias("_nc"),
        F.format_string("d%08d", F.col("doc_id").cast("bigint")).alias("_did"),
        F.col("text").alias("_text"),
        F.col("lang").alias("lang"),
    )
    return base.select(*_docs_projection())


def synth_docs(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """End-to-end: spark.range -> documents -> docs span table."""
    return docs_from_documents(synth_documents(spark, n_docs, partitions))
