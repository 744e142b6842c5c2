"""The core operator: main-content span extraction.

Input  : docs(doc_id string, url string, lang string,
              spans array<struct<kind,text,media_ref,offset:int>>)
Output : one row per doc with
         extracted array<struct<kind,text,media_ref,offset:int>>  (ordered,
             boilerplate stripped, text cleaned, media refs preserved,
             offsets re-indexed 0..n-1),
         title, author, publication_date (strings, '' when absent),
         cleaned_date (timestamp, NULL on parse failure),
         content_type, type_confidence, error (bool),
         spans_in/spans_kept/content_chars (per-doc metrics).

Semantics rebuilt from the reference (no code ported):
 - keep/drop        : LLM strategy config -> deterministic rules
                      (extractContent.py:271-279): boilerplate-kind
                      blacklist, content-kind whitelist, ambiguous 'text'
                      kept iff word_count >= 50 and link_density < 0.5.
 - clean_text       : extractContent.py:101-109 (exact chain).
 - media preserved  : standalone image/video spans kept with media_ref;
                      inline markdown images are stripped from text
                      (ref :104) but their URL is re-emitted as a
                      dedicated image span right after the source span
                      (north rule: media-reference preservation).
 - metadata         : title/author/date = first kept headline/author/time
                      span (the deterministic analog of the LLM field
                      extraction, extractContent.py:325-414).
 - error rows       : 'Extraction error:'/'Failed to extract' prefixed
                      text marks the doc failed (article_processor.py:53);
                      such spans are dropped, the doc is flagged.
 - classification   : rule chain analog of analyze_content_type
                      (cleanContent.py:260-372 + URL regex :307-310 and
                      <200-char shortcut extractContent.py:376-377) with
                      constant confidences, clamped/floored per
                      extractContent.py:426-433,453-454.

SCALE: this operator is a single per-row projection built from
higher-order array functions. It performs ZERO shuffles, keeps every
expression inside whole-stage codegen, and needs no Python worker. On a
1000-executor cluster it is embarrassingly parallel and bounded purely
by scan + CPU; skew in spans-per-doc is amortized by Parquet row-group
splitting (maxPartitionBytes), not by keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import spec
from ..functions import confidence as conf_fn
from ..functions import dates as date_fn
from ..functions import text as text_fn
from ..functions import urls as url_fn

_MEDIA = spec.MEDIA_KINDS
_BOILER = spec.BOILERPLATE_KINDS
_CONTENT = spec.CONTENT_KINDS


def _enrich(span: Column) -> Column:
    """Per-span derived fields: cleaned text, inline image URL, flags."""
    cleaned = text_fn.clean_text(span["text"])
    is_err = text_fn.is_error_text(span["text"])
    keep = (
        F.when(span["kind"].isin(*_MEDIA), F.lit("media"))
        .when(is_err, F.lit("drop"))
        .when(span["kind"].isin(*_BOILER), F.lit("drop"))
        .when(span["kind"].isin(*_CONTENT),
              F.when(F.length(cleaned) > 0, F.lit("keep")).otherwise(F.lit("drop")))
        .when(
            span["kind"] == "text",
            F.when(
                (text_fn.word_count(cleaned) >= spec.WORD_COUNT_THRESHOLD)
                & (text_fn.link_density(span["text"]) < spec.LINK_DENSITY_MAX),
                F.lit("keep"),
            ).otherwise(F.lit("drop")),
        )
        .otherwise(F.lit("drop"))
    )
    return F.struct(
        span["kind"].alias("kind"),
        cleaned.alias("text"),
        span["media_ref"].alias("media_ref"),
        span["offset"].alias("offset"),
        text_fn.inline_image_url(span["text"]).alias("inline_img"),
        is_err.alias("is_err"),
        keep.alias("keep"),
    )


def _first_kind_text(kept: Column, kind: str) -> Column:
    """Cleaned text of the first kept span of a kind ('' if none)."""
    matches = F.filter(kept, lambda s: s["kind"] == kind)
    # F.get (0-based) returns NULL when empty — safe under ANSI mode,
    # where element_at would throw INVALID_ARRAY_INDEX.
    return F.coalesce(F.get(matches, 0)["text"], F.lit(""))


def _count_kind(kept: Column, kind: str) -> Column:
    return F.size(F.filter(kept, lambda s: s["kind"] == kind))


# Column-expression memo (same device as sources/synth._COLS_MEMO): the
# enrich/keep/expand tree is hundreds of expression nodes, each an F.*
# py4j round trip; rebuilding it per invocation cost ~0.4 s of driver
# time (measured). The memo holds immutable Column OBJECTS keyed by the
# date-format list — plan fragments bound by column name, never data.
_COLS_MEMO: dict = {}


def _core_columns() -> dict:
    cols = _COLS_MEMO.get("core")
    if cols is not None:
        return cols
    spans_schema = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    norm_spans = F.transform(
        F.coalesce(F.col("spans"), F.array().cast(spans_schema)),
        lambda s: F.struct(
            F.coalesce(s["kind"], F.lit("")).alias("kind"),
            F.coalesce(s["text"], F.lit("")).alias("text"),
            F.coalesce(s["media_ref"], F.lit("")).alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    enriched = F.transform(F.col("spans"), _enrich)
    kept = F.filter(enriched, lambda s: s["keep"] != "drop")

    # media expansion: inline markdown-image URLs become dedicated image
    # spans immediately after their source span (cardinality-changing,
    # still per-row: transform -> array-of-arrays -> flatten).
    expanded = F.flatten(
        F.transform(
            kept,
            lambda s: F.when(
                s["keep"] == "media",
                F.array(F.struct(
                    s["kind"].alias("kind"), F.lit("").alias("text"),
                    s["media_ref"].alias("media_ref"))),
            )
            .when(
                s["inline_img"] != "",
                F.array(
                    F.struct(s["kind"].alias("kind"), s["text"].alias("text"),
                             F.lit("").alias("media_ref")),
                    F.struct(F.lit("image").alias("kind"), F.lit("").alias("text"),
                             s["inline_img"].alias("media_ref")),
                ),
            )
            .otherwise(
                F.array(F.struct(s["kind"].alias("kind"), s["text"].alias("text"),
                                 F.lit("").alias("media_ref")))
            ),
        )
    )
    extracted = F.transform(
        expanded,
        lambda s, i: F.struct(
            s["kind"].alias("kind"), s["text"].alias("text"),
            s["media_ref"].alias("media_ref"), i.cast("int").alias("offset"),
        ),
    )
    cols = {
        "norm_spans": norm_spans,
        "url_norm": url_fn.normalize_url(F.col("url")).alias("url_norm"),
        "spans_in": F.size("spans").alias("spans_in"),
        "extracted": extracted.alias("extracted"),
        "error": F.exists(
            F.col("spans"), lambda s: text_fn.is_error_text(s["text"])
        ).alias("error"),
    }
    _COLS_MEMO["core"] = cols
    return cols


def _meta_columns(date_formats: tuple | None) -> dict:
    key = ("meta", date_formats)
    cols = _COLS_MEMO.get(key)
    if cols is not None:
        return cols
    ex = F.col("extracted")
    # text spans = non-media KINDS (filtering on media_ref=='' would
    # misclassify a degenerate media span whose ref is empty — found by
    # property testing)
    text_spans = F.filter(ex, lambda s: ~s["kind"].isin(*_MEDIA))
    content_chars = F.aggregate(
        text_spans, F.lit(0).cast("bigint"), lambda acc, s: acc + F.length(s["text"])
    )
    headline = _first_kind_text(ex, "headline")
    author = _first_kind_text(ex, "author")
    pub_date = _first_kind_text(ex, "time")
    # escalation analog (extractContent.py:394-399): no headline AND
    # content < 500 chars -> secondary heuristic pass supplies the title
    # from the first kept text span's opening characters.
    first_text = F.coalesce(F.get(text_spans, 0)["text"], F.lit(""))
    title = F.when(
        (headline == "") & (content_chars < spec.ESCALATE_MAX_CONTENT),
        F.substring(first_text, 1, spec.TITLE_FALLBACK_CHARS),
    ).otherwise(headline)
    cols = {
        "title": title,
        "author": author,
        "publication_date": pub_date,
        "cleaned_date": date_fn.parse_date_formats(
            pub_date, list(date_formats) if date_formats is not None else None),
        "content_chars": content_chars,
        "headline_cnt": _count_kind(ex, "headline"),
        "team_cnt": _count_kind(ex, "team"),
        "news_cnt": _count_kind(ex, "news"),
        "spans_kept": F.size("extracted"),
    }
    _COLS_MEMO[key] = cols
    return cols


def _classify_columns() -> dict:
    cols = _COLS_MEMO.get("classify")
    if cols is not None:
        return cols
    ct = (
        F.when(url_fn.is_roundup_url(F.col("url_norm")), F.lit(spec.CT_ROUNDUP_URL[0]))
        .when(F.col("content_chars") < spec.MIN_CONTENT_CHARS, F.lit(spec.CT_EMPTY[0]))
        .when(F.col("lang") != "en", F.lit(spec.CT_WRONG[0]))
        .when(F.col("headline_cnt") >= spec.HEADLINE_ROUNDUP_MIN, F.lit(spec.CT_ROUNDUP_SHAPE[0]))
        .when((F.col("team_cnt") >= spec.TEAM_TOPIC_MIN) & (F.col("news_cnt") >= spec.NEWS_TOPIC_MIN),
              F.lit(spec.CT_TOPIC[0]))
        .when(F.col("news_cnt") >= spec.NEWS_COLL_MIN, F.lit(spec.CT_NEWSCOLL[0]))
        .otherwise(F.lit(spec.CT_ARTICLE[0]))
    )
    tc = (
        F.when(url_fn.is_roundup_url(F.col("url_norm")), F.lit(spec.CT_ROUNDUP_URL[1]))
        .when(F.col("content_chars") < spec.MIN_CONTENT_CHARS, F.lit(spec.CT_EMPTY[1]))
        .when(F.col("lang") != "en", F.lit(spec.CT_WRONG[1]))
        .when(F.col("headline_cnt") >= spec.HEADLINE_ROUNDUP_MIN, F.lit(spec.CT_ROUNDUP_SHAPE[1]))
        .when((F.col("team_cnt") >= spec.TEAM_TOPIC_MIN) & (F.col("news_cnt") >= spec.NEWS_TOPIC_MIN),
              F.lit(spec.CT_TOPIC[1]))
        .when(F.col("news_cnt") >= spec.NEWS_COLL_MIN, F.lit(spec.CT_NEWSCOLL[1]))
        .otherwise(F.lit(spec.CT_ARTICLE[1]))
    )
    cols = {
        "content_type": ct,
        "type_confidence": conf_fn.apply_confidence_floor(
            conf_fn.coerce_confidence(tc), ct),
    }
    _COLS_MEMO["classify"] = cols
    return cols


def extract(
    docs: DataFrame,
    date_formats: list[str] | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """docs -> extracted (see module docstring). Shuffle-free.

    passthrough: extra input columns carried to the output unchanged
    (e.g. an ingest timestamp in the streaming path)."""
    core = _core_columns()
    # NULL spans arrays and NULL span texts must not poison downstream
    # NULL-propagation (exists/aggregate over NULL -> NULL): normalize once.
    docs = docs.withColumn("spans", core["norm_spans"])
    # Materialize the expensive clean/score chain exactly ONCE per row
    # (the `extracted` column); every metadata field below derives from
    # that column, so Catalyst cannot duplicate the regex work.
    out = docs.select(
        *(passthrough or []),
        "doc_id",
        core["url_norm"],
        F.col("lang"),
        core["spans_in"],
        core["extracted"],
        core["error"],
    )
    # NOTE (measured): the metadata projections below reference the
    # `extracted` tree many times, and Catalyst collapses them into one
    # Project. That is FASTER than forcing materialization with a
    # barrier (21.8k vs 7.7k docs/s at 100k docs) because interpreted
    # Project evaluation performs runtime common-subexpression
    # elimination, while a barrier costs an extra operator + UnsafeRow
    # round-trip of the nested array. Aggregating consumers (no CSE in
    # HashAggregate) should insert barrier.barrier() themselves before
    # grouping — see plans/queries.q_extract_metrics.
    out = out.withColumns(
        _meta_columns(tuple(date_formats) if date_formats is not None else None)
    )
    return out.withColumns(_classify_columns())


def main_content(extracted: Column) -> Column:
    """'\\n\\n'-joined kept text (section join, extractContent.py:531,538)."""
    return F.array_join(
        F.transform(
            F.filter(extracted, lambda s: ~s["kind"].isin(*_MEDIA)),
            lambda s: s["text"],
        ),
        "\n\n",
    )
