"""Arrow-vectorized twin of ``extraction.extract``.

Same semantics, same output schema, different execution: one
``mapInPandas`` pass where each Arrow batch (~10k docs) is processed
with compiled-regex Python over the span lists. This is the
pandas/Arrow-UDF path the BASELINE.json input_hint prescribes
("vectorized pandas/Arrow UDFs, no per-row Python" — per-row here
means per-row *Spark* UDF calls; inside the batch we use plain
compiled re, which is C-speed per operation).

Trade-offs vs the pure-Catalyst higher-order-function path
(operators/extraction.py):

+ compiled regex (C) vs interpreted Catalyst expression eval,
+ one pass over each span (the HOF path re-evaluates shared subtrees
  in some consumers),
- Arrow (de)serialization of the nested spans arrays per batch,
- a Python worker pool per executor (memory + startup).

``tests/test_extraction_arrow.py`` asserts row-for-row equality with
the Catalyst path; ``bench.py`` can time both (T4L_EXTRACT_IMPL=arrow).

Semantics derived from the same reference lines as extraction.py
(clean chain extractContent.py:101-109, keep/drop :271-279, escalation
:394-399, classifier cleanContent.py:260-372) via spec.py constants.
"""

from __future__ import annotations

import re
import urllib.parse
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame

from .. import spec

_RE_IMG = re.compile(spec.RE_MD_IMAGE)
_RE_LINK = re.compile(spec.RE_MD_LINK)
_RE_TAG = re.compile(spec.RE_HTML_TAG)
_RE_WS = re.compile(r"\s+")
_RE_IMG_URL = re.compile(spec.RE_MD_IMAGE_URL)
_RE_ROUNDUP = re.compile(spec.ROUNDUP_URL_REGEX)

_CONTENT = frozenset(spec.CONTENT_KINDS)
_BOILER = frozenset(spec.BOILERPLATE_KINDS)
_MEDIA = frozenset(spec.MEDIA_KINDS)

OUT_SCHEMA = (
    "doc_id string, url_norm string, lang string, spans_in bigint, "
    "extracted array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "error boolean, title string, author string, publication_date string, "
    "cleaned_date timestamp, content_chars bigint, headline_cnt bigint, "
    "team_cnt bigint, news_cnt bigint, spans_kept bigint, "
    "content_type string, type_confidence double"
)


def _clean(t: str) -> str:
    t = _RE_IMG.sub("", t)
    t = _RE_LINK.sub(r"\1", t)
    t = _RE_TAG.sub(" ", t)
    t = t.replace("\\\\", "\\").replace('\\"', '"')
    return _RE_WS.sub(" ", t).strip()


def _url_decode(u: str) -> str:
    """Twin of functions/urls.normalize_url's decode step: '+' preserved,
    malformed escapes stay literal while valid %XX elsewhere still
    decode, invalid UTF-8 sequences become U+FFFD — i.e. exactly
    urllib.parse.unquote (the reference's call), which IS those
    semantics natively."""
    return urllib.parse.unquote(u)


def _extract_one(doc_id, url, lang, spans, date_formats):
    url_norm = _url_decode(url or "")
    if not url_norm.startswith("http"):
        url_norm = "https://www." + url_norm

    error = False
    extracted = []
    title = author = pub_date = ""
    content_chars = 0
    headline_cnt = team_cnt = news_cnt = 0
    first_text = None
    spans = spans if spans is not None else []

    for s in spans:
        kind = s["kind"] or ""
        raw = s["text"] or ""
        media = s["media_ref"] or ""
        is_err = raw.startswith(spec.ERROR_PREFIXES)
        if is_err:
            error = True  # flag considers every span's text
        if kind in _MEDIA:  # media kind wins over the error predicate
            extracted.append((kind, "", media, 0))
            continue
        if is_err:
            continue
        cleaned = _clean(raw)
        if kind in _BOILER:
            continue
        if kind in _CONTENT:
            if not cleaned:
                continue
        elif kind == "text":
            wc = 0 if not cleaned else cleaned.count(" ") + 1
            matched = len(raw) - len(_RE_LINK.sub("", raw))
            if wc < spec.WORD_COUNT_THRESHOLD or matched / max(len(raw), 1) >= spec.LINK_DENSITY_MAX:
                continue
        else:
            continue
        extracted.append((kind, cleaned, "", 0))
        if first_text is None:
            first_text = cleaned
        content_chars += len(cleaned)
        if kind == "headline":
            headline_cnt += 1
            if title == "":
                title = cleaned
        elif kind == "team":
            team_cnt += 1
        elif kind == "news":
            news_cnt += 1
        elif kind == "author":
            if author == "":
                author = cleaned
        elif kind == "time":
            if pub_date == "":
                pub_date = cleaned
        m = _RE_IMG_URL.search(raw)
        if m and m.group(1):
            extracted.append(("image", "", m.group(1), 0))

    extracted = [(k, t, mr, i) for i, (k, t, mr, _z) in enumerate(extracted)]

    # escalation analog (extractContent.py:394-399)
    if title == "" and content_chars < spec.ESCALATE_MAX_CONTENT and first_text:
        title = first_text[: spec.TITLE_FALLBACK_CHARS]

    cleaned_date = None
    if pub_date:
        for fmt in date_formats:
            try:
                cleaned_date = datetime.strptime(pub_date, fmt)
                break
            except ValueError:
                continue

    if _RE_ROUNDUP.search(url_norm.lower()):
        ct, tc = spec.CT_ROUNDUP_URL
    elif content_chars < spec.MIN_CONTENT_CHARS:
        ct, tc = spec.CT_EMPTY
    elif lang is not None and lang != "en":
        # NULL lang must NOT classify as wrong_content: the Catalyst
        # twin's (lang != 'en') is NULL for NULL lang, which when()
        # treats as false — mirror that fall-through here
        ct, tc = spec.CT_WRONG
    elif headline_cnt >= spec.HEADLINE_ROUNDUP_MIN:
        ct, tc = spec.CT_ROUNDUP_SHAPE
    elif team_cnt >= spec.TEAM_TOPIC_MIN and news_cnt >= spec.NEWS_TOPIC_MIN:
        ct, tc = spec.CT_TOPIC
    elif news_cnt >= spec.NEWS_COLL_MIN:
        ct, tc = spec.CT_NEWSCOLL
    else:
        ct, tc = spec.CT_ARTICLE
    tc = min(max(float(tc), 0.0), 1.0)
    if ct in ("empty_content", "wrong_content"):
        tc = max(tc, 0.5)

    return (
        doc_id, url_norm, lang, len(spans), extracted, error, title, author,
        pub_date, cleaned_date, content_chars, headline_cnt, team_cnt,
        news_cnt, len(extracted), ct, tc,
    )


# python strptime formats equivalent to the Catalyst default list
PY_DATE_FORMATS = ["%b %d, %Y", "%B %d, %Y", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%m/%d/%Y"]

COLS = [
    "doc_id", "url_norm", "lang", "spans_in", "extracted", "error", "title",
    "author", "publication_date", "cleaned_date", "content_chars",
    "headline_cnt", "team_cnt", "news_cnt", "spans_kept", "content_type",
    "type_confidence",
]


def extract_arrow(docs: DataFrame, date_formats: list[str] | None = None) -> DataFrame:
    """Arrow-batched extraction; output schema equals extraction.extract."""
    fmts = date_formats or PY_DATE_FORMATS
    # explicit Spark-pattern -> strptime mapping (string surgery on
    # datetime patterns is error-prone; unknown patterns must be passed
    # as strptime directly)
    _fmt_map = {
        "MMM d, yyyy": "%b %d, %Y",
        "MMMM d, yyyy": "%B %d, %Y",
        "yyyy-MM-dd'T'HH:mm:ss": "%Y-%m-%dT%H:%M:%S",
        "yyyy-MM-dd HH:mm:ss": "%Y-%m-%d %H:%M:%S",
        "yyyy-MM-dd": "%Y-%m-%d",
        "MM/dd/yyyy": "%m/%d/%Y",
    }
    fmts = [_fmt_map.get(f, f) for f in fmts]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _extract_one(d, u, lg, sp, fmts)
                for d, u, lg, sp in zip(pdf["doc_id"], pdf["url"], pdf["lang"], pdf["spans"])
            ]
            yield pd.DataFrame(rows, columns=COLS)

    return docs.mapInPandas(fn, schema=OUT_SCHEMA)
