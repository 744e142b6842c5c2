"""Pure-Python oracle: an independent implementation of the corpus
synthesis + extraction semantics defined in
``tackle4losscontentextraction_spark/spec.py``.

Used by the golden tests to verify the Spark implementation row-for-row
(span-sequence equality on (kind, text, media_ref, order), per the
BASELINE.json invariant). Deliberately written with plain Python
string ops / re — shares only the constants with the Spark code.
"""

from __future__ import annotations

import re
import urllib.parse
from datetime import date, datetime, timedelta

from tackle4losscontentextraction_spark import spec

# ---------------------------------------------------------------------------
# scalar semantics (reference extractContent.py:101-109 etc.)
# ---------------------------------------------------------------------------


def clean_text(text: str) -> str:
    if not text:
        return ""
    t = re.sub(spec.RE_MD_IMAGE, "", text)
    t = re.sub(spec.RE_MD_LINK, r"\1", t)
    t = re.sub(spec.RE_HTML_TAG, " ", t)
    t = t.replace("\\\\", "\\").replace('\\"', '"')
    t = re.sub(r"\s+", " ", t).strip()
    return t


def word_count(cleaned: str) -> int:
    return 0 if not cleaned else cleaned.count(" ") + 1


def link_density(raw: str) -> float:
    if not raw:
        return 0.0
    matched = len(raw) - len(re.sub(spec.RE_MD_LINK, "", raw))
    return matched / max(len(raw), 1)


def is_error_text(text: str) -> bool:
    return any(text.startswith(p) for p in spec.ERROR_PREFIXES)


def inline_image_url(raw: str) -> str:
    m = re.search(spec.RE_MD_IMAGE_URL, raw)
    return m.group(1) if m else ""


def deterministic_uuid(name: str) -> str:
    """Twin of functions/ids.deterministic_uuid (v3-style name UUID)."""
    import hashlib

    h = hashlib.md5(name.encode()).hexdigest()
    return (
        f"{h[0:8]}-{h[8:12]}-3{h[13:16]}-"
        f"{(int(h[16], 16) % 4 + 8):x}{h[17:20]}-{h[20:32]}"
    )


def normalize_url(url: str) -> str:
    # plain urllib.parse.unquote — the reference's own call
    # (article_processor.py:40-41), kept UN-mirrored from the Spark
    # implementation so this stays an independent check of its
    # malformed-escape semantics (valid %XX decode even when an
    # invalid escape exists elsewhere in the string)
    decoded = urllib.parse.unquote(url)
    if not decoded.startswith("http"):
        decoded = "https://www." + decoded
    return decoded


def is_roundup_url(url_norm: str) -> bool:
    return re.search(spec.ROUNDUP_URL_REGEX, url_norm.lower()) is not None


def sql_substr(s: str, start_1b: int, length: int) -> str:
    return s[start_1b - 1 : start_1b - 1 + length]


# ---------------------------------------------------------------------------
# corpus synthesis (mirrors sources/synth.py)
# ---------------------------------------------------------------------------


def _fmt_date(n_chars: int, i: int) -> str:
    base = date.fromisoformat(spec.DATE_BASE)
    d = base + timedelta(days=(n_chars + i) % 365)
    return f"{d.strftime('%b')} {d.day}, {d.year}"


def synth_spans(doc_id: int, text: str, n_chars: int) -> list[dict]:
    did = spec.doc_id_str(doc_id)
    arch, n_spans = spec.n_spans_for(n_chars)
    if arch == -1:
        return [{"kind": "text", "text": spec.ERROR_SPAN_TEXT, "media_ref": "", "offset": 0}]
    tmpl = spec.ARCHETYPES[arch]
    spans = []
    for i in range(n_spans):
        kind = tmpl[i % len(tmpl)]
        if kind in ("image", "video"):
            media = spec.media_url(kind, doc_id, i)
            stext = ""
        elif kind == "time":
            media = ""
            stext = _fmt_date(n_chars, i)
        else:
            media = ""
            start, ln = spec.slice_params(kind, i, n_chars)
            stext = sql_substr(text, start, ln)
            if i % spec.DECOR_LINK_MOD == 0:
                stext = stext + spec.decor_link(i)
            if i % spec.DECOR_IMG_MOD == 1:
                stext = spec.decor_img(doc_id, i) + stext
            if i % spec.DECOR_HTML_MOD == 2:
                stext = stext + spec.decor_html(i)
        spans.append({"kind": kind, "text": stext, "media_ref": media, "offset": i})
    return spans


def synth_doc(doc_id: int, text: str, lang: str, n_chars: int) -> dict:
    return {
        "doc_id": spec.doc_id_str(doc_id),
        "url": spec.synth_url(doc_id, n_chars),
        "lang": lang,
        "spans": synth_spans(doc_id, text, n_chars),
    }


# ---------------------------------------------------------------------------
# extraction (mirrors operators/extraction.py)
# ---------------------------------------------------------------------------

_CONTENT = set(spec.CONTENT_KINDS)
_BOILER = set(spec.BOILERPLATE_KINDS)
_MEDIA = set(spec.MEDIA_KINDS)


def extract_doc(doc: dict) -> dict:
    kept = []  # (kind, cleaned, media_ref, inline_img, keep_class)
    error = False
    for s in doc["spans"]:
        raw, kind = s["text"], s["kind"]
        if is_error_text(raw):
            error = True  # flag considers every span's text
        # keep/drop order mirrors the Spark operator: media kind wins
        # over the error predicate (media text is ignored anyway)
        if kind in _MEDIA:
            kept.append((kind, "", s["media_ref"], "", "media"))
            continue
        if is_error_text(raw):
            continue
        cleaned = clean_text(raw)
        if kind in _BOILER:
            continue
        elif kind in _CONTENT:
            if cleaned:
                kept.append((kind, cleaned, "", inline_image_url(raw), "keep"))
        elif kind == "text":
            if (
                word_count(cleaned) >= spec.WORD_COUNT_THRESHOLD
                and link_density(raw) < spec.LINK_DENSITY_MAX
            ):
                kept.append((kind, cleaned, "", inline_image_url(raw), "keep"))

    extracted = []
    for kind, cleaned, media, inline_img, klass in kept:
        if klass == "media":
            extracted.append({"kind": kind, "text": "", "media_ref": media})
        else:
            extracted.append({"kind": kind, "text": cleaned, "media_ref": ""})
            if inline_img:
                extracted.append({"kind": "image", "text": "", "media_ref": inline_img})
    for i, e in enumerate(extracted):
        e["offset"] = i

    def first_text(kind: str) -> str:
        for k, cleaned, _m, _ii, klass in kept:
            if k == kind:
                return cleaned
        return ""

    title = first_text("headline")
    author = first_text("author")
    pub_date = first_text("time")

    keep_texts = [x[1] for x in kept if x[4] == "keep"]
    content_chars_pre = sum(len(t) for t in keep_texts)
    # escalation analog (extractContent.py:394-399)
    if title == "" and content_chars_pre < spec.ESCALATE_MAX_CONTENT and keep_texts:
        title = keep_texts[0][: spec.TITLE_FALLBACK_CHARS]
    cleaned_date = None
    if pub_date:
        try:
            cleaned_date = datetime.strptime(pub_date, "%b %d, %Y")
        except ValueError:
            cleaned_date = None

    text_spans = [x for x in kept if x[4] == "keep"]
    content_chars = sum(len(x[1]) for x in text_spans)
    headline_cnt = sum(1 for x in kept if x[0] == "headline")
    team_cnt = sum(1 for x in kept if x[0] == "team")
    news_cnt = sum(1 for x in kept if x[0] == "news")

    url_norm = normalize_url(doc["url"])
    if is_roundup_url(url_norm):
        ct, tc = spec.CT_ROUNDUP_URL
    elif content_chars < spec.MIN_CONTENT_CHARS:
        ct, tc = spec.CT_EMPTY
    elif doc["lang"] is not None and doc["lang"] != "en":
        ct, tc = spec.CT_WRONG
    elif headline_cnt >= spec.HEADLINE_ROUNDUP_MIN:
        ct, tc = spec.CT_ROUNDUP_SHAPE
    elif team_cnt >= spec.TEAM_TOPIC_MIN and news_cnt >= spec.NEWS_TOPIC_MIN:
        ct, tc = spec.CT_TOPIC
    elif news_cnt >= spec.NEWS_COLL_MIN:
        ct, tc = spec.CT_NEWSCOLL
    else:
        ct, tc = spec.CT_ARTICLE
    # coerce/clamp/floor (constants already in range — asserts the rule)
    tc = min(max(float(tc), 0.0), 1.0)
    if ct in ("empty_content", "wrong_content"):
        tc = max(tc, 0.5)

    return {
        "doc_id": doc["doc_id"],
        "url_norm": url_norm,
        "extracted": extracted,
        "title": title,
        "author": author,
        "publication_date": pub_date,
        "cleaned_date": cleaned_date,
        "content_type": ct,
        "type_confidence": tc,
        "error": error,
        "spans_in": len(doc["spans"]),
        "spans_kept": len(extracted),
        "content_chars": content_chars,
    }
