"""DuckDB oracle SQL for the driver's correctness gate.

Each function returns ANSI-ish SQL runnable by DuckDB over the
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). The SQL is generated from the
SAME constants in ``spec.py`` that drive the Spark implementation, so
the two stay in lock-step; only the *dialect* differs (DuckDB regexp
replacement uses \\1 + 'g' flag, Java uses $1 and is global).

The extraction oracles re-derive the synthetic span corpus from the
``documents`` view with pure SQL (lateral unnest + arithmetic), then
apply the full extraction semantics (clean chain, keep/drop, media
preservation, metadata, classification) — an independent third
implementation of the spec, alongside Spark and the pure-Python test
oracle.
"""

from __future__ import annotations

from . import spec

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

_ARCH = "[" + ", ".join(
    "[" + ", ".join(f"'{k}'" for k in t) + "]" for t in spec.ARCHETYPES
) + "]"
_TMPL_LENS = "[" + ", ".join(str(len(t)) for t in spec.ARCHETYPES) + "]"

_CONTENT_IN = ", ".join(f"'{k}'" for k in spec.CONTENT_KINDS)
_BOILER_IN = ", ".join(f"'{k}'" for k in spec.BOILERPLATE_KINDS)

_ERR_PRED = " OR ".join(f"starts_with(raw, '{p}')" for p in spec.ERROR_PREFIXES)


def spans_cte() -> str:
    """WITH-clause body producing the enriched span rows.

    Exposes CTEs: doc_base (did, idn, lang, n_chars, url, url_norm),
    enriched (did, i, kind, raw, media_ref, cleaned, wc, ld,
    is_err_span, inline_img, keep_class).
    """
    return f"""
doc_base AS (
  SELECT
    doc_id::BIGINT AS idn,
    printf('d%08d', doc_id::BIGINT) AS did,
    text, lang, n_chars::BIGINT AS n_chars,
    CASE WHEN doc_id::BIGINT % {spec.ENCODED_URL_MOD} = 0
         THEN replace(u.full_url, 'https://', 'https%3A//')
         ELSE u.full_url END AS url
  FROM documents,
  LATERAL (
    SELECT 'https://' ||
      CASE WHEN doc_id::BIGINT % {spec.ESPN_DOC_MOD} < 3 THEN 'www.espn.com'
           ELSE 'site' || (doc_id::BIGINT % {spec.N_COLD_DOMAINS})::VARCHAR || '.example.com' END
      || '/' ||
      CASE WHEN n_chars::BIGINT % {spec.ROUNDUP_URL_MOD} = 0
           THEN 'nfl-news-round-up/' || doc_id::BIGINT::VARCHAR
           ELSE 'nfl/story/id/' || doc_id::BIGINT::VARCHAR END AS full_url
  ) u
),
sized AS (
  SELECT *,
    (n_chars % {spec.ERROR_DOC_MOD} = 0) AS is_err_doc,
    CASE WHEN n_chars % {spec.ERROR_DOC_MOD} = 0 THEN 1
         ELSE {_TMPL_LENS}[(n_chars % 7)::INT + 1] + (n_chars % 7)::INT
    END AS n_spans
  FROM doc_base
),
kinds AS (
  SELECT s.*, t.i::BIGINT AS i,
    CASE WHEN s.is_err_doc THEN 'text'
         ELSE {_ARCH}[(s.n_chars % 7)::INT + 1]
              [(t.i % {_TMPL_LENS}[(s.n_chars % 7)::INT + 1])::INT + 1]
    END AS kind
  FROM sized s, LATERAL unnest(range(0, s.n_spans)) AS t(i)
),
raw_spans AS (
  SELECT did, idn, lang, n_chars, url, i, kind,
    CASE
      WHEN is_err_doc THEN '{spec.ERROR_SPAN_TEXT}'
      WHEN kind IN ('image', 'video') THEN ''
      WHEN kind = 'time' THEN strftime(DATE '{spec.DATE_BASE}' + ((n_chars + i) % 365)::INT, '%b %-d, %Y')
      ELSE d3.x
    END AS raw,
    CASE
      WHEN is_err_doc THEN ''
      WHEN kind = 'image' THEN 'https://cdn.example.com/img/' || did || '/' || i::VARCHAR || '.jpg'
      WHEN kind = 'video' THEN 'https://cdn.example.com/vid/' || did || '/' || i::VARCHAR || '.mp4'
      ELSE '' END AS media_ref
  FROM kinds,
  LATERAL (
    SELECT substr(text,
             ((i * 37) % greatest(n_chars - 80, 1) + 1)::INT,
             (CASE WHEN kind IN ('headline','author') THEN {spec.LEN_SHORT}
                   WHEN kind = 'text' THEN CASE WHEN i % 2 = 0 THEN {spec.LEN_TEXT_SHORT} ELSE {spec.LEN_TEXT_LONG} END
                   ELSE {spec.LEN_BODY} + (i % 3)::INT * 40 END)::INT) AS x
  ) d0,
  LATERAL (
    SELECT CASE WHEN i % {spec.DECOR_LINK_MOD} = 0
                THEN d0.x || ' [read more](https://www.example.com/more/' || i::VARCHAR || ')'
                ELSE d0.x END AS x
  ) d1,
  LATERAL (
    SELECT CASE WHEN i % {spec.DECOR_IMG_MOD} = 1
                THEN '![pic](https://img.example.com/p/' || did || '_' || i::VARCHAR || '.png) ' || d1.x
                ELSE d1.x END AS x
  ) d2,
  LATERAL (
    SELECT CASE WHEN i % {spec.DECOR_HTML_MOD} = 2
                THEN d2.x || ' <b>Key stat ' || i::VARCHAR || '</b>'
                ELSE d2.x END AS x
  ) d3
),
enriched AS (
  SELECT did, idn, lang, n_chars, url, i, kind, raw, media_ref,
    c.cleaned,
    CASE WHEN c.cleaned = '' THEN 0
         ELSE length(c.cleaned) - length(replace(c.cleaned, ' ', '')) + 1 END AS wc,
    (length(raw) - length(regexp_replace(raw, '{spec.RE_MD_LINK}', '', 'g')))::DOUBLE
      / greatest(length(raw), 1) AS ld,
    ({_ERR_PRED}) AS is_err_span,
    regexp_extract(raw, '{spec.RE_MD_IMAGE_URL}', 1) AS inline_img
  FROM raw_spans,
  LATERAL (
    SELECT trim(regexp_replace(
             replace(replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(raw, '{spec.RE_MD_IMAGE}', '', 'g'),
                   '{spec.RE_MD_LINK}', '\\1', 'g'),
                 '{spec.RE_HTML_TAG}', ' ', 'g'),
               '\\\\', '\\'), '\\"', '"'),
             '\\s+', ' ', 'g')) AS cleaned
  ) c
),
scored AS (
  SELECT *,
    CASE
      WHEN kind IN ('image', 'video') THEN 'media'
      WHEN is_err_span THEN 'drop'
      WHEN kind IN ({_BOILER_IN}) THEN 'drop'
      WHEN kind IN ({_CONTENT_IN}) THEN CASE WHEN length(cleaned) > 0 THEN 'keep' ELSE 'drop' END
      WHEN kind = 'text' THEN CASE WHEN wc >= {spec.WORD_COUNT_THRESHOLD} AND ld < {spec.LINK_DENSITY_MAX}
                                   THEN 'keep' ELSE 'drop' END
      ELSE 'drop' END AS keep_class
  FROM enriched
),
expanded AS (
  SELECT did, i, 0 AS sub, kind,
         CASE WHEN keep_class = 'media' THEN '' ELSE cleaned END AS text,
         CASE WHEN keep_class = 'media' THEN media_ref ELSE '' END AS media_ref
  FROM scored WHERE keep_class <> 'drop'
  UNION ALL
  SELECT did, i, 1 AS sub, 'image' AS kind, '' AS text, inline_img AS media_ref
  FROM scored WHERE keep_class = 'keep' AND inline_img <> ''
)
""".strip()


def _doc_agg_cte() -> str:
    """Per-doc aggregates over scored spans + classification."""
    return f"""
doc_agg AS (
  SELECT
    s.did AS doc_id,
    any_value(s.lang) AS lang,
    replace(any_value(s.url), '%3A', ':') AS url_norm,
    CASE WHEN coalesce((list(s.cleaned ORDER BY s.i) FILTER (WHERE s.keep_class = 'keep' AND s.kind = 'headline'))[1], '') = ''
              AND coalesce(sum(length(s.cleaned)) FILTER (WHERE s.keep_class = 'keep'), 0) < {spec.ESCALATE_MAX_CONTENT}
         THEN substr(coalesce((list(s.cleaned ORDER BY s.i) FILTER (WHERE s.keep_class = 'keep'))[1], ''), 1, {spec.TITLE_FALLBACK_CHARS})
         ELSE coalesce((list(s.cleaned ORDER BY s.i) FILTER (WHERE s.keep_class = 'keep' AND s.kind = 'headline'))[1], '') END AS title,
    coalesce((list(s.cleaned ORDER BY s.i) FILTER (WHERE s.keep_class = 'keep' AND s.kind = 'author'))[1], '') AS author,
    coalesce((list(s.cleaned ORDER BY s.i) FILTER (WHERE s.keep_class = 'keep' AND s.kind = 'time'))[1], '') AS publication_date,
    coalesce(bool_or(s.is_err_span), false) AS error,
    count(*)::BIGINT AS spans_in,
    (count(*) FILTER (WHERE s.keep_class <> 'drop')
     + count(*) FILTER (WHERE s.keep_class = 'keep' AND s.inline_img <> ''))::BIGINT AS spans_kept,
    coalesce(sum(length(s.cleaned)) FILTER (WHERE s.keep_class = 'keep'), 0)::BIGINT AS content_chars,
    count(*) FILTER (WHERE s.keep_class = 'keep' AND s.kind = 'headline') AS headline_cnt,
    count(*) FILTER (WHERE s.keep_class = 'keep' AND s.kind = 'team') AS team_cnt,
    count(*) FILTER (WHERE s.keep_class = 'keep' AND s.kind = 'news') AS news_cnt
  FROM scored s
  GROUP BY s.did
),
classified AS (
  SELECT *,
    CASE
      WHEN regexp_matches(lower(url_norm), '{spec.ROUNDUP_URL_REGEX}') THEN '{spec.CT_ROUNDUP_URL[0]}'
      WHEN content_chars < {spec.MIN_CONTENT_CHARS} THEN '{spec.CT_EMPTY[0]}'
      WHEN lang <> 'en' THEN '{spec.CT_WRONG[0]}'
      WHEN headline_cnt >= {spec.HEADLINE_ROUNDUP_MIN} THEN '{spec.CT_ROUNDUP_SHAPE[0]}'
      WHEN team_cnt >= {spec.TEAM_TOPIC_MIN} AND news_cnt >= {spec.NEWS_TOPIC_MIN} THEN '{spec.CT_TOPIC[0]}'
      WHEN news_cnt >= {spec.NEWS_COLL_MIN} THEN '{spec.CT_NEWSCOLL[0]}'
      ELSE '{spec.CT_ARTICLE[0]}'
    END AS content_type,
    CASE
      WHEN regexp_matches(lower(url_norm), '{spec.ROUNDUP_URL_REGEX}') THEN {spec.CT_ROUNDUP_URL[1]}
      WHEN content_chars < {spec.MIN_CONTENT_CHARS} THEN {spec.CT_EMPTY[1]}
      WHEN lang <> 'en' THEN {spec.CT_WRONG[1]}
      WHEN headline_cnt >= {spec.HEADLINE_ROUNDUP_MIN} THEN {spec.CT_ROUNDUP_SHAPE[1]}
      WHEN team_cnt >= {spec.TEAM_TOPIC_MIN} AND news_cnt >= {spec.NEWS_TOPIC_MIN} THEN {spec.CT_TOPIC[1]}
      WHEN news_cnt >= {spec.NEWS_COLL_MIN} THEN {spec.CT_NEWSCOLL[1]}
      ELSE {spec.CT_ARTICLE[1]}
    END::DOUBLE AS type_confidence
  FROM doc_agg
)
""".strip()


# ---------------------------------------------------------------------------
# extraction oracles
# ---------------------------------------------------------------------------


def extract_spans() -> str:
    return f"""
WITH {spans_cte()}
SELECT did AS doc_id,
       (row_number() OVER (PARTITION BY did ORDER BY i, sub) - 1)::BIGINT AS out_offset,
       kind, text, media_ref
FROM expanded
""".strip()


def extract_meta() -> str:
    return f"""
WITH {spans_cte()},
{_doc_agg_cte()}
SELECT doc_id, title, author, publication_date,
       strftime(try_strptime(publication_date, '%b %-d, %Y'), '%Y-%m-%d %H:%M:%S') AS pub_ts,
       content_type, type_confidence, error,
       spans_in, spans_kept, content_chars
FROM classified
""".strip()


def extract_media() -> str:
    return f"""
WITH {spans_cte()}
SELECT did AS doc_id, kind, media_ref
FROM expanded
WHERE media_ref <> ''
""".strip()


def extract_metrics() -> str:
    return f"""
WITH {spans_cte()},
{_doc_agg_cte()}
SELECT content_type,
       count(*)::BIGINT AS n_docs,
       sum(spans_in)::BIGINT AS spans_in,
       sum(spans_kept)::BIGINT AS spans_kept,
       sum(content_chars)::BIGINT AS content_chars,
       sum(CASE WHEN error THEN 1 ELSE 0 END)::BIGINT AS n_errors
FROM classified
GROUP BY content_type
""".strip()


def clean_text_query() -> str:
    return f"""
WITH {spans_cte()}
SELECT did AS doc_id, i AS offset, cleaned
FROM enriched
""".strip()


def url_normalize() -> str:
    return f"""
WITH {spans_cte()}
SELECT did AS doc_id,
       replace(url, '%3A', ':') AS url_norm,
       regexp_matches(lower(replace(url, '%3A', ':')), '{spec.ROUNDUP_URL_REGEX}') AS is_roundup
FROM doc_base
""".strip()
