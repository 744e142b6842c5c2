"""Single source of truth for the span data model, the deterministic
corpus-synthesis rules, and the extraction/classification constants.

Three implementations consume these constants and must stay in exact
agreement (tests assert it):

1. the Spark-native implementation (``sources/synth.py`` +
   ``operators/extraction.py``),
2. the pure-Python test oracle (``tests/pyoracle.py``),
3. the generated DuckDB oracle SQL (``oracle_sql()`` in
   ``__spark_entry__.py``).

Semantics derived from the reference (cited file:line, studied not copied):

- span model         : tagged block lists in
                       reference src/modules/extraction/extracted_contents.json;
                       block ``tags[0]`` -> kind, ``index`` -> offset.
- clean_text chain   : reference extractContent.py:101-109 (images ->
                       links -> tags -> unescape -> collapse ws).
- keep/drop          : Crawl4AI strategy config extractContent.py:271-279
                       (word_count_threshold=50, exclude footer/header/nav/
                       aside/script/style/img, exclude_external_links).
- error predicates   : article_processor.py:53, extractContent.py:301.
- roundup URL regex  : extractContent.py:462-463.
- confidence rules   : extractContent.py:426-433,453-454.
- content types      : extractContent.py:447.
- short-circuit <200 : extractContent.py:376-377.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Span-kind vocabulary (closed, per FIXTURES.md §3)
# ---------------------------------------------------------------------------

CONTENT_KINDS = [
    "headline", "author", "time", "article_body", "main_content",
    "news", "analysis", "introduction", "team",
]
BOILERPLATE_KINDS = [
    "navigation", "menu", "footer", "copyright", "share", "link",
    "related_articles",
]
MEDIA_KINDS = ["image", "video"]
AMBIGUOUS_KINDS = ["text"]  # decided by density heuristics

# word_count_threshold=50 mirrors the reference crawler config
# (extractContent.py:272); link-density cap mirrors exclude_external_links.
WORD_COUNT_THRESHOLD = 50
LINK_DENSITY_MAX = 0.5

# Short-content short-circuit (extractContent.py:376-377)
MIN_CONTENT_CHARS = 200

# Escalation gate (extractContent.py:394-399): the reference re-runs a
# stronger model iff (no title AND main_content < 500 chars). The
# deterministic analog: under the same gate, fall back to the first
# kept text span's opening TITLE_FALLBACK_CHARS characters.
ESCALATE_MAX_CONTENT = 500
TITLE_FALLBACK_CHARS = 80

# Error-message prefixes treated as extraction failures
# (article_processor.py:53, extractContent.py:582-583)
ERROR_PREFIXES = ("Extraction error:", "Failed to extract", "Extraction failed for")

# Roundup URL regex, verbatim semantics from extractContent.py:462-463
# (applied to the lowercased, decoded URL). RE2- and Java-regex compatible.
ROUNDUP_URL_REGEX = r"(?:^|/)(?:nfl[-_/]?news[-_/]?round[-_]?up|news[-_/]?round[-_]?up)(?:/|$)"

CONTENT_TYPES = [
    "news_article", "topic_collection", "news_collection",
    "empty_content", "news-round-up", "wrong_content",
]

# ---------------------------------------------------------------------------
# clean_text regex chain (extractContent.py:101-109 order — canonical)
# Patterns kept in the Java-regex / RE2 common subset.
# ---------------------------------------------------------------------------

RE_MD_IMAGE = r"!\[[^\]]*\]\([^)]*\)"          # drop markdown images
RE_MD_LINK = r"\[([^\]]+)\]\([^)]+\)"          # unwrap links, keep anchor text
RE_HTML_TAG = r"<[^>]+>"                        # strip tags -> space
RE_WS = r"\s+"                                  # collapse whitespace
RE_MD_IMAGE_URL = r"!\[[^\]]*\]\(([^)]*)\)"    # capture inline image URL

# ---------------------------------------------------------------------------
# Deterministic synthetic corpus (archetypes per FIXTURES.md §4).
# All randomness is arithmetic on (doc_id, n_chars) — no RNG, no wall clock,
# identical in Spark SQL, DuckDB SQL and Python.
# ---------------------------------------------------------------------------

# 7 archetype kind-templates; a doc cycles its template to n_spans spans.
ARCHETYPES: list[list[str]] = [
    # A0 single-article, block body
    ["navigation", "menu", "headline", "team", "author",
     "related_articles", "article_body", "article_body", "article_body", "footer"],
    # A1 single-article, monolithic body
    ["navigation", "headline", "author", "related_articles", "main_content", "footer"],
    # A2 roundup/tracker — many short headline/time/news sections
    ["copyright", "navigation", "menu", "headline", "team", "time", "news",
     "headline", "team", "time", "news", "headline", "news"],
    # A3 topic collection — repeating team/news groups
    ["headline", "author", "team", "news", "news", "team", "news", "news"],
    # A4 odd tagging — ambiguous kinds decided by heuristics
    ["navigation", "menu", "text", "text", "text", "footer"],
    # A5 media-rich
    ["navigation", "headline", "author", "image", "article_body", "video",
     "article_body", "image", "footer"],
    # A6 short doc
    ["headline", "text"],
]

# per-kind slice length rules for synthesized span text
LEN_SHORT = 30          # headline / author
LEN_BODY = 90           # body kinds (plus (i % 3) * 40)
LEN_TEXT_SHORT = 40     # ambiguous 'text', even i (drops: < 50 words)
LEN_TEXT_LONG = 300     # ambiguous 'text', odd i (keeps: >= 50 words)

ERROR_DOC_MOD = 17      # n_chars % 17 == 0 -> extraction-error doc
ROUNDUP_URL_MOD = 11    # n_chars % 11 == 0 -> roundup path in URL
ENCODED_URL_MOD = 13    # doc_id % 13 == 0 -> %3A-encoded scheme (A10)
ESPN_DOC_MOD = 10       # doc_id % 10 < 3 -> hot domain (skew)
N_COLD_DOMAINS = 20

ERROR_SPAN_TEXT = "Extraction error: simulated fetch failure (timeout)"

# classification rule constants: (content_type, confidence) per rule.
CT_ROUNDUP_URL = ("news-round-up", 1.0)      # rule 1: URL regex (conf 1.0, ref :463)
CT_EMPTY = ("empty_content", 1.0)            # rule 2: content < 200 chars
CT_WRONG = ("wrong_content", 0.5)            # rule 3: non-'en' lang (conf floor 0.5, ref :453-454)
CT_ROUNDUP_SHAPE = ("news-round-up", 0.85)   # rule 4: >= 4 headline sections
CT_TOPIC = ("topic_collection", 0.8)         # rule 5: >= 2 team + >= 3 news
CT_NEWSCOLL = ("news_collection", 0.7)       # rule 6: >= 5 news
CT_ARTICLE = ("news_article", 0.9)           # rule 7: default
HEADLINE_ROUNDUP_MIN = 4
TEAM_TOPIC_MIN = 2
NEWS_TOPIC_MIN = 3
NEWS_COLL_MIN = 5


def n_spans_for(n_chars: int) -> tuple[int, int]:
    """(archetype index, span count) for a doc. Pure arithmetic."""
    if n_chars % ERROR_DOC_MOD == 0:
        return (-1, 1)
    arch = n_chars % 7
    tmpl_len = len(ARCHETYPES[arch])
    return (arch, tmpl_len + (n_chars % 7))


def doc_id_str(doc_id: int) -> str:
    return "d%08d" % doc_id


def synth_url(doc_id: int, n_chars: int) -> str:
    if doc_id % ESPN_DOC_MOD < 3:
        domain = "www.espn.com"
    else:
        domain = "site%d.example.com" % (doc_id % N_COLD_DOMAINS)
    if n_chars % ROUNDUP_URL_MOD == 0:
        path = "nfl-news-round-up/%d" % doc_id
    else:
        path = "nfl/story/id/%d" % doc_id
    url = "https://%s/%s" % (domain, path)
    if doc_id % ENCODED_URL_MOD == 0:
        url = url.replace("https://", "https%3A//")
    return url


# time-span text is a formatted date: DATE_BASE + (n_chars + i) % 365 days,
# rendered 'MMM d, yyyy' (fuzzy-parseable, mirrors fixture date shapes).
DATE_BASE = "2025-01-01"

# deterministic text decorations (exercise the clean_text chain)
DECOR_LINK_MOD = 3   # i % 3 == 0 -> append markdown link
DECOR_IMG_MOD = 4    # i % 4 == 1 -> prefix inline markdown image
DECOR_HTML_MOD = 5   # i % 5 == 2 -> append HTML tag


def decor_link(i: int) -> str:
    return " [read more](https://www.example.com/more/%d)" % i


def decor_img(doc_id: int, i: int) -> str:
    return "![pic](https://img.example.com/p/d%08d_%d.png) " % (doc_id, i)


def decor_html(i: int) -> str:
    return " <b>Key stat %d</b>" % i


def media_url(kind: str, doc_id: int, i: int) -> str:
    if kind == "image":
        return "https://cdn.example.com/img/d%08d/%d.jpg" % (doc_id, i)
    return "https://cdn.example.com/vid/d%08d/%d.mp4" % (doc_id, i)


def slice_params(kind: str, i: int, n_chars: int) -> tuple[int, int]:
    """1-based substring (start, length) for span i of a doc."""
    start = 1 + ((i * 37) % max(n_chars - 80, 1))
    if kind in ("headline", "author"):
        ln = LEN_SHORT
    elif kind == "text":
        ln = LEN_TEXT_SHORT if i % 2 == 0 else LEN_TEXT_LONG
    else:
        ln = LEN_BODY + (i % 3) * 40
    return start, ln
