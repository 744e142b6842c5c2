"""Token counting and text chunking.

Reference ``num_tokens``/``chunk_text`` (extractContent.py:120-133) use
tiktoken. tiktoken (and its downloaded vocab) is not in this
environment, so:

- :func:`token_count_ws` — whitespace tokens (JVM-side).
- :func:`token_count_bpe_regex` — BPE-ish regex token count (the GPT-2
  pre-tokenizer word/number/punct split), JVM-side via ``regexp_count``.
- :func:`token_count_bpe` — REAL byte-pair-encoding token count over a
  small vendored merge table (:data:`BPE_MERGES`): characters are the
  initial symbols and merge rules apply in rank order, exactly the
  reference BPE encode algorithm, just with a 64-rule table instead of
  tiktoken's 50k. Deterministic, pure string ops (JVM codegen, no
  Python worker), and bit-identical in DuckDB/Python for the oracle.
- :func:`token_count_proxy` — chars/4 heuristic for chunk planning.
- :func:`chunk_text_by_tokens` — windowed slices of ~max_tokens words
  (array of chunks; per-row, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer classes: contractions, letter runs, digit
# runs, punctuation runs (kept RE2/Java compatible — no \p{L} lookaheads).
BPE_TOKEN_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_count_ws(col: Column) -> Column:
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_bpe_regex(col: Column) -> Column:
    return F.regexp_count(col, F.lit(BPE_TOKEN_REGEX))


# Vendored BPE merge table, rank-ordered (highest priority first) — the
# stand-in for tiktoken's learned merges (extractContent.py:120-125).
# Any fixed ordered pair list is a valid BPE vocabulary; this one covers
# frequent English digraphs so common words compress realistically
# ("the" -> 1 token, "and" -> 1, "extraction" -> ~4). Merges may chain
# (("t","h") then ("th","e")); a rule whose sides aren't current symbols
# simply never fires, exactly like unused vocab entries.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("h", "e"), ("a", "t"), ("e", "n"),
    ("an", "d"), ("o", "r"), ("e", "s"), ("s", "t"), ("a", "r"),
    ("o", "u"), ("i", "t"), ("i", "s"), ("e", "d"), ("a", "l"),
    ("in", "g"), ("t", "o"), ("o", "f"), ("c", "o"), ("l", "e"),
    ("m", "e"), ("r", "o"), ("a", "s"), ("i", "c"), ("l", "l"),
    ("e", "a"), ("c", "h"), ("s", "e"), ("u", "r"), ("w", "h"),
    ("o", "w"), ("l", "y"), ("v", "e"), ("b", "e"), ("s", "p"),
    ("d", "a"), ("t", "a"), ("q", "u"), ("qu", "er"), ("qu", "e"),
    ("r", "y"), ("j", "o"), ("jo", "in"), ("w", "in"), ("win", "d"),
    ("s", "c"), ("sc", "an"), ("m", "er"), ("mer", "g"), ("merg", "e"),
    ("i", "l"), ("f", "il"), ("fil", "t"), ("filt", "er"), ("g", "r"), ("gr", "ou"),
    ("grou", "p"), ("s", "or"), ("sor", "t"), ("h", "as"), ("has", "h"),
]

# symbol delimiter: each symbol is wrapped as \x01sym\x01, so the merge
# pattern \x01a\x01\x01b\x01 can never match inside a longer symbol and
# adjacent matches never share a boundary character (a plain
# space-joined encoding would wrongly merge "st h" via rule "t h", and
# consecutive pairs would alternate-miss because the shared space is
# consumed by the previous replacement).
_D = "\x01"


def token_count_bpe(col: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """BPE token count with the vendored merge table (see module doc).

    Algorithm (the standard BPE encode): lowercase, collapse whitespace,
    wrap every character as a delimited symbol, then apply each merge
    rule in rank order as a left-to-right non-overlapping replace —
    Java, DuckDB and Python ``replace`` all agree on that scan order, so
    the count is engine-exact. Tokens = symbols remaining minus the
    whitespace symbols (spaces separate words; no merge contains one, so
    merges can never cross a word boundary).
    """
    if merges is None:
        merges = BPE_MERGES
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    # (?s): Java's dot excludes line terminators (U+2028/U+2029/U+0085)
    # by default, so without DOTALL those chars would silently escape
    # the symbol wrap and diverge from the Python/DuckDB twins (whose
    # dot excludes only \n, which never survives normalization)
    s = F.regexp_replace(norm, "(?s)(.)", _D + "$1" + _D)
    for a, b in merges:
        s = F.replace(s, F.lit(f"{_D}{a}{_D}{_D}{b}{_D}"), F.lit(f"{_D}{a}{b}{_D}"))
    n_sym = (F.length(s) - F.length(F.replace(s, F.lit(_D), F.lit("")))) / 2
    n_space = F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit("")))
    return (n_sym - n_space).cast("bigint")


def bpe_tokens_py(text: str, merges: list[tuple[str, str]] | None = None) -> int:
    """Pure-Python twin of :func:`token_count_bpe` (property tests /
    pyoracle): same normalize + rank-ordered str.replace fold.

    Whitespace is pinned to ASCII semantics — Java's ``\\s`` (and the
    DuckDB oracle's) matches only ``[ \\t\\n\\x0B\\f\\r]``, while
    Python's ``\\s`` / ``str.strip()`` are Unicode-aware; without the
    pin, interior U+00A0/U+2009 etc. collapse in the Python twin but
    count as character symbols in the other two engines."""
    if merges is None:
        merges = BPE_MERGES
    import re as _re

    norm = _re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip(" \t\n\x0b\f\r").lower())
    s = "".join(_D + c + _D for c in norm)
    for a, b in merges:
        s = s.replace(f"{_D}{a}{_D}{_D}{b}{_D}", f"{_D}{a}{b}{_D}")
    n_sym = s.count(_D) // 2
    n_space = norm.count(" ")
    return n_sym - n_space


def token_count_bpe_hof(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Catalyst fold of the merge table via ``F.aggregate`` — one flat
    expression whose rule loop runs at execution time, so it works at
    vocab sizes where a chained-``F.replace`` tree (O(rules) expression
    depth) would blow up the planner.  Same semantics as
    :func:`token_count_bpe`: rank-ordered left-to-right non-overlapping
    replace over the delimited symbol string.  JVM-side, no Python
    worker — but still O(rules x length) per row; for big tables prefer
    :func:`token_count_bpe_arrow` (word-level encode + cache)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    wrapped = F.regexp_replace(norm, "(?s)(.)", _D + "$1" + _D)
    rules = F.array(
        *[
            F.struct(
                F.lit(f"{_D}{a}{_D}{_D}{b}{_D}").alias("p"),
                F.lit(f"{_D}{a}{b}{_D}").alias("r"),
            )
            for a, b in merges
        ]
    )
    s = F.aggregate(rules, wrapped, lambda acc, m: F.replace(acc, m.p, m.r))
    n_sym = (F.length(s) - F.length(F.replace(s, F.lit(_D), F.lit("")))) / 2
    n_space = F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit("")))
    return (n_sym - n_space).cast("bigint")


def _encode_word_ntok(word: str, merges: list[tuple[str, str]],
                      rank_of: dict[tuple[str, str], int]) -> int:
    """Token count of one whitespace-free word under the rank-ordered
    replace fold — algorithmically fast (only ranks whose pair actually
    occurs are visited, via a min-heap) but EXACTLY fold-equivalent:

    ranks are processed strictly increasing (``applied`` advances on
    every pop, hit or stale), so a pair that becomes adjacent only
    after a higher-ranked merge is skipped — precisely what the
    replace chain does, and precisely where a tiktoken-style global
    priority queue would differ.  Each applied rank merges ALL
    occurrences left-to-right non-overlapping, matching the scan order
    of java/duckdb/python ``replace``.
    """
    toks = list(word)
    if len(toks) < 2:
        return len(toks)
    import heapq

    heap = sorted({rank_of[p] for p in zip(toks, toks[1:]) if p in rank_of})
    applied = -1
    while heap:
        r = heapq.heappop(heap)
        if r <= applied:
            continue
        applied = r
        a, b = merges[r]
        out: list[str] = []
        i, n, changed = 0, len(toks), False
        while i < n:
            if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
                changed = True
            else:
                out.append(toks[i])
                i += 1
        if changed:
            toks = out
            for p in zip(toks, toks[1:]):
                rr = rank_of.get(p)
                if rr is not None and rr > r:
                    heapq.heappush(heap, rr)
    return len(toks)


def bpe_tokens_py_fast(text: str, merges: list[tuple[str, str]],
                       rank_of: dict[tuple[str, str], int],
                       cache: dict[str, int]) -> int:
    """Fast twin of :func:`bpe_tokens_py`: same ASCII-pinned normalize,
    then per-WORD encode with a memo.  Valid because no merge symbol
    contains a space (enforced by the vocab generator), so the fold can
    never cross a word boundary and the doc count is the sum of word
    counts — Zipf word reuse makes the cache hit rate ~1 at corpus
    scale, turning O(rules x doc_len) into O(words) per doc."""
    import re as _re

    norm = _re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip(" \t\n\x0b\f\r").lower())
    if not norm:
        return 0
    total = 0
    for w in norm.split(" "):
        n = cache.get(w)
        if n is None:
            n = _encode_word_ntok(w, merges, rank_of)
            if len(cache) > 2_000_000:  # bound executor memory on adversarial vocab
                cache.clear()
            cache[w] = n
        total += n
    return total


def token_count_bpe_arrow(col: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """Arrow-vectorized BPE token count for big vocabularies — the
    production path for tables where ``token_count_bpe``'s O(rules)
    sequential replace passes are too slow (ref tiktoken encode,
    extractContent.py:120-125).  Exactly fold-equivalent to
    :func:`token_count_bpe` / :func:`bpe_tokens_py` (property-tested);
    the per-Python-worker word cache persists across Arrow batches for
    the lifetime of the task."""
    from pyspark.sql.functions import pandas_udf

    if merges is None:
        from .bpe_vocab import BPE_MERGES_1K

        merges = BPE_MERGES_1K
    rank_of = {p: i for i, p in enumerate(merges)}
    # closure-held memo: each Python worker deserializes its own copy
    # once and keeps it across Arrow batches for the task's lifetime
    cache: dict[str, int] = {}

    @pandas_udf("long")
    def _count(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        return pd.Series(
            [
                None if t is None else bpe_tokens_py_fast(t, merges, rank_of, cache)
                for t in s
            ],
            dtype="Int64",
        )

    return _count(col)


def token_count_proxy(col: Column) -> Column:
    """length/4 — the classic planning proxy (ceil)."""
    return F.ceil(F.length(col) / F.lit(4.0)).cast("int")


def chunk_text_by_tokens(col: Column, max_tokens: int) -> Column:
    """Split into chunks of <= max_tokens whitespace tokens.

    Returns array<string>. Per-row (higher-order functions only) — the
    Spark analog of the reference's chunk_text (extractContent.py:127-133)
    minus the LLM context-limit motivation.
    """
    words = F.split(F.trim(col), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(max_tokens)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.array_join(
            F.slice(words, i * max_tokens + 1, max_tokens), " "
        ),
    )


# ---------------------------------------------------------------------------
# byte-level BPE (round 5): tiktoken-faithful alphabet + pre-tokenizer
# ---------------------------------------------------------------------------

# category-run pre-tokenizer, the regex-split shape of tiktoken's GPT-2
# pattern (letters / digits / other split apart so merges never bridge
# categories).  CASE-SENSITIVE — byte-level BPE is defined over raw
# UTF-8 bytes and tiktoken never case-folds (the word-level table above
# keeps its historical lowercased contract).
import re as _re_mod

_PRETOK_BYTES = _re_mod.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9]+")


def _norm_bytes(text: str) -> str:
    """ASCII-pinned whitespace collapse, NO case fold (see module doc
    of bpe_vocab_bytes; same \\s semantics as Java/RE2)."""
    return _re_mod.sub(r"[ \t\n\x0b\f\r]+", " ",
                       text.strip(" \t\n\x0b\f\r"))


def _hex_syms(pretok: str) -> list[str]:
    """Pre-token -> its UTF-8 bytes as uppercase hex pairs — the exact
    representation DuckDB's hex(encode(pt)) produces, so the SQL oracle
    folds literally the same strings."""
    hx = pretok.encode("utf-8").hex().upper()
    return [hx[i:i + 2] for i in range(0, len(hx), 2)]


def bpe_bytes_tokens_py(text: str, merges: list[tuple[str, str]] | None = None) -> int:
    """Slow fold twin of the byte-level count (property tests): per
    pre-token, rank-ordered left-to-right replace fold over delimited
    hex-pair symbols — str.replace, like :func:`bpe_tokens_py`."""
    if merges is None:
        from .bpe_vocab_bytes import BPE_MERGES_BYTES

        merges = BPE_MERGES_BYTES
    norm = _norm_bytes(text)
    total = 0
    for w in norm.split(" "):
        for pt in _PRETOK_BYTES.findall(w):
            s = "".join(_D + h + _D for h in _hex_syms(pt))
            for a, b in merges:
                s = s.replace(f"{_D}{a}{_D}{_D}{b}{_D}", f"{_D}{a}{b}{_D}")
            total += s.count(_D) // 2
    return total


def bpe_bytes_tokens_py_fast(text: str, merges: list[tuple[str, str]],
                             rank_of: dict[tuple[str, str], int],
                             cache: dict[str, int]) -> int:
    """Fast twin: per-PRE-TOKEN heap encode (:func:`_encode_word_ntok`
    runs unchanged over hex-pair symbol lists) with a memo — merges
    never cross pre-token boundaries, so the doc count is the sum of
    pre-token counts and Zipf reuse makes the cache hit rate ~1."""
    norm = _norm_bytes(text)
    if not norm:
        return 0
    total = 0
    for w in norm.split(" "):
        for pt in _PRETOK_BYTES.findall(w):
            n = cache.get(pt)
            if n is None:
                n = _encode_word_ntok(_hex_syms(pt), merges, rank_of)
                if len(cache) > 2_000_000:
                    cache.clear()
                cache[pt] = n
            total += n
    return total


def token_count_bpe_bytes_arrow(col: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """Arrow-vectorized BYTE-level BPE token count with the learned
    >=10k-merge vocab (functions/bpe_vocab_bytes.py) — the
    tiktoken-shaped production encoder (byte alphabet + regex
    pre-tokenizer + big learned vocab; ref extractContent.py:120-125).
    Exactly fold-equivalent to :func:`bpe_bytes_tokens_py`
    (property-tested); per-worker pre-token memo persists across Arrow
    batches."""
    from pyspark.sql.functions import pandas_udf

    if merges is None:
        from .bpe_vocab_bytes import BPE_MERGES_BYTES

        merges = BPE_MERGES_BYTES
    rank_of = {p: i for i, p in enumerate(merges)}
    cache: dict[str, int] = {}

    @pandas_udf("long")
    def _count(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        return pd.Series(
            [
                None if t is None
                else bpe_bytes_tokens_py_fast(t, merges, rank_of, cache)
                for t in s
            ],
            dtype="Int64",
        )

    return _count(col)
