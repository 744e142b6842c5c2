"""Generate the vendored >=1k-entry BPE merge table (functions/bpe_vocab.py).

The reference counts tokens with tiktoken's learned vocabulary
(reference extractContent.py:120-125); that vocab is a network download
and is not available offline, so we LEARN a deterministic merge table
with the standard BPE training loop (Sennrich et al. 2016, the same
algorithm tiktoken's vocabs were built with) over a corpus that ships
with the repo:

  - the repo's own English prose (README.md + SURVEY.md, ~54 KB) for
    natural-language digraph statistics, and
  - the synthetic testdata word list (the ~30 words the driver's
    documents.parquet is built from) so corpus-frequent words compress
    to single tokens.

Training is exact greedy BPE: count adjacent symbol pairs across the
word-frequency table, merge the most frequent pair everywhere
(left-to-right, non-overlapping — the same scan order the encoder
uses), repeat.  Ties break deterministically on (count desc, pair
lexicographic), so the output is a pure function of the committed
corpus files.

Run:  python tools/gen_bpe_vocab.py [n_merges]   (default 1200)
Writes tackle4losscontentextraction_spark/functions/bpe_vocab.py.

Byte-level mode (round 5):
  python tools/gen_bpe_vocab.py --bytes [n_merges]   (default 10000)
Writes tackle4losscontentextraction_spark/functions/bpe_vocab_bytes.py —
a tiktoken-style BYTE-level vocabulary: each pre-token (category runs
[a-z]+ / [0-9]+ / other within a word, the regex-pre-tokenizer shape of
tiktoken's GPT-2 pattern) is UTF-8 encoded and its BYTES are the
initial symbols, represented as uppercase hex pairs so the DuckDB
oracle (hex(encode(w))) and the Python/Arrow encoders share one exact
string representation.  Training is the same exact greedy loop, made
O(merges log pairs) with a lazy max-heap + per-pair word index so a
>=10k-merge vocab trains in seconds.  The corpus adds the remaining
committed prose files — byte-level needs richer digraph statistics
than the word-level table.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_FILES = ["README.md", "SURVEY.md"]
# the testdata documents vocabulary (TESTDATA.md: driver-synthesised
# query-plan words) — repeated so these words win early single-token
# merges, like corpus-frequent words do in a real learned vocab.
TESTDATA_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window join group filter select the a of and to in is"
).split()
OUT = os.path.join(
    REPO, "tackle4losscontentextraction_spark", "functions", "bpe_vocab.py"
)


def corpus_words() -> Counter:
    """word -> frequency, normalized exactly like the encoder input
    (lowercase, ASCII-whitespace collapse, split on space)."""
    freq: Counter = Counter()
    for fn in CORPUS_FILES:
        with open(os.path.join(REPO, fn), encoding="utf-8") as f:
            text = f.read()
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip(" \t\n\x0b\f\r").lower())
        freq.update(norm.split(" "))
    for w in TESTDATA_WORDS:
        freq[w] += 200
    freq.pop("", None)
    return freq


def _merge_word(sym: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Left-to-right non-overlapping merge of (a,b) -> a+b (the scan
    order of str.replace / java replace / duckdb replace)."""
    out = []
    i = 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train(n_merges: int) -> list[tuple[str, str]]:
    freq = corpus_words()
    segs: dict[str, tuple[str, ...]] = {w: tuple(w) for w in freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, sym in segs.items():
            f = freq[w]
            for p in zip(sym, sym[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, sym in segs.items():
            for i in range(len(sym) - 1):
                if sym[i] == a and sym[i + 1] == b:
                    segs[w] = _merge_word(sym, a, b)
                    break
    return merges


# ---------------------------------------------------------------------------
# byte-level mode
# ---------------------------------------------------------------------------

BYTES_CORPUS_MD = ["README.md", "SURVEY.md", "SNIPPETS.md", "BASELINE.md",
                   "TESTDATA.md", "FIXTURES.md", "COVERAGE.md", "PAPERS.md",
                   "VERDICT.md", "ADVICE.md", "PROGRESS.jsonl"]


def bytes_corpus_files() -> list[str]:
    """The committed byte-level training corpus: the repo's prose docs
    plus its own source tree (a prose+code mix, like the corpora real
    byte-level vocabs are trained on — 60 KB of markdown alone tops
    out near 3.7k merges).  The generated vocab modules themselves are
    excluded so regeneration is a fixed point; sorted for determinism."""
    files = list(BYTES_CORPUS_MD)
    for sub in ("tackle4losscontentextraction_spark", "tests", "tools", "jobs"):
        for root, _dirs, names in os.walk(os.path.join(REPO, sub)):
            for n in names:
                if n.endswith(".py") and not n.startswith("bpe_vocab"):
                    files.append(os.path.relpath(os.path.join(root, n), REPO))
    return sorted(set(files))
OUT_BYTES = os.path.join(
    REPO, "tackle4losscontentextraction_spark", "functions", "bpe_vocab_bytes.py"
)
# tiktoken-style category runs — CASE-SENSITIVE, unlike the word-level
# table's lowercased contract: byte-level BPE is defined over the raw
# bytes (tiktoken never case-folds), and case variants double the
# distinct-pre-token set the vocab can learn from.
# Imported from the encoder so training and encoding can never drift:
# the vocab is trained with THIS split and applied with tokens.py's —
# they must be the same compiled object, not a copy.
from tackle4losscontentextraction_spark.functions.tokens import (  # noqa: E402
    _PRETOK_BYTES as _PRETOK,
    _norm_bytes,
)


def corpus_pretokens() -> Counter:
    """pre-token -> frequency over the byte-level corpus, normalized
    and split exactly like the encoder input (ASCII-ws collapse — NO
    case fold, see _PRETOK — space split, category-run pre-tokenize)."""
    freq: Counter = Counter()
    for fn in bytes_corpus_files():
        with open(os.path.join(REPO, fn), encoding="utf-8") as f:
            text = f.read()
        norm = _norm_bytes(text)
        for w in norm.split(" "):
            for pt in _PRETOK.findall(w):
                freq[pt] += 1
    for w in TESTDATA_WORDS:
        for pt in _PRETOK.findall(w):
            freq[pt] += 200
    return freq


def train_bytes(n_merges: int) -> list[tuple[str, str]]:
    """Exact greedy BPE over byte (hex-pair) symbols — identical merge
    selection to :func:`train` (count desc, pair lexicographic asc;
    left-to-right non-overlapping application) but O(merges log pairs):
    a lazy max-heap over pair counts plus a pair -> containing-words
    index, so each merge touches only the words it occurs in."""
    import heapq
    from collections import defaultdict

    freq = corpus_pretokens()
    words: list[list] = []  # [symbols, freq]
    for pt, f in sorted(freq.items()):
        hx = pt.encode("utf-8").hex().upper()
        words.append([[hx[i:i + 2] for i in range(0, len(hx), 2)], f])

    counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (syms, f) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] += f
            where[p].add(idx)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = counts.get(best, 0)
        if cur <= 0:
            continue
        if -negc != cur:  # stale entry: re-queue at the live count
            heapq.heappush(heap, (-cur, best))
            continue
        merges.append(best)
        a, b = best
        touched: set[tuple[str, str]] = set()
        for idx in sorted(where[best]):
            syms, f = words[idx]
            if len(syms) < 2:
                continue
            for p in zip(syms, syms[1:]):
                counts[p] -= f
                touched.add(p)
            new = list(_merge_word(tuple(syms), a, b))
            words[idx][0] = new
            for p in zip(new, new[1:]):
                counts[p] += f
                where[p].add(idx)
                touched.add(p)
        counts.pop(best, None)
        where.pop(best, None)
        for p in touched:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
            else:
                counts.pop(p, None)
    return merges


def write_bytes_vocab(n: int) -> None:
    merges = train_bytes(n)
    corpus = bytes_corpus_files()
    h = hashlib.md5()
    for fn in corpus:
        with open(os.path.join(REPO, fn), "rb") as f:
            h.update(f.read())
    # packed format: entries "A.B" space-separated, wrapped lines — the
    # table is DATA (like tiktoken's .tiktoken files), not code
    entries = [f"{a}.{b}" for a, b in merges]
    lines, cur = [], []
    width = 0
    for e in entries:
        if width + len(e) + 1 > 76 and cur:
            lines.append(" ".join(cur))
            cur, width = [], 0
        cur.append(e)
        width += len(e) + 1
    if cur:
        lines.append(" ".join(cur))
    body = "\n".join(lines)
    out = (
        '"""Vendored BYTE-level BPE merge table (generated — do not hand-edit).\n'
        "\n"
        "Learned by tools/gen_bpe_vocab.py --bytes (exact greedy BPE) over the\n"
        f"committed corpus ({len(corpus)} files: repo docs + source tree)\n"
        f"(md5 {h.hexdigest()[:12]}) plus the testdata word list; the byte-level,\n"
        "regex-pre-tokenized analogue of tiktoken's downloaded vocab (reference\n"
        "extractContent.py:120-125).  Symbols are UTF-8 bytes as uppercase hex\n"
        "pairs — the exact representation DuckDB's hex(encode(w)) produces, so\n"
        "all three engines fold the same strings.  Rank order = training order\n"
        '= encode priority.  Packed as data: entries "A.B", space-separated."""\n'
        "\n"
        f"N_MERGES = {len(merges)}\n"
        "\n"
        '_DATA = """\\\n' + body + '"""\n'
        "\n"
        "BPE_MERGES_BYTES: list[tuple[str, str]] = [\n"
        '    tuple(e.split("."))  # type: ignore[misc]\n'
        "    for e in _DATA.split()\n"
        "]\n"
        "assert len(BPE_MERGES_BYTES) == N_MERGES\n"
    )
    with open(OUT_BYTES, "w", encoding="utf-8") as f:
        f.write(out)
    print(f"wrote {len(merges)} byte-level merges to {OUT_BYTES}")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if "--bytes" in args:
        args.remove("--bytes")
        write_bytes_vocab(int(args[0]) if args else 10000)
        return
    n = int(args[0]) if args else 1200
    merges = train(n)
    h = hashlib.md5()
    for fn in CORPUS_FILES:
        with open(os.path.join(REPO, fn), "rb") as f:
            h.update(f.read())
    lines = [
        '"""Vendored BPE merge table (generated — do not hand-edit).',
        "",
        "Learned by tools/gen_bpe_vocab.py (exact greedy BPE training) over",
        f"the committed corpus {CORPUS_FILES} (md5 {h.hexdigest()[:12]}) plus",
        "the testdata word list; stands in for tiktoken's downloaded vocab",
        "(reference extractContent.py:120-125).  Rank order = training",
        'order = encode priority."""',
        "",
        "BPE_MERGES_1K: list[tuple[str, str]] = [",
    ]
    for a, b in merges:
        lines.append(f"    ({a!r}, {b!r}),")
    lines.append("]")
    lines.append("")
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
