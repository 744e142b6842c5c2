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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
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
