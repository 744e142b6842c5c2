"""Byte-level BPE (VERDICT r4 task 3): tiktoken-shaped alphabet +
pre-tokenizer + >=10k learned merges (functions/bpe_vocab_bytes.py,
trained by tools/gen_bpe_vocab.py --bytes).

Contract chain, as for the 1k word-level path: the Arrow fast encoder
(heap over hex-pair byte symbols + pre-token memo) is EXACTLY
equivalent to the naive rank-ordered replace fold
(bpe_bytes_tokens_py), which is what the DuckDB oracle replays over
hex(encode(pre_token)) at sf0.01 (driver row `token_count_bpe`,
column n_bpe_10k).
"""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from tackle4losscontentextraction_spark.functions import tokens as tok_fn
from tackle4losscontentextraction_spark.functions.bpe_vocab_bytes import (
    BPE_MERGES_BYTES,
    N_MERGES,
)

RANK_OF = {p: i for i, p in enumerate(BPE_MERGES_BYTES)}


def test_vocab_shape_and_validity():
    assert N_MERGES >= 10_000
    assert len(BPE_MERGES_BYTES) == N_MERGES
    assert len(set(BPE_MERGES_BYTES)) == N_MERGES
    hexchars = set("0123456789ABCDEF")
    known: set[str] = set()
    for a, b in BPE_MERGES_BYTES:
        # symbols are non-empty even-length uppercase hex
        for side in (a, b):
            assert side and len(side) % 2 == 0 and set(side) <= hexchars
            # derivable: a single byte or the product of an earlier merge
            assert len(side) == 2 or side in known, (a, b, side)
        known.add(a + b)


def test_no_merge_crosses_a_pretoken_boundary():
    """Every merged symbol must decode to bytes that stay inside ONE
    category run ([a-zA-Z]+ / [0-9]+ / other) — the invariant that lets
    all engines count per distinct pre-token."""
    for a, b in BPE_MERGES_BYTES:
        raw = bytes.fromhex(a + b)
        try:
            s = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue  # partial multi-byte sequence: "other" run by construction
        kinds = {
            "alpha" if c.isascii() and c.isalpha()
            else "digit" if c.isascii() and c.isdigit()
            else "other"
            for c in s
        }
        assert len(kinds) == 1, (a, b, s)
        assert " " not in s


def test_fast_encoder_equals_naive_fold_random():
    rng = random.Random(20260818)
    alpha = "etaoinSHRDLU bcfgjkmpqvwxyz0147.,()'-*`\\   \xdfé中"
    cache: dict[str, int] = {}
    for trial in range(300):
        n = rng.randint(0, 100)
        s = "".join(rng.choice(alpha) for _ in range(n))
        if trial % 7 == 0:
            s = "  \t" + s + " \n"
        want = tok_fn.bpe_bytes_tokens_py(s)
        got = tok_fn.bpe_bytes_tokens_py_fast(s, BPE_MERGES_BYTES, RANK_OF, cache)
        assert got == want, repr(s)


def test_case_sensitivity_and_category_split():
    # the byte path never case-folds: different byte sequences may
    # tokenize differently (and must both round through the encoder)
    cache: dict[str, int] = {}
    for s in ["The THE the", "Spark2026!", "a1b2c3", "CamelCaseRuns"]:
        assert tok_fn.bpe_bytes_tokens_py_fast(
            s, BPE_MERGES_BYTES, RANK_OF, cache
        ) == tok_fn.bpe_bytes_tokens_py(s)
    # category runs split: letters|digits|punct are separate pre-tokens,
    # so "abc123" can never be fewer than 2 tokens
    assert tok_fn.bpe_bytes_tokens_py("abc123") >= 2


def test_corpus_frequent_words_compress():
    """The learned vocab must actually compress: corpus-frequent words
    reach a single token, and realistic prose lands well under
    1 token/char (the chunk-planning realism the 10k vocab buys)."""
    for w in ["the", "table", "merge", "filter", "spark"]:
        assert tok_fn.bpe_bytes_tokens_py(w) == 1, w
    prose = ("the extraction pipeline scans the table and filters each "
             "partition before the merge")
    n = tok_fn.bpe_bytes_tokens_py(prose)
    assert n <= len(prose.split()) * 2
    assert n >= len(prose.split()) // 2


def test_multibyte_utf8_tokenizes_as_bytes():
    # 3-byte CJK char alone: its bytes form one "other" pre-token;
    # count is >=1 and the fast/naive paths agree
    cache: dict[str, int] = {}
    for s in ["中文", "café", "ééé", "emoji \U0001f600 end"]:
        want = tok_fn.bpe_bytes_tokens_py(s)
        assert want >= 1
        assert tok_fn.bpe_bytes_tokens_py_fast(
            s, BPE_MERGES_BYTES, RANK_OF, cache) == want


def test_arrow_path_agrees_and_handles_nulls(spark):
    rng = random.Random(5)
    words = ["The", "query", "Extract", "merge", "(c,", "a'b", "table4",
             "scan", "WINDOWING", "zzz", "café"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 25))))
        for i in range(30)
    ] + [(30, ""), (31, "   "), (32, None)]
    df = spark.createDataFrame(rows, "i int, s string")
    got = {r.i: r.n for r in df.select(
        "i", tok_fn.token_count_bpe_bytes_arrow(F.col("s")).alias("n")
    ).collect()}
    for i, s in rows:
        if s is None:
            assert got[i] is None
        else:
            assert got[i] == tok_fn.bpe_bytes_tokens_py(s), (i, repr(s))
