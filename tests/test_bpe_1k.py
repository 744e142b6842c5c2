"""The production-size BPE path (verdict r3 task 4).

The learned 1200-merge vocab (functions/bpe_vocab.py, trained by
tools/gen_bpe_vocab.py with exact greedy BPE — the tiktoken training
algorithm; ref extractContent.py:120-125 counts with tiktoken) is
encoded on the big-table path by token_count_bpe_arrow: per-word
heap-driven fold that visits only ranks whose pair occurs, plus a
per-worker word memo.  Its contract is EXACT equivalence with the
naive rank-ordered replace fold (bpe_tokens_py), which in turn is
engine-exact with the chained-replace JVM/DuckDB folds.  These tests
pin that equivalence chain at 1k-vocab scale.
"""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from tackle4losscontentextraction_spark.functions import tokens as tok_fn
from tackle4losscontentextraction_spark.functions.bpe_vocab import BPE_MERGES_1K

RANK_OF = {p: i for i, p in enumerate(BPE_MERGES_1K)}


def test_vocab_shape_and_validity():
    assert len(BPE_MERGES_1K) >= 1000
    assert len(set(BPE_MERGES_1K)) == len(BPE_MERGES_1K)
    # no merge may contain a space (word-level decomposition invariant)
    # or the \x01 symbol delimiter
    assert all(" " not in a + b and "\x01" not in a + b for a, b in BPE_MERGES_1K)
    # every side is derivable: a single character or a product of an
    # earlier merge — i.e. the table is a valid BPE vocabulary, not an
    # arbitrary pair list
    known = set()
    for a, b in BPE_MERGES_1K:
        for side in (a, b):
            assert len(side) == 1 or side in known, (a, b, side)
        known.add(a + b)


def test_fast_encoder_equals_naive_fold_random_corpus():
    rng = random.Random(20260817)
    # alphabet biased toward merge-heavy chars plus hostile extras
    alpha = "etaoinshrdlu bcfgjkmpqvwxyz0147.,()'-*`\\   \xdf"
    cache: dict[str, int] = {}
    for trial in range(400):
        n = rng.randint(0, 120)
        s = "".join(rng.choice(alpha) for _ in range(n))
        if trial % 7 == 0:
            s = "  \t" + s + " \n"
        want = tok_fn.bpe_tokens_py(s, BPE_MERGES_1K)
        got = tok_fn.bpe_tokens_py_fast(s, BPE_MERGES_1K, RANK_OF, cache)
        assert got == want, repr(s)


def test_fast_encoder_equals_naive_fold_english():
    words = [
        "the", "extraction", "partition", "shuffle", "throughput",
        "tokenization", "aaaaaa", "zq", "spark-native", "100tb", "don't",
    ]
    rng = random.Random(7)
    cache: dict[str, int] = {}
    for _ in range(100):
        s = " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        assert tok_fn.bpe_tokens_py_fast(
            s, BPE_MERGES_1K, RANK_OF, cache
        ) == tok_fn.bpe_tokens_py(s, BPE_MERGES_1K)


def test_three_engines_agree_at_1k(spark):
    """Catalyst HOF fold (F.aggregate — flat expression, JVM loop),
    the Arrow word-cache path, and the Python naive fold must agree on
    the same rows at the full 1200-rule table."""
    rng = random.Random(99)
    words = ["the", "query", "extract", "merge", "(c,", "a'b", "table4",
             "scan", "windowing", "zzz", " odd"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 25))))
        for i in range(40)
    ] + [(40, ""), (41, "   "), (42, "\t\n")]
    df = spark.createDataFrame(rows, "i int, s string")
    got = df.select(
        "i",
        tok_fn.token_count_bpe_hof(F.col("s"), BPE_MERGES_1K).alias("n_hof"),
        tok_fn.token_count_bpe_arrow(F.col("s")).alias("n_arrow"),
    ).collect()
    by_i = {r.i: r for r in got}
    for i, s in rows:
        want = tok_fn.bpe_tokens_py(s, BPE_MERGES_1K)
        assert by_i[i].n_hof == want, (i, repr(s), "hof")
        assert by_i[i].n_arrow == want, (i, repr(s), "arrow")


def test_arrow_path_nulls(spark):
    df = spark.createDataFrame([(1, None), (2, "the the")], "i int, s string")
    got = {r.i: r.n for r in df.select(
        "i", tok_fn.token_count_bpe_arrow(F.col("s")).alias("n")).collect()}
    assert got[1] is None
    assert got[2] == 2  # "the" merges to a single token
