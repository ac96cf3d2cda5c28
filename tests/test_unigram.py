"""Unigram-LM tokenizer (pipeline/unigram.py): Viterbi vs brute-force
enumeration, local == distributed trainer equality (the bpe pattern),
coverage/termination invariants, round-trip, and the token-count frame
contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import unigram


def _brute_best(word, logp):
    """All 2^(n-1) segmentations, best by (score desc, n asc) — the spec
    the DP must match."""
    n = len(word)
    best = None
    for mask in range(1 << max(0, n - 1)):
        cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(p not in logp for p in pieces):
            continue
        s = 0.0
        for p in pieces:  # left-to-right, the DP's accumulation order
            s += logp[p]
        key = (-s, len(pieces))
        if best is None or key < best[0]:
            best = (key, pieces)
    return best


def test_viterbi_matches_bruteforce():
    logp = {
        "a": -1.0, "b": -2.0, "c": -2.5, "ab": -2.6, "bc": -3.9,
        "abc": -6.1, "ca": -3.0, "aa": -1.9,
    }
    for word in ["a", "ab", "abc", "aabca", "cab", "aaaa", "bcab", "x", "axb"]:
        pieces, s, n = unigram._viterbi(word, logp, 3)
        want = _brute_best(word, logp)
        if want is None:
            assert pieces == [] and n == 0 and s == float("-inf")
        else:
            (negs, wn), wp = want
            assert pieces == wp, word
            assert n == wn
            assert s == pytest.approx(-negs, abs=1e-12)
            assert "".join(pieces) == word  # round-trip


def test_train_local_equals_distributed(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog " * 2 + f"tail{i % 5}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(vocab_size=50, max_piece_len=4, seed_size=120, em_iters=2)
    local = {
        r["piece"]: r["logp"] for r in unigram.unigram_train(df, **kw).collect()
    }
    dist = {
        r["piece"]: r["logp"]
        for r in unigram.unigram_train(df, driver_vocab_cap=0, **kw).collect()
    }
    assert set(local) == set(dist)
    for p in local:
        assert local[p] == pytest.approx(dist[p], abs=1e-12)


def test_single_chars_never_pruned(spark):
    df = spark.createDataFrame(
        [(0, "abcabc xyz xyz abab")], "doc_id long, text string"
    )
    # vocab_size below the char count: trainer stops at the char floor
    # instead of looping or dropping coverage
    pieces = {
        r["piece"] for r in unigram.unigram_train(
            df, vocab_size=2, seed_size=30, em_iters=1
        ).collect()
    }
    for ch in "abcxyz":
        assert ch in pieces


def test_probabilities_normalized(spark):
    df = spark.createDataFrame(
        [(i, "some words repeat words some more") for i in range(5)],
        "doc_id long, text string",
    )
    rows = unigram.unigram_train(df, vocab_size=30, seed_size=60).collect()
    total = sum(math.exp(r["logp"]) for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)


def test_encode_words_round_trip_and_oov(spark):
    pieces = spark.createDataFrame(
        [("h", -1.0), ("i", -1.2), ("hi", -1.5), ("ho", -2.0)],
        "piece string, logp double",
    )
    words = spark.createDataFrame(
        [("hi",), ("hihi",), ("hox",)], "word string"
    )
    got = {r["word"]: r for r in unigram.unigram_encode_words(words, pieces).collect()}
    assert got["hi"]["toks"] == ["hi"] and got["hi"]["n_pieces"] == 1
    assert "".join(got["hihi"]["toks"]) == "hihi"
    # 'x' is not in the vocabulary: NULL toks, zero pieces, NULL logp
    assert got["hox"]["toks"] is None and got["hox"]["n_pieces"] == 0
    assert got["hox"]["logp"] is None


def test_token_counts_empty_doc_zero_row(spark):
    pieces = spark.createDataFrame(
        [("a", -0.5), ("b", -1.0)], "piece string, logp double"
    )
    df = spark.createDataFrame(
        [(0, "ab ab"), (1, ""), (2, None)], "doc_id long, text string"
    )
    got = {r["id"]: r for r in unigram.unigram_token_counts(df, pieces).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["n_words"] == 2 and got[0]["n_pieces"] == 4
    assert got[0]["logp_sum"] == pytest.approx(-3.0, abs=1e-12)
    for i in (1, 2):
        assert got[i]["n_words"] == 0 and got[i]["n_pieces"] == 0
        assert got[i]["logp_sum"] is None


def test_fewer_pieces_win_on_tied_score(spark):
    # 'aa' as one piece ties 'a'+'a' when logp(aa) == 2*logp(a): the
    # deterministic tie-break must pick the single piece
    logp = {"a": -1.0, "aa": -2.0}
    pieces, s, n = unigram._viterbi("aa", logp, 2)
    assert pieces == ["aa"] and n == 1 and s == pytest.approx(-2.0)
