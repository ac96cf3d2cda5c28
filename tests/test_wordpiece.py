"""WordPiece tokenizer: hand-computed training known values (including a
score tie broken lexically), local==distributed trainer equivalence,
greedy longest-match encode semantics, UNK and decode contracts, and
per-document count/sequence reassembly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import wordpiece as wp


def _corpus(spark):
    # word counts: ab x3, abc x2, bc x1
    rows = [(1, "ab ab abc"), (2, "ab abc bc")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_known_values_with_score_tie(spark):
    """Hand-computed: round 0 picks (b, ##c) (score 1/3 beats 5/25 and
    2/15); round 1 is a genuine 0.2-vs-0.2 score tie between (a, ##b)
    and (##b, ##c), broken lexically ('##b' < 'a') to (##b, ##c)."""
    pieces = wp.wordpiece_train(_corpus(spark), num_merges=2, min_pair_freq=1)
    got = {(r["piece"], r["rank"]) for r in pieces.collect()}
    assert got == {
        ("a", -1), ("b", -1), ("##b", -1), ("##c", -1),
        ("bc", 0), ("##bc", 1),
    }


def test_local_equals_distributed_trainer(spark):
    df = _corpus(spark)
    local = wp.wordpiece_train(df, num_merges=3, min_pair_freq=1)
    dist = wp.wordpiece_train(df, num_merges=3, min_pair_freq=1, driver_vocab_cap=0)
    assert sorted(map(tuple, local.collect())) == sorted(map(tuple, dist.collect()))


def test_min_pair_freq_early_stop(spark):
    # every pair has frequency <= 5; min_pair_freq=6 learns nothing
    pieces = wp.wordpiece_train(_corpus(spark), num_merges=5, min_pair_freq=6)
    assert all(r["rank"] == -1 for r in pieces.collect())


def test_encode_greedy_longest_match_and_unk(spark):
    pieces = wp.wordpiece_train(_corpus(spark), num_merges=2, min_pair_freq=1)
    words = spark.createDataFrame(
        [("abc",), ("bc",), ("ab",), ("xyz",), ("bca",)], "word string"
    )
    got = {r["word"]: (list(r["toks"]), r["is_unk"])
           for r in wp.wordpiece_encode_words(words, pieces).collect()}
    assert got["abc"] == (["a", "##bc"], False)  # longest match at pos 1
    assert got["bc"] == (["bc"], False)
    assert got["ab"] == (["a", "##b"], False)
    assert got["xyz"] == (["[UNK]"], True)  # 'x' not in alphabet
    # 'bca': pos0 'bc' matches (len 2) but then '##a' is NOT in the vocab
    # (a only occurs word-initially in training) -> whole word UNKs: the
    # documented WordPiece all-or-nothing rule
    assert got["bca"] == (["[UNK]"], True)


def test_decode_roundtrip(spark):
    pieces = wp.wordpiece_train(_corpus(spark), num_merges=2, min_pair_freq=1)
    words = spark.createDataFrame([("abc",), ("ab",), ("bc",)], "word string")
    enc = wp.wordpiece_encode_words(words, pieces)
    out = {r["word"]: r["word_decoded"] for r in wp.wordpiece_decode(enc).collect()}
    assert out == {"abc": "abc", "ab": "ab", "bc": "bc"}


def test_token_counts_and_sequence_reassembly(spark):
    df = _corpus(spark)
    pieces = wp.wordpiece_train(df, num_merges=2, min_pair_freq=1)
    got = {r["id"]: r for r in wp.wordpiece_token_counts(df, pieces).collect()}
    # doc 1: "ab ab abc" -> [a ##b] [a ##b] [a ##bc]
    assert got[1]["n_words"] == 3
    assert got[1]["n_pieces"] == 6
    assert got[1]["n_unk_words"] == 0
    assert got[1]["pieces_text"] == "a ##b a ##b a ##bc"
    # doc 2: "ab abc bc" -> [a ##b] [a ##bc] [bc]
    assert got[2]["pieces_text"] == "a ##b a ##bc bc"
    assert got[2]["n_pieces"] == 5


def test_token_counts_keep_zero_row_for_empty_docs(spark):
    """Empty/NULL docs keep a zero row (posexplode_outer + left join) —
    the unigram_token_counts convention, so the tokenizer-stats API is
    consistent across the triad and drops no documents."""
    pieces = wp.wordpiece_train(_corpus(spark), num_merges=2, min_pair_freq=1)
    df = spark.createDataFrame(
        [(1, "ab ab abc"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in wp.wordpiece_token_counts(df, pieces).collect()}
    assert set(got) == {1, 2, 3, 4}
    for i in (2, 3, 4):
        assert (got[i]["n_words"], got[i]["n_pieces"], got[i]["n_unk_words"]) == (0, 0, 0)
        assert got[i]["pieces_text"] == ""


def test_alphabet_fallback_never_unks_training_words(spark):
    """Any word over the training alphabet segments (chars are rank -1
    pieces), so only words with unseen chars or unseen continuation
    positions can UNK."""
    df = _corpus(spark)
    pieces = wp.wordpiece_train(df, num_merges=0)
    words = spark.createDataFrame([("abcb",), ("cb",)], "word string")
    got = {r["word"]: r["is_unk"] for r in wp.wordpiece_encode_words(words, pieces).collect()}
    assert got["abcb"] is False
    # 'cb': 'c' never occurs word-initially in training -> UNK
    assert got["cb"] is True


def test_partition_independence(spark):
    df = _corpus(spark)
    a = sorted(map(tuple, wp.wordpiece_train(df, num_merges=2, min_pair_freq=1).collect()))
    b = sorted(map(tuple, wp.wordpiece_train(
        df.repartition(7), num_merges=2, min_pair_freq=1).collect()))
    assert a == b
