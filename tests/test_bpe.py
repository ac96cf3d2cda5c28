"""BPE trainer/encoder tests: exact comparison against a from-scratch
pure-Python reference implementation of the Sennrich'16 algorithm, plus
roundtrip and composition properties."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline import bpe
from eth2dgraph_spark.pipeline.bpe import END


def _ref_merge_word(toks: tuple, left: str, right: str) -> tuple:
    out, pend = [], None
    for x in toks:
        if pend == left and x == right:
            out.append(left + right)
            pend = None
        else:
            if pend is not None:
                out.append(pend)
            pend = x
    if pend is not None:
        out.append(pend)
    return tuple(out)


def _ref_train(word_counts: dict[str, int], num_merges: int, min_pair_freq: int = 2):
    vocab = {tuple(list(w) + [END]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += c
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_pair_freq:
            break
        merges.append((rank, left, right, freq))
        vocab = {_ref_merge_word(t, left, right): c for t, c in vocab.items()}
    return merges


def _spark_train(spark, word_counts: dict[str, int], num_merges: int, cap: int = 0):
    # one doc per word occurrence keeps the corpus->vocab aggregation honest;
    # cap=0 forces the DISTRIBUTED loop so the reference comparison tests
    # the Spark path, not the driver-side twin of itself
    rows = [(i, w) for i, w in enumerate(
        w for w, c in sorted(word_counts.items()) for _ in range(c)
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe.bpe_train(df, num_merges=num_merges, driver_vocab_cap=cap)
    return df, [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in got.orderBy("rank").collect()
    ]


def test_bpe_train_matches_reference_classic_corpus(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    _, got = _spark_train(spark, wc, num_merges=8)
    assert got == _ref_train(wc, 8)
    # sanity on the classic example: 'est' family dominates ('es' first:
    # freq 9 beats 'lo' 7 and ties resolve lexicographically)
    assert (got[0][1], got[0][2]) == ("e", "s") and got[0][3] == 9


def test_bpe_train_matches_reference_randomized(spark):
    rng = random.Random(64)
    for trial in range(3):
        words = {
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7))): rng.randint(1, 9)
            for _ in range(25)
        }
        _, got = _spark_train(spark, words, num_merges=12)
        assert got == _ref_train(words, 12), f"trial {trial} diverged"


def test_bpe_local_and_distributed_paths_agree(spark):
    """The driver-side and distributed training loops are the same
    algorithm: identical merge tables on the same corpus."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "abba": 4}
    _, dist = _spark_train(spark, wc, num_merges=10, cap=0)
    _, local = _spark_train(spark, wc, num_merges=10, cap=1_000_000)
    assert dist == local


def test_bpe_encode_roundtrip_and_train_consistency(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "a": 4}
    df, merges_list = _spark_train(spark, wc, num_merges=10)
    merges = bpe.bpe_train(df, num_merges=10)
    vocab = bpe.word_counts(df)
    enc = {r["word"]: list(r["toks"]) for r in bpe.bpe_encode_words(vocab, merges).collect()}
    assert set(enc) == set(wc)
    for w, toks in enc.items():
        # lossless: concatenating tokens reproduces word + end marker
        assert "".join(toks) == w + END
        # encode agrees with applying the trained merges in rank order
        ref = tuple(list(w) + [END])
        for _, left, right, _f in merges_list:
            ref = _ref_merge_word(ref, left, right)
        assert toks == list(ref)


def test_bpe_token_counts_per_doc(spark):
    df = spark.createDataFrame(
        [(1, "aa aa ab"), (2, "aa"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(df, num_merges=3, min_pair_freq=2)
    out = {r["id"]: r for r in bpe.bpe_token_counts(df, merges).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_words"] == 3 and out[2]["n_words"] == 1
    # empty/NULL text keeps a zero row, not a missing one
    assert out[3]["n_words"] == 0 and out[3]["n_bpe_tokens"] == 0
    assert out[4]["n_words"] == 0 and out[4]["n_bpe_tokens"] == 0
    # counts equal the sum of the words' own encodings
    enc = {
        r["word"]: r["n_tokens"]
        for r in bpe.bpe_encode_words(bpe.word_counts(df), merges).collect()
    }
    assert out[1]["n_bpe_tokens"] == 2 * enc["aa"] + enc["ab"]
    assert out[2]["n_bpe_tokens"] == enc["aa"]


def test_bpe_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "the lowest low"), (2, "newest estates")], "doc_id long, text string"
    )
    merges = bpe.bpe_train(df, num_merges=6)
    words = df.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word")
    )
    enc = bpe.bpe_encode_words(words.select("word").distinct(), merges)
    dec = bpe.bpe_decode(enc, "toks")
    for r in dec.collect():
        assert r["text_decoded"] == r["word"]


def test_bpe_counts_feed_greedy_pack(spark):
    """Composition: real BPE token counts drive sequence packing — the
    end-to-end path a training-data pipeline actually runs."""
    from eth2dgraph_spark.pipeline import pack

    df = spark.createDataFrame(
        [(i, "aa ab ba bb " * (i + 1)) for i in range(6)], "doc_id long, text string"
    )
    merges = bpe.bpe_train(df, num_merges=4)
    counts = bpe.bpe_token_counts(df, merges)
    packed = pack.greedy_pack(
        counts.select(F.col("id").alias("doc_id"), "n_bpe_tokens"),
        token_col="n_bpe_tokens",
        budget=64,
        num_shards=2,
    )
    rows = packed.collect()
    assert len(rows) == 6
    # offsets within a pack are unique and bounded by the budget
    seen = set()
    for r in rows:
        key = (r["shard"], r["pack_id"], r["pack_offset"])
        assert key not in seen
        seen.add(key)
        assert 0 <= r["pack_offset"] < 64


def test_bpe_merge_fold_nonoverlap_rule(spark):
    df = spark.createDataFrame([(["a", "a", "a", END],)], "toks array<string>")
    got = df.select(bpe._merge_fold(F.col("toks"), "a", "a").alias("m")).collect()[0]["m"]
    assert got == ["aa", "a", END]


def test_priority_greedy_equals_rank_sequential_on_trained_tables():
    """The bpe_encode oracle applies the pinned merges in RANK ORDER (one
    left-to-right non-overlap pass each) while the kernel runs the
    priority-greedy loop. On VALID tables — every operand a single char
    or an earlier merge's product, which training guarantees — the two
    agree; pin that on randomized trained tables so the oracle's
    rank-sequential form can never silently diverge from the kernel."""
    rng = random.Random(20260815)
    for trial in range(30):
        vocab = "abcdef"[: rng.randint(2, 6)]
        words = [
            "".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
            for _ in range(rng.randint(5, 60))
        ]
        counts = Counter(words)
        merges = bpe._train_local(
            list(counts.items()), num_merges=rng.randint(1, 30), min_pair_freq=2
        )
        ranks = {(l, r): k for k, l, r, _ in merges}
        for w in set(words):
            seq = tuple(list(w) + [END])
            for _, l, r, _ in merges:
                seq = bpe._merge_word_local(seq, l, r)
            assert list(seq) == bpe._encode_word(w, ranks), (trial, w, merges)
