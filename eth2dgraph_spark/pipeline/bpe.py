"""Distributed BPE subword tokenizer: merge-table training and corpus
encoding (Sennrich, Haddow & Birch, "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016 — the public byte-pair-encoding
algorithm every modern LLM tokenizer family descends from).

Scale design — the two standard tricks, both load-bearing at 100 TB:

- **Train on the word vocabulary, not the corpus** (Sennrich's own
  pre-aggregation): pair statistics are identical whether computed over
  every token occurrence or over (distinct word, count) rows, and the
  distinct-word table is vocabulary-scale (millions of rows) while the
  corpus is petabyte-scale. One corpus-wide groupBy builds it; every
  training iteration after that touches only the persisted vocab table.
- **Encode the vocabulary, then join** : encoding is per-word and
  words repeat, so the Python merge loop (the genuinely sequential part
  BPE forces — greedy rank-ordered merges per word) runs ONCE per
  distinct word in an Arrow-batched kernel with the merge table in the
  closure, and docs get their token arrays back via a hash join on the
  word. The per-doc reassembly is pure column math.

Training itself only ever touches the (word, cnt) vocabulary, so it
picks its engine by vocabulary size: in-memory on the driver when the
vocab fits a bounded collect (fixed per-round Spark job latency dwarfs
the real work on vocab-scale frames), distributed when it doesn't. The
distributed loop runs one job per iteration over the persisted vocab
frame: pair counts -> argmax (orderBy+limit(1), a TakeOrdered, with a
deterministic (freq desc, left, right) tiebreak) -> in-row merge fold.
The merge fold is a pure column `aggregate` (left-to-right greedy,
matching the reference algorithm's non-overlapping semantics: 'aaa'
under merge (a,a) -> [aa, a]); the re-tokenized frame is
localCheckpoint'ed each round so expression trees and lineage stay O(1)
across iterations, exactly the connected-components discipline in
graph/__init__.py. The two paths are semantics-identical, pinned by
test.

Training is iterative-by-nature (each merge depends on the previous
argmax), so there is no ANSI-SQL oracle; correctness is pinned instead
by a from-scratch pure-Python reference implementation in
tests/test_bpe.py, compared exactly on randomized corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import norm_ws

# classic Sennrich end-of-word marker: keeps "low" in "lowest" and "low"
# as distinct merge contexts, and makes decode unambiguous
END = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace-normalized text — the vocabulary-scale
    training frame. The ONLY corpus-wide pass in BPE training."""
    return (
        df.select(F.explode(F.split(norm_ws(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _chars_with_end(word_col):
    """Initial tokenization: unicode chars + the end-of-word marker."""
    return F.concat(F.split(word_col, ""), F.array(F.lit(END)))


def _merge_fold(toks, left: str, right: str):
    """Left-to-right greedy merge of adjacent (left, right) -> left+right
    inside a token array, as a pure column fold. The accumulator carries
    (out, pend): `pend` is the previous unmerged token; when (pend, cur)
    is the merge pair they fuse and pend clears — so 'aaa' under (a, a)
    becomes [aa, a], the reference algorithm's non-overlap rule."""
    merged = F.lit(left + right)
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        hit = acc["pend"].eqNullSafe(F.lit(left)) & (x == F.lit(right))
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(merged)))
            .otherwise(
                F.when(
                    acc["pend"].isNotNull(), F.concat(acc["out"], F.array(acc["pend"]))
                ).otherwise(acc["out"])
            )
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(x).alias("pend"),
        )

    def finish(acc):
        return F.when(
            acc["pend"].isNotNull(), F.concat(acc["out"], F.array(acc["pend"]))
        ).otherwise(acc["out"])

    return F.aggregate(toks, acc0, step, finish)


def _merge_word_local(toks: tuple, left: str, right: str) -> tuple:
    """Driver-side twin of _merge_fold (same left-to-right non-overlap
    rule); the local/distributed equivalence is pinned by test."""
    out: list[str] = []
    pend: str | None = None
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


def _train_local(
    vocab_rows: list[tuple[str, int]], num_merges: int, min_pair_freq: int
) -> list[tuple[int, str, str, int]]:
    """In-memory Sennrich training over a collected (word, cnt) vocab —
    identical argmax/tiebreak/merge semantics to the distributed loop."""
    vocab = {tuple(list(w) + [END]): int(c) for w, c in vocab_rows}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                pairs[k] = pairs.get(k, 0) + c
        if not pairs:
            break
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < min_pair_freq:
            break
        merges.append((rank, left, right, freq))
        vocab = {
            _merge_word_local(t, left, right): c for t, c in vocab.items()
        }
    return merges


DEFAULT_DRIVER_VOCAB_CAP = 1_000_000


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_pair_freq: int = 2,
    driver_vocab_cap: int = DEFAULT_DRIVER_VOCAB_CAP,
) -> DataFrame:
    """Learn a BPE merge table: (rank, left, right, freq), rank 0 first.

    Stops early when the best remaining pair's frequency drops below
    `min_pair_freq` (merging singletons memorizes the corpus). Ties on
    frequency break deterministically by (left, right) string order, so
    the merge table is reproducible across runs and partitionings.

    Engine choice by vocabulary size: the corpus-scale pass is always
    `word_counts` (one distributed groupBy); training itself only ever
    touches the (word, cnt) vocabulary. When that vocabulary fits the
    driver (<= driver_vocab_cap rows — a bounded collect in the
    sketch.py sense: vocab rows, never corpus rows), the merge loop runs
    in-memory, because each distributed round costs two fixed-latency
    Spark jobs that dwarf the actual work on vocab-scale frames
    (measured at sf0.1: 31-word vocab, ~0.6 s/round of pure job
    overhead, 24 rounds = 14 s for microseconds of computation). Vocabs
    over the cap run the distributed loop below — identical semantics,
    equivalence pinned by test."""
    wc = word_counts(df, text_col)
    if driver_vocab_cap and driver_vocab_cap > 0:
        head = wc.limit(driver_vocab_cap + 1).collect()
        if len(head) <= driver_vocab_cap:
            spark = df.sparkSession
            return spark.createDataFrame(
                _train_local(
                    [(r["word"], r["cnt"]) for r in head], num_merges, min_pair_freq
                ),
                "rank long, left string, right string, freq long",
            )
    vocab = wc.select(_chars_with_end(F.col("word")).alias("toks"), "cnt")
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("left"), b.alias("right")),
                )
            ).alias("p"),
            "cnt",
        )
        best = (
            pairs.groupBy("p.left", "p.right")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["freq"] < min_pair_freq:
            break
        left, right, freq = best[0]["left"], best[0]["right"], best[0]["freq"]
        merges.append((rank, left, right, int(freq)))
        # re-tokenize in-row, then cut lineage: without the per-round
        # checkpoint the fold expressions nest num_merges deep
        vocab = vocab.select(
            _merge_fold(F.col("toks"), left, right).alias("toks"), "cnt"
        ).localCheckpoint(eager=True)
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "rank long, left string, right string, freq long"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-ordered BPE encode of one word (the reference
    algorithm): repeatedly merge the best-ranked adjacent pair."""
    toks = list(word) + [END]
    while len(toks) > 1:
        pairs = [(ranks.get((toks[i], toks[i + 1])), i) for i in range(len(toks) - 1)]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        r, i = min(ranked)
        toks[i : i + 2] = [toks[i] + toks[i + 1]]
    return toks


def bpe_encode_words(vocab: DataFrame, merges: DataFrame) -> DataFrame:
    """(word, toks array<string>, n_tokens) for every distinct word. The
    merge table is collected into the kernel closure — it is bounded by
    num_merges (a training hyperparameter, thousands at most), the same
    broadcast-a-bounded-model shape as importance.ngram_model."""
    import pandas as pd

    ranks = {
        (r["left"], r["right"]): int(r["rank"])
        for r in merges.select("rank", "left", "right").collect()
    }

    def kern(batches):
        for pdf in batches:
            toks = [_encode_word(w, ranks) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return vocab.select("word").mapInPandas(
        kern, "word string, toks array<string>, n_tokens long"
    )


def bpe_token_counts(
    df: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token count: (id, n_words, n_bpe_tokens). Encodes
    each DISTINCT word once (vocabulary-scale Python), then one hash join
    back to the exploded corpus and a per-doc sum — the corpus itself
    never runs Python. Docs with no words (empty/NULL text) keep a row
    with zeros."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.filter(F.split(norm_ws(text_col), " "), lambda w: F.length(w) > 0)
        ).alias("word"),
    )
    encoded = bpe_encode_words(
        words.filter(F.col("word").isNotNull()).select("word").distinct(), merges
    )
    return (
        words.join(encoded.select("word", "n_tokens"), "word", "left")
        .groupBy("id")
        .agg(
            F.count("word").cast("long").alias("n_words"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )

def bpe_decode(df: DataFrame, toks_col: str = "toks", out_col: str = "text_decoded") -> DataFrame:
    """Inverse of encoding for a token array: concatenate and turn the
    end-of-word markers back into spaces. Lossless against the
    whitespace-normalized text the tokenizer saw (pure column math)."""
    joined = F.array_join(F.col(toks_col), "")
    return df.withColumn(
        out_col, F.trim(F.regexp_replace(joined, F.lit(END), F.lit(" ")))
    )
