"""Distributed WordPiece subword tokenizer: likelihood-scored merge
training and greedy longest-match-first corpus encoding.

Schuster & Nakajima, "Japanese and Korean Voice Search", ICASSP 2012 —
the BERT-family tokenizer, and the third public subword family next to
BPE (`bpe.py`, frequency-argmax merges) and unigram-LM (`unigram.py`,
EM-pruned piece probabilities). WordPiece trains like BPE but scores a
candidate merge by pair likelihood gain, score(a,b) = freq(ab) /
(freq(a) * freq(b)) — merging symbols that co-occur MORE than their
unigram frequencies predict — and encodes with a different rule
entirely: greedy longest-match-first against the final vocabulary
(continuation pieces carry the '##' prefix; a word with no match at any
position becomes [UNK]).

Scale design is `bpe.py` trick for trick (see that module's docstring):
training touches only the (word, cnt) vocabulary after ONE corpus-wide
groupBy (`bpe.word_counts`); it runs in-memory under a bounded vocab
collect and distributed above it (per round: one symbol-frequency agg +
one pair agg + a broadcast-sized join + TakeOrdered argmax + in-row
merge fold, lineage cut per round), semantics identical and pinned by
test; encoding runs ONCE per distinct word in an Arrow-batched kernel
with the piece set in the closure (bounded by vocab_size, the
broadcast-a-bounded-model shape), and documents get token arrays back
via a hash join — the corpus never runs Python.

Determinism, load-bearing for the cross-engine gate and the
local==distributed pin: the merge argmax compares (score DESC, left,
right) with score the double freq/(fa*fb) built from identical longs in
both paths; greedy longest-match encoding is a pure function of the
piece set (ties are impossible — at a fixed position and length exactly
one candidate piece exists), so the `wordpiece_encode` gate replays it
verbatim in a DuckDB recursive CTE under a pinned piece table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts
from .text import norm_ws

UNK = "[UNK]"
CONT = "##"

DEFAULT_DRIVER_VOCAB_CAP = 1_000_000


def _seg_local(word: str) -> tuple:
    return tuple([word[0]] + [CONT + c for c in word[1:]])


def _merged_symbol(a: str, b: str) -> str:
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def _merge_word_local(syms: tuple, left: str, right: str) -> tuple:
    """Left-to-right non-overlapping merge (the bpe._merge_word_local rule,
    with the WordPiece '##'-stripping merged symbol)."""
    merged = _merged_symbol(left, right)
    out: list[str] = []
    pend: str | None = None
    for x in syms:
        if pend == left and x == right:
            out.append(merged)
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
) -> list[tuple[int, str, str, str, int]]:
    """In-memory WordPiece training over a collected (word, cnt) vocab.
    Scores mirror the distributed path bit for bit: the pair and symbol
    frequencies are exact longs, and the score double is ONE division of
    the exact freq by the exact product (float(f)/float(fa*fb) here ==
    Spark's Divide(long, long*long) — both round the exact operands once;
    symbol-frequency products above 2^63 would wrap in Spark and round
    here, far past any real corpus)."""
    segs: dict[str, tuple[tuple, int]] = {
        w: (_seg_local(w), int(c)) for w, c in vocab_rows
    }
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        sym_freq: dict[str, int] = {}
        for syms, c in segs.values():
            for s in syms:
                sym_freq[s] = sym_freq.get(s, 0) + c
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pair_freq[k] = pair_freq.get(k, 0) + c
        best = None
        for (a, b), f in pair_freq.items():
            if f < min_pair_freq:
                continue
            score = float(f) / float(sym_freq[a] * sym_freq[b])
            key = (-score, a, b)
            if best is None or key < best[0]:
                best = (key, a, b, f)
        if best is None:
            break
        _, a, b, f = best
        merges.append((rank, a, b, _merged_symbol(a, b), int(f)))
        segs = {
            w: (_merge_word_local(s, a, b), c) for w, (s, c) in segs.items()
        }
    return merges


def _seg_expr(word_col):
    """Column form of _seg_local: first char raw, rest '##'-prefixed."""
    chars = F.split(word_col, "")
    rest = F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0)))
    return F.concat(
        F.slice(chars, 1, 1),
        F.transform(rest, lambda c: F.concat(F.lit(CONT), c)),
    )


def _merge_fold_to(toks, left: str, right: str, merged: str):
    """bpe._merge_fold with an explicit merged symbol (WordPiece merges
    strip the right piece's '##'; BPE concatenates verbatim)."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        hit = acc["pend"].eqNullSafe(F.lit(left)) & (x == F.lit(right))
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.lit(merged))))
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


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_pair_freq: int = 2,
    driver_vocab_cap: int = DEFAULT_DRIVER_VOCAB_CAP,
) -> DataFrame:
    """Learn a WordPiece piece table: (piece, rank).

    rank -1 rows are the seed alphabet (every word-initial char and every
    '##'-continuation char in the corpus — always in the vocabulary, so
    encoding can fall back to characters); rank 0..n-1 are the learned
    merges in order. Early-stops when no remaining pair reaches
    `min_pair_freq`. Engine choice by vocabulary size, exactly as
    bpe_train (whose docstring records the measured rationale)."""
    wc = word_counts(df, text_col)
    merges: list[tuple[int, str, str, str, int]] | None = None
    spark = df.sparkSession
    if driver_vocab_cap and driver_vocab_cap > 0:
        head = wc.limit(driver_vocab_cap + 1).collect()
        if len(head) <= driver_vocab_cap:
            rows = [(r["word"], r["cnt"]) for r in head]
            merges = _train_local(rows, num_merges, min_pair_freq)
            alphabet = sorted({s for w, _ in rows for s in _seg_local(w)})
    if merges is None:
        vocab = wc.select(_seg_expr(F.col("word")).alias("syms"), "cnt")
        vocab = vocab.localCheckpoint(eager=True)
        alphabet = sorted(
            r["s"]
            for r in vocab.select(F.explode("syms").alias("s")).distinct().collect()
        )
        merges = []
        for rank in range(num_merges):
            exploded = vocab.select("syms", "cnt")
            sym = (
                exploded.select(F.explode("syms").alias("s"), "cnt")
                .groupBy("s")
                .agg(F.sum("cnt").alias("f"))
            )
            pairs = (
                exploded.select(
                    F.explode(
                        F.zip_with(
                            F.slice("syms", 1, F.size("syms") - 1),
                            F.slice("syms", 2, F.size("syms") - 1),
                            lambda a, b: F.struct(a.alias("left"), b.alias("right")),
                        )
                    ).alias("p"),
                    "cnt",
                )
                .groupBy("p.left", "p.right")
                .agg(F.sum("cnt").alias("freq"))
                .filter(F.col("freq") >= min_pair_freq)
            )
            # symbol table is vocab-alphabet-sized: broadcast both sides
            best = (
                pairs.join(
                    F.broadcast(sym.select(F.col("s").alias("left"), F.col("f").alias("fl"))),
                    "left",
                )
                .join(
                    F.broadcast(sym.select(F.col("s").alias("right"), F.col("f").alias("fr"))),
                    "right",
                )
                .withColumn("score", F.col("freq") / (F.col("fl") * F.col("fr")))
                .orderBy(F.desc("score"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, f = best[0]["left"], best[0]["right"], best[0]["freq"]
            merges.append((rank, a, b, _merged_symbol(a, b), int(f)))
            vocab = vocab.select(
                _merge_fold_to(F.col("syms"), a, b, _merged_symbol(a, b)).alias("syms"),
                "cnt",
            ).localCheckpoint(eager=True)
    # the same surface string can be merged twice via different pairs
    # (e.g. 'a'+'##bc' and 'ab'+'##c' both yield 'abc' once both parents
    # exist) — keep the first rank so `piece` is unique in the table
    # (encoding is set-based and wouldn't care, but a keyed table should
    # not carry duplicate keys)
    seen: dict[str, int] = {p: -1 for p in alphabet}
    for m in merges:
        seen.setdefault(m[3], m[0])
    return spark.createDataFrame(
        sorted(seen.items(), key=lambda kv: (kv[1], kv[0])),
        "piece string, rank long",
    )


def _encode_word(word: str, pieces: frozenset, max_raw: int) -> list[str]:
    """Greedy longest-match-first WordPiece encoding of one word. max_raw
    bounds the raw-character length tried per step (longest piece content
    in the vocabulary) — the standard O(n * max_piece_len) scan."""
    out: list[str] = []
    pos, n = 0, len(word)
    while pos < n:
        take = None
        for ln in range(min(n - pos, max_raw), 0, -1):
            cand = word[pos : pos + ln] if pos == 0 else CONT + word[pos : pos + ln]
            if cand in pieces:
                take = (cand, ln)
                break
        if take is None:
            return [UNK]
        out.append(take[0])
        pos += take[1]
    return out


def wordpiece_encode_words(vocab: DataFrame, pieces: DataFrame) -> DataFrame:
    """(word, toks array<string>, n_tokens, is_unk) for every distinct
    word; the piece set rides in the kernel closure (bounded by the
    vocabulary-size hyperparameter)."""
    import pandas as pd

    pset = frozenset(r["piece"] for r in pieces.select("piece").collect())
    max_raw = max(
        (len(p) - len(CONT) if p.startswith(CONT) else len(p) for p in pset),
        default=1,
    )

    def kern(batches):
        for pdf in batches:
            toks = [_encode_word(w, pset, max_raw) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": toks,
                    "n_tokens": [len(t) for t in toks],
                    "is_unk": [t == [UNK] for t in toks],
                }
            )

    return vocab.select("word").mapInPandas(
        kern, "word string, toks array<string>, n_tokens long, is_unk boolean"
    )


def wordpiece_token_counts(
    df: DataFrame,
    pieces: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document WordPiece stats: (id, n_words, n_pieces, n_unk_words,
    pieces_text) with pieces_text the document's full space-joined piece
    sequence in token order — encode each DISTINCT word once, hash-join
    back, reassemble via the sorted-struct trick (pack_texts' shape). The
    corpus never runs Python. Empty/NULL docs keep a zero row
    (posexplode_outer + left join — the unigram_token_counts convention,
    so the tokenizer-stats API drops no documents anywhere)."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(
            F.filter(F.split(norm_ws(text_col), " "), lambda w: F.length(w) > 0)
        ).alias("pos", "word"),
    )
    enc = wordpiece_encode_words(
        words.filter(F.col("word").isNotNull()).select("word").distinct(), pieces
    )
    joined = words.join(
        enc.select("word", F.array_join("toks", " ").alias("ptxt"), "n_tokens", "is_unk"),
        "word",
        "left",
    )
    return joined.groupBy("id").agg(
        F.count("word").cast("long").alias("n_words"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_pieces"),
        F.coalesce(F.sum(F.col("is_unk").cast("long")), F.lit(0))
        .cast("long")
        .alias("n_unk_words"),
        F.array_join(
            F.transform(
                # when() leaves the outer-join padding row NULL and
                # collect_list skips NULLs, so an empty doc reassembles to ''
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("word").isNotNull(), F.struct("pos", "ptxt"))
                    )
                ),
                lambda s: s["ptxt"],
            ),
            " ",
        ).alias("pieces_text"),
    )


def wordpiece_decode(
    df: DataFrame, toks_col: str = "toks", out_col: str = "word_decoded"
) -> DataFrame:
    """Strip '##' continuations and concatenate — lossless for any input
    encoded without [UNK]. Word boundaries (adjacent non-continuation
    pieces) decode back to spaces, so a whole document's piece stream
    decodes in one pass."""
    joined = F.array_join(F.col(toks_col), " ")
    return df.withColumn(out_col, F.regexp_replace(joined, " " + CONT, ""))
