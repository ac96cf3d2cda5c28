"""Unigram-LM subword tokenizer (SentencePiece family): seed → EM →
prune training and Viterbi corpus encoding.

Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates", ACL 2018 — the OTHER public
subword family next to BPE (`pipeline/bpe.py`): instead of learning a
merge sequence, fit a unigram language model over a piece vocabulary
(seed with frequent substrings, EM-estimate piece probabilities, prune
the least useful pieces, repeat until the target vocabulary size), then
encode by Viterbi-segmenting each word into its most probable piece
sequence. This module implements the deterministic HARD-EM (Viterbi-EM)
variant: the E-step counts pieces of each word's single best
segmentation instead of forward-backward expected counts — the standard
simplification, chosen here because it is exactly reproducible across
engines (the soft E-step's float lattice sums are not), which is what
lets tests pin local == distributed and lets the encode gate replay the
same DP in SQL.

Scale design mirrors bpe.py, trick for trick:
- the ONLY corpus-wide pass is `bpe.word_counts` (one groupBy); training
  touches the vocabulary-scale (word, cnt) frame from then on;
- the piece table is BOUNDED by seed_size (a hyperparameter) — it lives
  in kernel closures / the driver, the broadcast-a-bounded-model shape;
- per EM round the distributed path runs ONE Arrow-batched Viterbi pass
  over distinct words + one groupBy(piece) sum, collecting only
  piece-table-sized count rows (the classifier bounded-collect
  discipline); vocabularies under `driver_vocab_cap` train fully
  in-memory instead (per-round Spark job latency dwarfs vocab-scale
  work — the measured bpe_train rationale), identical semantics pinned
  by test;
- encoding the corpus encodes each DISTINCT word once, then hash-joins
  the token stats back (the bpe_token_counts shape) — documents never
  run Python.

Viterbi tie-break, load-bearing for determinism: maximize total logp,
then fewest pieces, comparing (score, -n) left to right as doubles —
both engines build candidate scores with identical operand order, so
the (score, n_pieces) pair per word is engine-portable (the
`unigram_encode` gate hash-matches it against a recursive-CTE DP in
DuckDB under a pinned piece table).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts

DEFAULT_MAX_PIECE_LEN = 4
DEFAULT_SEED_SIZE = 2000
DEFAULT_PRUNE_FRACTION = 0.25
DEFAULT_DRIVER_VOCAB_CAP = 1_000_000


def _viterbi(word: str, logp: dict[str, float], max_len: int):
    """Best segmentation of `word` into pieces: (pieces, score, n).
    dp over end positions; candidates compared by (score desc, n asc) —
    ties beyond that cannot occur in the OUTPUT pair. Unsegmentable
    words (a char absent from the vocabulary) return ([], -inf, 0)."""
    n = len(word)
    NEG = float("-inf")
    score = [NEG] * (n + 1)
    npc = [0] * (n + 1)
    back = [0] * (n + 1)
    score[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if score[j] == NEG:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            s = score[j] + lp
            c = npc[j] + 1
            if s > score[i] or (s == score[i] and c < npc[i]):
                score[i], npc[i], back[i] = s, c, j
    if score[n] == NEG:
        return [], NEG, 0
    pieces = []
    i = n
    while i > 0:
        pieces.append(word[back[i] : i])
        i = back[i]
    return pieces[::-1], score[n], npc[n]


def _seed_local(vocab: list[tuple[str, int]], max_len: int, seed_size: int):
    """Seed piece counts: every substring of every word up to max_len,
    weighted by word count; keep ALL single chars (coverage is mandatory
    — a droppable char would make some word unsegmentable forever) plus
    the top (seed_size - n_chars) longer substrings by (count desc,
    piece asc)."""
    counts: dict[str, int] = {}
    for w, c in vocab:
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_len, len(w)) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    longer = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    return {**chars, **dict(longer)}


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    tot = sum(counts.values())
    return {p: math.log(c / tot) for p, c in counts.items() if c > 0}


def _train_local(
    vocab: list[tuple[str, int]],
    vocab_size: int,
    max_len: int,
    seed_size: int,
    em_iters: int,
    prune_fraction: float,
) -> dict[str, float]:
    """Pure-driver trainer — also the test reference (bpe._train_local
    pattern). Rounds of (em_iters hard-EM steps, prune) until the piece
    table is down to vocab_size."""
    logp = _normalize({p: float(c) for p, c in _seed_local(vocab, max_len, seed_size).items()})
    while True:
        for _ in range(em_iters):
            cnt: dict[str, float] = {}
            for w, c in vocab:
                pieces, _, _ = _viterbi(w, logp, max_len)
                for p in pieces:
                    cnt[p] = cnt.get(p, 0.0) + float(c)
            logp = _em_mstep(logp, cnt)
        if len(logp) <= vocab_size:
            return logp
        pruned = _prune(logp, vocab_size, prune_fraction)
        if len(pruned) == len(logp):
            # only single chars remain and they exceed vocab_size: chars
            # are never droppable (coverage invariant), so this is final
            return logp
        logp = pruned


def _em_mstep(logp: dict[str, float], cnt: dict[str, float]) -> dict[str, float]:
    """M-step: renormalize hard counts. Unused single chars stay with a
    floor count (coverage invariant); unused longer pieces drop."""
    kept = {p: c for p, c in cnt.items() if c > 0}
    for p in logp:
        if len(p) == 1 and p not in kept:
            kept[p] = 0.5  # floor: rare chars must stay segmentable
    return _normalize(kept)


def _prune(logp: dict[str, float], vocab_size: int, fraction: float) -> dict[str, float]:
    """Drop the lowest-probability longer pieces (never single chars):
    floor(fraction * n_longer) of them, at least enough progress to
    terminate, stopping exactly at vocab_size when closer than that."""
    chars = {p for p in logp if len(p) == 1}
    longer = sorted(
        ((p, lp) for p, lp in logp.items() if len(p) > 1),
        key=lambda kv: (kv[1], kv[0]),
    )
    n_drop = max(1, int(len(longer) * fraction))
    n_drop = min(n_drop, max(0, len(logp) - vocab_size), len(longer))
    dropped = {p for p, _ in longer[:n_drop]}
    return {p: lp for p, lp in logp.items() if p not in dropped or p in chars}


def _distinct_word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    return word_counts(df, text_col)


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
    seed_size: int = DEFAULT_SEED_SIZE,
    em_iters: int = 2,
    prune_fraction: float = DEFAULT_PRUNE_FRACTION,
    driver_vocab_cap: int = DEFAULT_DRIVER_VOCAB_CAP,
) -> DataFrame:
    """Learn unigram-LM pieces: (piece, logp) with logp the fitted log
    probability. Deterministic end to end (hard EM, string tie-breaks).

    Engine choice by vocabulary size, exactly bpe_train's rule: the
    corpus-scale pass is always word_counts; when the (word, cnt) vocab
    fits the driver the EM loop runs in-memory, otherwise each E-step is
    one distributed Viterbi pass over the persisted vocab + one bounded
    groupBy(piece) collect (piece table <= seed_size rows by
    construction). Both paths share _em_mstep/_prune — semantics
    identical, pinned by test."""
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    wc = _distinct_word_vocab(df, text_col)
    if driver_vocab_cap and driver_vocab_cap > 0:
        head = wc.limit(driver_vocab_cap + 1).collect()
        if len(head) <= driver_vocab_cap:
            logp = _train_local(
                [(r["word"], int(r["cnt"])) for r in head],
                vocab_size, max_piece_len, seed_size, em_iters, prune_fraction,
            )
            return spark.createDataFrame(
                sorted(logp.items()), "piece string, logp double"
            )
    vocab = wc.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # seed counts, distributed: in-row substring explode (bounded
        # max_len * len(word) pieces per word), groupBy piece. Single
        # chars all kept; longer pieces cut to seed_size by TakeOrdered.
        w = F.col("word")
        starts = F.sequence(F.lit(0), F.length(w) - 1)
        subs = F.flatten(
            F.transform(
                starts,
                lambda i: F.transform(
                    F.sequence(
                        F.lit(1), F.least(F.lit(max_piece_len), F.length(w) - i)
                    ),
                    lambda ln: F.substring(w, (i + 1).cast("int"), ln.cast("int")),
                ),
            )
        )
        pc = (
            vocab.select(F.explode(subs).alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("double").alias("c"))
        )
        chars = pc.filter(F.length("piece") == 1).collect()
        n_chars = len(chars)
        longer = (
            pc.filter(F.length("piece") > 1)
            .orderBy(F.desc("c"), F.asc("piece"))
            .limit(max(0, seed_size - n_chars))
            .collect()
        )
        counts = {r["piece"]: float(r["c"]) for r in [*chars, *longer]}
        logp = _normalize(counts)
        while True:
            for _ in range(em_iters):
                cnt_rows = _estep_counts(vocab, logp, max_piece_len).collect()
                logp = _em_mstep(logp, {r["piece"]: float(r["c"]) for r in cnt_rows})
            if len(logp) <= vocab_size:
                break
            pruned = _prune(logp, vocab_size, prune_fraction)
            if len(pruned) == len(logp):
                break  # char-only floor reached (see local path)
            logp = pruned
    finally:
        vocab.unpersist()
    return spark.createDataFrame(sorted(logp.items()), "piece string, logp double")


def _estep_counts(vocab: DataFrame, logp: dict[str, float], max_len: int) -> DataFrame:
    """(piece, c): hard-EM expected counts — Viterbi-segment every
    distinct word (Arrow-batched, piece table in closure), weight by the
    word's corpus count, sum per piece. Emits piece-level partials from
    each partition, so the groupBy moves <= seed_size rows/partition."""
    import pandas as pd

    def kern(batches):
        acc: dict[str, float] = {}
        for pdf in batches:
            for word, c in zip(pdf["word"], pdf["cnt"]):
                pieces, _, _ = _viterbi(word, logp, max_len)
                for p in pieces:
                    acc[p] = acc.get(p, 0.0) + float(c)
        yield pd.DataFrame({"piece": list(acc), "c": list(acc.values())})

    return (
        vocab.select("word", "cnt")
        .mapInPandas(kern, "piece string, c double")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
    )


def unigram_encode_words(words: DataFrame, pieces: DataFrame) -> DataFrame:
    """(word, toks array<string>, n_pieces, logp) for every distinct
    word — Viterbi under the fitted piece table (collected into the
    kernel closure: bounded by vocab_size). Unsegmentable words keep
    NULL toks / n_pieces 0 / NULL logp (they surface, not crash: at
    encode time an out-of-vocabulary CHARACTER is data, the
    lsh_bucket-null convention)."""
    import pandas as pd

    logp = {r["piece"]: float(r["logp"]) for r in pieces.collect()}
    max_len = max((len(p) for p in logp), default=1)

    def kern(batches):
        for pdf in batches:
            toks, ns, lps = [], [], []
            for word in pdf["word"]:
                pc, s, n = _viterbi(word, logp, max_len)
                if n == 0:
                    toks.append(None)
                    ns.append(0)
                    lps.append(None)
                else:
                    toks.append(pc)
                    ns.append(n)
                    lps.append(s)
            yield pd.DataFrame(
                {"word": pdf["word"], "toks": toks, "n_pieces": ns, "logp": lps}
            )

    return words.select("word").mapInPandas(
        kern, "word string, toks array<string>, n_pieces long, logp double"
    )


def unigram_token_counts(
    df: DataFrame,
    pieces: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram-LM stats: (id, n_words, n_pieces, logp_sum).
    Encodes each DISTINCT word once, joins back, sums per doc — the
    bpe_token_counts shape; empty/NULL docs keep a zero row."""
    from .text import norm_ws

    words = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.filter(F.split(norm_ws(text_col), " "), lambda w: F.length(w) > 0)
        ).alias("word"),
    )
    encoded = unigram_encode_words(
        words.filter(F.col("word").isNotNull()).select("word").distinct(), pieces
    )
    return (
        words.join(encoded.select("word", "n_pieces", "logp"), "word", "left")
        .groupBy("id")
        .agg(
            F.count("word").cast("long").alias("n_words"),
            F.coalesce(F.sum("n_pieces"), F.lit(0)).cast("long").alias("n_pieces"),
            F.sum("logp").alias("logp_sum"),
        )
    )
