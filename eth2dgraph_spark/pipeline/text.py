"""Text analysis for large-scale training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All four are pure column expressions (JVM-side, whole-stage codegen) — no
Python in the hot path, so they scan-rate-bound at 100 TB. Each returns the
input plus derived columns so they compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deliberately deterministic and SQL-expressible (the DuckDB oracle runs the
# same scoring) — a real deployment would swap in fastText via mapInPandas.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
}

_WS = r"\s+"


def norm_ws(text_col: str):
    """Lower, trim, collapse whitespace — THE content-identity
    normalization. `fingerprint()` here and `dedup._norm_text` both
    delegate to this single definition: `curate_increment`'s anti-join
    equivalence (incremental == one-shot curation) requires the two
    fingerprints to stay byte-identical forever."""
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " ")


def md5_60bit(col):
    """First 15 hex chars of md5 as a long: 60 bits, exact under conv()
    (16 chars could overflow signed int64). Shared by fingerprint64 and
    dedup's shingle hashing."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    """Whitespace tokenization into an array column."""
    return df.withColumn(out_col, F.split(F.trim(F.col(text_col)), _WS))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (chars/4 is the common transformer rule of thumb, blended with word
    count — deterministic, no tokenizer dependency)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), _WS))
    chars = F.length(text_col)
    return (
        df.withColumn("n_tokens_ws", ws)
        .withColumn("n_tokens_bpe_est", F.ceil(chars / F.lit(4.0)).cast("long"))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio, mean word
    length, and a composite [0,1] score — the C4/Gopher-style cheap filters."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.size(F.split(F.trim(t), _WS))
    # \p{L}\p{N} not \w: Java's \w is ASCII-only, so a clean Cyrillic or
    # Greek document would count EVERY letter as punctuation, score 0.2,
    # and be silently dropped by curate_corpus' quality floor. \p{L}/\p{N}
    # have the same semantics in RE2, keeping the DuckDB oracle identical.
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\p{L}\p{N}_\s]", ""))
    all_stop = [w for ws in LANG_STOPWORDS.values() for w in ws]
    words = F.split(F.lower(F.trim(t)), _WS)
    n_stop = F.size(F.filter(words, lambda w: w.isin(all_stop)))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    mean_word_len = (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1))
    score = (
        F.when(n_words < 5, 0.0)
        .when(punct_ratio > 0.3, 0.2)
        .otherwise(
            F.least(
                F.lit(1.0),
                F.lit(0.5) + stop_ratio + F.when((mean_word_len >= 3) & (mean_word_len <= 10), 0.2).otherwise(0.0),
            )
        )
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("quality_score", score)
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID by stopword voting: per language, count distinct stopword
    hits in the token set; argmax wins, 'und' (undetermined) when no hits.
    Deterministic tie-break by language code order."""
    words = F.split(F.lower(F.trim(F.col(text_col))), _WS)
    out = df
    for lang, stops in LANG_STOPWORDS.items():
        out = out.withColumn(
            f"_hits_{lang}", F.size(F.array_intersect(words, F.array(*[F.lit(s) for s in stops])))
        )
    langs = sorted(LANG_STOPWORDS)
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in langs:  # later langs must beat strictly -> first-wins tie-break
        h = F.col(f"_hits_{lang}")
        best = F.when(h > best_hits, F.lit(lang)).otherwise(best)
        best_hits = F.when(h > best_hits, h).otherwise(best_hits)
    out = out.withColumn("lang_pred", best).withColumn("lang_hits", best_hits)
    return out.drop(*[f"_hits_{lang}" for lang in langs])


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: the word-level duplication ratio
    (1 - distinct/total) and the coverage of the single most frequent word
    — high values mark boilerplate/spam documents that survive the basic
    quality score. Pure column math, no explode and no shuffle.

    The top-word frequency is the longest equal-run in the SORTED word
    array, folded with one `aggregate` pass — O(n log n) per row. (The
    naive transform-over-distinct x filter form is O(n^2) per row: a single
    100k-token document would cost ~10^10 comparisons in one task, which no
    cluster parallelism can absorb.)"""
    words = F.split(F.lower(F.trim(F.col(text_col))), _WS)
    n = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    # longest run in the sorted array == max multiplicity; one linear fold
    top_freq = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(acc["prev"].isNull() | (acc["prev"] != w), F.lit(1))
            .otherwise(acc["run"] + 1)
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNull() | (acc["prev"] != w), F.lit(1)).otherwise(
                    acc["run"] + 1
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    # +1e-9 before rounding: integer-ratio values can land exactly on the
    # 6-dp rounding boundary (e.g. k/512 word ratios), where engines with
    # different tie rules disagree by one final-digit ulp; the nudge puts
    # every engine on the same side (see __spark_entry__._r6e)
    return (
        df.withColumn(
            "dup_word_ratio",
            F.round((n - n_distinct) / F.greatest(n, F.lit(1)) + F.lit(1e-9), 6),
        )
        .withColumn(
            "top_word_ratio",
            F.round(
                F.coalesce(top_freq, F.lit(0)) / F.greatest(n, F.lit(1)) + F.lit(1e-9),
                6,
            ),
        )
    )


# PII patterns: deliberately conservative, anchored shapes (emails, E.164-ish
# phone numbers, 16-digit card-like runs, IPv4). Pure regexp_replace column
# expressions — JVM-side, codegen-friendly, zero Python in the hot path.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # digit-run lookarounds: without them the phone class matches the
    # FIRST 11-13 digits inside any longer digit run — a bare 16-digit
    # card became '<PHONE>111' (3 card digits leaked past redaction) and
    # arbitrary numeric ids got corrupted. Lookbehind is fine here: this
    # pattern runs in Spark (Java regex); only email/ipv4 are oracle-gated
    # (RE2 has no lookbehind).
    "phone": r"(?<!\d)\+?\d{1,3}[-. (]{0,2}\d{3}[-. )]{0,2}\d{3}[-. ]?\d{4}(?!\d)",
    "card": r"\b(?:\d[ -]?){15}\d\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII scrubbing (the redaction pass of a training-data pipeline):
    replace each pattern class with a typed placeholder token and count the
    redactions per class, so downstream filters can drop PII-dense documents
    and audits can report exactly what was removed. Patterns apply in dict
    order; counts are computed BEFORE that class's replacement (on the text
    as already redacted by earlier classes, so overlapping classes don't
    double-count)."""
    patterns = patterns or PII_PATTERNS
    out = df
    acc = F.col(text_col)
    total = F.lit(0).cast("long")
    for name, pat in patterns.items():
        # split on the pattern yields matches+1 parts; null text counts 0
        n_matches = (
            F.when(acc.isNull(), F.lit(0))
            .otherwise(F.size(F.split(acc, pat)) - F.lit(1))
            .cast("long")
        )
        out = out.withColumn(f"n_{name}", n_matches)
        total = total + F.col(f"n_{name}")
        acc = F.regexp_replace(acc, pat, f"<{name.upper()}>")
    return out.withColumn(out_col, acc).withColumn("n_pii_total", total)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text (content-defined identity for exact dedup; same `norm_ws` as
    dedup._norm_text), plus a 60-bit prefix usable as a cheap
    shard/join key."""
    fp = F.md5(norm_ws(text_col))
    return df.withColumn("fingerprint", fp).withColumn(
        "fingerprint64", F.conv(F.substring(fp, 1, 15), 16, 10).cast("long")
    )


# ---------------------------------------------------------------------------
# Cross-document boilerplate-passage removal (the CCNet/RefinedWeb-style
# paragraph-dedup pass): a passage that recurs across many DISTINCT documents
# (headers, navigation chrome, license blurbs, templated footers) is dropped
# from EVERY document, while each document's unique prose is kept. This is a
# different axis from whole-document dedup (pipeline/dedup.py) and from
# within-document repetition stats (repetition_stats above).


def passage_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
) -> DataFrame:
    """(id, pidx, ph) rows: md5 per passage, where a passage is a
    non-overlapping window of `window` whitespace tokens (the tail keeps its
    short remainder). Token windows rather than newline paragraphs so the
    pass also works on token-stream corpora; split on a real delimiter
    upstream and set window high to get paragraph semantics.

    Scale shape: every passage is built IN-ROW from pure column expressions
    (split -> sequence -> slice -> array_join -> md5) — no explode-then-
    regroup shuffle to assemble windows; the exploded output carries only
    (id, pidx, 32-hex ph), so everything shuffled downstream is keyed on the
    16-byte digest, never on passage text."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = F.split(F.trim(F.col(text_col)), _WS)
    npass = F.greatest(F.ceil(F.size(toks) / F.lit(window)).cast("int"), F.lit(1))
    passages = F.transform(
        F.sequence(F.lit(0), npass - F.lit(1)),
        lambda i: F.struct(
            i.cast("long").alias("pidx"),
            F.md5(F.array_join(F.slice(toks, i * window + 1, window), " ")).alias("ph"),
        ),
    )
    return df.select(F.col(id_col).alias("id"), F.explode(passages).alias("p")).select(
        "id", "p.pidx", "p.ph"
    )


def boilerplate_passage_hashes(passages: DataFrame, max_docs: int = 100) -> DataFrame:
    """(ph, doc_freq) for passages appearing in MORE than `max_docs`
    distinct documents — the boilerplate set. Document frequency (not
    occurrence count) so a passage repeated inside one document is never
    boilerplate by itself; that case is repetition_stats' job."""
    return (
        passages.groupBy("ph")
        .agg(F.countDistinct("id").alias("doc_freq"))
        .filter(F.col("doc_freq") > max_docs)
    )


def passage_drop_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    max_docs: int = 100,
) -> DataFrame:
    """Per-document audit of what drop_boilerplate_passages would do:
    (id_col, n_passages, n_dropped). Run this first to tune `max_docs`;
    the oracle-gated form of this operator family.

    The passage frame is intentionally NOT persisted: it is a pure
    projection of the input (recompute = one extra scan-bound pass), and
    at corpus scale caching a frame comparable to the corpus costs more
    than the rescan — the opposite trade from dedup's shingle frames,
    which feed a multi-stage pipeline."""
    p = passage_hashes(df, id_col, text_col, window)
    hot = boilerplate_passage_hashes(p, max_docs).select("ph", F.lit(1).alias("_hot"))
    return (
        p.join(hot, "ph", "left")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.coalesce(F.col("_hot"), F.lit(0))).cast("long").alias("n_dropped"),
        )
    )


def drop_boilerplate_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_clean",
    window: int = 50,
    max_docs: int = 100,
) -> DataFrame:
    """Input plus `out_col` (the text with boilerplate passages removed,
    remaining passages re-joined in order) and `n_passages_dropped`. A
    document that is ALL boilerplate keeps an empty string (filter on
    n_passages_dropped / length downstream to drop it entirely).

    The kept-index list per document is bounded by the document's own
    passage count (len(text)/window), so the collect_list buffer is
    per-doc-sized, never corpus-sized; the rebuild slices the ORIGINAL
    token array in-row, so passage text itself is never shuffled."""
    p = passage_hashes(df, id_col, text_col, window)
    hot = boilerplate_passage_hashes(p, max_docs)
    kept = p.join(hot.select("ph"), "ph", "left_anti")
    keep_idx = kept.groupBy("id").agg(F.sort_array(F.collect_list("pidx")).alias("_keep"))
    keep_idx = keep_idx.select(F.col("id").alias("_bp_id"), "_keep")
    toks = F.split(F.trim(F.col(text_col)), _WS)
    npass = F.greatest(F.ceil(F.size(toks) / F.lit(window)).cast("int"), F.lit(1))
    keep = F.coalesce(F.col("_keep"), F.array().cast("array<bigint>"))
    rebuilt = F.array_join(
        F.flatten(
            F.transform(keep, lambda i: F.slice(toks, i.cast("int") * window + 1, window))
        ),
        " ",
    )
    return (
        df.join(keep_idx, df[id_col] == F.col("_bp_id"), "left")
        .withColumn(out_col, rebuilt)
        .withColumn("n_passages_dropped", (npass.cast("long") - F.size(keep)).cast("long"))
        .drop("_bp_id", "_keep")
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing: Local
# Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS scheme).
# Where `fingerprint` above identifies whole documents and substring.py
# finds EXACT duplicated spans, winnowing selects a position-robust SAMPLE
# of k-gram hashes (the rightmost minimum of every w-hash window) whose
# guarantee is the point: any shared run of w + k - 1 tokens between two
# documents shares at least one selected fingerprint. That makes the
# fingerprint sets joinable for partial-overlap detection at a fraction of
# the all-k-grams volume (expected density 2/(w+1)).
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    hash64: str = "md5",
) -> DataFrame:
    """(id_col, pos, fp) — the winnowing fingerprint set per document:
    60-bit k-gram hashes at their 0-based token offsets, one rightmost
    minimum per w-window, overlapping selections deduplicated. Documents
    with fewer than k tokens yield no rows.

    `hash64` picks the k-gram hash: 'md5' (default — the 60-bit md5 prefix
    DuckDB can replay, the cross-engine gate contract) or 'xxhash64'
    (Spark-native, measured 48.9 -> 38.3 s on the 500k-doc soak corpus —
    the 100 TB option when no SQL oracle needs to replay the hash). The
    winnowing guarantee (any shared w+k-1-token run shares a fingerprint)
    holds under either hash; only the SAMPLE of selected k-grams differs.

    Everything is in-row column math (the 100 TB contract: no shuffle at
    all until whatever join consumes the fingerprints): k-gram hashes via
    the chained-zip_with window builder, window minima via w-1 more
    chained zip_withs over shifted slices combining by (hash asc, pos
    desc) — the rightmost-min pick is associative, so the fold order
    can't change the result. Per-doc cost O(n * (k + w)) with no
    per-window allocations (the BASELINE round-6 lesson)."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    if hash64 == "md5":
        hash_fn = md5_60bit
    elif hash64 == "xxhash64":
        hash_fn = F.xxhash64
    else:
        raise ValueError(f"hash64 must be 'md5' or 'xxhash64', got {hash64!r}")
    toks = F.filter(F.split(norm_ws(text_col), " "), lambda x: F.length(x) > 0)
    # k-gram strings via chained zip_withs (importance._with_ngrams form)
    size = F.size(toks)
    n_grams = F.greatest(size - F.lit(k - 1), F.lit(0))
    grams = F.slice(toks, F.lit(1), n_grams)
    for i in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(toks, F.lit(i + 1), n_grams),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    hps = F.transform(
        grams,
        lambda g, i: F.struct(hash_fn(g).alias("h"), i.cast("long").alias("p")),
    )
    # rightmost min per w-window: fold of w shifted struct arrays; b is
    # always the more-rightward operand, so <= keeps the rightmost tie
    n_wins = F.greatest(F.size(hps) - F.lit(w - 1), F.lit(0))
    sel = F.slice(hps, F.lit(1), n_wins)
    for j in range(1, w):
        sel = F.zip_with(
            sel,
            F.slice(hps, F.lit(j + 1), n_wins),
            lambda a, b: F.when(b["h"] <= a["h"], b).otherwise(a),
        )
    # under-window docs (1 <= n_grams < w): the single global rightmost
    # min, so every document with >= k tokens carries a fingerprint (the
    # guarantee only covers matches of length >= w+k-1 either way)
    short = F.array(
        F.aggregate(
            hps,
            F.struct(
                F.lit(None).cast("long").alias("h"), F.lit(None).cast("long").alias("p")
            ),
            lambda a, b: F.when(a["h"].isNull() | (b["h"] <= a["h"]), b).otherwise(a),
        )
    )
    sel = F.when(F.size(hps) >= w, sel).otherwise(
        F.when(F.size(hps) > 0, short).otherwise(sel)
    )
    out = F.transform(
        F.array_sort(F.array_distinct(sel)),
        lambda s: F.struct(s["p"].alias("pos"), s["h"].alias("fp")),
    )
    return df.select(F.col(id_col), F.explode(out).alias("_w")).select(
        id_col, F.col("_w.pos").alias("pos"), F.col("_w.fp").alias("fp")
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    delta: float = 0.0,
) -> DataFrame:
    """(w1, w2, n_pair, pmi, phrase_score): adjacent-bigram collocation
    statistics over the corpus — PMI (Church & Hanks, CL 1990) plus the
    word2vec phrase score (Mikolov et al., NeurIPS 2013: score =
    (n_pair - delta) * N_tokens / (n_w1 * n_w2)), the standard pass for
    promoting frequent collocations to vocabulary phrases before
    tokenizer training. Pairs below `min_count` are cut (both papers'
    discounting rationale: rare pairs have unreliable statistics).

    pmi = ln( (n_pair / N_pairs) / ((n_w1 / N_tokens) * (n_w2 / N_tokens)) )

    Scale shape: one corpus explode for unigram counts (vocabulary-sized
    result, joined back twice — no forced broadcast: an open web-text
    vocabulary is not broadcast-sized at 100 TB, so AQE picks the join
    strategy from the measured unigram-table size), one in-row bigram
    build (the chained zip_with window builder — no second explode pass
    over positions) + groupBy(w1, w2); the two corpus totals ride a
    broadcast 1-row agg."""
    toks = F.filter(F.split(norm_ws(text_col), " "), lambda x: F.length(x) > 0)
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    size = F.size(toks)
    # both corpus totals from ONE narrow agg — no explode needed
    totals = F.broadcast(
        df.agg(
            F.sum(size).cast("double").alias("n_tokens"),
            F.sum(F.greatest(size - F.lit(1), F.lit(0))).cast("double").alias("n_bigrams"),
        )
    )
    n_bi = F.greatest(size - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, F.lit(1), n_bi),
        F.slice(toks, F.lit(2), n_bi),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pair = (
        df.select(F.explode(bigrams).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    return (
        pair.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(totals)
        .select(
            "w1",
            "w2",
            "n_pair",
            F.log(
                (F.col("n_pair") / F.col("n_bigrams"))
                / ((F.col("n_w1") / F.col("n_tokens")) * (F.col("n_w2") / F.col("n_tokens")))
            ).alias("pmi"),
            (
                (F.col("n_pair") - F.lit(float(delta)))
                * F.col("n_tokens")
                / (F.col("n_w1") * F.col("n_w2"))
            ).alias("phrase_score"),
        )
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_posting: int = 1024,
    hash64: str = "md5",
) -> DataFrame:
    """(id_a, id_b, n_shared): document pairs sharing >= min_shared
    winnowing fingerprints — the MOSS partial-overlap detector. This is
    the sampled counterpart of dedup.ngram_jaccard_pairs: candidate
    volume scales with the ~2/(w+1)-density fingerprint sample instead of
    the full shingle set, which is the whole reason to winnow at 100 TB.

    Scale shape: one shuffle of the (id, fp) frame keyed on fp with a
    spillable count-over-window enforcing `max_posting` BEFORE the pair
    join (hot fingerprints — boilerplate spans every document shares —
    would otherwise emit O(f^2) pair rows on single keys; dropped
    postings only UNDERCOUNT n_shared, the similarity.DEFAULT_MAX_POSTING
    contract), then the triangular self-join on the surviving postings."""
    from pyspark.sql.window import Window

    fps = winnow_fingerprints(df, id_col, text_col, k, w, hash64).select(
        F.col(id_col).alias("id"), "fp"
    ).distinct()
    capped = (
        fps.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter((F.col("_n") > 1) & (F.col("_n") <= max_posting))
        .drop("_n")
    )
    a = capped.select(F.col("id").alias("id_a"), "fp")
    b = capped.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def ngram_repetition_fractions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6),
    persist_tokens: bool = False,
) -> DataFrame:
    """Gopher/RedPajama word-n-gram repetition signals, per document:

    - top{n}_frac (n in top_ns): fraction of the document's characters
      attributable to the single most frequent word n-gram — Gopher A1.1's
      "fraction of characters contained within the most frequently-
      occurring n-gram", computed as count * gram_chars / total_chars with
      gram_chars the gram's non-space length and total_chars the summed
      word lengths. The most frequent gram ties break to the
      lexicographically smallest (Gopher leaves ties unspecified; a
      deterministic rule is load-bearing for the cross-engine gate).
    - dup{n}_frac (n in dup_ns): fraction of characters in word n-grams
      that occur more than once in the document, each OCCURRENCE counted
      (the RedPajama-Data quality-signal convention, which may exceed 1
      on degenerate documents — downstream filters threshold well below).

    Documents with fewer than n words get fraction 0 for that n. These are
    the repetition filters from Gopher's quality pipeline that
    `repetition_stats` (word-level duplication + top-word coverage) does
    not cover; line-based variants are omitted because the fraction
    definitions degenerate on single-line documents (the corpus here) —
    split upstream and treat lines as documents for those.

    Scale shape: set-based, not in-row — per n, one explode keyed by the
    document and one (id, gram) hash aggregation, then per-doc folds; at
    petabyte scale this is the same shuffle discipline as the shingle
    pipeline (dedup.py), and it avoids the O(m^2) in-row counting a
    transform-over-distinct form would cost on a 100k-word document (the
    repetition_stats lesson)."""
    from .importance import _norm_tokens, _with_ngrams

    # persist_tokens=True shares ONE tokenize pass across every n instead
    # of len(top_ns | dup_ns)+1 corpus scans — the right call on a real
    # cluster where each scan is a 100 TB read. It is OFF by default
    # because the local A/B measured it SLOWER at sf0.1 (3.95 vs 3.08 s
    # best-of-3: materializing the token arrays costs more than
    # rescanning a small OS-cached parquet) — the reliable-checkpoint
    # pattern: measured-fast local default, documented cluster option.
    words = df.select(
        F.col(id_col).alias("id"), _norm_tokens(text_col).alias("ws")
    )
    if persist_tokens:
        from pyspark.storagelevel import StorageLevel

        words = words.persist(StorageLevel.MEMORY_AND_DISK)
    base = words.select(
        "id",
        F.length(F.array_join("ws", "")).cast("double").alias("total_chars"),
    )
    out = base
    for n in sorted(set(top_ns) | set(dup_ns)):
        grams = words.select(
            "id", F.explode(_with_ngrams(F.col("ws"), n)).alias("g")
        )
        per_gram = grams.groupBy("id", "g").agg(
            F.count(F.lit(1)).cast("double").alias("cnt")
        )
        per_gram = per_gram.withColumn(
            "gchars",
            F.length(F.regexp_replace("g", " ", "")).cast("double"),
        )
        aggs = []
        if n in top_ns:
            # struct-extremum argmax: (cnt desc, gram asc) via max of
            # (cnt, negated-ordering-proxy) — use min over struct of
            # (-cnt, g) to get the deterministic winner
            aggs.append(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("g").alias("g"),
                        (F.col("cnt") * F.col("gchars")).alias("chars"),
                    )
                ).alias("_top")
            )
        if n in dup_ns:
            aggs.append(
                F.sum(
                    F.when(
                        F.col("cnt") >= 2, F.col("cnt") * F.col("gchars")
                    ).otherwise(0.0)
                ).alias("_dup")
            )
        per_doc = per_gram.groupBy("id").agg(*aggs)
        cols = [F.col("id")]
        if n in top_ns:
            cols.append(F.col("_top.chars").alias(f"_topchars{n}"))
        if n in dup_ns:
            cols.append(F.col("_dup").alias(f"_dupchars{n}"))
        out = out.join(per_doc.select(*cols), "id", "left")
    sel = [F.col("id"), F.col("total_chars").cast("long").alias("n_chars")]
    denom = F.greatest(F.col("total_chars"), F.lit(1.0))
    for n in sorted(top_ns):
        sel.append(
            (F.coalesce(F.col(f"_topchars{n}"), F.lit(0.0)) / denom).alias(
                f"top{n}_frac"
            )
        )
    for n in sorted(dup_ns):
        sel.append(
            (F.coalesce(F.col(f"_dupchars{n}"), F.lit(0.0)) / denom).alias(
                f"dup{n}_frac"
            )
        )
    return out.select(*sel)


# Unicode scripts the profiler reports, as Java regex script classes
# (Spark). The DuckDB oracle uses the RE2 spellings without the Is prefix
# (\p{Latin} etc.) — both implement Unicode Script property identically
# (verified cross-engine on mixed-script strings before this landed).
_SCRIPTS = {
    "latin": "IsLatin",
    "cyrillic": "IsCyrillic",
    "han": "IsHan",
    "greek": "IsGreek",
    "arabic": "IsArabic",
    "hangul": "IsHangul",
    "hebrew": "IsHebrew",
}


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unicode-script profile over NON-WHITESPACE characters:
    (id, n_chars, <script>_chars ..., digit_chars, other_chars,
    <script>_frac ..., digit_frac, other_frac) for Latin / Cyrillic / Han /
    Greek / Arabic / Hangul / Hebrew — the curation signal for
    mislabeled-language and mixed-script (confusable-spoofing, spam)
    documents that a stopword-based lang_id cannot see. Counts are exact
    integers (`other` = n minus the listed counts minus digits — digits are
    script Common, punctuation falls in no listed class), so the engine
    never accumulates float residue; fractions are one division each.

    Pure in-row column math: zero shuffles, zero Python — at 100 TB this
    is a mapper-only pass that pipelines into whatever scan feeds it."""
    base = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s", "")
    n = F.length(base)
    out = df.select(F.col(id_col).alias("id"), base.alias("_sp_base"), n.alias("n_chars"))
    counts = []
    for name, cls in _SCRIPTS.items():
        c = F.length(F.regexp_replace("_sp_base", f"[^\\p{{{cls}}}]", ""))
        out = out.withColumn(f"{name}_chars", c.cast("long"))
        counts.append(F.col(f"{name}_chars"))
    out = out.withColumn(
        "digit_chars", F.length(F.regexp_replace("_sp_base", r"[^0-9]", "")).cast("long")
    )
    listed = counts[0]
    for c in counts[1:]:
        listed = listed + c
    out = out.withColumn(
        "other_chars", (F.col("n_chars") - listed - F.col("digit_chars")).cast("long")
    ).drop("_sp_base")
    for name in [*_SCRIPTS, "digit", "other"]:
        out = out.withColumn(
            f"{name}_frac",
            F.when(F.col("n_chars") > 0, F.col(f"{name}_chars") / F.col("n_chars")).otherwise(
                F.lit(0.0)
            ),
        )
    return out


def entropy_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (bits) of each document's character and word
    distributions: (id, n_chars, char_entropy, n_words, word_entropy) —
    the gibberish filter quality pipelines run alongside the Gopher
    repetition fractions: near-zero char entropy flags repeated-character
    spam ('aaaa...'), abnormally high char entropy flags random-string
    blobs (keys, base64), and low word entropy flags template/boilerplate
    pages that repeat a tiny vocabulary.

    Characters are the non-whitespace stream (whitespace carries layout,
    not content); words are the usual whitespace tokens. Empty/NULL docs
    keep a zero row. Two explode + two-stage hash aggregations, both
    keyed by (id, symbol) then id — the shingle-pipeline shuffle shape;
    entropy itself is -sum(p log2 p) per doc, a float fold over <=
    alphabet-size terms (round downstream when comparing cross-engine:
    log2 is libm)."""
    base = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s", "")
    ids = df.select(F.col(id_col).alias("id"), base.alias("_ep_chars"), F.col(text_col))

    def dist_entropy(exploded: DataFrame, sym: str) -> DataFrame:
        counts = exploded.groupBy("id", sym).agg(F.count(F.lit(1)).alias("c"))
        return (
            counts.groupBy("id")
            .agg(
                F.sum("c").alias("n"),
                F.sum(F.col("c") * F.log2("c")).alias("_clogc"),
            )
            # H = log2(n) - (1/n) sum c*log2(c): one pass, no p column
            .select(
                "id",
                F.col("n"),
                (F.log2("n") - F.col("_clogc") / F.col("n")).alias("h"),
            )
        )

    ch = dist_entropy(
        ids.select(
            "id", F.explode(F.split("_ep_chars", "")).alias("s")
        ).filter(F.length("s") > 0),
        "s",
    ).select("id", F.col("n").alias("n_chars"), F.col("h").alias("char_entropy"))
    wd = dist_entropy(
        ids.select(
            "id",
            F.explode(
                F.filter(F.split(F.trim(F.col(text_col)), _WS), lambda w: F.length(w) > 0)
            ).alias("w"),
        ),
        "w",
    ).select("id", F.col("n").alias("n_words"), F.col("h").alias("word_entropy"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(ch, "id", "left")
        .join(wd, "id", "left")
        .select(
            "id",
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("char_entropy", F.lit(0.0)).alias("char_entropy"),
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("word_entropy", F.lit(0.0)).alias("word_entropy"),
        )
    )


def line_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document LINE-level quality signals — the RedPajama-Data/Dolma
    structural filters that char/word stats cannot see: (id, n_lines,
    mean_line_len, frac_lines_end_punct, frac_lines_bullet,
    frac_lines_upper, frac_dup_lines). Lines are split on '\\n' with
    whitespace-trimmed edges; EMPTY lines are dropped before any ratio
    (blank separators are formatting, not content). Definitions:

      - frac_lines_end_punct: lines whose last char is . ! ? " ' (the
        terminal-punctuation mark of prose vs scraped navigation/menus)
      - frac_lines_bullet: lines starting with -, *, or the bullet
        characters U+2022/U+2023/U+25E6 (list-dominated pages)
      - frac_lines_upper: lines with >= 1 letter and no lowercase letters
        (shouting headers, navigation chrome)
      - frac_dup_lines: 1 - distinct/total (within-document repeated
        lines — the page-local boilerplate signal; the CROSS-document
        version is drop_boilerplate_passages)
      - mean_line_len: mean trimmed line length in characters

    Pure in-row array/column math — zero shuffles, zero Python: a
    mapper-only pass that pipelines into the scan, the script_profile
    contract. Empty/NULL documents emit n_lines=0 and 0.0 ratios."""
    lines = F.filter(
        F.transform(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
            lambda s: F.trim(s),
        ),
        lambda s: F.length(s) > 0,
    )
    n = F.size(lines)

    def frac(pred_lines):
        return F.when(n > 0, F.size(pred_lines) / n).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_lines"),
        F.when(
            n > 0,
            F.aggregate(lines, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s)) / n,
        )
        .otherwise(F.lit(0.0))
        .alias("mean_line_len"),
        frac(F.filter(lines, lambda s: s.rlike("[.!?\"']$"))).alias(
            "frac_lines_end_punct"
        ),
        frac(F.filter(lines, lambda s: s.rlike("^[-*•‣◦]"))).alias(
            "frac_lines_bullet"
        ),
        frac(
            F.filter(
                lines,
                lambda s: s.rlike("\\p{L}") & ~s.rlike("\\p{Ll}"),
            )
        ).alias("frac_lines_upper"),
        F.when(n > 0, F.lit(1.0) - F.size(F.array_distinct(lines)) / n)
        .otherwise(F.lit(0.0))
        .alias("frac_dup_lines"),
    )
