"""Corpus-level importance scoring for training-data selection.

Two published selection methods the rest of the pipeline composes with:

- **DSIR** hashed n-gram importance weights (Xie et al., "Data Selection
  for Language Models via Importance Resampling", NeurIPS 2023): score
  every raw document by the log-likelihood ratio of a target-domain
  bag-of-hashed-ngrams model vs the raw-corpus model, then take a
  deterministic Gumbel-top-k resample by that weight.
- **n-gram LM scoring / perplexity filtering** (Wenzek et al., "CCNet:
  Extracting High Quality Monolingual Datasets from Web Crawl Data",
  LREC 2020 — the public method; CCNet uses a KenLM 5-gram, this is the
  dependency-free bigram instance of the same filter): train an add-alpha
  bigram LM on a reference corpus, score every document by mean token
  log-probability, filter on the perplexity.

Scale shapes (the 100 TB contract):

- DSIR feature space is a FIXED `num_buckets` hash range, so both model
  tables are bounded (<= num_buckets rows) and broadcast into the per-doc
  scoring join — the only corpus-scale shuffles are the per-doc feature
  groupBy and the final per-doc sum, both keyed on doc id.
- The LM's bigram/context tables are corpus-scale, so those joins shuffle
  — but on 60-bit md5 hash keys (longs), never the bigram strings, the
  same key discipline as `dedup.ngram_jaccard_pairs`. Hash collisions
  merge the colliding bigrams' counts identically on every engine (the
  oracle mirrors the hashing), so results stay deterministic.
- No driver-side iteration; the one scalar total per model table rides a
  broadcast 1-row aggregate (the pagerank dangling-mass pattern), not a
  collect.

All arithmetic is plain double logs, so every op here is cross-engine
oracle-gated in `__spark_entry__.py` (`dsir_weights`, `lm_perplexity`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import md5_60bit, norm_ws

DEFAULT_NUM_BUCKETS = 4096
DEFAULT_ALPHA = 1.0


def _norm_tokens(text_col: str):
    """Whitespace tokens of the normalized text — same split rule as
    text.tokenize/fingerprint (see _ws_tokens in __spark_entry__.py), but
    with zero-length tokens dropped: split("") yields [""], and that
    phantom '' unigram would otherwise give empty/whitespace-only docs a
    real DSIR weight and pollute the raw/target models (they must be
    absent, as the dsir_logweights docstring promises). The oracle SQL
    mirrors the filter (list_filter(..., len > 0))."""
    return F.filter(F.split(norm_ws(text_col), " "), lambda x: F.length(x) > 0)


def _with_ngrams(toks, n: int):
    """Sliding space-joined n-token windows from a token array column;
    docs with fewer than n tokens yield [].

    Built as n-1 chained zip_withs over shifted slices of the SAME window
    count, not per-window slice+array_join (that form briefly shipped and
    measured ~3x slower on the sf0.1 bigram gates: dsir_weights
    3.5 -> 7.1 s, lm_perplexity 2.3 -> 7.4 s — one array allocation per
    window). The greatest(.., 0) guard keeps under-n docs at zero-length
    slices (slice() throws on negative length), which zip_with carries
    through to []."""
    size = F.size(toks)
    win = F.greatest(size - F.lit(n - 1), F.lit(0))
    out = F.slice(toks, F.lit(1), win)
    for i in range(1, n):
        out = F.zip_with(
            out,
            F.slice(toks, F.lit(i + 1), win),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return out


def _with_bigrams(toks):
    """Adjacent-token bigrams 'w1 w2' (the n=2 windows)."""
    return _with_ngrams(toks, 2)


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    include_bigrams: bool = True,
) -> DataFrame:
    """Per-document hashed n-gram feature counts: (id, bucket, cnt).

    DSIR's feature map: unigrams (+ adjacent bigrams) hashed into a fixed
    `num_buckets` range. Hashing is md5-60bit mod B — engine-portable (the
    DuckDB oracle computes the identical bucket), deterministic, and the
    shuffle key is a small long."""
    toks = _norm_tokens(text_col)
    grams = F.concat(toks, _with_bigrams(toks)) if include_bigrams else toks
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .select("id", F.pmod(md5_60bit(F.col("g")), F.lit(num_buckets)).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_model(
    features: DataFrame,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Bag-of-hashed-ngrams model from a feature frame: (bucket, logp)
    with add-alpha smoothing, logp = ln((c_b + alpha) / (total + alpha*B)).

    Bounded output (<= num_buckets rows) — safe to broadcast. Buckets the
    feature frame never saw are absent; score-time lookups coalesce them
    to the smoothed-zero ln(alpha / (total + alpha*B))."""
    by_bucket = features.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    total = by_bucket.agg(F.sum("c").alias("_total"))
    denom = F.col("_total") + F.lit(float(alpha) * num_buckets)
    return (
        by_bucket.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.log((F.col("c") + F.lit(float(alpha))) / denom).alias("logp"),
            F.log(F.lit(float(alpha)) / denom).alias("logp0"),
        )
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """DSIR importance log-weight per raw document: (id, n_features,
    log_weight) where log_weight = sum_b c_doc(b) * (ln p_target(b) -
    ln p_raw(b)).

    Both model tables are bounded by num_buckets and broadcast; a doc
    bucket missing from a model scores at that model's smoothed zero.
    The raw model is fit on `raw` itself (the paper's q-hat); `target` is
    the in-domain sample (p-hat).

    NULL-text docs produce no grams and are absent from the output (=
    never selected) — mirror-consistent with the oracle. The target model
    frame is consumed by two jobs (the broadcast join and its
    smoothed-zero aggregate), so the target corpus is scanned twice —
    fine by construction: DSIR's target is the small in-domain sample.

    The RAW feature frame, by contrast, is the corpus-scale cost of the
    whole op and has two consumers (the raw model's aggregate and the
    scoring join), so it is persisted for the duration and released once
    the per-doc result is eagerly checkpointed — the
    materialize-then-release contract of dedup.minhash_dedup_pairs;
    without it the corpus-wide explode+groupBy runs twice."""
    from pyspark.storagelevel import StorageLevel

    feats = hashed_ngram_features(raw, text_col, id_col, num_buckets).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    p_t = ngram_model(
        hashed_ngram_features(target, text_col, id_col, num_buckets),
        num_buckets,
        alpha,
    )
    p_r = ngram_model(feats, num_buckets, alpha)
    # every bucket in feats exists in p_r by construction (same frame), but
    # the target lookup needs its smoothed zero; ship it on a 1-row frame
    # so absent-bucket rows don't need a second model scan. An EMPTY target
    # model (empty frame / all-NULL text) makes min(logp0) NULL, which
    # would silently NULL every log_weight — coalesce to the closed form
    # at total=0, ln(alpha / (0 + alpha*B)) = -ln(B): empty target =
    # uniform smoothed model, every doc scored, none silently dropped.
    t_zero = p_t.agg(
        F.coalesce(F.min("logp0"), F.lit(-math.log(float(num_buckets)))).alias(
            "_t_logp0"
        )
    )
    scored = (
        feats.join(F.broadcast(p_t.select("bucket", F.col("logp").alias("logp_t"))), "bucket", "left")
        .join(F.broadcast(p_r.select("bucket", F.col("logp").alias("logp_r"))), "bucket")
        .crossJoin(F.broadcast(t_zero))
        .withColumn("logp_t", F.coalesce("logp_t", "_t_logp0"))
    )
    out = scored.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_features"),
        F.sum(F.col("cnt") * (F.col("logp_t") - F.col("logp_r"))).alias("log_weight"),
    ).localCheckpoint(eager=True)
    feats.unpersist()
    return out


def dsir_select(
    weights: DataFrame,
    n: int,
    seed_salt: str = "dsir-v1",
) -> DataFrame:
    """Deterministic Gumbel-top-k resample: keep the n docs with the
    largest log_weight + Gumbel(id), the paper's sampling-without-
    replacement trick with the noise derived from md5(id || salt) instead
    of an RNG — append-stable and engine-portable like split.hash_split.

    u in (0,1) comes from a 52-bit md5 slice; g = -ln(-ln(u)).

    orderBy+limit compiles to TakeOrderedAndProject — per-partition top-n
    with a driver merge, never a global sort on one reducer. That holds n
    rows on the driver, so for corpus-scale n (selecting billions) cut by
    an approximate weight threshold (approxQuantile on _k) first."""
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(":" + seed_salt))), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16 ** 13))
    )
    g = -F.log(-F.log(u + F.lit(1e-300)))
    keyed = weights.withColumn("_k", F.col("log_weight") + g)
    return keyed.orderBy(F.desc("_k"), F.asc("id")).limit(n).drop("_k")


def ngram_lm(
    reference: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Add-alpha n-gram LM tables from a reference corpus (n >= 2; CCNet
    proper uses n=5 — pass the n your corpus supports).

    Returns (gram_counts, context_counts, vocab_size):
    - gram_counts: (bg_hash, c2) — 60-bit md5 hash of the n space-joined
      tokens
    - context_counts: (ctx_hash, c1) — hash of the first n-1 tokens,
      c1 = count of n-gram instances whose context hashes there
    - vocab_size: 1-row frame (v,) = distinct unigram hashes

    Each table is grouped on ITS OWN hash key alone — grouping grams on
    (bg_hash, ctx_hash) would leave duplicate bg_hash rows whenever two
    grams with different contexts collide on bg_hash, fanning out the
    score-time join; keying each table independently makes collisions
    merge counts, identically to the hash-mirroring oracle.

    Corpus-scale tables; downstream joins key on the long hashes."""
    if n < 2:
        raise ValueError(f"ngram_lm needs n >= 2, got {n}")
    toks = _norm_tokens(text_col)
    bg = reference.select(F.explode(_with_ngrams(toks, n)).alias("bg"))
    hashed = bg.select(
        md5_60bit(F.col("bg")).alias("bg_hash"),
        md5_60bit(F.substring_index(F.col("bg"), " ", n - 1)).alias("ctx_hash"),
    )
    gram_counts = hashed.groupBy("bg_hash").agg(F.count(F.lit(1)).alias("c2"))
    context_counts = hashed.groupBy("ctx_hash").agg(F.count(F.lit(1)).alias("c1"))
    uni = reference.select(F.explode(toks).alias("w"))
    vocab = uni.agg(F.countDistinct(md5_60bit(F.col("w"))).alias("v"))
    return gram_counts, context_counts, vocab


def ngram_lm_scores(
    docs: DataFrame,
    reference: DataFrame | None = None,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Per-document n-gram-LM score: (id, n_bigrams, avg_logp, ppl) —
    the column stays named n_bigrams for the n=2 default's gate contract;
    it counts the doc's n-gram instances for any n.

    P(w_n|w_1..w_{n-1}) = (c_n + alpha) / (c_ctx + alpha*V); avg_logp is
    the mean ln P over the doc's n-grams; ppl = exp(-avg_logp). Unseen
    grams/contexts coalesce to count 0 (pure add-alpha smoothing). Docs
    with < n tokens (NULL text included — explode_outer keeps the row)
    return n_bigrams = 0 and NULL avg_logp/ppl — the caller's filter
    decides their fate, not a fake score.

    `reference` defaults to `docs` itself (self-scored corpus, the CCNet
    shape when no curated LM corpus exists yet)."""
    ref = docs if reference is None else reference
    gram_counts, context_counts, vocab = ngram_lm(ref, n, text_col, id_col, alpha)
    toks = _norm_tokens(text_col)
    doc_bg = docs.select(
        F.col(id_col).alias("id"), F.explode_outer(_with_ngrams(toks, n)).alias("bg")
    ).select(
        "id",
        F.when(F.col("bg").isNotNull(), md5_60bit(F.col("bg"))).alias("bg_hash"),
        F.when(
            F.col("bg").isNotNull(),
            md5_60bit(F.substring_index(F.col("bg"), " ", n - 1)),
        ).alias("ctx_hash"),
    )
    a = F.lit(float(alpha))
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + a)
        / (F.coalesce(F.col("c1"), F.lit(0)) + a * F.col("v"))
    )
    scored = (
        doc_bg.join(gram_counts, "bg_hash", "left")
        .join(context_counts, "ctx_hash", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn("logp", F.when(F.col("bg_hash").isNotNull(), logp))
    )
    return scored.groupBy("id").agg(
        F.count("bg_hash").cast("long").alias("n_bigrams"),
        F.avg("logp").alias("avg_logp"),
        F.exp(-F.avg("logp")).alias("ppl"),
    )


def bigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The n=2 instance of ngram_lm (kept as the named default)."""
    return ngram_lm(reference, 2, text_col, id_col, alpha)


def bigram_lm_scores(
    docs: DataFrame,
    reference: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """The n=2 instance of ngram_lm_scores (kept as the named default)."""
    return ngram_lm_scores(docs, reference, 2, text_col, id_col, alpha)


def source_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
    persist_tokens: bool = False,
) -> DataFrame:
    """Per-source unigram KL divergence and cross-entropy vs the whole
    corpus — the data-mixing diagnostic that pairs with
    `split.temperature_mix_rates`: which sources are distributionally far
    from the blend (high KL -> distinct vocabulary worth upweighting or a
    contamination/quality smell worth inspecting; the same statistic DSIR
    uses pairwise against a target, here source-vs-mixture).

    Distributions are add-alpha smoothed over the corpus vocabulary V:
      p_s(w) = (c_s(w) + a) / (T_s + aV),  p_c(w) = (c(w) + a) / (T + aV)

    The sum over the FULL vocabulary is computed WITHOUT materializing the
    (source x vocab) grid: for words absent from a source, p_s is the
    constant p0_s = a/(T_s + aV), so
      KL(p_s||p_c) = sum_{w in s} p_s ln(p_s/p_c)
                   + (V - V_s) * p0_s * ln(p0_s)
                   - p0_s * (Lc - sum_{w in s} ln p_c(w))
    where Lc = sum over the vocab of ln p_c(w) is ONE corpus scalar. The
    shuffles are: one explode -> groupBy(word), one groupBy(source, word),
    one word-keyed join, one groupBy(source) — every key is a token or a
    source, never a grid. Corpus scalars attach via the sanctioned
    broadcast-1-row cross join.

    Output per source: n_tokens (T_s), n_types (V_s), kl_from_corpus,
    cross_entropy (both nats, full-precision doubles — gates apply the
    repo's tie-nudged 6-dp round; the per-term doubles are identical
    cross-engine, only the final summation order differs, ~1e-14
    relative)."""
    a = float(alpha)
    toks = df.select(
        F.col(group_col).alias("src"), F.explode(_norm_tokens(text_col)).alias("w")
    )
    # the token frame feeds the corpus-count and per-source-count passes;
    # persist_tokens=True trades one materialization for one fewer corpus
    # scan on a real cluster (measured a wash at sf0.1: 0.90 vs 0.91 s —
    # the gopher_rep persist_tokens rationale, same default)
    if persist_tokens:
        from pyspark.storagelevel import StorageLevel

        toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
    cw = toks.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("cw"))
    tot = F.broadcast(
        cw.agg(
            F.sum("cw").alias("t"),
            F.count(F.lit(1)).cast("double").alias("v"),
        )
    )
    # ln p_c(w) per vocab word, plus the corpus scalar Lc = sum ln p_c
    cw = cw.crossJoin(tot).withColumn(
        "ln_pc",
        F.log((F.col("cw") + F.lit(a)) / (F.col("t") + F.lit(a) * F.col("v"))),
    )
    lc = F.broadcast(cw.agg(F.sum("ln_pc").alias("lc")))
    sw = toks.groupBy("src", "w").agg(F.count(F.lit(1)).cast("double").alias("cs"))
    # word-level pieces; with ln p_s(w) = ln(cs+a) - ln(T_s + aV), the
    # per-source folds below need only these three sums + (T_s, V_s)
    joined = sw.join(cw.select("w", "ln_pc"), "w")
    per_src = joined.groupBy("src").agg(
        F.sum("cs").alias("t_s"),
        F.count(F.lit(1)).cast("double").alias("v_s"),
        F.sum((F.col("cs") + F.lit(a)) * F.log(F.col("cs") + F.lit(a))).alias("_a"),
        F.sum((F.col("cs") + F.lit(a)) * F.col("ln_pc")).alias("_b"),
        F.sum("ln_pc").alias("_c"),
    )
    out = per_src.crossJoin(tot).crossJoin(lc)
    denom = F.col("t_s") + F.lit(a) * F.col("v")
    p0 = F.lit(a) / denom
    # sum over words PRESENT in s of p_s ln p_s
    h_pres = (
        F.col("_a") - (F.col("t_s") + F.lit(a) * F.col("v_s")) * F.log(denom)
    ) / denom
    # the (V - V_s) absent words all contribute p0 ln p0
    h_abs = (F.col("v") - F.col("v_s")) * p0 * F.log(p0)
    x_pres = F.col("_b") / denom
    x_abs = p0 * (F.col("lc") - F.col("_c"))
    return out.select(
        F.col("src").alias(group_col),
        F.col("t_s").cast("long").alias("n_tokens"),
        F.col("v_s").cast("long").alias("n_types"),
        (h_pres + h_abs - x_pres - x_abs).alias("kl_from_corpus"),
        (-(x_pres + x_abs)).alias("cross_entropy"),
    )


def ppl_buckets(
    docs: DataFrame,
    reference: DataFrame | None = None,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
    cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
    score_dp: int = 6,
) -> DataFrame:
    """CCNet head/middle/tail perplexity partitioning (Wenzek et al.
    LREC 2020): score each document under the reference n-gram LM
    (self-scored when reference is None, CCNet trains on Wikipedia), then
    label equal-ish thirds of the perplexity distribution — 'head' is the
    lowest-perplexity (most reference-like) cut, the slice CCNet keeps
    outright; 'tail' is the candidate-drop slice.

    The cut points are DISCRETE percentiles of the rounded perplexity
    (one bounded two-value aggregate, broadcast back) — NOT a global
    ntile, whose single-partition window sort is exactly the
    full-corpus-through-one-task shape this repo bans. Bucketing compares
    score_dp-rounded perplexities (the rank-on-rounded discipline), so
    the decision is engine-portable; documents too short to score keep
    bucket 'unscored' (the max_ppl convention: unscorable is not
    evidence of low quality)."""
    scores = ngram_lm_scores(docs, reference, n, text_col, id_col, alpha)
    r = scores.select(
        "id",
        F.col("n_bigrams").alias("n_grams"),  # ngram_lm_scores' fixed name
        F.round(F.col("ppl") + F.lit(10.0 ** -(score_dp + 3)), score_dp).alias(
            "rppl"
        ),
    )
    # eager cut: TWO consumers read r (the percentile aggregate and the
    # output projection), and without it each re-runs the whole
    # ngram_lm_scores subtree — the count-table joins twice end to end
    # (r14 plan audit: the before-plan carries the scoring subtree twice,
    # ~16 Exchanges). The checkpoint holds (id, n_grams, rppl) only —
    # corpus rows x 3 scalars, the guide-§8 lightweight-proxy shape.
    r = r.localCheckpoint(eager=True)
    lo, hi = cuts
    cut_row = F.broadcast(
        r.where(F.col("rppl").isNotNull()).agg(
            F.expr(
                f"percentile_disc({lo!r}) WITHIN GROUP (ORDER BY rppl)"
            ).alias("_c1"),
            F.expr(
                f"percentile_disc({hi!r}) WITHIN GROUP (ORDER BY rppl)"
            ).alias("_c2"),
        )
    )
    bucket = (
        F.when(F.col("rppl").isNull(), F.lit("unscored"))
        .when(F.col("rppl") <= F.col("_c1"), F.lit("head"))
        .when(F.col("rppl") <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return r.crossJoin(cut_row).select(
        "id",
        "n_grams",
        F.col("rppl").alias("ppl"),
        bucket.alias("bucket"),
    )
