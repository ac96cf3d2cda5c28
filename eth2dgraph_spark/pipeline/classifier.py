"""Trained quality classifier: hashed-feature logistic regression.

The public curation stacks pair an n-gram-LM perplexity filter (CCNet,
Wenzek et al. LREC'20 — `pipeline/importance.py`) with a TRAINED linear
quality classifier: fastText-style (Joulin et al., "Bag of Tricks for
Efficient Text Classification", EACL 2017) in CCNet/LLaMA's pipeline,
logistic regression over hashed features in GPT-3's (Brown et al. 2020,
Appendix A: "a classifier trained to distinguish curated corpora from raw
Common Crawl"). This module is that second filter, dependency-free:

- **Features**: the DSIR hashed n-gram map (`importance.
  hashed_ngram_features` — unigram+bigram counts hashed md5-60bit into a
  fixed `num_buckets` range), L1-normalized per document (the fastText
  mean-of-embeddings analogue), plus a constant bias feature at bucket
  index `num_buckets`.
- **Model**: binary logistic regression, full-batch gradient descent with
  L2 regularization. Deterministic: fixed zero init, fixed epoch count,
  no sampling — the same labeled frame always trains the same weights,
  the append-stability discipline every corpus-level op here follows.

Scale shape (the 100 TB contract):
- the feature frame is built ONCE and persisted across epochs (the
  pagerank iteration discipline); each epoch is two bounded shuffles —
  margins keyed on doc id, gradient keyed on bucket (<= num_buckets+1
  longs) — and ONE driver collect of <= num_buckets+1 gradient rows,
  never of documents;
- the weight vector is <= num_buckets+1 doubles, broadcast into both the
  margin join and final scoring — model size is a CONSTANT, independent
  of corpus size (the DSIR model-table pattern);
- training data is the small labeled reference (curated positives vs
  sampled negatives — thousands to millions of docs), while SCORING runs
  over the full corpus as one broadcast join + one groupBy(id): a single
  corpus-scale shuffle keyed on doc id.

Training is iterative but each epoch is plain sums, so a FIXED-epoch run
is SQL-expressible by unrolling: the `quality_clf` gate in
`__spark_entry__.py` cross-checks a 2-epoch train+score end-to-end
against DuckDB. The numeric path is additionally pinned against a
from-scratch numpy reference in tests/test_classifier.py (the
tests/test_bpe.py pattern).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .importance import DEFAULT_NUM_BUCKETS, hashed_ngram_features

DEFAULT_LR = 0.5
DEFAULT_L2 = 1e-3
DEFAULT_EPOCHS = 8


def l1_hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> DataFrame:
    """(id, bucket, x): per-document L1-normalized hashed n-gram features
    plus a bias row (bucket = num_buckets, x = 1.0) for every document
    that produced at least one gram. Documents with no grams (empty/NULL
    text) are ABSENT — unscorable, same contract as dsir_logweights."""
    cnt = hashed_ngram_features(df, text_col, id_col, num_buckets)
    tot = cnt.groupBy("id").agg(F.sum("cnt").alias("_t"))
    x = cnt.join(tot, "id").select(
        "id", "bucket", (F.col("cnt") / F.col("_t")).cast("double").alias("x")
    )
    bias = tot.select(
        "id",
        F.lit(num_buckets).cast("long").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    return x.unionByName(bias)


def pin_features(feats: DataFrame) -> DataFrame:
    """Hash-partition a feature frame by id so a PERSISTED copy carries a
    partitioning every epoch can reuse (guide §2.4: operations keyed the
    same way share one exchange). l1_hashed_features ends in a union
    (x rows + bias rows), which reports unknown partitioning, so without
    this every epoch's margin groupBy(id) and gradient join(id) re-shuffle
    the corpus-scale frame from the cache; pinned, the margin groupBy, the
    err join and the gradient join are all satisfied by the cached layout
    and only the small (id, y) / weight sides move. One exchange paid at
    build, ~3 corpus-scale exchanges saved per epoch. Uses the session
    shuffle-partition count (the deploy-time knob; AQE cannot coalesce a
    cached layout anyway)."""
    return feats.repartition("id")


def _weights_df(spark: SparkSession, weights: dict[int, float]) -> DataFrame:
    rows = [(int(b), float(w)) for b, w in sorted(weights.items())]
    return spark.createDataFrame(rows, "bucket long, w double")


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    epochs: int = DEFAULT_EPOCHS,
    lr: float = DEFAULT_LR,
    l2: float = DEFAULT_L2,
    feats: "DataFrame | None" = None,
) -> dict[int, float]:
    """Full-batch logistic-regression weights {bucket: w} from a labeled
    frame (label_col in {0, 1}; 1 = curated/target quality).

    Per epoch, with N = number of scorable labeled docs:
        p_d    = sigmoid(sum_b w_b x_db)
        grad_b = (1/N) sum_d (p_d - y_d) x_db + l2 * w_b
        w_b   -= lr * grad_b
    Zero init. Buckets the labeled corpus never emits keep w=0 exactly
    (their data gradient is 0 and l2*0 = 0), so the returned dict over
    SEEN buckets is the exact dense solution — num_buckets+1 doubles at
    most, broadcastable by construction.

    One persisted feature frame; per epoch: one groupBy(id) for margins,
    one groupBy(bucket) for the gradient, one driver collect bounded by
    num_buckets+1 rows. Raises on an empty or single-class labeled frame
    (a silent constant classifier would pass every downstream filter).

    `feats` (optional) is a precomputed l1_hashed_features(labeled) frame:
    train-then-score callers tokenize+hash the SAME corpus twice without
    it (once here, once in quality_classifier_scores) — pass one shared
    persisted frame to both and the corpus feature build runs once. The
    caller owns its lifecycle (this function only persists/unpersists the
    frame it builds itself); the math is unchanged either way."""
    from pyspark.storagelevel import StorageLevel

    spark = labeled.sparkSession
    own_feats = feats is None
    if own_feats:
        # pin the persisted frame on id (see pin_features): every epoch
        # joins and re-aggregates it by id
        feats = pin_features(
            l1_hashed_features(labeled, text_col, id_col, num_buckets)
        ).persist(StorageLevel.MEMORY_AND_DISK)
    y = labeled.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    )
    # N and the class-split guard ride epoch 1's collect (a marker row
    # unioned onto the gradient frame) instead of a separate pre-pass —
    # one fewer Spark action per train (measured 4.83 -> 4.50 s
    # steady-state at sf0.1: modest, the fused job's own cost dominates;
    # kept because the win scales with per-action overhead on a real
    # cluster, BASELINE.md round-7). The per-bucket gradient is collected
    # as the RAW sum and divided by N on the driver: identical to the
    # in-plan `/ N` form and to the pure-Python reference UP TO float
    # summation order (Spark sums x*e across partitions then divides
    # once; the local reference accumulates x*e/n per term) — which is
    # why the cross-engine gate ranks on 6dp-rounded scores and the unit
    # tests pin weights at 1e-12 tolerance, not exact equality.
    n_docs: int | None = None
    weights: dict[int, float] = {}
    for _ in range(epochs):
        if weights:
            wdf = F.broadcast(_weights_df(spark, weights))
            margins = (
                feats.join(wdf, "bucket")
                .groupBy("id")
                .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
            )
            # absent-bucket contributions are exactly 0 (w=0), so the
            # inner join loses nothing; every scorable doc has the bias
            # bucket, which is always in `weights` after epoch 1
            err = margins.join(y, "id").select(
                "id",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("y")).alias(
                    "e"
                ),
            )
        else:
            # zero weights: p = 0.5 for every doc, no margin job needed
            err = y.join(
                feats.filter(F.col("bucket") == num_buckets).select("id"), "id"
            ).select("id", (F.lit(0.5) - F.col("y")).alias("e"))
        gsum = (
            feats.join(err, "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("e")).alias("g"))
        )
        if n_docs is None:
            stats = (
                feats.filter(F.col("bucket") == num_buckets)
                .join(y, "id")
                .agg(
                    F.lit(-1).cast("long").alias("bucket"),
                    F.lit(None).cast("double").alias("g"),
                    F.count(F.lit(1)).alias("_n"),
                    F.sum("y").alias("_pos"),
                )
            )
            gsum = gsum.withColumn("_n", F.lit(None).cast("long")).withColumn(
                "_pos", F.lit(None).cast("double")
            ).unionByName(stats)
        rows = gsum.collect()
        if n_docs is None:
            st = next(r for r in rows if r["bucket"] == -1)
            rows = [r for r in rows if r["bucket"] != -1]
            n_docs, n_pos = int(st["_n"]), int(st["_pos"] or 0)
            if n_docs == 0 or n_pos == 0 or n_pos == n_docs:
                if own_feats:
                    feats.unpersist()
                raise ValueError(
                    f"train_quality_classifier: need both classes among "
                    f"scorable docs, got {n_pos} positive of {n_docs}"
                )
        new_w = dict(weights)
        for r in rows:
            b = int(r["bucket"])
            w_b = weights.get(b, 0.0)
            new_w[b] = w_b - lr * (float(r["g"]) / n_docs + l2 * w_b)
        weights = new_w
    if own_feats:
        feats.unpersist()
    return weights


def quality_classifier_scores(
    df: DataFrame,
    weights: dict[int, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    feats: "DataFrame | None" = None,
) -> DataFrame:
    """(id, clf_score): sigmoid(w . x) per document under a trained weight
    dict — the corpus-scale pass: broadcast weight join + one groupBy(id).
    Documents with no grams are absent (unscorable; callers keep them,
    the curate_corpus LM-stage convention). `feats` (optional) reuses a
    precomputed l1_hashed_features(df) frame — see
    train_quality_classifier; identical scores either way."""
    spark = df.sparkSession
    if feats is None:
        feats = l1_hashed_features(df, text_col, id_col, num_buckets)
    wdf = F.broadcast(_weights_df(spark, weights or {num_buckets: 0.0}))
    margins = (
        feats.join(wdf, "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("m"))
    )
    return margins.select(
        "id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))).alias("clf_score")
    )


def train_quality_classifier_local(
    docs: dict,
    labels: dict,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    epochs: int = DEFAULT_EPOCHS,
    lr: float = DEFAULT_LR,
    l2: float = DEFAULT_L2,
) -> dict[int, float]:
    """Pure-Python reference of the identical math (hashing included) for
    tests: same zero init, same epoch updates, float64 throughout. Kept in
    the package (not tests/) so the distributed path and its reference
    can never drift apart silently — the bpe.bpe_train_local pattern."""
    import hashlib

    def buckets(text: str) -> dict[int, float]:
        toks = [t for t in " ".join(text.lower().strip().split()).split(" ") if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        out: dict[int, float] = {}
        for g in grams:
            b = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % num_buckets
            out[b] = out.get(b, 0.0) + 1.0
        tot = sum(out.values())
        if not tot:
            return {}
        feats = {b: c / tot for b, c in out.items()}
        feats[num_buckets] = 1.0
        return feats

    X = {i: buckets(t) for i, t in docs.items()}
    X = {i: f for i, f in X.items() if f}
    n = len(X)
    w: dict[int, float] = {}
    for _ in range(epochs):
        grad: dict[int, float] = {}
        for i, f in X.items():
            m = sum(w.get(b, 0.0) * x for b, x in f.items())
            e = 1.0 / (1.0 + math.exp(-m)) - labels[i]
            for b, x in f.items():
                grad[b] = grad.get(b, 0.0) + x * e / n
        for b, g in grad.items():
            w_b = w.get(b, 0.0)
            w[b] = w_b - lr * (g + l2 * w_b)
    return w
