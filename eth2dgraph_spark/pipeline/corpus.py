"""End-to-end corpus curation: the composed training-data pipeline run.

The individual operators (dedup, quality, lang ID, token counting, split)
are each gated on their own; this module chains them the way a real
pretraining-data job does — one declarative DAG, so Catalyst fuses the
column stages and the only shuffles are the ones the semantics require
(the dedup groupBy; everything downstream of it is narrow).

Stage order is deliberate: dedup FIRST (cheapest way to shrink the corpus
before any scoring work), then the pure-column filters (quality, lang),
then bookkeeping (token counts, split assignment). At 100 TB the dedup
shuffle moves 16-byte digests, not text; every later stage is
shuffle-free column math on the surviving rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_exact
from .split import hash_split
from .text import lang_id, quality_score, repetition_stats, token_count


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    fractions: dict[str, float] | None = None,
    max_dup_word_ratio: float | None = None,
    max_top_word_ratio: float | None = None,
    fingerprint_col: str | None = None,
    max_ppl: float | None = None,
    lm_reference: DataFrame | None = None,
    lm_n: int = 2,
    min_clf_score: float | None = None,
    clf_positive: DataFrame | None = None,
    clf_negative: DataFrame | None = None,
    clf_epochs: int | None = None,
    clf_lr: float | None = None,
    clf_num_buckets: int | None = None,
    max_top_ngram_fracs: dict[int, float] | None = None,
    max_dup_ngram_fracs: dict[int, float] | None = None,
) -> DataFrame:
    """Per-document curated frame: exact-dedup representatives that pass the
    quality floor (and, when the thresholds are set, the Gopher-style
    repetition filters and the CCNet-style LM perplexity cut), annotated
    with (lang_pred, n_tokens_ws, n_tokens_bpe_est, quality_score, split).
    Deterministic end to end — every stage is either exact or hash-based,
    so the same corpus always curates identically. `fingerprint_col`
    forwards a precomputed fingerprint to the dedup stage (see dedup_exact).

    `max_ppl` enables the perplexity filter and REQUIRES `lm_reference`
    (the LM training corpus): self-scoring here would make every kept/
    dropped decision depend on the whole evolving corpus, silently
    breaking curate_increment's append-equivalence — a fixed reference
    keeps scores append-stable. Docs too short to score (ppl NULL) are
    KEPT: an unscorable document is not evidence of low quality, and the
    length-sensitive filters already own that axis.

    `min_clf_score` enables the trained quality classifier (GPT-3 /
    CCNet-style, pipeline/classifier.py) and REQUIRES both `clf_positive`
    (curated exemplars) and `clf_negative` (raw/rejected exemplars) as
    FIXED reference frames — training on the evolving corpus itself would
    break append-equivalence exactly like LM self-scoring. Unscorable
    docs (no grams) are kept, the max_ppl convention."""
    kept = dedup_exact(df, id_col, text_col, fingerprint_col=fingerprint_col)
    scored = quality_score(kept, text_col).filter(F.col("quality_score") >= min_quality)
    if max_dup_word_ratio is not None or max_top_word_ratio is not None:
        scored = repetition_stats(scored, text_col)
        if max_dup_word_ratio is not None:
            scored = scored.filter(F.col("dup_word_ratio") <= max_dup_word_ratio)
        if max_top_word_ratio is not None:
            scored = scored.filter(F.col("top_word_ratio") <= max_top_word_ratio)
    if max_top_ngram_fracs or max_dup_ngram_fracs:
        # Gopher A1.1's n-gram repetition cuts (e.g. {2: 0.20, 3: 0.18,
        # 4: 0.16} / {5: 0.15, 6: 0.14}): per-doc pure functions of the
        # text, so append-equivalence is preserved; the fraction columns
        # are dropped after filtering to keep the output schema stable.
        from .text import ngram_repetition_fractions

        top_ns = tuple(sorted((max_top_ngram_fracs or {}).keys()))
        dup_ns = tuple(sorted((max_dup_ngram_fracs or {}).keys()))
        fr = ngram_repetition_fractions(
            scored, text_col=text_col, id_col=id_col, top_ns=top_ns, dup_ns=dup_ns
        )
        frac_cols = [f"top{n}_frac" for n in top_ns] + [
            f"dup{n}_frac" for n in dup_ns
        ]
        scored = scored.join(
            fr.select(F.col("id").alias(id_col), *frac_cols), id_col, "left"
        )
        for n, cut in (max_top_ngram_fracs or {}).items():
            scored = scored.filter(
                F.coalesce(F.col(f"top{n}_frac"), F.lit(0.0)) <= cut
            )
        for n, cut in (max_dup_ngram_fracs or {}).items():
            scored = scored.filter(
                F.coalesce(F.col(f"dup{n}_frac"), F.lit(0.0)) <= cut
            )
        scored = scored.drop(*frac_cols)
    if max_ppl is not None:
        if lm_reference is None:
            raise ValueError(
                "curate_corpus: max_ppl needs an explicit lm_reference — "
                "self-scoring would break curate_increment's append-equivalence"
            )
        from .importance import ngram_lm_scores

        ppl = ngram_lm_scores(scored, lm_reference, lm_n, text_col, id_col).select(
            F.col("id").alias(id_col), "ppl"
        )
        scored = scored.join(ppl, id_col, "left").filter(
            F.col("ppl").isNull() | (F.col("ppl") <= max_ppl)
        ).drop("ppl")
    if min_clf_score is not None:
        if clf_positive is None or clf_negative is None:
            raise ValueError(
                "curate_corpus: min_clf_score needs explicit clf_positive "
                "and clf_negative reference frames — training on the "
                "corpus itself would break curate_increment's "
                "append-equivalence"
            )
        from .classifier import (
            DEFAULT_EPOCHS,
            DEFAULT_LR,
            DEFAULT_NUM_BUCKETS,
            quality_classifier_scores,
            train_quality_classifier,
        )

        from pyspark.sql import Window

        nb = clf_num_buckets if clf_num_buckets is not None else DEFAULT_NUM_BUCKETS
        # re-id the references so pos/neg doc_id collisions can't merge
        # two documents' features in the training groupBy. The id must be
        # CONTENT-derived, not monotonically_increasing_id(): training
        # persists only the feature frame while the label frame re-derives
        # its ids on every epoch's action, so a nondeterministic id would
        # silently pair cached features with the wrong labels. Duplicate
        # (label, text) rows get a row_number suffix — identical rows are
        # interchangeable, so any numbering of them yields the same
        # (id -> label, id -> features) multiset on every re-evaluation.
        dup_w = Window.partitionBy("_clf_fp").orderBy("_clf_fp")
        labeled = (
            clf_positive.select(F.col(text_col), F.lit(1.0).alias("label"))
            .unionByName(
                clf_negative.select(F.col(text_col), F.lit(0.0).alias("label"))
            )
            .withColumn("_clf_fp", F.xxhash64(F.col("label"), F.col(text_col)))
            .withColumn(
                "_clf_id",
                F.concat_ws("#", F.col("_clf_fp"), F.row_number().over(dup_w)),
            )
            .drop("_clf_fp")
        )
        w = train_quality_classifier(
            labeled,
            label_col="label",
            text_col=text_col,
            id_col="_clf_id",
            num_buckets=nb,
            epochs=clf_epochs if clf_epochs is not None else DEFAULT_EPOCHS,
            lr=clf_lr if clf_lr is not None else DEFAULT_LR,
        )
        cs = quality_classifier_scores(scored, w, text_col, id_col, nb).select(
            F.col("id").alias(id_col), "clf_score"
        )
        scored = scored.join(cs, id_col, "left").filter(
            F.col("clf_score").isNull() | (F.col("clf_score") >= min_clf_score)
        ).drop("clf_score")
    tagged = lang_id(scored, text_col)
    counted = token_count(tagged, text_col)
    assigned = hash_split(counted, id_col, fractions)
    return assigned.select(
        id_col, "lang_pred", "n_tokens_ws", "n_tokens_bpe_est", "quality_score", "split"
    )


def curate_increment(
    new_df: DataFrame,
    seen_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    fractions: dict[str, float] | None = None,
    bloom_num_bits: int | None = None,
    bloom_num_hashes: int | None = None,
    **filters,
) -> DataFrame:
    """Incremental curation: curate ONLY the new batch, dropping documents
    whose normalized-text fingerprint already appeared in the corpus
    (`seen_fingerprints`: one `fingerprint` column covering every document
    ever ingested, kept or not — dedup history, not the curated set).

    Append-equivalence: with monotonically increasing ids across batches
    (the normal ingestion order), curating everything in one shot equals
    curating each increment against the accumulated fingerprint set —
    every stage is hash- or min-id-based, so no rerun ever reshuffles
    earlier decisions. The anti-join is the only interaction with corpus
    history; at 100 TB that is a join against a fingerprint-only table
    (16 bytes/doc), not against the corpus text.

    `bloom_num_bits` turns on the Dolma-style Bloom screen
    (pipeline/bloom.py): bloom-negative rows skip the history join
    entirely and only the positive sliver anti-joins — the OUTPUT is
    identical (no false negatives ⇒ zero false drops; the screened gate
    reuses the unscreened oracle to prove it cross-engine), but the
    per-batch join cost stops scaling with how much of the batch is
    fresh. Size it ~16 bits per history row."""
    from .text import fingerprint

    # keep the fingerprint column: the dedup stage inside curate_corpus
    # reuses it instead of re-normalizing + re-hashing every document's
    # text a second time (the dominant column work of the increment)
    printed = fingerprint(new_df, text_col)
    if bloom_num_bits is not None:
        from . import bloom

        fresh = bloom.bloom_screened_anti_join(
            printed,
            seen_fingerprints.select("fingerprint"),
            "fingerprint",
            bloom_num_bits,
            bloom_num_hashes if bloom_num_hashes is not None else bloom.DEFAULT_NUM_HASHES,
        ).drop("fingerprint64")
    else:
        fresh = printed.join(
            seen_fingerprints.select("fingerprint"), "fingerprint", "left_anti"
        ).drop("fingerprint64")
    return curate_corpus(
        fresh, id_col, text_col, min_quality, fractions,
        fingerprint_col="fingerprint", **filters,
    )


def corpus_report(curated: DataFrame) -> DataFrame:
    """Curation summary per (lang, split): document and token counts — the
    run report a data job publishes (and the oracle-gated aggregate)."""
    return curated.groupBy("lang_pred", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens_ws").alias("total_tokens_ws"),
        F.sum("n_tokens_bpe_est").alias("total_tokens_bpe"),
    )
