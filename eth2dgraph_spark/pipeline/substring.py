"""Substring-level exact deduplication (ExactSubstr, Lee et al., ACL'22
"Deduplicating Training Data Makes Language Models Better").

The paper finds that web corpora contain verbatim substrings repeated
across otherwise-distinct documents (quoted passages, templated spans,
licence text) and removes every duplicated substring of >= 50 tokens.
Its single-node implementation builds a suffix array over the whole
corpus; that structure doesn't distribute. The published distributable
equivalence this module uses instead: a substring of >= w tokens is
duplicated iff every one of its sliding w-token windows is duplicated,
so hashing ALL sliding w-token windows, keeping the ones whose content
occurs >= 2 times in the corpus, and merging each document's duplicated
window offsets into spans marks exactly the duplicated substrings of
length >= w (span resolution is w tokens: up to w-1 unique neighbor
tokens adjacent to a duplicated span are absorbed into it — the same
boundary slack the paper accepts when cutting at window edges).

This is a different axis from every other dedup in the package:
whole-document (pipeline/dedup.py), near-dup (MinHash/SimHash/Jaccard),
passage-level boilerplate (pipeline/text.py — NON-overlapping windows
dropped only when shared by many DISTINCT docs). Here windows OVERLAP,
within-document repeats count, and the unit removed is an arbitrary
token span.

Scale shape (the 100 TB contract):
- windows are built IN-ROW from pure column expressions (split ->
  sequence -> slice -> array_join -> md5), the text.passage_hashes
  pattern — no explode-then-regroup shuffle to assemble windows;
- the exploded frame carries only (id, off, 60-bit wh): every shuffle
  key is a long, never window text;
- global occurrence counting is count(1) OVER (PARTITION BY wh) — ONE
  shuffle of the window frame, spillable hot keys, the exact mechanics
  the round-7 ngram_jaccard A/B measured faster than count-agg+semi-join
  (tools/measure_r7.py);
- per-document offset lists are bounded by the document's own window
  count, so the collect_list buffer is doc-sized, never corpus-sized;
- span merge and text rebuild are in-row array folds over the ORIGINAL
  token array (the text.drop_boilerplate_passages slice-and-rejoin
  technique) — rebuilt text never shuffles.

Oracle-gated cross-engine in __spark_entry__.py (substring_stats,
substring_clean, substring_keep_first); rebuild invariants are
property-tested in tests/test_substring.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import _WS, md5_60bit

# The paper's duplicated-substring granularity: 50 BPE tokens. Ours are
# whitespace tokens (the package-wide token rule); same order of
# magnitude of content per window.
DEFAULT_WINDOW = 50

_SPAN_T = "array<struct<s:bigint,e:bigint>>"


def _split_tokens(text_col: str):
    """Whitespace tokens of the trimmed ORIGINAL text (case/punctuation
    preserved — the rebuild must return the document's own words), with
    zero-length tokens dropped so empty/whitespace-only docs yield []
    rather than the phantom [''] (the importance._norm_tokens rule)."""
    return F.filter(
        F.split(F.trim(F.col(text_col)), _WS), lambda x: F.length(x) > 0
    )


def token_window_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
) -> DataFrame:
    """(id, off, wh) rows: every sliding `window`-token window, as the
    60-bit md5 hash of its space-joined tokens, with its 0-based token
    offset. Docs with fewer than `window` tokens yield no rows (nothing
    of length >= window can be duplicated in them).

    The F.when guard matters: Spark's sequence(0, n) DESCENDS when
    n < 0, so under-window docs must short-circuit to an empty array,
    not an empty sequence."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = _split_tokens(text_col)
    wins = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - window),
            lambda i: F.struct(
                i.cast("long").alias("off"),
                md5_60bit(F.array_join(F.slice(toks, i + 1, window), " ")).alias("wh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<off:bigint,wh:bigint>>"))
    return df.select(F.col(id_col).alias("id"), F.explode(wins).alias("w")).select(
        "id", "w.off", "w.wh"
    )


def duplicate_window_offsets(
    windows: DataFrame,
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """(id, off) occurrences whose window content occurs >= `min_count`
    times corpus-wide — occurrence count, not document frequency, so a
    span repeated twice inside ONE document is duplicated (the paper's
    rule; passage-level boilerplate deliberately chooses the other).

    keep_first=False (default) marks EVERY occurrence — remove all
    copies. keep_first=True exempts the globally first occurrence
    (smallest (id, off)) of each window hash, approximating the paper's
    keep-one-copy variant at window resolution; note that with
    overlapping windows the kept occurrence's neighbors may still lose
    their own duplicated windows, so keep-first guarantees at least the
    anchor window of each duplicated substring survives somewhere, not
    the whole maximal substring.

    One shuffle on wh (spillable window aggregate); the row_number for
    keep_first rides the same partitioning."""
    w = Window.partitionBy("wh")
    out = windows.withColumn("_n", F.count(F.lit(1)).over(w))
    if keep_first:
        out = out.withColumn(
            "_rn", F.row_number().over(w.orderBy("id", "off"))
        ).filter((F.col("_n") >= min_count) & (F.col("_rn") > 1))
    else:
        out = out.filter(F.col("_n") >= min_count)
    return out.select("id", "off")


def _doc_offsets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    min_count: int,
    keep_first: bool,
) -> DataFrame:
    """df plus `_offs`: each doc's sorted duplicated-window offsets
    (empty array when none). Only (id, long-offset) rows shuffle."""
    dups = duplicate_window_offsets(
        token_window_hashes(df, id_col, text_col, window), min_count, keep_first
    )
    per_doc = dups.groupBy("id").agg(F.sort_array(F.collect_list("off")).alias("_offs"))
    per_doc = per_doc.select(F.col("id").alias("_ss_id"), "_offs")
    return (
        df.join(per_doc, df[id_col] == F.col("_ss_id"), "left")
        .withColumn("_offs", F.coalesce(F.col("_offs"), F.array().cast("array<bigint>")))
        .drop("_ss_id")
    )


def _merged_spans(offs, window: int):
    """Sorted duplicate-window offsets -> disjoint merged [s, e) token
    spans, as an in-row fold: each offset covers [o, o+window); an offset
    within (or adjacent to) the running span extends it, otherwise it
    opens a new one. Offsets ascend, so the running span is always the
    array's last element."""
    last = F.element_at  # readability alias

    def step(acc, o):
        prev_e = last(acc, -1)["e"]
        extended = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last(acc, -1)["s"].alias("s"),
                    F.greatest(prev_e, o + F.lit(window)).alias("e"),
                )
            ),
        )
        fresh = F.concat(
            acc, F.array(F.struct(o.alias("s"), (o + F.lit(window)).alias("e")))
        )
        return F.when((F.size(acc) > 0) & (o <= prev_e), extended).otherwise(fresh)

    return F.aggregate(offs, F.array().cast(_SPAN_T), step)


def substring_drop_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Per-document audit of what drop_duplicate_substrings would do:
    (id_col, n_tokens, n_windows, n_dup_windows, n_dropped_tokens).
    Run it to tune `window`/`min_count`; the primary oracle-gated form."""
    out = _doc_offsets(df, id_col, text_col, window, min_count, keep_first)
    toks = _split_tokens(text_col)
    spans = _merged_spans(F.col("_offs"), window)
    dropped = F.aggregate(
        spans, F.lit(0).cast("bigint"), lambda a, sp: a + sp["e"] - sp["s"]
    )
    n_toks = F.size(toks).cast("long")
    return out.select(
        F.col(id_col),
        n_toks.alias("n_tokens"),
        F.greatest(n_toks - F.lit(window - 1), F.lit(0)).alias("n_windows"),
        F.size("_offs").cast("long").alias("n_dup_windows"),
        dropped.alias("n_dropped_tokens"),
    )


def drop_duplicate_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_clean",
    window: int = DEFAULT_WINDOW,
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Input plus `out_col` (the text with duplicated >= window-token
    spans removed, surviving tokens re-joined with single spaces in
    order) and `n_tokens_dropped`. A document that is ONE duplicated
    span keeps an empty string — filter downstream, same contract as
    drop_boilerplate_passages. Documents with no duplicated windows get
    their tokens re-joined unchanged (whitespace normalizes to single
    spaces; content identity under norm_ws is preserved — property-
    tested)."""
    out = _doc_offsets(df, id_col, text_col, window, min_count, keep_first)
    toks = _split_tokens(text_col)
    spans = _merged_spans(F.col("_offs"), window)
    # kept token ranges are the gaps between spans: starts = [0] + span
    # ends, ends = span starts + [n]; spans are disjoint ascending so
    # every gap is well-formed (possibly empty)
    gap_starts = F.concat(F.array(F.lit(0).cast("bigint")), F.transform(spans, lambda x: x["e"]))
    gap_ends = F.concat(
        F.transform(spans, lambda x: x["s"]), F.array(F.size(toks).cast("bigint"))
    )
    rebuilt = F.array_join(
        F.flatten(
            F.zip_with(
                gap_starts,
                gap_ends,
                lambda s, e: F.slice(
                    toks, (s + 1).cast("int"), F.greatest(e - s, F.lit(0)).cast("int")
                ),
            )
        ),
        " ",
    )
    dropped = F.aggregate(
        spans, F.lit(0).cast("bigint"), lambda a, sp: a + sp["e"] - sp["s"]
    )
    return (
        out.withColumn(out_col, rebuilt)
        .withColumn("n_tokens_dropped", dropped)
        .drop("_offs")
    )
