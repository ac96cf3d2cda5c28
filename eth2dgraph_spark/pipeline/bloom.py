"""Mergeable Bloom filter screen for incremental exact dedup.

The Dolma pipeline (Soldaini et al., ACL 2024 — a Bloom filter over
document/paragraph hashes drives its cross-batch exact dedup) screens
each new batch against the ACCUMULATED corpus with one bit-array probe
instead of a join. This module is that screen, Spark-shaped:

- **build** is one `mapInPandas` pass over the history's fingerprints:
  each partition sets bits in a local numpy array (k cells per
  fingerprint by double hashing — `sketch._cell_indices`, the Kirsch-
  Mitzenmacher construction), emits the array as packed int64 words, and
  the partials OR-merge distributively (posexplode + groupBy(pos) +
  bit_or — mergeable partials, the `sketch.countmin_partials`
  discipline). The driver collects exactly num_bits/64 longs, history-
  size-independent.
- **probe** broadcasts the merged words (a real
  `SparkContext.broadcast`, not a closure literal — GB-sized filters
  ship once per executor) and tests each new fingerprint's k bits in a
  vectorized Arrow-batched kernel.
- **screen** = probe + exact fallback: bloom-NEGATIVE rows are
  definitely unseen (no false negatives) and skip the join entirely;
  only bloom-POSITIVE rows anti-join the full history. The output is
  IDENTICAL to the plain anti-join — zero false drops by construction;
  the false-positive rate only controls how much of the batch still
  pays for the join (expected fpr·|fresh| extra join rows).

At 100 TB of history the anti-join's right side is the full fingerprint
table every batch; the screen reduces the join's LEFT side to the
duplicate rows plus an fpr-sized sliver, and the filter itself is
O(num_bits) — independent of history size — built once and reusable
across batches (OR-merge new batches' partials in).

Sizing: fpr ≈ (1 - e^(-k·n/m))^k for n fingerprints in m bits; the
default k=6 is optimal near m/n = 8.7 (fpr ≈ 1.3% at m/n = 8, 0.2% at
m/n = 16). Pick num_bits ≈ 16 × expected history size, rounded up to a
power of two (the modulo stays well-distributed either way).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sketch import _cell_indices, _with_hash_cols

DEFAULT_NUM_BITS = 1 << 23
DEFAULT_NUM_HASHES = 6


def bloom_partials(
    df: DataFrame,
    col: str = "fingerprint",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """One row per input partition: the partition's bit array as
    num_bits/64 packed int64 words (`words array<long>`). Hashing is
    JVM-side (xxhash64 twice); the kernel only does numpy index math."""
    if num_bits % 64:
        raise ValueError(f"bloom_partials: num_bits {num_bits} not a multiple of 64")
    n_words = num_bits // 64

    def kernel(batches):
        words = np.zeros(n_words, dtype=np.uint64)
        for pdf in batches:
            pdf = pdf.dropna(subset=[col])
            if pdf.empty:
                continue
            idx = _cell_indices(
                pdf["_h1"].to_numpy(np.int64),
                pdf["_h2"].to_numpy(np.int64),
                num_hashes,
                num_bits,
            ).reshape(-1)
            np.bitwise_or.at(
                words, idx >> 6, np.uint64(1) << (idx.astype(np.uint64) & np.uint64(63))
            )
        yield pd.DataFrame({"words": [words.view(np.int64).tolist()]})

    return _with_hash_cols(df.select(col), col).mapInPandas(
        kernel, schema="words array<long>"
    )


def bloom_merge(partials: DataFrame, num_bits: int = DEFAULT_NUM_BITS) -> np.ndarray:
    """OR-merge the per-partition word arrays distributively; the driver
    collects exactly num_bits/64 (pos, word) rows."""
    rows = (
        partials.select(F.posexplode("words").alias("pos", "w"))
        .groupBy("pos")
        .agg(F.bit_or("w").alias("w"))
        .collect()
    )
    words = np.zeros(num_bits // 64, dtype=np.int64)
    for r in rows:
        words[r["pos"]] = r["w"]
    return words.view(np.uint64)


def bloom_build(
    df: DataFrame,
    col: str = "fingerprint",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> np.ndarray:
    """The merged filter for `df`'s `col` values: a num_bits/64 uint64
    array. Reusable across batches — OR in new partials to extend."""
    return bloom_merge(bloom_partials(df, col, num_bits, num_hashes), num_bits)


def bloom_maybe_contains(
    df: DataFrame,
    words: np.ndarray,
    col: str = "fingerprint",
    num_hashes: int = DEFAULT_NUM_HASHES,
    out_col: str = "bloom_maybe_seen",
) -> DataFrame:
    """Append `out_col`: True iff all k probed bits are set (value may be
    in the filter — or a false positive); False is DEFINITIVE absence.
    NULL values probe NULL (unknown — callers route them to the exact
    path). The filter ships once per executor via a real broadcast.

    The probe is a vectorized pandas_udf over ONLY the two hash columns
    (r14, guide §4.1): the previous mapInPandas form shipped the ENTIRE
    row — document text included — JVM→Python→JVM just to compute one
    boolean, and the screen's two consumer branches paid that crossing
    twice. Now two longs cross per row and the payload never leaves the
    JVM. Same kernel math, identical output (pinned by tests)."""
    num_bits = int(words.size) * 64
    bc = df.sparkSession.sparkContext.broadcast(np.ascontiguousarray(words, np.uint64))

    # returnType-only pandas_udf form: under `from __future__ import
    # annotations` stringified pd.Series hints break decoration (the
    # bench.py warmup lesson)
    def _probe(h1, h2):
        w = bc.value
        out = pd.Series(pd.NA, index=h1.index, dtype="boolean")
        mask = h1.notna() & h2.notna()
        if mask.any():
            idx = _cell_indices(
                h1[mask].to_numpy(np.int64),
                h2[mask].to_numpy(np.int64),
                num_hashes,
                num_bits,
            )
            bits = (
                w[idx >> 6] >> (idx.astype(np.uint64) & np.uint64(63))
            ) & np.uint64(1)
            out[mask] = bits.all(axis=1)
        return out

    probe = F.pandas_udf(_probe, "boolean")
    return (
        _with_hash_cols(df, col)
        .withColumn(out_col, probe(F.col("_h1"), F.col("_h2")))
        .drop("_h1", "_h2")
    )


def bloom_screened_anti_join(
    new_df: DataFrame,
    seen: DataFrame,
    col: str = "fingerprint",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Rows of `new_df` whose `col` does NOT appear in `seen` — the exact
    anti-join's output (zero false drops), with the join's left side cut
    to the bloom-positive sliver. NULL fingerprints take the exact path
    (a NULL never matches in an anti-join, so they always survive —
    identical to the plain anti-join's NULL semantics)."""
    filt = bloom_build(seen, col, num_bits, num_hashes)
    # materialize the probed increment ONCE across the two branch
    # consumers (r14): fresh and maybe are both read inside the caller's
    # ONE union query, and without the cut each branch re-evaluated the
    # whole scan + fingerprint + probe subtree (the incr_curate_bloom plan
    # carried 6 document scans before the r14 probe slimming; 2 remained
    # from this split). r15: eager localCheckpoint instead of persist —
    # a persist() here could never be unpersisted (the caller gets a lazy
    # frame), and SQL cache entries live in the CacheManager until an
    # explicit unpersist/clearCache (the ContextCleaner only reclaims
    # GC'd RDD state), so repeated curate_increment calls in a long-lived
    # ingest session accumulated MEMORY_AND_DISK entries for the session
    # lifetime. Checkpoint blocks ARE plain RDD state: the ContextCleaner
    # frees them when the caller's frame is garbage-collected. Same
    # single-evaluation plan shape (both branches scan the checkpointed
    # RDD); measured interleaved A/B at sf0.1 (tools/measure_r15_bloom.py):
    # incr_curate_bloom 1.86 vs 1.98 s best-of-4 (0.94x, a wash-or-better).
    probed = bloom_maybe_contains(new_df, filt, col, num_hashes).localCheckpoint(
        eager=True
    )
    fresh = probed.filter(~F.coalesce(F.col("bloom_maybe_seen"), F.lit(True)))
    maybe = probed.filter(F.coalesce(F.col("bloom_maybe_seen"), F.lit(True)))
    survived = maybe.join(seen.select(col), col, "left_anti")
    return fresh.unionByName(survived).drop("bloom_maybe_seen")
