"""Count-min sketch + Misra-Gries heavy hitters — the mergeable-sketch
companion to the exact explode->groupBy top-k baseline (`heavy_hitters`).

Why it exists: the exact baseline shuffles every distinct token. At 100 TB
corpus scale that shuffle is token-cardinality-sized; a mergeable sketch is
one combiner pass instead (reference analog: the frequency kernels of
src/analysys/similarities.rs:127-142 have the same count-then-rank shape).

Design, one pass over the data and bounded memory everywhere:

1. Token hashing is JVM-side: two `xxhash64` columns (h1, and h2 salted)
   are computed IN-PLAN before the Python kernel, so the kernel never
   hashes a string — it derives all `depth` cell indices from (h1, h2) with
   pure-numpy Kirsch-Mitzenmacher double hashing `(h1 + i*h2|1) mod width`.
   (The previous design md5-hashed every distinct token in Python — the
   measured hot loop of `cms_topk`.)
2. `countmin_partials` — mapInPandas; each input PARTITION emits ONE row:
   a flattened depth x width count-min sketch plus a Misra-Gries candidate
   summary (token, count, h1, h2) capped at `cap` counters. Per Arrow batch
   the kernel does a C-speed groupby then a vectorized sketch update;
   memory is O(depth*width + cap) regardless of partition size or token
   cardinality.
3. Sketch merge happens IN SPARK: posexplode the flattened sketches and sum
   per cell (map-side partial aggregation applies), so the driver only ever
   collects the final depth x width matrix (~d*w*8 bytes), never one matrix
   per partition.
4. Candidate merge is a groupBy over <= partitions*cap (token, count) rows;
   Misra-Gries counts are lower bounds and merging by sum keeps the
   candidate guarantee (any token with global freq > N/cap survives).
5. `countmin_estimate` broadcasts the merged matrix into a pandas_udf and
   takes the min over the depth rows — the classic conservative CMS point
   query (estimate >= true count always; overshoot bounded by collisions).

Hashes are deterministic (Spark's xxhash64 is a fixed public algorithm),
so results are reproducible across runs and partitionings; candidate rows
carry their hashes, so driver-side estimation needs no re-hashing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 4096
DEFAULT_CAP = 1024  # Misra-Gries counters per partition

_H2_SALT = "cms-h2"  # second independent hash: xxhash64(token, salt)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("sketch", ArrayType(LongType()), False),  # depth*width flat
        StructField("cand_token", ArrayType(StringType()), False),
        StructField("cand_count", ArrayType(LongType()), False),
        StructField("cand_h1", ArrayType(LongType()), False),
        StructField("cand_h2", ArrayType(LongType()), False),
    ]
)


def _with_hash_cols(df: DataFrame, token_col: str) -> DataFrame:
    """Attach the two 64-bit hash columns IN-PLAN (JVM-side, codegen): the
    only hashing in the whole sketch path."""
    return df.withColumn("_h1", F.xxhash64(F.col(token_col))).withColumn(
        "_h2", F.xxhash64(F.col(token_col), F.lit(_H2_SALT))
    )


def _cell_indices(h1: np.ndarray, h2: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(n, depth) cell indices via double hashing — pure numpy, no per-token
    Python. int64 bits are reinterpreted as uint64 so the modular arithmetic
    is well-defined; `|1` makes the stride odd (full period)."""
    h1u = np.ascontiguousarray(h1, dtype=np.int64).view(np.uint64)
    h2u = np.ascontiguousarray(h2, dtype=np.int64).view(np.uint64) | np.uint64(1)
    strides = np.arange(depth, dtype=np.uint64)
    idx = (h1u[:, None] + strides[None, :] * h2u[:, None]) % np.uint64(width)
    return idx.astype(np.int64)


def _mg_update(mg: dict[str, int], vc: pd.Series, cap: int) -> None:
    """Batched Misra-Gries: absorb a batch's value_counts, then if over
    capacity subtract the (size-cap)-th smallest count from everyone and
    drop the non-positives — the standard batched compaction, preserving
    the `error <= N/cap` undercount guarantee."""
    for tok, c in vc.items():
        mg[tok] = mg.get(tok, 0) + int(c)
    if len(mg) > cap:
        counts = np.sort(np.fromiter(mg.values(), dtype=np.int64))
        cut = int(counts[len(mg) - cap - 1])
        for tok in list(mg):
            nc = mg[tok] - cut
            if nc <= 0:
                del mg[tok]
            else:
                mg[tok] = nc


def countmin_partials(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    cap: int = DEFAULT_CAP,
) -> DataFrame:
    """One row per input partition: (flattened sketch, MG candidates with
    their precomputed hashes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketch = np.zeros((depth, width), dtype=np.int64)
        mg: dict[str, int] = {}
        hashes: dict[str, tuple[int, int]] = {}
        for pdf in batches:
            pdf = pdf.dropna(subset=[token_col])
            if pdf.empty:
                continue
            g = pdf.groupby(token_col, sort=False).agg(
                cnt=(token_col, "size"), h1=("_h1", "first"), h2=("_h2", "first")
            )
            idx = _cell_indices(
                g["h1"].to_numpy(np.int64), g["h2"].to_numpy(np.int64), depth, width
            )
            cnts = g["cnt"].to_numpy(np.int64)
            for i in range(depth):
                np.add.at(sketch[i], idx[:, i], cnts)
            _mg_update(mg, g["cnt"], cap)
            hashes.update(zip(g.index, zip(g["h1"].tolist(), g["h2"].tolist())))
            # keep hash state bounded by cap, not vocabulary: every mg key's
            # hash was recorded by the batch that inserted it, so pruning to
            # mg keys preserves the emit invariant
            hashes = {t: hashes[t] for t in mg}
        toks = sorted(mg, key=lambda t: (-mg[t], t))
        yield pd.DataFrame(
            {
                "sketch": [sketch.reshape(-1).tolist()],
                "cand_token": [toks],
                "cand_count": [[mg[t] for t in toks]],
                "cand_h1": [[hashes[t][0] for t in toks]],
                "cand_h2": [[hashes[t][1] for t in toks]],
            }
        )

    return (
        _with_hash_cols(tokens.select(token_col), token_col)
        .mapInPandas(kernel, schema=_PARTIAL_SCHEMA)
    )


def merge_sketch(partials: DataFrame, depth: int, width: int) -> np.ndarray:
    """Distributed element-wise merge: posexplode + groupBy(pos) + sum runs
    with map-side partial aggregation; the driver collects exactly
    depth*width (pos, total) rows — bounded, partition-count-independent."""
    cells = (
        partials.select(F.posexplode("sketch").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("total"))
        .collect()
    )
    merged = np.zeros(depth * width, dtype=np.int64)
    for r in cells:
        merged[r["pos"]] = r["total"]
    return merged.reshape(depth, width)


def merged_candidates(partials: DataFrame, max_candidates: int = 8192) -> DataFrame:
    """(token, mg_count, h1, h2) candidate pool: union of per-partition MG
    summaries, summed (MG counts are lower bounds; the sum keeps the
    guarantee), cut to a bounded pool by merged count before the estimate
    pass. Hashes ride along so no step ever re-hashes a token."""
    return (
        partials.select(
            F.explode(
                F.arrays_zip("cand_token", "cand_count", "cand_h1", "cand_h2")
            ).alias("c")
        )
        .select(
            F.col("c.cand_token").alias("token"),
            F.col("c.cand_count").alias("mg_count"),
            F.col("c.cand_h1").alias("h1"),
            F.col("c.cand_h2").alias("h2"),
        )
        .groupBy("token", "h1", "h2")
        .agg(F.sum("mg_count").alias("mg_count"))
        .orderBy(F.desc("mg_count"), F.asc("token"))
        .limit(max_candidates)
    )


def countmin_estimate(
    candidates: DataFrame,
    merged: np.ndarray,
    token_col: str = "token",
) -> DataFrame:
    """Attach `cms_est` = min over depth rows of the merged sketch — the
    conservative point query (>= true count). The sketch matrix rides to the
    workers in the UDF closure (depth*width*8 bytes, broadcast-sized); token
    hashing stays JVM-side (xxhash64 columns feed the numpy kernel)."""
    depth, width = merged.shape
    sketch = merged  # closure capture

    @pandas_udf(LongType())
    def est(h1: pd.Series, h2: pd.Series) -> pd.Series:
        if h1.empty:
            return pd.Series([], dtype="int64")
        idx = _cell_indices(h1.to_numpy(np.int64), h2.to_numpy(np.int64), depth, width)
        vals = np.stack([sketch[i, idx[:, i]] for i in range(depth)])
        return pd.Series(vals.min(axis=0))

    return candidates.withColumn(
        "cms_est",
        est(F.xxhash64(F.col(token_col)), F.xxhash64(F.col(token_col), F.lit(_H2_SALT))),
    )


def _estimate_from_hashes(
    merged: np.ndarray, h1: np.ndarray, h2: np.ndarray
) -> np.ndarray:
    """Driver-side batch point query over precomputed hashes."""
    depth, width = merged.shape
    idx = _cell_indices(h1, h2, depth, width)
    return np.stack([merged[i, idx[:, i]] for i in range(depth)]).min(axis=0)


class StreamingCountMin:
    """Streaming accumulator over the SAME partials kernel — the mergeability
    property that makes the sketch a streaming-native heavy-hitters design:
    each micro-batch's partials are pre-merged IN SPARK (the `merge_sketch`
    groupBy for cells, the `merged_candidates` groupBy for candidates), so
    the driver receives O(depth*width + cap) rows per batch REGARDLESS of
    how many partitions the micro-batch had. Merging is element-wise
    addition for the sketch and capped Misra-Gries summation for
    candidates, both order-insensitive.

    Equivalence to the batch `countmin_topk`: the merged CMS cells are
    exact sums no matter how rows were micro-batched, so point estimates
    are identical. The Misra-Gries candidate SET, however, is
    merge-order/compaction dependent near the tail — the guarantee is that
    any token with true frequency > N/cap is in both candidate sets, so
    `topk()` equals the batch top-k exactly for true heavy hitters
    (freq > N/cap) and may differ only among threshold-straddling tail
    tokens.

    State lives on the driver and is O(depth*width + cap) — it never grows
    with the stream."""

    def __init__(
        self,
        token_col: str = "token",
        depth: int = DEFAULT_DEPTH,
        width: int = DEFAULT_WIDTH,
        cap: int = DEFAULT_CAP,
    ) -> None:
        self.token_col = token_col
        self.depth, self.width, self.cap = depth, width, cap
        self.sketch = np.zeros((depth, width), dtype=np.int64)
        self.mg: dict[str, int] = {}
        self.hashes: dict[str, tuple[int, int]] = {}
        self._spark = None  # captured on first absorb; used for cold lookups

    def absorb_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """foreachBatch hook: run the partials kernel on the micro-batch,
        pre-merge in Spark, and fold the bounded result into the state.
        Two actions per batch over a persisted partials frame; the collects
        are depth*width cells + <=4*cap candidate rows, independent of the
        micro-batch's partition count."""
        self._spark = batch_df.sparkSession
        partials = countmin_partials(
            batch_df, self.token_col, self.depth, self.width, self.cap
        ).persist()
        try:
            self.sketch += merge_sketch(partials, self.depth, self.width)
            cands = merged_candidates(partials, max_candidates=4 * self.cap).collect()
        finally:
            partials.unpersist(blocking=False)
        if cands:
            vc = pd.Series({r["token"]: int(r["mg_count"]) for r in cands})
            _mg_update(self.mg, vc, self.cap)
            self.hashes.update({r["token"]: (r["h1"], r["h2"]) for r in cands})
            # prune to surviving MG keys: without this, a churning vocabulary
            # adds up to 4*cap entries per batch and driver state grows with
            # stream lifetime, breaking the O(depth*width + cap) guarantee
            self.hashes = {t: h for t, h in self.hashes.items() if t in self.mg}

    def _hashes_for(self, token: str) -> tuple[int, int]:
        hp = self.hashes.get(token)
        if hp is None:
            if self._spark is None:
                raise ValueError(
                    "cannot estimate an unseen token before any batch was absorbed"
                )
            row = (
                self._spark.range(1)
                .select(
                    F.xxhash64(F.lit(token)).alias("h1"),
                    F.xxhash64(F.lit(token), F.lit(_H2_SALT)).alias("h2"),
                )
                .first()
            )
            hp = (row["h1"], row["h2"])
            self.hashes[token] = hp
        return hp

    def estimate(self, token: str) -> int:
        h1, h2 = self._hashes_for(token)
        return int(
            _estimate_from_hashes(self.sketch, np.array([h1]), np.array([h2]))[0]
        )

    def topk(self, k: int = 20) -> list[tuple[str, int]]:
        toks = list(self.mg)
        if not toks:
            return []
        hs = np.array([self.hashes[t] for t in toks], dtype=np.int64)
        ests = _estimate_from_hashes(self.sketch, hs[:, 0], hs[:, 1])
        ranked = sorted(zip(toks, ests.tolist()), key=lambda te: (-te[1], te[0]))
        return ranked[:k]


def countmin_topk_and_total(
    tokens: DataFrame,
    token_col: str = "token",
    k: int = 20,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    cap: int = DEFAULT_CAP,
) -> tuple[DataFrame, int]:
    """Approximate top-k heavy hitters plus the exact total token count,
    read off the sketch for free (every sketch row sums to N — each token
    occurrence increments exactly one cell per row), saving callers a
    separate full count pass. ONE distributed pass over the data (the
    cached partials frame, consumed by both the sketch merge and the
    candidate pool); every later step is bounded — depth*width merged
    cells, <=8192 candidate rows — so the estimate runs driver-side in
    numpy (over the hashes the candidates already carry) and the result
    comes back as a k-row local DataFrame. At 100 TB this is one
    combiner-style pass where the exact baseline shuffles every distinct
    token."""
    spark = tokens.sparkSession
    partials = countmin_partials(tokens, token_col, depth, width, cap).persist()
    try:
        merged = merge_sketch(partials, depth, width)
        cands = merged_candidates(partials).collect()  # bounded: <= max_candidates
    finally:
        partials.unpersist(blocking=False)
    total = int(merged[0].sum())
    if not cands:
        return spark.createDataFrame([], "token string, cms_est long"), total
    toks = [r["token"] for r in cands]
    hs = np.array([(r["h1"], r["h2"]) for r in cands], dtype=np.int64)
    ests = _estimate_from_hashes(merged, hs[:, 0], hs[:, 1])
    ranked = sorted(zip(toks, ests.tolist()), key=lambda te: (-te[1], te[0]))[:k]
    return spark.createDataFrame(ranked, "token string, cms_est long"), total


def countmin_topk(
    tokens: DataFrame,
    token_col: str = "token",
    k: int = 20,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    cap: int = DEFAULT_CAP,
) -> DataFrame:
    """`countmin_topk_and_total` without the total — see there."""
    return countmin_topk_and_total(tokens, token_col, k, depth, width, cap)[0]
