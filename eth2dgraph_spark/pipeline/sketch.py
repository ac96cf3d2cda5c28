"""Count-min sketch + Misra-Gries heavy hitters — the mergeable-sketch
companion to the exact explode->groupBy top-k baseline (`heavy_hitters`).

Why it exists: the exact baseline shuffles every distinct token. At 100 TB
corpus scale that shuffle is token-cardinality-sized; a mergeable sketch is
one combiner pass instead (reference analog: the frequency kernels of
src/analysys/similarities.rs:127-142 have the same count-then-rank shape).

Design, one pass over the data and bounded memory everywhere:

1. `countmin_partials` — mapInPandas; each input PARTITION emits ONE row:
   a flattened depth x width count-min sketch plus a Misra-Gries candidate
   summary capped at `cap` counters. Per Arrow batch the kernel does a
   value_counts (C speed) then a vectorized sketch update over the <=10k
   distinct tokens of the batch; memory is O(depth*width + cap) regardless
   of partition size or token cardinality.
2. Sketch merge happens IN SPARK: posexplode the flattened sketches and sum
   per cell (map-side partial aggregation applies), so the driver only ever
   collects the final depth x width matrix (~d*w*8 bytes), never one matrix
   per partition.
3. Candidate merge is a groupBy over <= partitions*cap (token, count) rows;
   Misra-Gries counts are lower bounds and merging by sum keeps the
   candidate guarantee (any token with global freq > N/cap survives).
4. `countmin_estimate` broadcasts the merged matrix into a pandas_udf and
   takes the min over the depth rows — the classic conservative CMS point
   query (estimate >= true count always; overshoot bounded by collisions).

Hashes are deterministic (md5-derived double hashing, Kirsch-Mitzenmacher),
so results are reproducible across runs, partitionings, and engines.
"""

from __future__ import annotations

import hashlib
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

_PARTIAL_SCHEMA = StructType(
    [
        StructField("sketch", ArrayType(LongType()), False),  # depth*width flat
        StructField("cand_token", ArrayType(StringType()), False),
        StructField("cand_count", ArrayType(LongType()), False),
    ]
)


def _token_hashes(tokens: "np.ndarray | list[str]", depth: int, width: int) -> np.ndarray:
    """(len(tokens), depth) array of cell indices via md5 double hashing —
    one md5 per token (C speed), depth derived rows for free."""
    n = len(tokens)
    idx = np.empty((n, depth), dtype=np.int64)
    for j, tok in enumerate(tokens):
        dg = hashlib.md5(str(tok).encode("utf-8")).digest()
        h1 = int.from_bytes(dg[:8], "big")
        h2 = int.from_bytes(dg[8:], "big") | 1  # odd -> full-period stride
        for i in range(depth):
            idx[j, i] = (h1 + i * h2) % width
    return idx


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
    """One row per input partition: (flattened sketch, MG candidates)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketch = np.zeros((depth, width), dtype=np.int64)
        mg: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[token_col].dropna().value_counts()
            if vc.empty:
                continue
            idx = _token_hashes(vc.index.to_numpy(), depth, width)
            cnts = vc.to_numpy(dtype=np.int64)
            for i in range(depth):
                np.add.at(sketch[i], idx[:, i], cnts)
            _mg_update(mg, vc, cap)
        toks = sorted(mg, key=lambda t: (-mg[t], t))
        yield pd.DataFrame(
            {
                "sketch": [sketch.reshape(-1).tolist()],
                "cand_token": [toks],
                "cand_count": [[mg[t] for t in toks]],
            }
        )

    return tokens.select(token_col).mapInPandas(kernel, schema=_PARTIAL_SCHEMA)


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
    """(token, mg_count) candidate pool: union of per-partition MG summaries,
    summed (MG counts are lower bounds; the sum keeps the guarantee), cut to
    a bounded pool by merged count before the estimate pass."""
    return (
        partials.select(
            F.explode(F.arrays_zip("cand_token", "cand_count")).alias("c")
        )
        .select(
            F.col("c.cand_token").alias("token"),
            F.col("c.cand_count").alias("mg_count"),
        )
        .groupBy("token")
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
    workers in the UDF closure (depth*width*8 bytes, broadcast-sized)."""
    depth, width = merged.shape
    sketch = merged  # closure capture

    @pandas_udf(LongType())
    def est(tokens: pd.Series) -> pd.Series:
        if tokens.empty:
            return pd.Series([], dtype="int64")
        idx = _token_hashes(tokens.to_numpy(), depth, width)
        vals = np.stack([sketch[i, idx[:, i]] for i in range(depth)])
        return pd.Series(vals.min(axis=0))

    return candidates.withColumn("cms_est", est(F.col(token_col)))


class StreamingCountMin:
    """Streaming accumulator over the SAME partials kernel — the mergeability
    property that makes the sketch a streaming-native heavy-hitters design:
    each micro-batch contributes per-partition partial rows (bounded:
    partitions x (depth*width + cap)); merging is element-wise addition for
    the sketch and capped Misra-Gries summation for candidates, both
    order-insensitive. Point this at foreachBatch and the final `topk()`
    equals the batch `countmin_topk` over the full data, because the merged
    CMS cells are exact sums no matter how the rows were micro-batched.

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

    def absorb_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """foreachBatch hook: run the partials kernel on the micro-batch and
        fold the (bounded) partial rows into the accumulated state."""
        rows = countmin_partials(
            batch_df, self.token_col, self.depth, self.width, self.cap
        ).collect()
        for r in rows:
            self.sketch += np.asarray(r["sketch"], dtype=np.int64).reshape(
                self.depth, self.width
            )
            vc = pd.Series(
                dict(zip(r["cand_token"], (int(c) for c in r["cand_count"])))
            )
            if not vc.empty:
                _mg_update(self.mg, vc, self.cap)

    def estimate(self, token: str) -> int:
        idx = _token_hashes([token], self.depth, self.width)
        return int(min(self.sketch[i, idx[0, i]] for i in range(self.depth)))

    def topk(self, k: int = 20) -> list[tuple[str, int]]:
        ests = [(t, self.estimate(t)) for t in self.mg]
        return sorted(ests, key=lambda te: (-te[1], te[0]))[:k]


def countmin_topk(
    tokens: DataFrame,
    token_col: str = "token",
    k: int = 20,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    cap: int = DEFAULT_CAP,
) -> DataFrame:
    """Approximate top-k heavy hitters: (token, cms_est), ordered by the
    sketch estimate. ONE distributed pass over the data (the cached partials
    frame, consumed by both the sketch merge and the candidate pool); every
    later step is bounded — depth*width merged cells, <=8192 candidate rows
    — so the estimate runs driver-side in numpy and the result comes back as
    a k-row local DataFrame. At 100 TB this is one combiner-style pass where
    the exact baseline shuffles every distinct token."""
    spark = tokens.sparkSession
    partials = countmin_partials(tokens, token_col, depth, width, cap).persist()
    try:
        merged = merge_sketch(partials, depth, width)
        cands = merged_candidates(partials).collect()  # bounded: <= max_candidates
    finally:
        partials.unpersist(blocking=False)
    if not cands:
        return spark.createDataFrame([], "token string, cms_est long")
    toks = [r["token"] for r in cands]
    idx = _token_hashes(toks, depth, width)
    ests = np.stack([merged[i, idx[:, i]] for i in range(depth)]).min(axis=0)
    ranked = sorted(zip(toks, ests.tolist()), key=lambda te: (-te[1], te[0]))[:k]
    return spark.createDataFrame(ranked, "token string, cms_est long")
