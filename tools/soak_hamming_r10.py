"""Round-10 measurement: fingerprint_overlap_pairs_hamming's docstring
claims its near-match cost scales with the fingerprint VOCABULARY, not
the corpus. Two arms, designed so OUTPUT volume stays proportional to the
planted duplicates (a first cut that let output cardinality grow
quadratically measured the sink, not the matcher):

  stage arm    — simhash_near_pairs alone over V distinct hash values
                 (V = 10k / 100k / 1M; every even/odd slot pair is
                 hamming-1): the banding's own scaling in V.
  pipeline arm — the full kernel over N_assets = 10k / 100k / 1M assets,
                 3 slots each, vocabulary growing WITH the corpus (the
                 realistic regime: frame hashes are near-unique) and
                 ~N/50 planted dup assets reusing their predecessor's
                 slots — constant pair density across scales.

Hash synthesis is column math (no codec — this soaks the MATCHER):
H(slot) = (slot DIV 2 * 2) * 2654435761 % 2^59, bit 3 flipped on odd
slots, injective for slot < 2e8. One JSON line.

Usage: python tools/soak_hamming_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402

_H = "(CAST({s} AS BIGINT) DIV 2 * 2) * 2654435761L % 576460752303423488L"


def hash_of(slot_expr: str):
    base = F.expr(_H.format(s=slot_expr))
    flip = F.expr(f"CASE WHEN ({slot_expr}) % 2 = 1 THEN 8L ELSE 0L END")
    return base.bitwiseXOR(flip)


def main() -> None:
    from eth2dgraph_spark.pipeline.dedup import simhash_near_pairs
    from eth2dgraph_spark.pipeline.multimodal import fingerprint_overlap_pairs_hamming

    spark = get_spark("soak-hamming")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"arms": {}}

    for v in (10_000, 100_000, 1_000_000):
        vals = spark.range(v).select(hash_of("id").alias("h")).distinct().persist()
        vals.count()
        best = None
        for _ in range(2):
            t0 = time.time()
            cnt = simhash_near_pairs(
                vals.select(F.col("h").alias("id"), F.col("h").alias("simhash")),
                max_hamming=2,
                max_bucket=None,
            ).count()
            el = round(time.time() - t0, 2)
            best = el if best is None else min(best, el)
        vals.unpersist()
        out["arms"][f"stage:V={v}"] = {"sec": best, "value_pairs": cnt}
        print(f"stage:V={v}: {out['arms'][f'stage:V={v}']}", file=sys.stderr)

    for n_assets in (10_000, 100_000, 1_000_000):
        # posting i: asset = i DIV 3, frame slot = 3*src + i%3 where src is
        # the predecessor for planted dups (asset%50==0) — vocabulary ~3N
        p = (
            spark.range(3 * n_assets)
            .select(
                (F.col("id") / 3).cast("long").alias("asset_id"),
                hash_of(
                    "3 * (CASE WHEN (id DIV 3) % 50 = 0 AND id >= 3 "
                    "THEN id DIV 3 - 1 ELSE id DIV 3 END) + id % 3"
                ).alias("phash"),
            )
            .persist()
        )
        p.count()
        best = None
        for _ in range(2):
            t0 = time.time()
            cnt = fingerprint_overlap_pairs_hamming(
                p, max_hamming=2, min_shared=2, max_posting=1024
            ).count()
            el = round(time.time() - t0, 2)
            best = el if best is None else min(best, el)
        p.unpersist()
        key = f"pipeline:assets={n_assets}"
        out["arms"][key] = {"sec": best, "pairs": cnt}
        print(f"{key}: {out['arms'][key]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
