"""Round-14 interleaved A/B: parallelism pins in the Hamming pair kernels
(simhash_near_pairs uncapped branch + fingerprint_overlap_pairs_hamming)
vs the pre-pin forms, reconstructed in-process and swapped by
monkeypatching (gates resolve both functions at call time).

Context: under the session default parallelismFirst=false the flag A/B
measured video_near_frames 1.42x (base=4.57 respect=6.47) — the matches-
union stage carrying the whole pair expansion was coalesced to ~1 task.

Usage: python tools/measure_r14_hampin.py [reps] [query ...]
"""

from __future__ import annotations

import gc
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "video_near_frames",
    "audio_near_frames",
    "image_near_dups",
    "image_near_dups_jpeg",
]


def _legacy_simhash_near_pairs(signatures, max_hamming=3, num_chunks=6, max_bucket=None):
    # pre-pin uncapped branch only (capped branch unchanged; callers here
    # all pass max_bucket=None)
    from pyspark.sql import functions as F

    from eth2dgraph_spark.pipeline import dedup as D

    if max_bucket is not None:
        return _NEW_SIMHASH(signatures, max_hamming, num_chunks, max_bucket)
    banded = D.simhash_banded(signatures, max_hamming, num_chunks)
    banded = banded.localCheckpoint(eager=True)
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"), "band", "chunk")
    b = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"), "band", "chunk")
    cands = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _legacy_hamming_pairs(
    frame_hashes,
    max_hamming=2,
    min_shared=2,
    max_posting=1024,
    id_col="asset_id",
    hash_col="phash",
    max_bucket=None,
):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from eth2dgraph_spark.pipeline import dedup as D

    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    fps_ = (
        frame_hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(hash_col).alias("_fh"))
        .distinct()
    )
    capped = (
        fps_.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_fh")))
        .filter(F.col("_n") <= max_posting)
        .drop("_n")
        .localCheckpoint(eager=True)
    )
    vals = capped.select("_fh").distinct()
    ident = vals.select(F.col("_fh").alias("_h1"), F.col("_fh").alias("_h2"))
    if max_hamming == 0:
        matches = ident
    else:
        near = D.simhash_near_pairs(
            vals.select(F.col("_fh").alias("id"), F.col("_fh").alias("simhash")),
            max_hamming=max_hamming,
            max_bucket=max_bucket,
        ).select(F.col("id_a").alias("_h1"), F.col("id_b").alias("_h2"))
        matches = ident.unionByName(near).unionByName(
            near.select(F.col("_h2").alias("_h1"), F.col("_h1").alias("_h2"))
        )
    a = capped.select(F.col("id").alias("id_a"), F.col("_fh").alias("_h1"))
    b = capped.select(F.col("id").alias("id_b"), F.col("_fh").alias("_h2"))
    return (
        a.join(matches, "_h1")
        .join(b, "_h2")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.countDistinct(F.least("_h1", "_h2"), F.greatest("_h1", "_h2")).alias("n_shared")
        )
        .filter(F.col("n_shared") >= min_shared)
    )


def main() -> None:
    global _NEW_SIMHASH
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or DEFAULT_QUERIES

    from eth2dgraph_spark.session import get_spark

    spark = get_spark("m14-hampin")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    from eth2dgraph_spark.pipeline import dedup as D
    from eth2dgraph_spark.pipeline import multimodal as MM

    _NEW_SIMHASH = D.simhash_near_pairs
    new_ham = MM.fingerprint_overlap_pairs_hamming

    qs = E.queries()
    qs.update(E.bench_only_queries())
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    qs["last_block"](spark, SF_DIR).collect()
    qs[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    gc.collect()

    for name in names:
        old_ts, new_ts = [], []
        for _ in range(reps):
            for arm, ts in (("old", old_ts), ("new", new_ts)):
                if arm == "old":
                    D.simhash_near_pairs = _legacy_simhash_near_pairs
                    MM.fingerprint_overlap_pairs_hamming = _legacy_hamming_pairs
                else:
                    D.simhash_near_pairs = _NEW_SIMHASH
                    MM.fingerprint_overlap_pairs_hamming = new_ham
                spark.sparkContext.setJobDescription(f"{name}:{arm}")
                t0 = time.time()
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
                spark.catalog.clearCache()
                gc.collect()
        print(
            f"RESULT {name}: old={min(old_ts):.2f} new={min(new_ts):.2f} "
            f"ratio={min(new_ts) / min(old_ts):.2f} "
            f"(old_all={[round(t, 2) for t in old_ts]} new_all={[round(t, 2) for t in new_ts]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
