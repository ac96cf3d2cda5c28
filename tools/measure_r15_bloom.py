"""r15 interleaved A/B: bloom_screened_anti_join probed-increment
persist (r14 form) vs eager localCheckpoint (r15 lifecycle fix).

The legacy form is reconstructed in-process (monkeypatched persist) so
both arms run interleaved in one session on the same box state.

Usage: python tools/measure_r15_bloom.py [reps]
"""

from __future__ import annotations

import gc
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from eth2dgraph_spark.session import get_spark
    from eth2dgraph_spark.pipeline import bloom as B

    spark = get_spark("m15-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    def legacy_screened(new_df, seen, col="fingerprint",
                        num_bits=B.DEFAULT_NUM_BITS, num_hashes=B.DEFAULT_NUM_HASHES):
        filt = B.bloom_build(seen, col, num_bits, num_hashes)
        probed = B.bloom_maybe_contains(new_df, filt, col, num_hashes).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        fresh = probed.filter(~F.coalesce(F.col("bloom_maybe_seen"), F.lit(True)))
        maybe = probed.filter(F.coalesce(F.col("bloom_maybe_seen"), F.lit(True)))
        survived = maybe.join(seen.select(col), col, "left_anti")
        return fresh.unionByName(survived).drop("bloom_maybe_seen")

    current = B.bloom_screened_anti_join

    def run(name):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        qs["incr_curate_bloom"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        return dt

    # warmup both arms once
    for arm in ("ckpt", "persist"):
        B.bloom_screened_anti_join = current if arm == "ckpt" else legacy_screened
        # the gate imports the function via module attribute? verify below
        run("warm-" + arm)

    res = {"ckpt": [], "persist": []}
    for r in range(reps):
        for arm in ("ckpt", "persist"):
            B.bloom_screened_anti_join = current if arm == "ckpt" else legacy_screened
            res[arm].append(run(f"{arm}-{r}"))
    B.bloom_screened_anti_join = current
    for arm, ts in res.items():
        print(f"RESULT {arm}: best={min(ts):.2f} all={[round(t,2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
