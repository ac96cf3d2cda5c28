"""Round-14 interleaved A/B: quality_clf with the persisted feature frame
PINNED on id (shipped, classifier.pin_features) vs unpinned (the
pre-change form reconstructed inline). Interleaved per rep so host noise
hits both arms equally.

Usage: python tools/measure_r14_clfpin.py [reps]
"""

from __future__ import annotations

import gc
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _quality_clf_unpinned(spark, sf):
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    import __spark_entry__ as E
    from eth2dgraph_spark.pipeline import classifier

    d = E._t(spark, sf, "documents")
    labeled = d.withColumn(
        "label", F.col("source").isin("src0", "src1").cast("double")
    )
    feats = classifier.l1_hashed_features(d, num_buckets=512).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    w = classifier.train_quality_classifier(
        labeled, num_buckets=512, epochs=2, feats=feats
    )
    s = classifier.quality_classifier_scores(d, w, num_buckets=512, feats=feats)
    return s.select("id", E._r6e("clf_score").alias("clf_score"))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("m14-clfpin")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    arms = {"new": qs["quality_clf"], "old": _quality_clf_unpinned}
    # throwaway warm run of each arm (JIT + python workers)
    for fn in arms.values():
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        gc.collect()
    times = {a: [] for a in arms}
    for _ in range(reps):
        for arm, fn in arms.items():
            spark.sparkContext.setJobDescription(f"clfpin:{arm}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[arm].append(time.time() - t0)
            spark.catalog.clearCache()
            gc.collect()
    for arm, ts in times.items():
        print(f"RESULT {arm}: best={min(ts):.2f}s all={[round(t, 2) for t in ts]}")
    print(f"RATIO best new/old = {min(times['new']) / min(times['old']):.3f}")


if __name__ == "__main__":
    main()
