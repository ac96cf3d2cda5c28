"""r15 phase profile of the minhash signature path (VERDICT r14 item 5):
where does minhash_signatures / minhash_lsh_pairs time actually go?

Phases timed isolated (noop sink, clearCache+gc between, best-of-N):
  p1_scan      documents scan + select only
  p2_shingle   _exploded_shingles (split/transform into shingles)
  p3_hash      p2 + md5-60bit + mod prime (the per-shingle hash)
  p4_sigs      full minhash_signatures (p3 + 32-min groupBy)
  p5_band      p4 + banding explode + groupBy(band,key) candidates
  q_minhash_signatures / q_minhash_lsh_pairs: the gates end-to-end

Usage: python tools/measure_r15_minhash.py [reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from eth2dgraph_spark.session import get_spark
    from eth2dgraph_spark.pipeline import dedup as D
    from eth2dgraph_spark.sources.testdata import read_table

    spark = get_spark("m15-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")

    def p1(s):
        return docs

    def p2(s):
        return D._exploded_shingles(docs, "doc_id", "text", 3)

    def p3(s):
        return D._exploded_shingles(docs, "doc_id", "text", 3).withColumn(
            "x", D._shingle_hash64(F.col("shingle")) % F.lit(D._MINHASH_PRIME)
        )

    def p4(s):
        return D.minhash_signatures(docs, "doc_id", "text", 3, 32)

    def p5(s):
        sigs = D.minhash_signatures(docs, "doc_id", "text", 3, 32)
        return D.minhash_lsh_candidates(sigs, num_bands=8, rows_per_band=4)

    frames = {"p1_scan": p1, "p2_shingle": p2, "p3_hash": p3, "p4_sigs": p4, "p5_band": p5}

    def run(name, thunk):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        thunk(spark).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        return dt

    # warm
    run("warm", p4)
    for name, thunk in frames.items():
        ts = [run(f"{name}-{r}", thunk) for r in range(reps)]
        print(f"RESULT {name}: best={min(ts):.2f} all={[round(t, 2) for t in ts]}", flush=True)
    for q in ("minhash_signatures", "minhash_lsh_pairs"):
        ts = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{q}-{r}")
            t0 = time.time()
            qs[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
            spark.catalog.clearCache()
            gc.collect()
        print(f"RESULT {q}: best={min(ts):.2f} all={[round(t, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
