"""r15 interleaved A/B/C: ngram_jaccard dp-pin derivations (VERDICT r14
item 2 / next-2).

  A = committed r14 form: max(defaultParallelism, input width)
  B = width-derived (no defaultParallelism floor): _size_partitions-style
      busy floor from the MEASURED shingle-row count (ceil(rows/50k),
      capped at defaultParallelism; ceil(rows/2M) growth above that)
  C = no pins (AQE alone; r14 measured 1.63x worse — re-confirm)

Runs ngram_jaccard and ngram_jaccard_capped interleaved. Honors
SPARK_GRAFT_CPUS so the c8 arm measures the anti-scaling claim.

Usage: SPARK_GRAFT_CPUS=32 python tools/measure_r15_ngram.py [reps]
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
    from eth2dgraph_spark.session import get_spark
    from eth2dgraph_spark.pipeline import dedup as D

    spark = get_spark("m15-ngram")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    def dp_a(sh, sess):
        return max(sess.sparkContext.defaultParallelism, sh.rdd.getNumPartitions())

    def dp_b(sh, sess):
        n = sh.count()  # sh is persisted: the count also warms the cache
        par = sess.sparkContext.defaultParallelism
        busy = min(par, max(1, -(-n // 50_000)))
        return max(busy, -(-n // 2_000_000))

    def dp_c(sh, sess):
        return None

    arms = {"A_floor": dp_a, "B_width": dp_b, "C_nopin": dp_c}

    def run(name, q):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        qs[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        return dt

    for q in ("ngram_jaccard", "ngram_jaccard_capped"):
        if q not in qs:
            continue
        for arm, fn in arms.items():
            D._ngram_dp = fn
            run(f"warm-{q}-{arm}", q)
        res = {a: [] for a in arms}
        for r in range(reps):
            for arm, fn in arms.items():
                D._ngram_dp = fn
                res[arm].append(run(f"{q}-{arm}-{r}", q))
        for arm, ts in res.items():
            print(
                f"RESULT {q} {arm}: best={min(ts):.2f} all={[round(t, 2) for t in ts]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
