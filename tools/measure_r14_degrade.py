"""Round-14 probe: why do the tail iterative queries run ~3x slower inside
the full bench than isolated on the same box (dedup_clusters 45.5 s in the
round-start baseline draw vs 15.5 s isolated, kcore_2rounds 16.8 vs 4.0)?

Hypothesis ladder:
  A. driver-state accumulation over the ~60-query prefix (listener/cleaner/
     shuffle-file backlog) -> run a polluting prefix, then the probe query.
  B. if a JVM System.gc() right before the probe restores isolated speed,
     the accumulation is GC-able (unreleased RDD/shuffle refs pinned by
     the lack of any full GC on a 24g heap).

Usage: python tools/measure_r14_degrade.py [n_prefix_loops]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PREFIX = [
    "region_revenue",
    "ngram_jaccard",
    "minhash_lsh_pairs",
    "simhash",
    "cms_topk",
    "substring_stats",
    "bm25_topk",
    "gopher_rep",
    "ppl_buckets",
    "quality_clf",
]


def run(qs, spark, name):
    t0 = time.time()
    qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    gc.collect()
    return dt


def main() -> None:
    loops = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("m14-degrade")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    qs.update(E.bench_only_queries())
    import glob

    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    qs["last_block"](spark, SF_DIR).collect()

    print(f"PROBE fresh dedup_clusters: {run(qs, spark, 'dedup_clusters'):.2f}s", flush=True)
    print(f"PROBE fresh kcore_2rounds: {run(qs, spark, 'kcore_2rounds'):.2f}s", flush=True)
    for i in range(loops):
        t0 = time.time()
        for name in PREFIX:
            run(qs, spark, name)
        print(f"prefix loop {i}: {time.time()-t0:.1f}s", flush=True)
        print(f"PROBE after loop {i} dedup_clusters: {run(qs, spark, 'dedup_clusters'):.2f}s", flush=True)
        print(f"PROBE after loop {i} kcore_2rounds: {run(qs, spark, 'kcore_2rounds'):.2f}s", flush=True)
    # discriminator: JVM full GC
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)
    print(f"PROBE after System.gc dedup_clusters: {run(qs, spark, 'dedup_clusters'):.2f}s", flush=True)
    print(f"PROBE after System.gc kcore_2rounds: {run(qs, spark, 'kcore_2rounds'):.2f}s", flush=True)


if __name__ == "__main__":
    main()
