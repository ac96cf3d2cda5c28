"""Round-14 probe: run the bench's iterative TAIL in exact bench order
(same session, clearCache+gc between queries, best-of-2 like bench.py) to
see whether the round-start baseline draw's 3-4x tail inflation
(dedup_clusters 45.5 s, pagerank_ranks 40.2 s, kcore_2rounds 16.8 s ...)
reproduces, i.e. is tail-internal accumulation vs draw-window noise.

Usage: python tools/measure_r14_tail.py
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TAIL = [
    "dedup_clusters",
    "pagerank_ranks",
    "kcore_2rounds",
    "modularity",
    "coreness_capped",
    "ppr_ranks",
    "hits_scores",
    "asset_cluster_reps",
    "sssp_dists",
    "sssp_paths",
    "sssp_route",
    "harmonic_landmarks",
    "msf_edges",
    "sl_clusters",
    "sssp_targeted",
    "betweenness_landmarks",
    "betweenness_weighted",
]


def main() -> None:
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("m14-tail")
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

    total = 0.0
    for name in TAIL:
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            gc.collect()
        total += best
        print(f"TAIL {name}: {best:.2f}s", flush=True)
    print(f"TAIL total: {total:.1f}s", flush=True)


if __name__ == "__main__":
    main()
