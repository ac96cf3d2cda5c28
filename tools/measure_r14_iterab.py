"""Round-14 interleaved A/B over the iterative-kernel family:
base (coalescePartitions.parallelismFirst=true, the Spark default) vs
respect (=false, coalesce to advisoryPartitionSizeInBytes — the setting
Spark's own config doc recommends, and the guide-§2.2 "fewer, larger
reduce partitions" lever).

Interleaved base/respect per query per rep so host noise hits both arms
equally (the r14 box is ~1.5x slower and noisy vs r13 — cross-session
draws are not comparable, see OPTIMIZATION_r14.md).

Usage: python tools/measure_r14_iterab.py [reps] [query ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FLAG = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

DEFAULT_QUERIES = [
    "dedup_clusters",
    "kcore_2rounds",
    "coreness_capped",
    "modularity",
    "hits_scores",
    "sssp_dists",
    "sl_clusters",
    "betweenness_weighted",
    "pagerank_ranks",
    "msf_edges",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or DEFAULT_QUERIES
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("m14-iterab")
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
    # throwaway warm run (JIT + python workers)
    qs[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    gc.collect()

    times: dict[str, dict[str, list[float]]] = {
        n: {"base": [], "respect": []} for n in names
    }
    for _ in range(reps):
        for name in names:
            for variant, val in (("base", "true"), ("respect", "false")):
                spark.conf.set(FLAG, val)
                spark.sparkContext.setJobDescription(f"{name}/{variant}")
                t0 = time.time()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[name][variant].append(time.time() - t0)
                spark.catalog.clearCache()
                gc.collect()
    spark.conf.set(FLAG, "true")
    tot = {"base": 0.0, "respect": 0.0}
    for name in names:
        b = min(times[name]["base"])
        r = min(times[name]["respect"])
        tot["base"] += b
        tot["respect"] += r
        print(
            f"RESULT {name}: base={b:.2f} respect={r:.2f} ratio={r / b:.2f} "
            f"(base_all={[round(t, 2) for t in times[name]['base']]} "
            f"respect_all={[round(t, 2) for t in times[name]['respect']]})",
            flush=True,
        )
    print(
        f"TOTAL base={tot['base']:.2f} respect={tot['respect']:.2f} "
        f"ratio={tot['respect'] / tot['base']:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
