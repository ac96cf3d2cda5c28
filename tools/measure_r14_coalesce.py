"""Round-14 A/B: AQE coalescePartitions.parallelismFirst true (default)
vs false (respect advisoryPartitionSizeInBytes).

Observation driving this (guide §2.2 "fewer, larger reduce partitions"):
on the r14 box every post-shuffle stage of the tiny iterative-kernel
frames runs 32-64 tasks (AQE's parallelismFirst floor = defaultParallelism),
and per-task scheduling overhead dominates sub-MB stages — the CC A/B
showed ~1.5 s/round across 6 rounds with stages of 64 tiny tasks.

Usage: python tools/measure_r14_coalesce.py {first|respect} [query ...]
Runs each query twice (best-of-2, noop sink) on a session identical to
eth2dgraph_spark.session.get_spark plus the flag under test.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "region_revenue",
    "ngram_jaccard",
    "pagerank_ranks",
    "dedup_clusters",
    "kcore_2rounds",
    "sssp_dists",
    "quality_clf",
    "ppl_buckets",
]


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    flag = "true" if mode == "first" else "false"

    from eth2dgraph_spark.session import get_spark

    spark = get_spark(
        f"m14-coalesce-{mode}",
        extra_conf={"spark.sql.adaptive.coalescePartitions.parallelismFirst": flag},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import gc

    import __spark_entry__ as E

    qs = E.queries()
    qs.update(E.bench_only_queries())

    # bench.py-style warmup: page cache + tiny query + Arrow worker fork
    import glob

    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    qs["last_block"](spark, SF_DIR).collect()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _warm_fn(v):
        import numpy as np

        return v + np.float64(0)

    _warm = pandas_udf(_warm_fn, "double")
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).select(_warm(F.col("id").cast("double"))).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            gc.collect()
        print(f"RESULT {mode} {name}: {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
