"""Round-14 pagerank-round anatomy: interleaved same-session A/B of
runtime-settable variants to find what the ~2.7 s/round floor is made of.

Variants (each = the exact q_pagerank_ranks gate body, 5 iterations):
  base      current code, current session confs
  respect   spark.sql.adaptive.coalescePartitions.parallelismFirst=false
  noaqe     spark.sql.adaptive.enabled=false
  sp8       spark.sql.shuffle.partitions=8
  sp8resp   both sp8 and respect

Usage: python tools/measure_r14_pagerank.py [reps]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

VARIANTS = {
    "base": {},
    "respect": {"spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "sp8": {"spark.sql.shuffle.partitions": "8"},
    "sp8resp": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
}

DEFAULTS = {
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("m14-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    import glob

    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    qs["last_block"](spark, SF_DIR).collect()
    # one throwaway warm run
    qs["pagerank_ranks"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    gc.collect()

    times: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for _ in range(reps):
        for name, conf in VARIANTS.items():
            for k, v in {**DEFAULTS, **conf}.items():
                spark.conf.set(k, v)
            t0 = time.time()
            qs["pagerank_ranks"](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(time.time() - t0)
            spark.catalog.clearCache()
            gc.collect()
    for k, v in DEFAULTS.items():
        spark.conf.set(k, v)
    for name, ts in times.items():
        print(
            f"RESULT {name}: best={min(ts):.2f}s all={[round(t,2) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
