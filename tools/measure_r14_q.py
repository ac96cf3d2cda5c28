"""Round-14 generic isolated per-query timer: warm page cache, one
throwaway warm run, then N timed noop-sink runs per query in one session
(bench.py methodology: clearCache + gc between runs, best-of-N reported).

Usage: python tools/measure_r14_q.py [reps] query [query ...]
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
    names = sys.argv[2:]
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("m14-q")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

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
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
            spark.catalog.clearCache()
            gc.collect()
        print(
            f"RESULT {name}: best={min(ts):.2f}s all={[round(t, 2) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
