"""Capture .explain("formatted") for headline queries into plans/r15/.

Usage: python tools/explain_r15.py <suffix> [query ...]
  suffix: "before" or "after" (file name suffix)
  query:  optional subset; default = every bench.py HEADLINE query.

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — the bench's
scale — so Exchange counts / join strategies match what the bench times.
Streaming gates (foreachBatch lifecycles) have no single batch plan; for
those we record the batch-side pair-builder plan is not available and skip
with a note in the file.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as E  # noqa: E402
from eth2dgraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(bench.HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("explain-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs.update(E.bench_only_queries())
    for name in names:
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"EXPLAIN FAILED: {e}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
