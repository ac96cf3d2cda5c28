"""Round-11 graph-kernel scale soak: shortest_paths (delta-frontier
Bellman-Ford) and minimum_spanning_forest (Borůvka, hybrid contraction
merge) over a synthetic directed graph at two scale points (default
1M / 10M nodes, 2 edges per node).

Graph shape (generated INSIDE Spark, mapInPandas over a range — the
soak discipline: no driver loop): node i carries a "chain" edge
i -> (i+1) % n with weight i%7+1 and a "doubling" edge i -> (2i+1) % n
with weight 3. The doubling edges give the graph O(log n) weighted-path
hop counts from the seed set (every 1000th node), so SSSP frontier
ROUNDS should stay ~flat across a 10x node scale-up while per-round
volume grows 10x — the separation this soak is built to show: round
count is a property of the graph's metric structure, per-round cost is
the only thing that scales, and that part is shuffle-parallel.

For the MSF the same graph exercises BOTH contraction-merge branches at
the 10M point: early Borůvka rounds pick >1M edges (distributed star-CC
path), later rounds fall under the bounded-collect threshold (driver
union-find path) — stats report rounds vs collected_rounds.

Usage: python tools/soak_graph_r11.py      SOAK_SIZES=1000000,10000000
       SOAK_OPS=sssp,msf
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402

SIZES = [int(x) for x in os.environ.get("SOAK_SIZES", "1000000,10000000").split(",")]
OPS = os.environ.get("SOAK_OPS", "sssp,msf").split(",")


def synth_edges(spark, n: int):
    def kernel(batches):
        for pdf in batches:
            i = pdf["id"]
            a = pd.DataFrame(
                {"src": i, "dst": (i + 1) % n, "w": (i % 7 + 1).astype("float64")}
            )
            b = pd.DataFrame({"src": i, "dst": (2 * i + 1) % n, "w": 3.0})
            yield pd.concat([a, b], ignore_index=True)

    parts = max(32, n // 500_000)
    return (
        spark.range(n)
        .repartition(parts)
        .mapInPandas(kernel, "src long, dst long, w double")
    )


def main() -> None:
    from eth2dgraph_spark.graph import minimum_spanning_forest, shortest_paths

    out = {"sizes": {}}
    for n in SIZES:
        spark = get_spark("soak-graph-r11", shuffle_partitions=max(32, n // 500_000))
        spark.sparkContext.setLogLevel("ERROR")
        edges = synth_edges(spark, n)
        seeds = spark.range(0, n, 1000).selectExpr("id AS node")
        rec = {}
        if "sssp" in OPS:
            st: dict = {}
            t0 = time.time()
            cnt = shortest_paths(edges, seeds, weight="w", max_iter=60, stats=st).count()
            rec["sssp"] = {
                "wall_s": round(time.time() - t0, 2),
                "reached": cnt,
                **st,
            }
            print(f"# n={n} sssp: {rec['sssp']}", file=sys.stderr)
        if "msf" in OPS:
            st2: dict = {}
            t0 = time.time()
            cnt = minimum_spanning_forest(edges, stats=st2).count()
            rec["msf"] = {
                "wall_s": round(time.time() - t0, 2),
                "forest_edges": cnt,
                **st2,
            }
            print(f"# n={n} msf: {rec['msf']}", file=sys.stderr)
        out["sizes"][str(n)] = rec
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
