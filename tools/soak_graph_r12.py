"""Round-12 graph soaks (VERDICT r11 items 3 + 7).

1. ZIPFIAN-SKEW soak for the iterative kernels (sssp / msf / harmonic):
   tools/soak_graph_r11.py proved scale on a UNIFORM-degree graph, but
   real similarity graphs are power-law and every frontier round joins
   the edge list on src — a hub's fan-out lands on one reducer. This
   soak generates a zipf out-degree graph (rank r gets ~C/r^alpha edges,
   alpha in {1.1, 1.5}; node 0 is a genuine mega-hub holding several
   percent of ALL edges at 1.1) with hash-scattered destinations, then
   measures rounds/wall for each kernel. The diagnostic: if the round
   that drains the hub is super-linear vs the uniform baseline's
   per-round cost, the salted-join lever (plans/physical.py salted_join)
   is the named fix; either way the measured pair lands in BASELINE.md.

   Degree construction, generated INSIDE Spark (no driver loop): the
   normalization constant C = m_target / H(n, alpha) is one numpy sum on
   the driver; each mapInPandas batch emits node i's d_i = max(1,
   int(C/(i+1)^alpha)) edges with dst_j = (i*2654435761 + j*40503 + 17)
   % n — deterministic, self-loop-filtered, hash-scattered so hub edges
   spread over DESTINATION space (the skew under test is the SRC key).

2. TARGETED-SSSP rounds-saved pair: the r11 soak graph (chain i->i+1
   w=i%7+1 + doubling i->(2i+1)%n w=3, seeds every 1000th node) runs
   shortest_paths to its ~30-round fixpoint; shortest_paths_targeted
   with targets adjacent to seeds must stop in a small fraction of the
   rounds and return identical target dists — the measured saving that
   justifies the two extra per-round driver actions.

Usage: python tools/soak_graph_r12.py
       SOAK_N=2000000 SOAK_M=4000000 SOAK_ALPHAS=1.1,1.5
       SOAK_OPS=sssp,msf,harmonic,betweenness,betweenness_weighted,targeted
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("SOAK_N", "2000000"))
M = int(os.environ.get("SOAK_M", "4000000"))
ALPHAS = [float(x) for x in os.environ.get("SOAK_ALPHAS", "1.1,1.5").split(",")]
OPS = os.environ.get("SOAK_OPS", "sssp,msf,harmonic,targeted").split(",")


def zipf_edges(spark, n: int, m: int, alpha: float):
    """Edges with zipf out-degrees: node i emits max(1, int(C/(i+1)^a))
    hash-scattered dsts; C normalizes the total to ~m."""
    c = m / float(np.sum(1.0 / np.arange(1, n + 1, dtype=np.float64) ** alpha))

    def kernel(batches):
        for pdf in batches:
            srcs, dsts = [], []
            for i in pdf["id"]:
                i = int(i)
                d = max(1, int(c / (i + 1) ** alpha))
                j = np.arange(d, dtype=np.int64)
                dst = (i * 2654435761 + j * 40503 + 17) % n
                keep = dst != i
                dsts.append(dst[keep])
                srcs.append(np.full(int(keep.sum()), i, dtype=np.int64))
            yield pd.DataFrame(
                {
                    "src": np.concatenate(srcs),
                    "dst": np.concatenate(dsts),
                }
            )

    return (
        spark.range(n)
        .repartition(64)
        .mapInPandas(kernel, "src long, dst long")
        .withColumn("w", (F.col("dst") % 7 + 1).cast("double"))
    )


def chain_edges(spark, n: int):
    """The r11 soak graph (uniform degree 2, O(log n) weighted diameter
    from the seed set) for the targeted-SSSP pair."""

    def kernel(batches):
        for pdf in batches:
            i = pdf["id"]
            a = pd.DataFrame(
                {"src": i, "dst": (i + 1) % n, "w": (i % 7 + 1).astype("float64")}
            )
            b = pd.DataFrame({"src": i, "dst": (2 * i + 1) % n, "w": 3.0})
            yield pd.concat([a, b], ignore_index=True)

    return (
        spark.range(n)
        .repartition(max(32, n // 500_000))
        .mapInPandas(kernel, "src long, dst long, w double")
    )



def main() -> None:
    from eth2dgraph_spark.graph import (
        harmonic_closeness_sampled,
        minimum_spanning_forest,
        shortest_paths,
        shortest_paths_targeted,
    )

    out: dict = {"n": N, "m_target": M, "alphas": {}}
    for alpha in ALPHAS:
        spark = get_spark(f"soak-graph-zipf-{alpha}", shuffle_partitions=64)
        spark.sparkContext.setLogLevel("ERROR")
        edges = zipf_edges(spark, N, M, alpha)
        n_edges = edges.count()
        hub = edges.groupBy("src").count().orderBy(F.desc("count")).limit(1).first()
        rec: dict = {
            "edges": n_edges,
            "max_out_degree": hub["count"],
            "hub_share": round(hub["count"] / n_edges, 4),
        }
        seeds = spark.range(0, N, 100_000).selectExpr("id AS node")
        if "sssp" in OPS:
            st: dict = {}
            t0 = time.time()
            cnt = shortest_paths(edges, seeds, weight="w", max_iter=60, stats=st).count()
            rec["sssp"] = {"wall_s": round(time.time() - t0, 2), "reached": cnt, **st}
            print(f"# alpha={alpha} sssp: {rec['sssp']}", file=sys.stderr)
        if "msf" in OPS:
            st2: dict = {}
            t0 = time.time()
            cnt = minimum_spanning_forest(edges, stats=st2).count()
            rec["msf"] = {
                "wall_s": round(time.time() - t0, 2),
                "forest_edges": cnt,
                **st2,
            }
            print(f"# alpha={alpha} msf: {rec['msf']}", file=sys.stderr)
        if "harmonic" in OPS:
            lm = spark.range(0, N, N // 4).selectExpr("CAST(id AS STRING) AS node")
            t0 = time.time()
            cnt = harmonic_closeness_sampled(
                edges, lm, weight="w", max_iter=30
            ).count()
            rec["harmonic"] = {"wall_s": round(time.time() - t0, 2), "nodes": cnt}
            print(f"# alpha={alpha} harmonic: {rec['harmonic']}", file=sys.stderr)
        if "betweenness" in OPS:
            # 2 landmarks keep the product graph at 2x edges. Landmarks =
            # sample_landmarks(by='degree') — the realistic
            # degree-biased sampling choice, and the one that keeps BFS
            # depth O(log n) on this graph: a TAIL landmark (out-degree 1)
            # starts a pseudo-random chain hundreds of hops deep (measured:
            # landmarks {0, N/2} truncated at max_iter=40, converged=false,
            # 129 s — kept as the truncation-semantics receipt), while the
            # head landmarks converge in ~log n levels. The scale shape
            # under test is the per-level DAG slice join vs the hub fan-out.
            from eth2dgraph_spark.graph import betweenness_landmarks

            from eth2dgraph_spark.graph import sample_landmarks

            lm2 = sample_landmarks(edges, 2, by="degree")
            st3: dict = {}
            t0 = time.time()
            cnt = betweenness_landmarks(edges, lm2, max_iter=40, stats=st3).count()
            rec["betweenness"] = {
                "wall_s": round(time.time() - t0, 2),
                "nodes_with_dependency": cnt,
                **st3,
            }
            print(f"# alpha={alpha} betweenness: {rec['betweenness']}", file=sys.stderr)
        if "betweenness_weighted" in OPS:
            # round-13: the weighted variant on the same zipfian graph
            # (the chain weights w=src%7+1 already ride zipf_edges) —
            # the scale question is the D full-DAG backward rounds vs
            # the unweighted kernel's per-level slices
            from eth2dgraph_spark.graph import betweenness_weighted, sample_landmarks as _sl

            lmw = _sl(edges, 2, by="degree")
            st4: dict = {}
            t0 = time.time()
            cnt = betweenness_weighted(
                edges, lmw, weight="w", max_iter=40, stats=st4
            ).count()
            rec["betweenness_weighted"] = {
                "wall_s": round(time.time() - t0, 2),
                "nodes_with_dependency": cnt,
                **st4,
            }
            print(
                f"# alpha={alpha} betweenness_weighted: {rec['betweenness_weighted']}",
                file=sys.stderr,
            )
        out["alphas"][str(alpha)] = rec
        spark.stop()

    if "targeted" in OPS:
        spark = get_spark("soak-targeted", shuffle_partitions=64)
        spark.sparkContext.setLogLevel("ERROR")
        edges = chain_edges(spark, N)
        seeds = spark.range(0, N, 1000).selectExpr("id AS node")
        # targets adjacent to three seeds — the point-to-point case
        tgts = spark.createDataFrame(
            [(1,), (1001,), (2001,)], "node long"
        )
        stf: dict = {}
        t0 = time.time()
        full = shortest_paths(edges, seeds, weight="w", max_iter=60, stats=stf)
        full_t = {
            r["node"]: r["dist"]
            for r in full.join(
                tgts.selectExpr("CAST(node AS STRING) AS node"), "node"
            ).collect()
        }
        full_wall = round(time.time() - t0, 2)
        stt: dict = {}
        t0 = time.time()
        got = {
            r["node"]: r["dist"]
            for r in shortest_paths_targeted(
                edges, seeds, tgts, weight="w", max_iter=60, stats=stt
            ).collect()
        }
        tgt_wall = round(time.time() - t0, 2)
        assert got == full_t, (got, full_t)
        out["targeted"] = {
            "full_rounds": stf["iterations"],
            "full_wall_s": full_wall,
            "targeted_rounds": stt["iterations"],
            "targeted_wall_s": tgt_wall,
            "early_stopped": stt["early_stopped"],
            "dists_equal": True,
        }
        print(f"# targeted: {out['targeted']}", file=sys.stderr)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
