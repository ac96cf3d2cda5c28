"""Round-8 ANN scale soak: brute force vs IVF vs IVF-PQ at 5k and 50k
vectors (dim 64), measuring index build time, search time, and recall@10
against the exact answer — the scaling row for the ANN family the
round-8 PQ work extended.

Vectors are deterministic column math (sin mixes of the id — no RNG at
plan time), queries are 50 held-in ids. Search timings are steady-state
best-of-2 via .count(); recall compares id sets per query.

Usage: python tools/soak_ann_r8.py   (prints one JSON line; ~minutes)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.pipeline import pq  # noqa: E402
from eth2dgraph_spark.pipeline import similarity_search as ss  # noqa: E402
from eth2dgraph_spark.session import get_spark  # noqa: E402

DIM = 64
K = 10


def synth(spark, n):
    # sin(id * p) per dimension with per-dim phase: deterministic, spread
    # over [-1, 1], enough cluster structure for IVF/PQ to be non-trivial
    cols = F.array(
        *[
            F.sin(F.col("id") * F.lit(0.000917 * (d + 1)) + F.lit(d * 0.13))
            * F.cos(F.col("id") * F.lit(0.0000311 * (d % 7 + 1)))
            for d in range(DIM)
        ]
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), cols.alias("embedding")
    )


def timed(fn):
    best, out = None, None
    for _ in range(2):
        t0 = time.time()
        out = fn()
        el = round(time.time() - t0, 2)
        best = el if best is None else min(best, el)
    return best, out


def main() -> None:
    spark = get_spark("soak-ann-r8")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"dim": DIM, "k": K, "scales": {}}
    for n in (5_000, 50_000):
        e = synth(spark, n).repartition(32).persist()
        e.count()
        q = e.filter(F.col("vec_id") % (n // 50) == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ).persist()
        nq = q.count()
        rec: dict = {"n_vectors": n, "n_queries": nq}

        t, _ = timed(lambda: ss.brute_force_topk(e, q, k=K).count())
        exact = {
            (r["query_id"], r["vec_id"])
            for r in ss.brute_force_topk(e, q, k=K).collect()
        }
        rec["brute_search_sec"] = t

        tb, cents = timed(
            lambda: ss.ivf_index(e, nlist=64, iters=2).persist()
        )
        cents.count()
        t, _ = timed(lambda: ss.ivf_topk(e, q, cents, k=K, nprobe=8).count())
        got = {
            (r["query_id"], r["vec_id"])
            for r in ss.ivf_topk(e, q, cents, k=K, nprobe=8).collect()
        }
        rec["ivf_build_sec"] = tb
        rec["ivf_search_sec"] = t
        rec["ivf_recall"] = round(len(got & exact) / len(exact), 3)

        tb, cb = timed(
            lambda: pq.pq_train(e, dim=DIM, m=8, ksub=16, iters=2).persist()
        )
        cb.count()
        t, _ = timed(lambda: pq.pq_topk(e, q, cb, k=K, dim=DIM, m=8).count())
        got = {
            (r["query_id"], r["vec_id"])
            for r in pq.pq_topk(e, q, cb, k=K, dim=DIM, m=8).collect()
        }
        rec["pq_build_sec"] = tb
        rec["pq_search_sec"] = t
        rec["pq_recall"] = round(len(got & exact) / len(exact), 3)

        out["scales"][str(n)] = rec
        print(f"n={n}: {rec}", file=sys.stderr)
        e.unpersist()
        q.unpersist()
        cents.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
