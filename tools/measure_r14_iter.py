"""Round-14 profiler for the iterative-kernel per-round action floor.

A/B: connected_components' current shape (eager localCheckpoint + separate
fingerprint job per round) vs a lazy-checkpoint variant where the
fingerprint aggregate is the materializing action (the checkpoint sweep
then finds every partition cached). Same rounds, same plan depth — only
the number of driver actions per round changes. Run isolated, warm.

Usage: python tools/measure_r14_iter.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from eth2dgraph_spark.graph import _large_star, _small_star, _canonical_undirected  # noqa: E402
from eth2dgraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def gate_pairs(spark):
    # the dedup_clusters gate's pair frame (minhash pairs) is expensive to
    # build; use a same-shape synthetic pair list over doc ids instead —
    # chains + stars so the star rounds actually iterate
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select("doc_id")
    a = d.select(
        F.concat(F.lit("d"), F.col("doc_id")).alias("id_a"),
        F.concat(F.lit("d"), (F.col("doc_id") + 1)).alias("id_b"),
    ).filter(F.col("doc_id") % 100 < 30)
    b = d.select(
        F.concat(F.lit("d"), F.col("doc_id")).alias("id_a"),
        F.concat(F.lit("d"), (F.col("doc_id") % 500)).alias("id_b"),
    ).filter(F.col("doc_id") % 100 >= 95)
    return a.unionByName(b)


def cc(edges, mode: str, max_iter: int = 20):
    e = _canonical_undirected(edges, "id_a", "id_b").persist(StorageLevel.MEMORY_AND_DISK)
    prev_fp = None
    rounds = 0
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e))
        if mode == "eager":
            e2 = nxt.localCheckpoint(eager=True)
        else:
            e2 = nxt.localCheckpoint(eager=False)
        fp_row = e2.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("s"),
        ).first()
        e.unpersist()
        e = e2
        rounds += 1
        fp = (fp_row["c"], fp_row["s"])
        if fp == prev_fp:
            break
        prev_fp = fp
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    out = comp.unionByName(roots).groupBy("node").agg(F.min("component").alias("component"))
    rows = sorted(tuple(r) for r in out.collect())
    e.unpersist()
    return rounds, rows


def main() -> None:
    spark = get_spark("measure-r14-iter")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = gate_pairs(spark).persist(StorageLevel.MEMORY_AND_DISK)
    pairs.count()

    results = {}
    for mode in ("eager", "lazy", "eager", "lazy"):
        t0 = time.time()
        rounds, rows = cc(pairs, mode)
        dt = time.time() - t0
        print(f"cc {mode}: {dt:.2f}s rounds={rounds} nodes={len(rows)}")
        results.setdefault(mode, rows)
    assert results["eager"] == results["lazy"], "RESULTS DIFFER"
    print("results identical across modes")


if __name__ == "__main__":
    main()
