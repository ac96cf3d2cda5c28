"""Round-6 scale measurements for BASELINE.md — run AFTER other JVMs exit.

Three measured before/after pairs:
  A) minhash_lsh_candidates, capped (1024) vs uncapped, on sf0.1 documents
     plus a 5k-member identical-text mega-cluster: candidate-row count and
     wall. The uncapped arm is the pre-round-6 behavior.
  B) simhash_near_pairs banding, num_chunks=4 (the pre-round-6 15-bit band
     keys) vs num_chunks=6 (30-bit chunk-triple keys), on 500k synthetic
     signatures: candidate-row count before verification and wall. At 500k
     docs the 15-bit keyspace (32,768 buckets) already forces ~15 docs per
     bucket per band purely by pigeonhole.
  C) pagerank tol-probe overhead on the gate graph shape at sf0.1:
     tol=None (gate plan) vs tol=0.0 (probe every round, never exits early)
     at the gate's pinned num_iter.

Usage: python tools/measure_r6.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from eth2dgraph_spark.session import get_spark
from eth2dgraph_spark.sources.testdata import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm

    from eth2dgraph_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        simhash_near_pairs,
    )
    from eth2dgraph_spark.graph import pagerank

    # ---- A: minhash mega-cluster, capped vs uncapped -------------------
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    mega = (
        spark.range(5000)
        .select(
            (F.col("id") + F.lit(10_000_000)).alias("doc_id"),  # doc_id is bigint
            F.lit(
                "the quick brown fox jumps over the lazy dog again and "
                "again in the exact same templated boilerplate sentence"
            ).alias("text"),
        )
    )
    corpus = docs.unionByName(mega)
    sigs = minhash_signatures(corpus).localCheckpoint(eager=True)  # isolate banding cost
    n_docs = sigs.count()
    for label, cap in (("capped_1024", 1024), ("uncapped", None)):
        t0 = time.time()
        cnt = minhash_lsh_candidates(sigs, max_bucket=cap).count()
        print(
            f"A minhash {label}: docs={n_docs} candidates={cnt} "
            f"wall={time.time() - t0:.1f}s",
            flush=True,
        )

    # ---- B: simhash banding, 15-bit vs 30-bit keys, 500k sigs ----------
    from eth2dgraph_spark.pipeline.dedup import simhash_banded

    for n in (500_000, 2_000_000):
        synth = (
            spark.range(n)
            .select(
                F.col("id").cast("string").alias("id"),
                # xxhash64 masked to 60 bits: uniform signatures, worst case
                # for keyspace-driven bucket growth (no similarity clusters)
                F.xxhash64("id").bitwiseAND(F.lit((1 << 60) - 1)).alias("simhash"),
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        for label, chunks in (("old_15bit_keys", 4), ("new_30bit_keys", 6)):
            # candidate volume = sum over buckets of C(n_b, 2): the join rows
            # the verification popcount must evaluate (computed analytically
            # so the count itself can't skew the wall measurement below)
            cand = (
                simhash_banded(synth, max_hamming=3, num_chunks=chunks)
                .groupBy("band", "chunk")
                .agg(F.count(F.lit(1)).alias("nb"))
                .agg(F.sum(F.expr("nb * (nb - 1) / 2")).alias("c"))
                .first()["c"]
            )
            t0 = time.time()
            cnt = simhash_near_pairs(synth, max_hamming=3, num_chunks=chunks).count()
            print(
                f"B simhash {label}: docs={n} candidate_rows={int(cand or 0)} "
                f"verified_pairs={cnt} wall={time.time() - t0:.1f}s",
                flush=True,
            )

    # ---- C: pagerank tol-probe overhead at the gate shape --------------
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    for label, tol in (("tol_none", None), ("tol_probe_every_round", 0.0)):
        st: dict = {}
        t0 = time.time()
        pagerank(edges, num_iter=5, tol=tol, stats=st).count()
        print(
            f"C pagerank {label}: iters={st['iterations']} "
            f"last_delta={st['last_delta']} wall={time.time() - t0:.1f}s",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
