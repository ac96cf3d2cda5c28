"""Round-10 measurement (round-11 target #4 pulled forward): the
asset_cluster_reps pipeline feeds connected_components the COMPLETE
near-dup pair set (C(group,2) edges per clip group — 497,500 rows at
sf0.1). For a CLUSTERING consumer, per-hash STAR edges (every posting
member -> the posting's min member) preserve connectivity at
min_shared=1 semantics with O(postings) edges instead of O(posting^2).
Measure CC + the representative pick on both edge sets at sf0.1 and
assert the kept representatives are IDENTICAL (they must be, on the
group corpus where min_shared=2 and min_shared=1 connectivity coincide).

This is the decide-before-changing measurement; the library keeps the
complete-pair input until a consumer needs the trade (the n_shared
threshold is NOT expressible on star edges — that semantic loss is the
cost, recorded here with the numbers).

Usage: python tools/measure_star_cc_r10.py     (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from eth2dgraph_spark.functions.avi import synthetic_clip_udf
    from eth2dgraph_spark.graph import cluster_representatives
    from eth2dgraph_spark.pipeline.multimodal import (
        video_frame_phashes,
        video_near_pairs,
    )
    from eth2dgraph_spark.sources.testdata import read_table

    spark = get_spark("star-cc")
    spark.sparkContext.setLogLevel("ERROR")
    clip = synthetic_clip_udf()
    d = read_table(spark, SF_DIR, "documents").select("doc_id")
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        clip("doc_id").alias("payload"),
        F.lit(2500).cast("long").alias("duration_ms"),
    )
    meta = d.select(F.col("doc_id").alias("asset_id")).persist()
    meta.count()

    # shared fingerprint stage, persisted so both arms time ONLY the
    # pair construction + CC + representative pick
    fh = video_frame_phashes(assets, every_ms=1000).persist()
    fh.count()

    out: dict = {"arms": {}}

    def run(name, pairs_builder):
        best, reps = None, None
        for _ in range(2):
            t0 = time.time()
            pairs = pairs_builder()
            got = cluster_representatives(
                meta, pairs, "asset_id", id_col="asset_id", descending=False
            ).select("asset_id", "cluster_size")
            rows = sorted((r["asset_id"], r["cluster_size"]) for r in got.collect())
            el = round(time.time() - t0, 2)
            best = el if best is None else min(best, el)
            reps = rows
        n_edges = pairs_builder().count()
        out["arms"][name] = {"sec": best, "edges": n_edges, "kept": len(reps)}
        print(f"{name}: {out['arms'][name]}", file=sys.stderr)
        return reps

    def complete_pairs():
        return video_near_pairs(assets, every_ms=1000, min_shared=2).select(
            "id_a", "id_b"
        )

    def star_pairs():
        p = (
            fh.filter(F.col("phash").isNotNull())
            .select(F.col("asset_id").alias("id"), "phash")
            .distinct()
        )
        hub = p.groupBy("phash").agg(F.min("id").alias("id_a"))
        return (
            p.join(hub, "phash")
            .filter(F.col("id") != F.col("id_a"))
            .select("id_a", F.col("id").alias("id_b"))
            .distinct()
        )

    reps_complete = run("complete_pairs", complete_pairs)
    reps_star = run("star_edges", star_pairs)
    out["representatives_identical"] = reps_complete == reps_star
    fh.unpersist()
    meta.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
