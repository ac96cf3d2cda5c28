"""Round-14 interleaved A/B for the committed batch-2 changes, on-box:
new (committed code) vs old (the pre-change form reconstructed in-process),
interleaved per rep so host noise hits both arms equally.

Variants:
  quality_clf    : shared feature frame (new) vs two l1_hashed_features builds (old)
  dedup_clusters : _small_star(oriented=True) in the CC loop (new) vs
                   forced orientation pass (old), via monkeypatch
  byte_kernels   : fused mapInPandas (new) vs three chained UDFs (old)

Usage: python tools/measure_r14_ab2.py [reps] [variant ...]
"""

from __future__ import annotations

import gc
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _quality_clf_old(spark, sf):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from eth2dgraph_spark.pipeline import classifier

    d = E._t(spark, sf, "documents")
    labeled = d.withColumn(
        "label", F.col("source").isin("src0", "src1").cast("double")
    )
    w = classifier.train_quality_classifier(labeled, num_buckets=512, epochs=2)
    s = classifier.quality_classifier_scores(d, w, num_buckets=512)
    return s.select("id", E._r6e("clf_score").alias("clf_score"))


def _byte_kernels_old(spark, sf):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from eth2dgraph_spark.functions.keccak import keccak256_udf
    from eth2dgraph_spark.functions.metadata import metadata_udf
    from eth2dgraph_spark.functions.ngrams import ngram_rows
    from eth2dgraph_spark.functions.skeleton import skeleton_udf

    docs = E._t(spark, sf, "documents")
    block = F.concat(
        *[F.md5(F.concat(F.col("text"), F.lit(str(i)))) for i in range(16)]
    )
    code = F.concat(F.lit("0x"), F.repeat(block, 16))
    frame = docs.select(F.col("doc_id").alias("id"), code.alias("deployed_bytecode"))
    frame = frame.repartition(spark.sparkContext.defaultParallelism)
    enriched = (
        frame.withColumn("_meta", metadata_udf(F.col("deployed_bytecode")))
        .withColumn("skeleton", skeleton_udf(F.col("deployed_bytecode")))
        .withColumn("skeleton_hash", keccak256_udf(F.col("skeleton")))
        .persist()
    )
    ng = ngram_rows(enriched, id_col="skeleton_hash", code_col="skeleton")
    return enriched.agg(
        F.count(F.lit(1)).alias("n_codes"),
        F.count_distinct("skeleton_hash").alias("n_skeletons"),
    ).crossJoin(
        ng.agg(
            F.count(F.lit(1)).alias("n_ngram_rows"),
            F.sum("cnt").alias("total_ngrams"),
        )
    )


class _LegacyStars:
    """Context manager: swap in the pre-r14 CC round implementation —
    groupBy+join stars with trailing distincts, orientation pass in
    small_star, eager truncator (probe job separate)."""

    def __enter__(self):
        import eth2dgraph_spark.graph as G
        from pyspark.sql import functions as F

        self._ls, self._ss, self._tr = G._large_star, G._small_star, G._truncator

        def large_star(e):
            nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
            return (
                nbrs.join(m, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )

        def small_star(e, oriented=False):
            o = e if oriented else e.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            ).distinct()
            m = o.groupBy("u").agg(F.min("v").alias("m"))
            moved = (
                o.join(m, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(m.select("u", F.col("m").alias("v")))
            )
            return moved.filter(F.col("u") != F.col("v")).distinct()

        def truncator(df, checkpoint_dir, **kw):
            return self._tr(df, checkpoint_dir)

        G._large_star, G._small_star, G._truncator = large_star, small_star, truncator
        return self

    def __exit__(self, *a):
        import eth2dgraph_spark.graph as G

        G._large_star, G._small_star, G._truncator = self._ls, self._ss, self._tr


class _EagerTruncate:
    """Context manager: force lazy=False in _truncator (the pre-r14
    separate-probe-job behavior) — old arm for msf/sssp_targeted."""

    def __enter__(self):
        import eth2dgraph_spark.graph as G

        self._tr = G._truncator

        def eager(df, checkpoint_dir, **kw):
            return self._tr(df, checkpoint_dir)

        G._truncator = eager
        return self

    def __exit__(self, *a):
        import eth2dgraph_spark.graph as G

        G._truncator = self._tr


class _LegacyKCore:
    """Context manager: pre-r14 k_core — keep not persisted, so the
    truncate job re-runs the degree aggregation every round."""

    def __enter__(self):
        import eth2dgraph_spark.graph as G
        from pyspark.sql import functions as F

        self._kc = G.k_core

        def k_core(edges, k=2, max_iters=50, src="src", dst="dst", checkpoint_dir=None):
            e = (
                G._canonical_undirected(edges, src, dst)
                .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
                .distinct()
            )
            cur = G._truncator(
                e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))),
                checkpoint_dir,
            )
            prev_n = None
            for _ in range(max_iters):
                deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
                keep = deg.filter(F.col("deg") >= k).select("u")
                n = keep.count()
                if prev_n is not None and n == prev_n:
                    break
                prev_n = n
                cur = G._truncator(
                    cur.join(keep, "u", "left_semi").join(
                        keep.select(F.col("u").alias("v")), "v", "left_semi"
                    ),
                    checkpoint_dir,
                )
            return cur.groupBy("u").agg(F.count(F.lit(1)).alias("degree")).select(
                F.col("u").alias("node"), "degree"
            )

        G.k_core = k_core
        return self

    def __exit__(self, *a):
        import eth2dgraph_spark.graph as G

        G.k_core = self._kc


class _LegacyCurate:
    """Context manager: pre-r14 curate path — groupBy+join dedup_exact
    and the full-row mapInPandas bloom probe."""

    def __enter__(self):
        import numpy as np
        import pandas as pd

        import eth2dgraph_spark.pipeline.bloom as B
        import eth2dgraph_spark.pipeline.corpus as C
        import eth2dgraph_spark.pipeline.dedup as D
        from pyspark.sql import functions as F

        self._de, self._bmc = C.dedup_exact, B.bloom_maybe_contains

        def dedup_exact(df, id_col="doc_id", text_col="text", fingerprint_col=None):
            if fingerprint_col is not None:
                fp = df.withColumn("_fp", F.col(fingerprint_col))
            else:
                fp = df.withColumn("_fp", F.md5(D._norm_text(text_col)))
            winners = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
            return fp.join(winners, ["_fp", id_col], "inner").drop("_fp")

        def bloom_maybe_contains(
            df, words, col="fingerprint", num_hashes=B.DEFAULT_NUM_HASHES,
            out_col="bloom_maybe_seen",
        ):
            num_bits = int(words.size) * 64
            bc = df.sparkSession.sparkContext.broadcast(
                np.ascontiguousarray(words, np.uint64)
            )

            def kernel(batches):
                w = bc.value
                for pdf in batches:
                    out = pd.Series(pd.NA, index=pdf.index, dtype="boolean")
                    mask = pdf["_h1"].notna() & pdf["_h2"].notna()
                    if mask.any():
                        idx = B._cell_indices(
                            pdf.loc[mask, "_h1"].to_numpy(np.int64),
                            pdf.loc[mask, "_h2"].to_numpy(np.int64),
                            num_hashes,
                            num_bits,
                        )
                        bits = (
                            w[idx >> 6]
                            >> (idx.astype(np.uint64) & np.uint64(63))
                        ) & np.uint64(1)
                        out[mask] = bits.all(axis=1)
                    yield pdf.drop(columns=["_h1", "_h2"]).assign(**{out_col: out})

            from pyspark.sql.types import BooleanType, StructField, StructType

            schema = StructType(
                list(df.schema.fields) + [StructField(out_col, BooleanType())]
            )
            return B._with_hash_cols(df, col).mapInPandas(kernel, schema=schema)

        C.dedup_exact, B.bloom_maybe_contains = dedup_exact, bloom_maybe_contains
        return self

    def __exit__(self, *a):
        import eth2dgraph_spark.pipeline.bloom as B
        import eth2dgraph_spark.pipeline.corpus as C

        C.dedup_exact, B.bloom_maybe_contains = self._de, self._bmc


class _LegacyPagerank:
    """Context manager: pre-r14 pagerank — session-constant shuffle
    partitions for the loop frames (repartition("src") on ej, no node
    repartitions)."""

    def __enter__(self):
        import eth2dgraph_spark.graph as G
        from pyspark.sql import functions as F
        from pyspark.storagelevel import StorageLevel

        self._pr = G.pagerank

        def pagerank(edges, src="src", dst="dst", num_iter=10, damping=0.85,
                     tol=None, stats=None, checkpoint_dir=None):
            e = edges.select(
                F.col(src).cast("string").alias("src"),
                F.col(dst).cast("string").alias("dst"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
            outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
            ej = e.join(outdeg, "src").repartition("src").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            nodes = (
                e.select(F.col("src").alias("node"))
                .unionByName(e.select(F.col("dst").alias("node")))
                .distinct()
                .join(outdeg.select(F.col("src").alias("node")), "node", "left_anti")
                .withColumn("dangling", F.lit(True))
                .unionByName(
                    outdeg.select(F.col("src").alias("node")).withColumn(
                        "dangling", F.lit(False)
                    )
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            n = nodes.count()
            if n == 0:
                e.unpersist()
                ej.unpersist()
                nodes.unpersist()
                return nodes.select("node").withColumn("rank", F.lit(0.0))
            ranks = nodes.withColumn("rank", F.lit(1.0 / n))
            iterations, last_delta = 0, None
            for _ in range(num_iter):
                contribs = (
                    ej.join(ranks, ej.src == ranks.node)
                    .select(
                        F.col("dst").alias("node"),
                        (F.col("rank") / F.col("outdeg")).alias("c"),
                    )
                    .groupBy("node")
                    .agg(F.sum("c").alias("c"))
                )
                dangling_mass = ranks.filter(F.col("dangling")).agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
                )
                rank_expr = (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("_dm") / F.lit(float(n)))
                ).alias("rank")
                base = nodes.join(contribs, "node", "left").join(
                    F.broadcast(dangling_mass)
                )
                nxt = G._truncator(
                    base.select("node", "dangling", rank_expr), checkpoint_dir
                )
                iterations += 1
                if tol is not None:
                    last_delta = (
                        nxt.join(ranks.select("node", F.col("rank").alias("_prev")), "node")
                        .agg(F.coalesce(F.sum(F.abs(F.col("rank") - F.col("_prev"))), F.lit(0.0)))
                        .first()[0]
                    )
                    ranks = nxt
                    if last_delta <= tol:
                        break
                else:
                    ranks = nxt
            if stats is not None:
                stats["iterations"] = iterations
                stats["last_delta"] = last_delta
            e.unpersist()
            ej.unpersist()
            nodes.unpersist()
            return ranks.select("node", "rank")

        G.pagerank = pagerank
        return self

    def __exit__(self, *a):
        import eth2dgraph_spark.graph as G

        G.pagerank = self._pr


class _ForceOrientation:
    """Context manager: make the CC loop run the legacy orienting
    _small_star (old arm) regardless of the oriented=True call site."""

    def __enter__(self):
        import eth2dgraph_spark.graph as G

        self._orig = G._small_star

        def legacy(e, oriented=False):
            return self._orig(e, oriented=False)

        G._small_star = legacy
        return self

    def __exit__(self, *a):
        import eth2dgraph_spark.graph as G

        G._small_star = self._orig


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("m14-ab2")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    qs.update(E.bench_only_queries())
    for f in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    qs["last_block"](spark, SF_DIR).collect()

    variants = {
        "quality_clf": (qs["quality_clf"], _quality_clf_old, None),
        "byte_kernels": (qs["byte_kernels"], _byte_kernels_old, None),
        "dedup_clusters": (qs["dedup_clusters"], qs["dedup_clusters"], _ForceOrientation),
        # window-star + lazy-truncate rewrite vs the full legacy CC round
        "dedup_clusters_stars": (
            qs["dedup_clusters"], qs["dedup_clusters"], _LegacyStars,
        ),
        "asset_cluster_reps_stars": (
            qs["asset_cluster_reps"], qs["asset_cluster_reps"], _LegacyStars,
        ),
        "sl_clusters_stars": (qs["sl_clusters"], qs["sl_clusters"], _LegacyStars),
        "msf_edges_stars": (qs["msf_edges"], qs["msf_edges"], _LegacyStars),
        # keep-persist + lazy-probe fusion vs the pre-r14 forms
        "kcore_2rounds_keep": (qs["kcore_2rounds"], qs["kcore_2rounds"], _LegacyKCore),
        # CC lazy cut in isolation (new stars in BOTH arms)
        "dedup_clusters_lazyonly": (
            qs["dedup_clusters"], qs["dedup_clusters"], _EagerTruncate,
        ),
        "asset_cluster_reps_lazyonly": (
            qs["asset_cluster_reps"], qs["asset_cluster_reps"], _EagerTruncate,
        ),
        "msf_edges_lazy": (qs["msf_edges"], qs["msf_edges"], _EagerTruncate),
        "sssp_targeted_lazy": (
            qs["sssp_targeted"], qs["sssp_targeted"], _EagerTruncate,
        ),
        # window dedup_exact + 2-long pandas_udf bloom probe vs legacy
        "incr_curate_bloom_cut": (
            qs["incr_curate_bloom"], qs["incr_curate_bloom"], _LegacyCurate,
        ),
        "incr_curate_cut": (qs["incr_curate"], qs["incr_curate"], _LegacyCurate),
        "corpus_pipeline_cut": (
            qs["corpus_pipeline"], qs["corpus_pipeline"], _LegacyCurate,
        ),
        # data-derived loop-frame partitioning vs session-constant
        "pagerank_sized": (
            qs["pagerank_ranks"], qs["pagerank_ranks"], _LegacyPagerank,
        ),
    }
    if only:
        variants = {k: v for k, v in variants.items() if k in only}

    # throwaway warm run of each (JIT + python workers), alternating arms
    for name, (new_fn, old_fn, ctx) in variants.items():
        new_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        gc.collect()

    times: dict[str, dict[str, list[float]]] = {
        n: {"new": [], "old": []} for n in variants
    }
    for _ in range(reps):
        for name, (new_fn, old_fn, ctx) in variants.items():
            for arm in ("new", "old"):
                fn = new_fn if arm == "new" else old_fn
                spark.sparkContext.setJobDescription(f"{name}/{arm}")
                t0 = time.time()
                if arm == "old" and ctx is not None:
                    with ctx():
                        fn(spark, SF_DIR).write.format("noop").mode(
                            "overwrite"
                        ).save()
                else:
                    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                times[name][arm].append(time.time() - t0)
                spark.catalog.clearCache()
                gc.collect()
    for name in variants:
        nw, od = min(times[name]["new"]), min(times[name]["old"])
        print(
            f"RESULT {name}: new={nw:.2f} old={od:.2f} ratio={nw / od:.2f} "
            f"(new_all={[round(t, 2) for t in times[name]['new']]} "
            f"old_all={[round(t, 2) for t in times[name]['old']]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
