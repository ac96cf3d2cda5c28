"""Capture INNER subplans the checkpoint-cut final plans hide (the
cc_round capture pattern): the pagerank round expression and the lazy
ngram_jaccard_pairs pipeline, before (legacy, reconstructed in-process
via tools/measure_r14_ab2.py contexts) and after (shipped code).

The pagerank round is captured by patching _truncator to a passthrough
for ONE 1-iteration construction, so the returned frame's plan contains
the full round instead of a checkpointed-RDD scan.

Usage: python tools/explain_inner_r14.py <before|after>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def _write(df, name: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT_DIR, f"{name}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue().splitlines())} lines)")


def _legacy_ngram_lazy(d, k=3, threshold=0.05, max_shingle_docs=1024):
    """The r13 ngram_jaccard_pairs pipeline (window cap, no explicit
    repartition pins), lazy, for the before-plan capture."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from pyspark.storagelevel import StorageLevel

    from eth2dgraph_spark.pipeline.dedup import _hashed_shingle_sets

    sh = _hashed_shingle_sets(d, "doc_id", "text", k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    posting_src = (
        sh.withColumn("_dc", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .filter((F.col("_dc") > 1) & (F.col("_dc") <= max_shingle_docs))
        .drop("_dc")
    )
    posting = posting_src.groupBy("h").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    posting = posting.filter(F.size("ids") > 1)
    pair = F.explode(
        F.flatten(
            F.transform(
                "ids",
                lambda x, i: F.transform(
                    F.slice("ids", i + 2, F.size("ids")),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
    ).alias("p")
    inter = (
        posting.select(pair)
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")).hint(
                "shuffle_hash"
            ),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")).hint(
                "shuffle_hash"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


class _PassthroughTruncate:
    def __enter__(self):
        import eth2dgraph_spark.graph as G

        self._tr = G._truncator
        G._truncator = lambda df, checkpoint_dir, **kw: df
        return self

    def __exit__(self, *a):
        import eth2dgraph_spark.graph as G

        G._truncator = self._tr


def main() -> None:
    suffix = sys.argv[1]
    import __spark_entry__ as E
    import eth2dgraph_spark.graph as G
    from eth2dgraph_spark.pipeline import dedup
    from eth2dgraph_spark.session import get_spark
    from measure_r14_ab2 import _LegacyCurate, _LegacyPagerank

    spark = get_spark("explain-inner")
    spark.sparkContext.setLogLevel("ERROR")
    d = E._t(spark, SF_DIR, "documents")

    ctxs = []
    if suffix == "before":
        ctxs = [_LegacyPagerank(), _LegacyCurate()]
        for c in ctxs:
            c.__enter__()
    try:
        # ngram: lazy pipeline plan (the gate's eager form hides it);
        # before = the r13 form (no explicit pins), reconstructed here
        if suffix == "before":
            ng = _legacy_ngram_lazy(d)
        else:
            ng = dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05, eager=False)
        _write(ng, f"ngram_jaccard_inner_{suffix}")
        # pagerank: one full round, lineage cut disabled for the capture
        o = E._t(spark, SF_DIR, "orders")
        li = E._t(spark, SF_DIR, "lineitem")
        from pyspark.sql import functions as F

        edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        with _PassthroughTruncate():
            _write(
                G.pagerank(edges, num_iter=1), f"pagerank_round_{suffix}"
            )
    finally:
        for c in ctxs:
            c.__exit__()


if __name__ == "__main__":
    main()
