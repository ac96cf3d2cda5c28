"""Round-7 A/B for BASELINE.md: ngram_jaccard posting-cap mechanics —
count-agg + left-semi-join (round-6 form) vs count-over-window filter.

Both enforce the cap BEFORE collect_list (the OOM guard stays); the
question is pure cost: the semi-join form scans the persisted shingle
frame twice and shuffles it once plus the tiny count table; the window
form scans once, shuffles once on h, and the posting groupBy reuses the
window's hashpartitioning(h) (no second exchange). WindowExec's group
buffer spills, so the hot-shingle safety argument holds for both.

Arms:
  A) sf0.1 documents (5,000 docs, honest near-dup corpus)
  B) sf0.1 + 3,000-doc identical-text mega-cluster whose shingles are all
     over the cap (the stop-shingle shape the cap exists for)

Each arm: correctness cross-check (identical pair sets), then best-of-3
wall per form.

Usage: python tools/measure_r7.py [sf_dir]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from eth2dgraph_spark.pipeline.dedup import ngram_jaccard_pairs
from eth2dgraph_spark.session import get_spark
from eth2dgraph_spark.sources.testdata import read_table


def run(docs, form):
    t0 = time.time()
    out = ngram_jaccard_pairs(docs, threshold=0.8, cap_form=form)
    n = out.count()
    return time.time() - t0, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    mega = spark.range(3000).select(
        (F.col("id") + F.lit(10_000_000)).alias("doc_id"),
        F.lit(
            "terms of service click here to accept the terms of service "
            "boilerplate footer repeated on every single page of the web"
        ).alias("text"),
    )
    arms = {
        "A_sf01": docs.localCheckpoint(eager=True),
        "B_hot": docs.unionByName(mega).localCheckpoint(eager=True),
    }
    for arm, corpus in arms.items():
        # correctness: both forms must produce the identical pair set
        a = ngram_jaccard_pairs(corpus, threshold=0.8, cap_form="semijoin")
        b = ngram_jaccard_pairs(corpus, threshold=0.8, cap_form="window")
        sym_diff = a.select("id_a", "id_b").exceptAll(b.select("id_a", "id_b")).count() + b.select(
            "id_a", "id_b"
        ).exceptAll(a.select("id_a", "id_b")).count()
        print(f"{arm}: pair sets identical = {sym_diff == 0} (sym_diff={sym_diff})")
        for form in ("semijoin", "window"):
            walls = []
            for _ in range(3):
                w, n = run(corpus, form)
                walls.append(w)
            print(f"{arm} {form}: pairs={n} best-of-3={min(walls):.2f}s  runs={[f'{w:.2f}' for w in walls]}")


if __name__ == "__main__":
    main()
