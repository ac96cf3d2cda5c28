"""Round-10 measurement: does the documented mitigation for the 8.77x
ngram_jaccard skew number — "run the boilerplate-removal pass first" —
actually hold as a composition? (r9 asserted it; VERDICT r9 task 5 says
measure it.)

Two corpus shapes, because "boilerplate" conflates two different skews:

1. INLINE hot-word skew (the r9 1-hot-word corpus, SOAK_HOT_WORDS=1):
   one hot word is ~30% of every doc's word draws, so hot shingles are
   woven through otherwise-unique text. Hypothesis to test: token-window
   passages are dominated by unique words, so drop_boilerplate_passages
   finds nothing and the composition does NOT mitigate — the posting cap
   is the actual defense for this shape.

2. REPEATED-PASSAGE boilerplate (the shape the pre-pass is designed for):
   a fixed 50-token block prefixed to ~1.6% of docs (806 of 50k — under
   the 1024 posting cap, so raw jaccard pays the near-cap quadratic
   expansion the 8.77x analysis identified). The pre-pass should delete
   the block, collapsing both the wall time and the boilerplate-induced
   pair volume.

Records per arm: wall (best of 2), output pairs, pair recall vs the raw
arm, and how many docs the pre-pass touched.

Usage: python tools/measure_composition_r10.py    (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SOAK_HOT_WORDS", "1")  # must precede the import
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402
from eth2dgraph_spark.sources.testdata import read_table  # noqa: E402
from tools.soak_skew_r9 import SF_DIR, synth_skew_corpus  # noqa: E402

N_DOCS = int(os.environ.get("SOAK_DOCS", "50000"))
BLOCK_EVERY = 62  # ~806 of 50k docs carry the injected passage block


def timed_pairs(op, frame, reps=2):
    """(best seconds, persisted (id_a, id_b) pair frame). Pair sets stay
    DISTRIBUTED — the composed arms can emit millions of pairs, so recall
    is computed with joins, never a driver collect."""
    best, got = None, None
    for _ in range(reps):
        if got is not None:
            got.unpersist()
        t0 = time.time()
        got = op(frame).select("id_a", "id_b").persist()
        got.count()
        el = round(time.time() - t0, 2)
        best = el if best is None else min(best, el)
    return best, got


def main() -> None:
    from eth2dgraph_spark.pipeline import dedup, text

    spark = get_spark("compose-r10")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    vocab = sorted(
        r["w"]
        for r in base.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .distinct()
        .collect()
    )
    lengths = [
        r["n"]
        for r in base.select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .limit(2000)
        .collect()
    ]

    # corpus 1: the r9 1-hot-word inline skew corpus, verbatim
    skw = (
        synth_skew_corpus(spark, vocab, lengths, N_DOCS)
        .select("doc_id", "text")
        .repartition(32)
        .persist()
    )
    skw.count()

    # corpus 2: uniform word stream + a FIXED 50-token block prefixed to
    # every 62nd doc (same injected block text in all of them)
    block = " ".join(f"boil{i:02d}" for i in range(50))
    uni = (
        synth_skew_corpus(spark, vocab, lengths, N_DOCS)  # reuse stream; hot word negligible in passage arm
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % BLOCK_EVERY == 0,
                F.concat(F.lit(block + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .repartition(32)
        .persist()
    )
    uni.count()

    def raw(d):
        return dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05)

    def composed(window):
        def op(d):
            # materialize the cleaned corpus between the stages (the
            # production shape — a cleaned corpus is cached/written before
            # dedup, and it gives the jaccard planner REAL size stats; the
            # unmaterialized composite lineage misled a broadcast estimate
            # into collecting >1 GiB on the first attempt of this script)
            clean = (
                text.drop_boilerplate_passages(
                    d, window=window, max_docs=100
                )
                .select("doc_id", F.col("text_clean").alias("text"))
                .filter(F.length(F.trim("text")) > 0)
                .localCheckpoint(eager=True)
            )
            return dedup.ngram_jaccard_pairs(clean, k=3, threshold=0.05)
        return op

    def touched(d, window):
        return (
            text.passage_drop_stats(d, window=window, max_docs=100)
            .filter(F.col("n_dropped") > 0)
            .count()
        )

    out: dict = {"n_docs": N_DOCS, "arms": {}}
    for corpus_name, frame in (("inline_1hot", skw), ("passage_block", uni)):
        sec_raw, p_raw = timed_pairs(raw, frame)
        n_raw = p_raw.count()
        rec: dict = {"raw": {"sec": sec_raw, "pairs": n_raw}}
        for window in (50, 5):
            sec_c, p_c = timed_pairs(composed(window), frame)
            n_c = p_c.count()
            inter = p_c.join(p_raw, ["id_a", "id_b"], "left_semi").count()
            rec[f"composed_w{window}"] = {
                "sec": sec_c,
                "pairs": n_c,
                "recall_vs_raw": round(inter / max(n_raw, 1), 4),
                "new_pairs": n_c - inter,
                "docs_touched_by_prepass": touched(frame, window),
            }
            p_c.unpersist()
            print(f"{corpus_name} w{window}: {rec[f'composed_w{window}']}", file=sys.stderr)
        out["arms"][corpus_name] = rec
        print(f"{corpus_name} raw: {rec['raw']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
