"""Round-10 winnow_overlap watch item (BASELINE.md third-decade soak:
7.93x wall at the 50k->500k decade, 73.6 s at 500k — the slowest scaler of
the pair-generating family). Before reaching for mitigations, find out
WHERE the time goes and whether the named mitigations actually bind:

arms at SOAK_DOCS (default 500k), best of SOAK_REPS (default 1 — steady
single draws; the r9 variance discipline says isolated runs only):

  fp_only        — winnow_fingerprints + distinct + count: the sampling
                   stage alone (if this dominates, the posting join is
                   innocent and caps/prepass can't help)
  raw            — winnow_overlap_pairs as shipped (max_posting=1024)
  cap256         — tightened posting cap (the jaccard cap-retune arm)
  groupby_count  — the count-over-window cap replaced by a groupBy(fp)
                   count + join: partial map-side combine shrinks the
                   count side to one row per distinct fp, where the
                   window shape sorts EVERY posting row inside the
                   fp-partitioned shuffle (candidate library change if
                   it wins; pairs must equal raw's exactly)

Records wall, pairs, and pair-set equality vs raw. One JSON line.
Usage: python tools/measure_winnow_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402
from eth2dgraph_spark.sources.testdata import read_table  # noqa: E402
from tools.soak_r10_scale import SF_DIR, synth_corpus_distributed  # noqa: E402

N_DOCS = int(os.environ.get("SOAK_DOCS", "500000"))
REPS = int(os.environ.get("SOAK_REPS", "1"))


def timed(op, reps=REPS):
    best, got = None, None
    for _ in range(reps):
        if got is not None:
            got.unpersist()
        t0 = time.time()
        got = op().persist()
        got.count()
        el = round(time.time() - t0, 2)
        best = el if best is None else min(best, el)
    return best, got


def main() -> None:
    from eth2dgraph_spark.pipeline import text

    spark = get_spark("winnow-r10")
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
    corpus = (
        synth_corpus_distributed(spark, vocab, lengths, N_DOCS)
        .repartition(64)
        .persist()
    )
    corpus.count()

    out: dict = {"n_docs": N_DOCS, "arms": {}}

    # stage isolation: the fingerprint sample alone
    def fp_only():
        return (
            text.winnow_fingerprints(corpus, "doc_id", "text", 4, 5)
            .select(F.col("doc_id").alias("id"), "fp")
            .distinct()
        )

    sec_fp, fps = timed(fp_only)
    n_post = fps.count()
    out["arms"]["fp_only"] = {"sec": sec_fp, "postings": n_post}
    print(f"fp_only: {out['arms']['fp_only']}", file=sys.stderr)

    def raw():
        return text.winnow_overlap_pairs(corpus, k=4, w=5, min_shared=2)

    sec_raw, p_raw = timed(raw)
    n_raw = p_raw.count()
    out["arms"]["raw"] = {"sec": sec_raw, "pairs": n_raw}
    print(f"raw: {out['arms']['raw']}", file=sys.stderr)

    def cap256():
        return text.winnow_overlap_pairs(
            corpus, k=4, w=5, min_shared=2, max_posting=256
        )

    sec_c, p_c = timed(cap256)
    inter = p_c.join(p_raw, ["id_a", "id_b"], "left_semi").count()
    out["arms"]["cap256"] = {
        "sec": sec_c,
        "pairs": p_c.count(),
        "recall_vs_raw": round(inter / max(n_raw, 1), 4),
    }
    p_c.unpersist()
    print(f"cap256: {out['arms']['cap256']}", file=sys.stderr)

    # groupBy-count variant of the cap (library shape candidate)
    def groupby_count():
        f = fp_only()
        counts = f.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
        capped = (
            f.join(counts.filter((F.col("_n") > 1) & (F.col("_n") <= 1024)), "fp")
            .drop("_n")
        )
        a = capped.select(F.col("id").alias("id_a"), "fp")
        b = capped.select(F.col("id").alias("id_b"), "fp")
        return (
            a.join(b, "fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= 2)
        )

    sec_g, p_g = timed(groupby_count)
    n_g = p_g.count()
    same = (
        n_g == n_raw
        and p_g.join(p_raw, ["id_a", "id_b"], "left_semi").count() == n_raw
    )
    out["arms"]["groupby_count"] = {"sec": sec_g, "pairs": n_g, "equals_raw": same}
    p_g.unpersist()
    print(f"groupby_count: {out['arms']['groupby_count']}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
