"""Round-9 cap-retune A/B motivated by the skew soak: on the 1-hot-word
(boilerplate) corpus, ngram_jaccard went 8.77x vs uniform even though the
posting cap bound — postings just UNDER max_shingle_docs=1024 each expand
to ~n^2/2 candidate pairs. Measure time + output rows + recall (pairs at
threshold vs the 1024 baseline) across cap settings to decide whether the
default should move.

Usage: python tools/retune_jaccard_cap_r9.py   (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SOAK_HOT_WORDS", "1")

from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402
from eth2dgraph_spark.sources.testdata import read_table  # noqa: E402
from tools.soak_skew_r9 import N_DOCS, SF_DIR, synth_skew_corpus  # noqa: E402


def main() -> None:
    from eth2dgraph_spark.pipeline import dedup

    spark = get_spark("retune-jaccard-cap")
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
    skw = synth_skew_corpus(spark, vocab, lengths, N_DOCS).repartition(32).persist()
    print(f"skew docs: {skw.count()}", file=sys.stderr)

    out: dict = {"corpus": "1-hot-word skew", "n_docs": N_DOCS, "caps": {}}
    baseline_pairs: "set | None" = None
    for cap in (1024, 512, 256, 128):
        best, rows = None, None
        for _ in range(2):
            t0 = time.time()
            rows = dedup.ngram_jaccard_pairs(
                skw, k=3, threshold=0.05, max_shingle_docs=cap
            ).count()
            el = round(time.time() - t0, 2)
            best = el if best is None else min(best, el)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.ngram_jaccard_pairs(
                skw, k=3, threshold=0.05, max_shingle_docs=cap
            ).collect()
        }
        if baseline_pairs is None:
            baseline_pairs = pairs
            recall = 1.0
        else:
            recall = round(len(pairs & baseline_pairs) / max(len(baseline_pairs), 1), 4)
        out["caps"][str(cap)] = {"sec": best, "rows": rows, "recall_vs_1024": recall}
        print(f"cap={cap}: {out['caps'][str(cap)]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
