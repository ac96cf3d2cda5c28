"""Round-9 new-op scale soak: token_budget_mix / script_profile /
entropy_profile / cluster_representatives measured on the sf0.1 corpus
(5k docs) and on the 50k-doc uniform and zipf-skew synthetic corpora
(tools/soak_r8 + tools/soak_skew_r9 generators) — the measured-scaling
discipline applied to this round's additions. Best-of-2 steady-state
timings + output rows per (op, corpus).

Usage: python tools/soak_r9_ops.py   (one JSON line; ~minutes)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eth2dgraph_spark.session import get_spark  # noqa: E402
from eth2dgraph_spark.sources.testdata import read_table  # noqa: E402
from tools.soak_r8 import synth_corpus  # noqa: E402
from tools.soak_skew_r9 import N_DOMAINS, SF_DIR, synth_skew_corpus  # noqa: E402

N_DOCS = int(os.environ.get("SOAK_DOCS", "50000"))


def main() -> None:
    from eth2dgraph_spark.graph import cluster_representatives
    from eth2dgraph_spark.pipeline import dedup, split, text

    spark = get_spark("soak-r9-ops")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
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
    small = base.withColumnRenamed("source", "domain").repartition(32).persist()
    uni = (
        synth_corpus(spark, vocab, lengths, N_DOCS)
        .withColumn(
            "domain",
            F.concat(F.lit("d"), (F.col("doc_id") % N_DOMAINS).cast("string"), F.lit(".example")),
        )
        .repartition(32)
        .persist()
    )
    skw = synth_skew_corpus(spark, vocab, lengths, N_DOCS).repartition(32).persist()
    for f in (small, uni, skw):
        f.count()

    def tbm(d):
        doms = [r["domain"] for r in d.select("domain").distinct().limit(4).collect()]
        return split.token_budget_mix(d, {x: 1.0 for x in sorted(doms)}, 4000, source_col="domain")

    def cross(d):
        new = d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat("text", F.lit(" zzz extra token")).alias("text"),
        )
        return dedup.minhash_cross_pairs(new, d.select("doc_id", "text"), k=3, threshold=0.5)

    OPS = {
        "cross_dedup_10pct_new": cross,
        "token_budget_mix": tbm,
        "script_profile": lambda d: text.script_profile(d),
        "entropy_profile": lambda d: text.entropy_profile(d),
        "cluster_reps": lambda d: cluster_representatives(
            d.withColumn("nt", F.size(F.split(F.trim("text"), r"\s+")).cast("long")),
            dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05).select("id_a", "id_b"),
            order_col="nt",
        ),
    }
    out: dict = {"n_docs_small": small.count(), "n_docs_big": N_DOCS, "ops": {}}
    for name, op in OPS.items():
        rec: dict = {}
        for label, frame in (("small_sf01", small), ("uniform_50k", uni), ("skew_50k", skw)):
            best, rows = None, None
            for _ in range(2):
                t0 = time.time()
                rows = op(frame).count()
                el = round(time.time() - t0, 2)
                best = el if best is None else min(best, el)
            rec[label] = {"sec": best, "rows": rows}
        rec["time_ratio_10x"] = round(
            rec["uniform_50k"]["sec"] / max(rec["small_sf01"]["sec"], 1e-9), 2
        )
        rec["time_ratio_skew"] = round(
            rec["skew_50k"]["sec"] / max(rec["uniform_50k"]["sec"], 1e-9), 2
        )
        out["ops"][name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
