"""Round-10 third scaling decade: the pair-generating ops (ngram_jaccard,
minhash_lsh_pairs, winnow_overlap, cross_dedup, cluster_reps) measured at
sf0.1 (~5k docs), 50k and 500k synthetic docs — two 10x decades on one VM,
extending the r8/r9 one-decade soaks (BASELINE.md). Also records the
minhash cap-binding stats (band buckets over DEFAULT_MAX_BAND_BUCKET and
the theoretical band pair volume) so "time per candidate keeps falling"
is checked against the actual candidate load, not just wall clock.

Unlike tools/soak_r8.synth_corpus (a driver-side Python loop — fine at 50k,
minutes of driver time at 500k), the generator here is DISTRIBUTED: a
mapInPandas kernel over spark.range(n) with the vocabulary in the closure;
each doc derives deterministically from its id alone (chain-free dup
structure: exact dups at i%100==37 copy normal doc i-37, near-dups at
i%50==23 mutate normal doc i-23 — both reference ids that are themselves
normal, so no recursive replay). ~1% exact + ~2% near dups, matching the
r8 corpus shape.

Usage: python tools/soak_r10_scale.py        (one JSON line; ~tens of min)
  SOAK_SIZES=50000,500000 SOAK_OPS=minhash_lsh_pairs,... to restrict.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SIZES = [int(x) for x in os.environ.get("SOAK_SIZES", "50000,500000").split(",")]
VOCAB_MULT = 10


def synth_corpus_distributed(spark, base_vocab, lengths, n_docs):
    """Deterministic n-doc corpus generated ON THE EXECUTORS (mapInPandas
    over a range): per-doc xorshift word stream over the 10x vocabulary,
    ~1% exact and ~2% near duplicates with CHAIN-FREE references (every
    dup points at a doc that generates the normal path)."""
    vocab = list(base_vocab)
    for i in range(len(base_vocab) * (VOCAB_MULT - 1)):
        vocab.append(f"{base_vocab[i % len(base_vocab)]}{i // len(base_vocab)}x")
    nv, nl = len(vocab), len(lengths)
    lens = list(lengths)

    def gen_words(seed: int, n: int) -> list:
        s = (seed * 2654435761 + 1) & 0xFFFFFFFFFFFFFFFF
        out = []
        for _ in range(n):
            s ^= (s << 13) & 0xFFFFFFFFFFFFFFFF
            s ^= s >> 7
            s ^= (s << 17) & 0xFFFFFFFFFFFFFFFF
            out.append(vocab[s % nv])
        return out

    def normal_text(i: int) -> str:
        return " ".join(gen_words(i, max(5, lens[i % nl])))

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            texts = []
            for i in pdf["id"]:
                i = int(i)
                if i % 100 == 37 and i > 100:  # exact dup of a normal doc
                    texts.append(normal_text(i - 37))
                elif i % 50 == 23 and i > 100:  # near dup: 10% words swapped
                    ws = normal_text(i - 23).split(" ")
                    repl = gen_words(i * 7 + 3, len(ws) // 10 + 1)
                    for j in range(0, len(ws), 10):
                        ws[j] = repl[j // 10]
                    texts.append(" ".join(ws))
                else:
                    texts.append(normal_text(i))
            yield pd.DataFrame({"doc_id": pdf["id"].astype("int64"), "text": texts})

    return (
        spark.range(n_docs)
        .repartition(64)
        .mapInPandas(kernel, "doc_id long, text string")
    )


def minhash_cap_stats(dedup, d, cap):
    """(band buckets over `cap`, theoretical uncapped band pair volume) —
    the candidate load the star cap is defending against."""
    sigs = dedup.minhash_signatures(d, k=3, num_hashes=32)
    rows_per_band = 32 // 8
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice("sig", b * rows_per_band + 1, rows_per_band).alias("key"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("bk"),
    ).select("bk.band", "bk.key")
    counts = banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    agg = counts.agg(
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias("overcap"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pair_volume"),
    ).first()
    return int(agg["overcap"] or 0), int(agg["pair_volume"] or 0)


def main() -> None:
    from eth2dgraph_spark.graph import cluster_representatives
    from eth2dgraph_spark.pipeline import dedup, text

    spark = get_spark("soak-r10")
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

    frames = [("small_sf01", base.repartition(32).persist())]
    for n in SIZES:
        frames.append(
            (f"uniform_{n // 1000}k", synth_corpus_distributed(spark, vocab, lengths, n)
             .repartition(64).persist())
        )
    for _, f in frames:
        f.count()

    def cross(d):
        new = d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat("text", F.lit(" zzz extra token")).alias("text"),
        )
        return dedup.minhash_cross_pairs(new, d, k=3, threshold=0.5)

    OPS = {
        "ngram_jaccard": lambda d: dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05),
        "minhash_lsh_pairs": lambda d: dedup.minhash_dedup_pairs(
            d, k=3, num_hashes=32, num_bands=8, threshold=0.05
        ),
        "winnow_overlap": lambda d: text.winnow_overlap_pairs(d, k=3, w=4, min_shared=2),
        "cross_dedup_10pct_new": cross,
        "cluster_reps": lambda d: cluster_representatives(
            d.withColumn("nt", F.size(F.split(F.trim("text"), r"\s+")).cast("long")),
            dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05).select("id_a", "id_b"),
            order_col="nt",
        ),
    }
    only = os.environ.get("SOAK_OPS")
    if only:
        keep = {x.strip() for x in only.split(",") if x.strip()}
        OPS = {k: v for k, v in OPS.items() if k in keep}

    out: dict = {"sizes": {lbl: f.count() for lbl, f in frames}, "ops": {}, "minhash_cap": {}}
    for lbl, f in frames:
        oc, pv = minhash_cap_stats(dedup, f, dedup.DEFAULT_MAX_BAND_BUCKET)
        out["minhash_cap"][lbl] = {"overcap_buckets": oc, "band_pair_volume": pv}
        print(f"minhash_cap {lbl}: overcap={oc} pair_volume={pv}", file=sys.stderr)
    for name, op in OPS.items():
        rec: dict = {}
        prev_sec = None
        for lbl, f in frames:
            reps = 2 if f is frames[0][1] or "50k" in lbl else 1
            best, rows = None, None
            for _ in range(reps):
                t0 = time.time()
                rows = op(f).count()
                el = round(time.time() - t0, 2)
                best = el if best is None else min(best, el)
            rec[lbl] = {"sec": best, "rows": rows}
            if prev_sec is not None:
                rec[lbl]["time_ratio_vs_prev_decade"] = round(best / max(prev_sec, 1e-9), 2)
            prev_sec = best
            print(f"{name} {lbl}: {rec[lbl]}", file=sys.stderr)
        out["ops"][name] = rec
    print(json.dumps(out))


if __name__ == "__main__":
    main()
