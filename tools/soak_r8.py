"""Round-8 scale soak: measure the five sf-sensitive pipeline ops on the
sf0.1 corpus (5k docs) and on a deterministic 10x synthetic corpus
(50k docs) built from the same distribution WITH the vocabulary scaled
10x too (a 10x web corpus grows its vocabulary; holding the 31-word toy
vocab fixed while 10x-ing docs would densify every shingle posting ~10x
and measure the data's degeneracy, not the operator's scaling).

Each op is timed via .count() (best of 2, steady-state) and its output
row count recorded, so the honest scaling claim is time-vs-work: a
bucketed op should scale near-linearly when candidate volume does.

Usage: python tools/soak_r8.py   (prints one JSON line; ~minutes)
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
N_DOCS = int(os.environ.get("SOAK_DOCS", "50000"))
VOCAB_MULT = 10


def synth_corpus(spark, base_vocab: list[str], lengths: list[int], n_docs: int):
    """Deterministic 50k-doc corpus: per-doc xorshift word stream over the
    10x-scaled vocabulary; ~1% exact duplicates and ~2% near-duplicates
    (every 10th word swapped) so the dedup ops keep real work at scale."""
    vocab = list(base_vocab)
    for i in range(len(base_vocab) * (VOCAB_MULT - 1)):
        vocab.append(f"{base_vocab[i % len(base_vocab)]}{i // len(base_vocab)}x")
    nv, nl = len(vocab), len(lengths)

    def words(seed: int, n: int) -> list[str]:
        s = (seed * 2654435761 + 1) & 0xFFFFFFFFFFFFFFFF
        out = []
        for _ in range(n):
            s ^= (s << 13) & 0xFFFFFFFFFFFFFFFF
            s ^= s >> 7
            s ^= (s << 17) & 0xFFFFFFFFFFFFFFFF
            out.append(vocab[s % nv])
        return out

    rows = []
    for i in range(n_docs):
        if i % 100 == 37 and i > 100:  # exact duplicate of an earlier doc
            rows.append((i, rows[i - 100][1]))
            continue
        if i % 50 == 23 and i > 100:  # near duplicate: 10% words swapped
            ws = rows[i - 100][1].split(" ")
            repl = words(i * 7 + 3, len(ws) // 10 + 1)
            for j in range(0, len(ws), 10):
                ws[j] = repl[j // 10]
            rows.append((i, " ".join(ws)))
            continue
        n_words = max(5, lengths[i % nl])
        rows.append((i, " ".join(words(i, n_words))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    from eth2dgraph_spark.graph import duplicate_clusters
    from eth2dgraph_spark.pipeline import dedup, substring, text

    spark = get_spark("soak-r8")
    spark.sparkContext.setLogLevel("ERROR")

    base = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    vocab = [
        r["w"]
        for r in base.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .distinct()
        .collect()
    ]
    lengths = [
        r["n"]
        for r in base.select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .limit(2000)
        .collect()
    ]
    big = synth_corpus(spark, sorted(vocab), lengths, N_DOCS)
    big = big.repartition(32).persist()
    print(f"big corpus: {big.count()} docs", file=sys.stderr)
    base = base.persist()
    base.count()

    OPS = {
        "ngram_jaccard": lambda d: dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05),
        "minhash_lsh_pairs": lambda d: dedup.minhash_dedup_pairs(
            d, k=3, num_hashes=32, num_bands=8, threshold=0.05
        ),
        "dedup_clusters": lambda d: duplicate_clusters(
            dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05).select("id_a", "id_b")
        ),
        "substring_stats": lambda d: substring.substring_drop_stats(d, window=25),
        "winnow_overlap": lambda d: text.winnow_overlap_pairs(
            d, k=3, w=4, min_shared=2
        ),
    }

    # session-2 additions: the Gopher n-gram fractions (5 explodes + 5
    # keyed aggs), WordPiece encoding under a FIXED vocabulary trained on
    # the small corpus (the realistic shape: the tokenizer doesn't retrain
    # per shard), and the HLL sketch over the exploded token stream
    from eth2dgraph_spark.pipeline import hll as hllmod
    from eth2dgraph_spark.pipeline import wordpiece as wp

    wp_pieces = wp.wordpiece_train(base, num_merges=24, min_pair_freq=2)
    wp_pieces = wp_pieces.persist()
    wp_pieces.count()
    OPS["gopher_rep"] = lambda d: text.ngram_repetition_fractions(d)
    OPS["wordpiece_encode"] = lambda d: wp.wordpiece_token_counts(d, wp_pieces)
    OPS["hll_distinct"] = lambda d: hllmod.hll_count_distinct(
        d.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")),
        "w",
        p=8,
    )

    only = os.environ.get("SOAK_OPS")
    if only:
        keep = {x.strip() for x in only.split(",") if x.strip()}
        OPS = {k: v for k, v in OPS.items() if k in keep}

    out: dict = {"n_docs_small": base.count(), "n_docs_big": N_DOCS, "ops": {}}
    for name, op in OPS.items():
        rec: dict = {}
        for label, frame in (("small", base), ("big", big)):
            best, rows = None, None
            for _ in range(2):
                t0 = time.time()
                rows = op(frame).count()
                el = round(time.time() - t0, 2)
                best = el if best is None else min(best, el)
                spark.catalog.clearCache()
                base.persist().count()
                big.persist().count()
            rec[label] = {"sec": best, "rows": rows}
        t_ratio = rec["big"]["sec"] / max(rec["small"]["sec"], 1e-9)
        w_ratio = rec["big"]["rows"] / max(rec["small"]["rows"], 1)
        rec["time_ratio"] = round(t_ratio, 2)
        rec["output_ratio"] = round(w_ratio, 2)
        out["ops"][name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
