"""Round-9 skew soak: the pair-generating ops and the per-key cap under a
ZIPFIAN key distribution — the realistic web-corpus shape (one domain owns
~30% of documents; one hot word family dominates the shingle stream) — vs
the uniform 50k-doc corpus of tools/soak_r8.py built from the same
vocabulary and length distribution.

Records per op x corpus: wall-clock (best of 2, steady-state), output rows,
and the CAP-BINDING diagnostics (over-cap shingle postings, over-cap LSH
band buckets, over-cap winnow fingerprint postings, rows dropped by the
domain cap) so the claim "the caps are what keep the skewed corpus from
going quadratic" is measured, not asserted.

Also A/Bs `salted_join` on the hottest join (token rows keyed by the 30%%
domain joined to a per-domain dim): with broadcast and AQE skew handling
DISABLED on both arms — the controlled experiment isolating the salting
lever — plus the default-config time, which is the first-line defense
(broadcast/AQE) this repo actually ships in gates.

Usage: python tools/soak_skew_r9.py   (one JSON line; ~minutes)
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
from tools.soak_r8 import VOCAB_MULT, synth_corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_DOCS = int(os.environ.get("SOAK_DOCS", "50000"))
HOT_DOMAIN_FRAC = 0.30  # one domain owns ~30% of docs
HOT_WORD_FRAC = 3  # 3 in 10 word draws come from the hot family
# 8 hot words -> 512 distinct hot 3-gram shingles at ~100 docs each: skewed
# but UNDER the 1024 posting/bucket caps (measured). N_HOT_WORDS=1 is the
# boilerplate shape — ONE shingle lands in ~most docs, forcing every cap to
# bind. Both modes are recorded in BASELINE.md round-9.
N_HOT_WORDS = int(os.environ.get("SOAK_HOT_WORDS", "8"))
N_DOMAINS = 5000


def synth_skew_corpus(spark, base_vocab: list[str], lengths: list[int], n_docs: int):
    """Same deterministic xorshift stream as soak_r8.synth_corpus, same
    duplicate injection, but (a) ~30% of word draws come from an 8-word hot
    family (consecutive hot draws create hot 3-gram shingles — the
    boilerplate shape), and (b) a `domain` column where one domain owns 30%
    of docs and the rest spread over 5000 (the web crawl shape)."""
    vocab = list(base_vocab)
    for i in range(len(base_vocab) * (VOCAB_MULT - 1)):
        vocab.append(f"{base_vocab[i % len(base_vocab)]}{i // len(base_vocab)}x")
    nv, nl = len(vocab), len(lengths)
    hot = vocab[:N_HOT_WORDS]

    def words(seed: int, n: int) -> list[str]:
        s = (seed * 2654435761 + 1) & 0xFFFFFFFFFFFFFFFF
        out = []
        for _ in range(n):
            s ^= (s << 13) & 0xFFFFFFFFFFFFFFFF
            s ^= s >> 7
            s ^= (s << 17) & 0xFFFFFFFFFFFFFFFF
            if s % 10 < HOT_WORD_FRAC:
                out.append(hot[s % N_HOT_WORDS])
            else:
                out.append(vocab[s % nv])
        return out

    rows = []
    for i in range(n_docs):
        # deterministic domain: 30% hot, the rest zipf-ish over 5000
        h = (i * 2654435761) & 0xFFFFFFFF
        if h % 100 < int(HOT_DOMAIN_FRAC * 100):
            domain = "hot.example"
        else:
            domain = f"d{h % N_DOMAINS}.example"
        if i % 100 == 37 and i > 100:  # exact duplicate of an earlier doc
            rows.append((i, rows[i - 100][1], domain))
            continue
        if i % 50 == 23 and i > 100:  # near duplicate: 10% words swapped
            ws = rows[i - 100][1].split(" ")
            repl = words(i * 7 + 3, len(ws) // 10 + 1)
            for j in range(0, len(ws), 10):
                ws[j] = repl[j // 10]
            rows.append((i, " ".join(ws), domain))
            continue
        n_words = max(5, lengths[i % nl])
        rows.append((i, " ".join(words(i, n_words)), domain))
    return spark.createDataFrame(rows, "doc_id long, text string, domain string")


def _best_of(fn, runs: int = 2) -> "tuple[float, int]":
    best, rows = None, None
    for _ in range(runs):
        t0 = time.time()
        rows = fn()
        el = round(time.time() - t0, 2)
        best = el if best is None else min(best, el)
    return best, rows


def main() -> None:
    from pyspark.sql import Window

    from eth2dgraph_spark.pipeline import dedup, split, text
    from eth2dgraph_spark.plans.physical import salted_join

    spark = get_spark("soak-skew-r9")
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
    uni = synth_corpus(spark, vocab, lengths, N_DOCS).withColumn(
        "domain",
        F.concat(F.lit("d"), (F.col("doc_id") % N_DOMAINS).cast("string"), F.lit(".example")),
    )
    skw = synth_skew_corpus(spark, vocab, lengths, N_DOCS)
    uni = uni.repartition(32).persist()
    skw = skw.repartition(32).persist()
    print(f"uniform={uni.count()} skew={skw.count()} docs", file=sys.stderr)
    hot_docs = skw.filter(F.col("domain") == "hot.example").count()
    print(f"hot-domain docs: {hot_docs} ({hot_docs / N_DOCS:.0%})", file=sys.stderr)

    OPS = {
        "ngram_jaccard": lambda d: dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05),
        "minhash_lsh_pairs": lambda d: dedup.minhash_dedup_pairs(
            d, k=3, num_hashes=32, num_bands=8, threshold=0.05
        ),
        "winnow_overlap": lambda d: text.winnow_overlap_pairs(d, k=3, w=4, min_shared=2),
        "cap_per_key": lambda d: split.cap_per_key(d, ["domain"], k=30),
    }
    out: dict = {
        "n_docs": N_DOCS,
        "hot_domain_docs": hot_docs,
        "ops": {},
        "cap_binding": {},
        "salted_ab": {},
    }
    for name, op in OPS.items():
        rec: dict = {}
        for label, frame in (("uniform", uni), ("skew", skw)):
            sec, rows = _best_of(lambda: op(frame).count())
            rec[label] = {"sec": sec, "rows": rows}
            spark.catalog.clearCache()
            uni.persist().count()
            skw.persist().count()
        rec["time_ratio_skew_vs_uniform"] = round(
            rec["skew"]["sec"] / max(rec["uniform"]["sec"], 1e-9), 2
        )
        out["ops"][name] = rec
        print(f"{name}: {rec}", file=sys.stderr)

    # --- cap-binding diagnostics (how hard each defense works per corpus)
    def band_hot_buckets(d) -> int:
        sigs = dedup.minhash_signatures(d, k=3, num_hashes=32)
        banded = sigs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.slice("sig", b * 4 + 1, 4).alias("key"),
                        )
                        for b in range(8)
                    ]
                )
            ).alias("bk"),
        ).select(F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        return (
            banded.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > dedup.DEFAULT_MAX_BAND_BUCKET)
            .count()
        )

    def winnow_hot_postings(d) -> int:
        fps = text.winnow_fingerprints(d, "doc_id", "text", 3, 4).select("doc_id", "fp").distinct()
        return (
            fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1024).count()
        )

    for label, frame in (("uniform", uni), ("skew", skw)):
        sp = dedup.stop_shingle_postings(frame, k=3)
        agg = sp.agg(
            F.count(F.lit(1)).alias("n"), F.max("doc_count").alias("mx")
        ).collect()[0]
        out["cap_binding"][label] = {
            "jaccard_overcap_postings": agg["n"],
            "jaccard_max_posting": agg["mx"],
            "minhash_overcap_buckets": band_hot_buckets(frame),
            "winnow_overcap_fps": winnow_hot_postings(frame),
            "cap_per_key_dropped": frame.count()
            - split.cap_per_key(frame, ["domain"], k=30).count(),
        }
        print(f"cap_binding[{label}]: {out['cap_binding'][label]}", file=sys.stderr)

    # --- salted_join A/B on the hottest join: token rows keyed by domain
    # (30% on one key) joined to a per-domain dim. Both arms run with
    # broadcast and AQE skew handling DISABLED — the controlled experiment
    # isolating the salting lever; 'default_conf' is the same join with the
    # session defaults (broadcast/AQE on), the first-line defense.
    toks = skw.select(
        "domain", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    ).persist()
    n_tok = toks.count()
    dim = (
        skw.select("domain").distinct().withColumn("w", F.xxhash64("domain") % 97)
    ).persist()
    dim.count()
    print(f"token rows: {n_tok}", file=sys.stderr)

    def join_count(df):
        return df.groupBy("domain").agg(F.count(F.lit(1)).alias("n"), F.sum("w")).count()

    sec_def, _ = _best_of(lambda: join_count(toks.join(dim, "domain")))
    ab = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    sj = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        sec_plain, _ = _best_of(lambda: join_count(toks.join(dim, "domain")))
        sec_salted, _ = _best_of(lambda: join_count(salted_join(toks, dim, "domain", salt=16)))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", ab)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", sj)
    out["salted_ab"] = {
        "token_rows": n_tok,
        "default_conf_sec": sec_def,
        "no_defense_plain_sec": sec_plain,
        "no_defense_salted_sec": sec_salted,
    }
    print(f"salted_ab: {out['salted_ab']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
