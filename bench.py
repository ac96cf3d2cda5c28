"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect cost). A warmup query amortizes JVM/codegen startup out of
the per-query numbers.

Robustness: every query runs under its own try/except — a failing query is
recorded as {"errors": {name: msg}} and the JSON line still prints with the
timings of everything else (a single bad query must never cost the whole
round's numbers).

Methodology: each query runs REPEAT times (default 2) and the best timing
is kept — steady state, not first-run. A one-shot run folds JVM JIT +
codegen of that query's whole pipeline into its number (measured: cms_topk
9.1 s first run vs 2.1 s steady on the same session, byte_kernels 19.8 vs
6.7), which is noise about the harness, not signal about the plan — at
real scale a query's fixed JIT cost amortizes to nothing. `--repeat N`
overrides (N=1 gives the old one-shot behavior).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from eth2dgraph_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: relational joins/aggs, windows, the eth-semantics queries,
# and the pipeline operators (dedup / similarity / text).
HEADLINE = [
    "gas_stats",
    "lifetimes_rq4",
    "pricing_summary",
    "shipping_priority",
    "region_revenue",
    "parts_top_per_brand",
    "first_per_key",
    "event_gaps",
    "rollup",
    "dedup_exact",
    "ngram_jaccard",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "embedding_cosine",
    "ann_topk",
    "quality_score",
    "lang_id",
    "token_count",
    "fingerprint",
    "cms_topk",
    "corpus_pipeline",
    # round-6 additions (importance scoring, semantic dedup, BPE): the
    # 29-query subtotal above/below stays comparable to rounds 1-5; these
    # four are extra (BASELINE.md round-6 session-3 notes)
    "dsir_weights",
    "lm_perplexity",
    "semantic_dedup",
    "bpe_tokens",
    # round-7 additions: substring-level exact dedup, trained quality
    # classifier, BM25 retrieval — extras beyond the comparable
    # subtotals, same policy
    "substring_stats",
    "quality_clf",
    "bm25_topk",
    # round-8 additions: product-quantized ANN, unigram-LM encoding,
    # perceptual hashing, Bloom-screened incremental curation — extras
    "pq_topk",
    "unigram_encode",
    "phash_bits",
    "incr_curate_bloom",
    # round-8 session-2 additions: HLL distinct sketch, per-key cap
    # sampler, source-KL mixing diagnostic — extras, same policy
    "hll_distinct",
    "domain_cap",
    "source_kl",
    "wordpiece_encode",
    "int8_quant",
    "format_roundtrips",
    "gopher_rep",
    "ppl_buckets",
    "shard_assign",
    "order_priority",
    "custdist",
    "nation_flows",
    "rank_funcs",
    "byte_kernels",
    # round-9 additions: the BPE trainer's merge table (2 distributed-or-
    # local rounds over the vocab) — extra beyond the comparable subtotal
    "bpe_merges",
    # round-10 additions: the stdlib WAV/AVI codec roundtrips, the
    # pHash-postings video near-dup, the HITS kernel, and the foreachBatch
    # incremental cross-corpus near-dup — extras, same policy
    "wav_envelope",
    "avi_luma",
    "video_near_dups",
    "audio_near_dups",
    "line_profile",
    "video_near_frames",
    "cross_dedup_stream",
    "audio_dedup_stream",
    # round-11 additions: the PNG image near-dup (closing the modality
    # asymmetry) and the hamming-tolerant audio matcher — extras, same
    # policy
    "image_near_dups",
    "audio_near_frames",
    # round-12 additions: the stdlib JPEG codec roundtrip, its near-dup
    # arm, the GIF codec roundtrip, and the streaming image ingest —
    # extras, same policy
    "jpeg_luma",
    "gif_luma",
    "video_near_dups_gif",
    "image_near_dups_jpeg",
    "image_dedup_stream",
    # round-13 additions: the stdlib FLAC codec roundtrip and its
    # near-dup arm — extras, same policy
    "flac_envelope",
    "audio_near_dups_flac",
    # the iterative localCheckpoint queries run LAST: their checkpointed
    # RDDs are released asynchronously by the ContextCleaner, and that
    # cleanup measurably degrades whatever runs next (byte_kernels measured
    # 11.7-25 s right after pagerank vs 2.5-6.7 s isolated, same session
    # settings) — ordering them at the end keeps every query's number about
    # its own plan
    "dedup_clusters",
    "pagerank_ranks",
    "kcore_2rounds",
    "modularity",
    # round-9: layered-peeling coreness (capped fixed-shape) — also a
    # localCheckpoint query, same end-of-run placement policy
    "coreness_capped",
    # round-10: personalized PageRank (seed-set reset vector) and HITS —
    # also localCheckpoint queries, same end-of-run placement policy
    "ppr_ranks",
    "hits_scores",
    # round-10: composed multimodal dedup policy (runs CC) — same policy
    "asset_cluster_reps",
    # round-11: weighted SSSP (frontier relaxation, two localCheckpoint
    # cuts per round) and its path-reconstruction variant — same
    # end-of-run placement policy
    "sssp_dists",
    "sssp_paths",
    "sssp_route",
    "harmonic_landmarks",
    # round-11: Borůvka minimum spanning forest + single-linkage cut
    # (both run contraction CC rounds) — same end-of-run placement policy
    "msf_edges",
    "sl_clusters",
    # round-12: targeted SSSP (early-stop frontier loop) and landmark
    # Brandes betweenness (BFS + backward sweep, both localCheckpoint) —
    # same end-of-run placement policy
    "sssp_targeted",
    "betweenness_landmarks",
    # round-13: weighted Brandes (SSSP + sigma/delta DAG rounds, all
    # localCheckpoint) — same end-of-run placement policy
    "betweenness_weighted",
]

# The 29 queries benched identically since round 1 — the cross-round /
# cross-VM comparison basis (BASELINE.md bands are quoted on this
# subtotal; the VM-variance discipline says compare bands, not draws).
COMPARABLE_29 = [
    q for q in HEADLINE
    if q not in {
        "dsir_weights", "lm_perplexity", "semantic_dedup", "bpe_tokens",
        "substring_stats", "quality_clf", "bm25_topk",
        "pq_topk", "unigram_encode", "phash_bits", "incr_curate_bloom",
        "hll_distinct", "domain_cap", "source_kl", "wordpiece_encode",
        "int8_quant",
    "format_roundtrips",
    "gopher_rep",
    "ppl_buckets",
    "shard_assign",
    "kcore_2rounds",
    "modularity",
    "bpe_merges",
    "coreness_capped",
    "wav_envelope",
    "avi_luma",
    "video_near_dups",
    "audio_near_dups",
    "line_profile",
    "hits_scores",
    "video_near_frames",
    "cross_dedup_stream",
    "audio_dedup_stream",
    "asset_cluster_reps",
    "ppr_ranks",
    "image_near_dups",
    "audio_near_frames",
    "sssp_dists",
    "sssp_paths",
    "sssp_route",
    "harmonic_landmarks",
    "msf_edges",
    "sl_clusters",
    "jpeg_luma",
    "gif_luma",
    "video_near_dups_gif",
    "image_near_dups_jpeg",
    "image_dedup_stream",
    "sssp_targeted",
    "betweenness_landmarks",
    "flac_envelope",
    "audio_near_dups_flac",
    "betweenness_weighted",
    }
]


def band_flags(timings: dict[str, float], bands: dict[str, dict]) -> dict[str, dict]:
    """Per-query band departures: above p90*1.15 ('high'), below p10*0.85
    ('low'), or 'no_band' for queries the bands file does not know."""
    flags: dict[str, dict] = {}
    for q, t in timings.items():
        b = bands.get(q)
        if b is None:
            flags[q] = {"flag": "no_band"}
        elif t > b["p90"] * 1.15:
            flags[q] = {"flag": "high", "ratio": round(t / b["p90"], 2)}
        elif t < b["p10"] * 0.85:
            flags[q] = {"flag": "low", "ratio": round(t / b["p10"], 2)}
    return flags


def detect_elevated(flags: dict[str, dict]) -> tuple[bool, float | None]:
    """Elevated-draw self-diagnosis (VERDICT r13 item 3): host steal on
    this box shows up as MANY diffuse high flags (r13: 40+ highs at
    1.16-1.77x across unrelated queries, no single-query outlier) rather
    than one regressed query. Returns (draw_elevated, median_high_ratio);
    the median is reported whenever >= 15 highs exist so a near-miss is
    still visible in the detail record."""
    high_ratios = sorted(f["ratio"] for f in flags.values() if f.get("flag") == "high")
    if len(high_ratios) < 15:
        return False, None
    median = high_ratios[len(high_ratios) // 2]
    # Outlier-robust cap (r15, VERDICT r14 item 3): the r14 driver draw had
    # 29 diffuse highs at median 1.66 — textbook host steal — but a single
    # query at 2.52 defeated the `max <= 2.5` cap and the contract line
    # shipped without the flag. One genuinely-regressed query must not veto
    # the environment diagnosis (its own high flag still names it), so the
    # cap is evaluated with the single largest ratio dropped. The median
    # window still rejects draws where the BULK of highs is extreme (a real
    # mass regression reads median > 1.8, not diffuse 1.15-1.8).
    elevated = 1.15 <= median <= 1.8 and high_ratios[-2] <= 2.5
    return elevated, median


def contract_line(
    timings: dict[str, float],
    errors: dict[str, str],
    sf_val: float | str,
    draw_elevated: bool,
    ndigits: int = 2,
    err_len: int = 80,
    max_errors: int | None = None,
) -> str:
    """The ONE stdout JSON line the driver parses. The driver records (and
    parses the contract JSON from) only the LAST 2000 characters of stdout:
    BENCH_r12/r13 show `"parsed": null` with a mid-JSON tail because the
    one-line record outgrew that window once the headline set passed ~75
    queries and band_flags joined the line (r10=1622 chars parsed OK,
    r11=1812 parsed OK, r12/r13 over). So this line carries ONLY the
    contract keys (metric/value/unit/queries/sf [+errors]) with compact
    separators and 2-decimal per-query rounding (bench noise is >>10ms),
    and the caller shrinks — 1-decimal timings, then 40-char error
    messages, then at most `max_errors` messages plus an `n_errors` count
    (0 = count only) — until the line fits 1900 chars (fit_contract_line;
    r15, ADVICE: with worst-case timings even ONE 80-char error overflowed
    the window at both rounding levels, i.e. exactly the failure draws
    where the contract matters most). Full-precision detail goes to
    stderr."""
    out: dict = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {q: round(t, ndigits) for q, t in timings.items()},
        "sf": sf_val,
    }
    if draw_elevated:
        out["draw_elevated"] = True
    if errors:
        shown = list(errors) if max_errors is None else list(errors)[:max_errors]
        if shown and err_len > 0:
            out["errors"] = {q: errors[q][:err_len] for q in shown}
        if len(shown) < len(errors) or err_len <= 0:
            # messages were dropped — the count keeps the failure visible
            out["n_errors"] = len(errors)
    return json.dumps(out, separators=(",", ":"))


def fit_contract_line(
    timings: dict[str, float],
    errors: dict[str, str],
    sf_val: float | str,
    draw_elevated: bool,
) -> str:
    """Shrink the contract line until it fits the driver's window: full
    80-char errors at 2 decimals first (the r14 shape, unchanged when it
    fits), then progressively tighter error budgets. The last step (0
    messages, count only) is bounded: 82 queries at 1 decimal + n_errors
    is ~1500 chars worst-case, so the loop always terminates under 1900."""
    attempts = (
        (2, 80, None),
        (2, 40, None),
        (1, 40, None),
        (1, 40, 5),
        (1, 0, 0),
    )
    line = ""
    for ndigits, err_len, max_errors in attempts:
        line = contract_line(
            timings, errors, sf_val, draw_elevated,
            ndigits=ndigits, err_len=err_len, max_errors=max_errors,
        )
        if len(line) <= 1900:
            return line
    return line


def main() -> None:
    repeat = 2
    if "--repeat" in sys.argv:
        repeat = max(1, int(sys.argv[sys.argv.index("--repeat") + 1]))

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs.update(E.bench_only_queries())

    # warmup: spin up executors + codegen on a tiny query, and pay the
    # Python-worker startup (worker fork + numpy/pandas imports on all
    # cores) with a tiny Arrow UDF so the pandas_udf queries aren't the
    # first to hit it (~5 s of non-steady-state otherwise)
    # NOTE: no type hints on the warmup UDF body — under `from __future__
    # import annotations` the stringified "pd.Series" hints make pandas_udf
    # raise UNSUPPORTED_SIGNATURE at decoration time (reproduced), which the
    # try/except silently ate: every bench run skipped the Python-worker
    # warmup and the first pandas_udf query absorbed the ~5 s fork+import
    # cost. The returnType-only form sidesteps hint parsing entirely.
    try:
        # warm the OS page cache for the testdata parquet before timing:
        # a long test/verify run right before the bench evicts it, and
        # cold draws measure the disk, not the plan — scan-bound
        # sub-second queries inflated 2.5-3.7x while compute-bound
        # iterative queries stayed flat (round-11 measurement; a
        # cat-to-devnull warm-up restored the 41-48 s comparable band
        # from 60-62 s cold draws)
        import glob as _glob

        for _f in _glob.glob(os.path.join(SF_DIR, "*.parquet")):
            with open(_f, "rb") as _fh:
                while _fh.read(1 << 24):
                    pass
        qs["last_block"](spark, SF_DIR).collect()
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        def _warm_fn(v):
            import numpy as np

            return v + np.float64(0)

        _warm = pandas_udf(_warm_fn, "double")
        spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
            spark.sparkContext.defaultParallelism
        ).select(_warm(F.col("id").cast("double"))).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:  # noqa: BLE001 — warmup failure shouldn't kill the run
        print(f"warmup failed: {e}", file=sys.stderr)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        best: float | None = None
        for _ in range(repeat):
            t0 = time.time()
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001 — isolate: one bad query, not zero numbers
                errors[name] = str(e)[:500]
                break
            elapsed = round(time.time() - t0, 3)
            best = elapsed if best is None else min(best, elapsed)
            # Each headline query is an independent job; drop persisted
            # intermediates so one query's cache doesn't eat the next one's
            # execution memory (measured 2x total slowdown without this).
            # clearCache does NOT free localCheckpoint'ed RDDs (the iterative
            # graph queries pin those) — a Python gc pass releases the last
            # references so Spark's ContextCleaner can unpersist them
            # (measured: byte_kernels 17.3s late in the run vs 3.1s isolated
            # before this, within noise of isolated after).
            spark.catalog.clearCache()
            gc.collect()
        # a query is either timed or errored, never both: counting repeat-1's
        # timing after repeat-2 failed would fold a half-completed query into
        # the headline total while also listing it under errors
        if best is not None and name not in errors:
            timings[name] = best
        spark.catalog.clearCache()
        gc.collect()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # delta-vs-band column (VERDICT r11 item 6): BANDS.json holds each
    # query's [p10, p90] over the last recorded round's isolated warm
    # draws (tools/make_bands.py). Flag only departures — above p90*1.15
    # (the judge's named-cause threshold) or below p10*0.85 (a suspicious
    # speedup is worth a look too: it can be a silently-shrunk plan). The
    # ratio reported is timing/band-edge, so "high: 1.3" reads as "30%
    # over the top of the band".
    flags: dict[str, dict] = {}
    band_err: str | None = None
    bands_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BANDS.json")
    if os.path.exists(bands_path):
        try:
            with open(bands_path) as f:
                flags = band_flags(timings, json.load(f)["queries"])
        except Exception as e:  # noqa: BLE001 — a bad bands file must not kill the numbers
            band_err = str(e)[:200]

    draw_elevated, elev_median = detect_elevated(flags)

    # Full-precision record — 3-decimal timings, comparable_subtotal_sec,
    # band_flags, the elevated-draw diagnosis — goes to stderr as one
    # BENCH_DETAIL line (and is what tools/ archive); stdout gets only the
    # short contract line (see contract_line).
    detail: dict = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # the round-1-comparable basis, precomputed so cross-round reads
        # need no arithmetic (total_sec grows every round by design as new
        # operators join the headline set)
        "comparable_subtotal_sec": round(
            sum(t for q, t in timings.items() if q in COMPARABLE_29), 3
        ),
    }
    if errors:
        detail["errors"] = errors
    if flags:
        detail["band_flags"] = flags
    if band_err:
        detail["band_flags_error"] = band_err
    if elev_median is not None:
        detail["draw_elevated"] = draw_elevated
        detail["elevated_median_ratio"] = elev_median
    print("BENCH_DETAIL " + json.dumps(detail), file=sys.stderr)

    print(fit_contract_line(timings, errors, sf_val, draw_elevated))


if __name__ == "__main__":
    main()
