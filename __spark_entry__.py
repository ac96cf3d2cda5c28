"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises a named operator from SURVEY.md §2 (or a
training-data-pipeline operator) through the eth2dgraph_spark package; the
matching ``oracle_sql()`` entry is the DuckDB-equivalent ANSI SQL. The
driver's synthetic tables stand in for the chain tables (the eth-domain
byte-level kernels are golden-tested in tests/ against the reference's own
test vectors, since /root/testdata has no chain-shaped tables):
  events(user_id, event_id, ts, event_type, value)  ~ transactions-in-blocks
  documents/embeddings                               ~ pipeline tables
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eth2dgraph_spark.operators import blocks, lifetimes
from eth2dgraph_spark.pipeline import (
    dedup,
    importance,
    similarity_search,
    substring,
    text,
)
from eth2dgraph_spark.sources.testdata import read_table

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------- adapters
# events -> transactions-shaped frame (user_id ~ block, value ~ gas price).
def _as_txs(ev: DataFrame) -> DataFrame:
    return ev.select(
        F.col("user_id").alias("block_number"),
        (F.col("value") * F.lit(1e9)).alias("gas_price"),  # "wei"; operator /1e9
    )


def _deps_fine(ev: DataFrame) -> DataFrame:  # signup ~ deployment
    return ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("contract"),
        F.col("event_id").alias("block_number"),
        F.col("event_id").cast("string").alias("tx_hash"),
    )


def _dess_fine(ev: DataFrame) -> DataFrame:  # error ~ destruction
    return ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("contract"),
        F.col("event_id").alias("block_number"),
        F.col("event_id").cast("string").alias("tx_hash"),
    )


def _deps_coarse(ev: DataFrame) -> DataFrame:  # day ~ block, day+hour ~ tx
    return ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("contract"),
        F.date_format("ts", "yyyyMMdd").cast("long").alias("block_number"),
        F.date_format("ts", "yyyyMMddHH").alias("tx_hash"),
    )


def _dess_coarse(ev: DataFrame) -> DataFrame:
    return ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("contract"),
        F.date_format("ts", "yyyyMMdd").cast("long").alias("block_number"),
        F.date_format("ts", "yyyyMMddHH").alias("tx_hash"),
    )


def _ws_tokens(text_col: str = "text"):
    """Whitespace tokens of normalized text — THE Spark mirror of the
    oracle's load-bearing `_NORM` + string_split constant. One definition:
    a tokenization tweak applied to a stray copy would silently diverge
    just that gate from its oracle (the round-5 rep_stats lesson)."""
    return F.split(F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " ")


def _overlap_jobs(*thunks):
    """Run independent Spark actions concurrently from driver threads
    (guide §2.6 "overlap independent jobs"): the scheduler back-fills
    executor cores freed by one job's straggler tail with the next job's
    tasks. Used by the stream gates, whose setup runs several small
    latency-bound jobs (landing-file writes, the initial-history
    fingerprint) that are mutually independent — sequentially they each
    pay their own scheduling floor on a mostly-idle 32-core session.
    Returns the thunks' results in order; re-raises the first failure."""
    from eth2dgraph_spark.pipeline._overlap import overlap_jobs

    return overlap_jobs(*thunks)


def _r6e(col):
    """Tie-nudged 6-dp rounding for DOUBLE columns, mirrored verbatim in the
    oracle SQL (`round(x + 1e-9, 6)`): a rational like 41/640 or an avg of
    2-dp values over a power-of-two count lands EXACTLY on the x.xxxxxx5
    rounding boundary, where Spark (HALF_UP on the accumulated double) and
    DuckDB (nearbyint half-even, different accumulation order) can disagree
    by one ulp of the 6th decimal — 5 gates broke this way when the round-5
    testdata introduced fresh tie rows at sf0.1. The +1e-9 nudge moves both
    engines to the same side of the boundary: it is ~100x larger than
    cross-engine double aggregation error (~1e-11 absolute at these
    magnitudes) and 500x smaller than the 5e-7 tie gap, and no
    small-denominator rational can sit within error distance of the shifted
    boundary."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(col + F.lit(1e-9), 6)


def _r6(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, _r6e(F.col(c)))
    return df


# ---------------------------------------------------------------- queries

def q_gas_stats(spark, sf):  # A1+A2 (src/models/block.rs:34-64)
    s = blocks.gas_price_stats(_as_txs(_t(spark, sf, "events")))
    return _r6(s, "gas_price_min", "gas_price_max", "gas_price_avg", "gas_price_std_dev")


def q_last_block(spark, sf):  # W1 (src/extraction/stream.rs:284-300)
    return _t(spark, sf, "events").agg(F.max("event_id").alias("last_block"))


def q_lifetimes_rq1(spark, sf):  # A8
    ev = _t(spark, sf, "events")
    lc = lifetimes.per_contract_lifecycle(_deps_fine(ev), _dess_fine(ev))
    return lifetimes.rq1_destroyed_vs_not(lc)


def q_lifetimes_rq2(spark, sf):  # A9
    ev = _t(spark, sf, "events")
    lc = lifetimes.per_contract_lifecycle(_deps_fine(ev), _dess_fine(ev))
    return lifetimes.rq2_destroyed_once_vs_multiple(lc)


def q_lifetimes_rq3(spark, sf):  # A10/J8
    ev = _t(spark, sf, "events")
    return lifetimes.rq3_same_block_tx(_deps_coarse(ev), _dess_coarse(ev))


def q_lifetimes_rq4(spark, sf):  # A11
    ev = _t(spark, sf, "events")
    lc = lifetimes.per_contract_lifecycle(_deps_fine(ev), _dess_fine(ev))
    return _r6(lifetimes.rq4_lifetime_stats(lc), "avg_lifetime_blocks", "stddev_lifetime_blocks")


def q_pricing_summary(spark, sf):  # TPC-H Q1 shape: groupBy + 6 aggs
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1999-01-01"))
    # decimal accumulation on every rounded money sum (here and in the other
    # TPC-H-shape gates): double-sum is accumulation-order-dependent, so at a
    # cent rounding boundary the same query can hash differently per
    # partitioning/engine; decimal(18,4) makes the sum exact and order-free
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2).cast("double").alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2).cast("double").alias("sum_base_price"),
        F.round(F.sum(disc), 2).cast("double").alias("sum_disc_price"),
        _r6e(F.avg("l_quantity")).alias("avg_qty"),
        _r6e(F.avg("l_extendedprice")).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_shipping_priority(spark, sf):  # TPC-H Q3 shape: 3-way join + top-k
    cu = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    rev = F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
    return (
        cu.join(o, cu["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(F.round(rev, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_region_revenue(spark, sf):  # 5-way join + agg (J1/J4 shape)
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    rev = F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
    return (
        r.join(n, r["r_regionkey"] == n["n_regionkey"])
        .join(c, n["n_nationkey"] == c["c_nationkey"])
        .join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("r_name")
        .agg(F.round(rev, 2).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def q_parts_top_per_brand(spark, sf):  # W3/W4 ranking window
    p = _t(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"), "rn")
    )


def q_segment_stats(spark, sf):  # grouped agg + countDistinct
    return _t(spark, sf, "customer").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _r6e(F.avg("c_acctbal")).alias("avg_acctbal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


def q_semi_join(spark, sf):  # customers with >=1 order (K2/J2 exists-shape)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_anti_join(spark, sf):  # customers with no URGENT orders. The right
    # side is predicate-restricted BEFORE the anti-join (the filter must
    # push below the join) so the gate produces rows on this testdata —
    # the unrestricted no-orders form matched the oracle on 0 rows, a
    # trivially-passing certification.
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_pagination(spark, sf):  # W2 (similarities.rs:151-184)
    return (
        _t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


def q_first_per_key(spark, sf):  # W4 first-writer-wins (extract.rs:170-246)
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_json_extract(spark, sf):  # U2 from_json/get_json_object surface
    ev = _t(spark, sf, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_string_funcs(spark, sf):  # §2.7 scalar surface
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring(F.trim("text"), 1, 10)).alias("prefix10"),
        F.length("text").cast("long").alias("n_chars_calc"),
        F.md5(F.lower(F.trim("text"))).alias("sig"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("long").alias("vowelless_len"),
    )


def q_timestamp_funcs(spark, sf):  # P11 datetime surface
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
    )


def q_rollup(spark, sf):  # grouping-sets extension (not in reference; §2.5 note)
    ev = _t(spark, sf, "events").withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
    return ev.rollup("event_type", "d").agg(F.count(F.lit(1)).alias("cnt"))


def q_event_gaps(spark, sf):  # lag window (engine surface beyond reference)
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros("ts")
    gaps = ev.withColumn("prev", F.lag(us).over(w)).withColumn(
        "gap_s", (us - F.col("prev")) / F.lit(1000000.0)
    )
    return gaps.groupBy("user_id").agg(
        _r6e(F.avg("gap_s")).alias("avg_gap_secs"),
        F.count("prev").alias("n_gaps"),
    )


def q_dedup_exact(spark, sf):  # pipeline: exact dedup groups. The raw
    # testdata has NO exact duplicates, so the original form certified on
    # 0 rows — vacuous (the anti_join lesson). The gate input is the
    # corpus UNIONed with an UPPERCASED shifted copy (doc_id + 100000):
    # both engines build the identical frame, every document gains one
    # duplicate, and the normalization (lower/trim) + grouping + windowed
    # member-list logic all bind.
    base = _t(spark, sf, "documents").select("doc_id", "text")
    shifted = base.select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    d = dedup.exact_duplicates(base.unionByName(shifted))
    return d.select(
        "fingerprint",
        "dup_count",
        F.element_at("doc_ids", 1).alias("min_doc"),
        F.element_at("doc_ids", -1).alias("max_doc"),
    )


def q_ngram_jaccard(spark, sf):  # pipeline: n-gram Jaccard near-dup (A7 kin)
    pairs = dedup.ngram_jaccard_pairs(_t(spark, sf, "documents"), k=3, threshold=0.05)
    return _r6(pairs, "jaccard")


def q_ngram_jaccard_capped(spark, sf):  # the cap branch itself, cross-engine:
    # max_shingle_docs=3 BINDS at sf (hot shingles exist in the synthetic
    # docs), proving the exact-or-underestimated drop rule against an oracle
    # that mirrors it (intersections counted only over postings <= 3 docs;
    # per-doc sizes stay uncapped) — the round-5 review asked for exactly
    # this: the capped path had only single-engine unit coverage.
    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf, "documents"), k=3, threshold=0.05, max_shingle_docs=3
    )
    return _r6(pairs, "jaccard")


def q_minhash_signatures(spark, sf):  # pipeline: MinHash (deterministic)
    sigs = dedup.minhash_signatures(_t(spark, sf, "documents"), k=3, num_hashes=8)
    return sigs.select("id", *[F.col("sig")[i].alias(f"h{i}") for i in range(8)])


def q_simhash(spark, sf):  # pipeline: SimHash 60-bit signatures
    return dedup.simhash_signatures(_t(spark, sf, "documents"))


def q_embedding_cosine(spark, sf):  # pipeline: exact cosine scores (A6 kin)
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    scored = e.crossJoin(F.broadcast(q))
    scored = similarity_search.with_cosine(scored, "embedding", "query_vec")
    return scored.select("query_id", "vec_id", _r6e("cosine").alias("cosine"))


def q_quality_score(spark, sf):  # pipeline: text quality
    d = text.quality_score(_t(spark, sf, "documents"))
    out = d.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "punct_ratio",
        "stopword_ratio",
        "mean_word_len",
        "quality_score",
    )
    return _r6(out, "punct_ratio", "stopword_ratio", "mean_word_len", "quality_score")


def q_lang_id(spark, sf):  # pipeline: language ID heuristic
    d = text.lang_id(_t(spark, sf, "documents"))
    return d.select("doc_id", "lang", "lang_pred", F.col("lang_hits").cast("long").alias("lang_hits"))


def q_token_count(spark, sf):  # pipeline: token counting
    d = text.token_count(_t(spark, sf, "documents"))
    return d.select(
        "doc_id",
        F.col("n_tokens_ws").cast("long").alias("n_tokens_ws"),
        F.col("n_tokens_bpe_est").cast("long").alias("n_tokens_bpe_est"),
    )


def q_fingerprint(spark, sf):  # pipeline: document fingerprinting
    d = text.fingerprint(_t(spark, sf, "documents"))
    return d.select("doc_id", "fingerprint", "fingerprint64")


def q_boilerplate_stats(spark, sf):  # pipeline: cross-doc boilerplate-passage
    # removal audit (CCNet/RefinedWeb paragraph-dedup pass), token-window
    # passages. window=3/max_docs=5 BIND on the synthetic docs (small vocab
    # means 3-token windows genuinely recur across documents), so the drop
    # rule itself is exercised cross-engine, not just the n_dropped=0 path.
    return text.passage_drop_stats(
        _t(spark, sf, "documents"), window=3, max_docs=5
    )


def q_boilerplate_clean(spark, sf):  # the REBUILD path of the same operator:
    # md5 of the cleaned text proves the slice-and-rejoin reconstruction is
    # byte-identical to the oracle's string_agg-over-kept-passages rebuild
    # (all-boilerplate docs compare as md5('') on both engines).
    out = text.drop_boilerplate_passages(
        _t(spark, sf, "documents"), window=3, max_docs=5
    )
    return out.select(
        "doc_id", F.md5("text_clean").alias("clean_md5"), "n_passages_dropped"
    )


def q_substring_stats(spark, sf):  # pipeline: substring-level exact dedup
    # audit (Lee et al. ACL'22 ExactSubstr — sliding-window equivalence of
    # the paper's suffix array). window=25 BINDS on the synthetic docs
    # (~1,300 duplicated window occurrences at sf0.01), so span merging and
    # the occurrence-count rule are exercised cross-engine, not the
    # zero-dup path.
    return substring.substring_drop_stats(_t(spark, sf, "documents"), window=25)


def q_substring_keep_first(spark, sf):  # the keep-one-copy variant: the
    # globally first (id, off) occurrence of each duplicated window is
    # exempt — drops strictly fewer tokens than drop-all; the row_number
    # branch gets its own cross-engine row.
    return substring.substring_drop_stats(
        _t(spark, sf, "documents"), window=25, keep_first=True
    )


def q_substring_clean(spark, sf):  # the REBUILD path: md5 of the text with
    # duplicated >=25-token spans removed proves the in-row merged-span
    # slice-and-rejoin equals the oracle's NOT-EXISTS token filter +
    # string_agg rebuild byte-for-byte.
    out = substring.drop_duplicate_substrings(_t(spark, sf, "documents"), window=25)
    return out.select(
        "doc_id", F.md5("text_clean").alias("clean_md5"), "n_tokens_dropped"
    )


def q_winnow_fp(spark, sf):  # pipeline: winnowing fingerprints (Schleimer
    # et al. SIGMOD'03, the MOSS scheme) — rightmost-min-per-window k-gram
    # sampling, all in-row chained zip_withs (zero shuffles before the
    # explode). k=4/w=5 BIND on the synthetic docs (~66 grams/doc).
    return text.winnow_fingerprints(_t(spark, sf, "documents"), k=4, w=5)


def q_lpa_communities(spark, sf):  # graph: synchronous label propagation
    # (Raghavan PRE'07), 2 rounds on the customer-supplier bipartite
    # graph — deterministic argmax (count desc, label asc), oracled by
    # unrolling both rounds (the pagerank_ranks pattern).
    from eth2dgraph_spark.graph import label_propagation

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return label_propagation(edges, num_iter=2)


def q_pmi_phrases(spark, sf):  # pipeline: PMI + word2vec phrase-score
    # collocation mining (Church&Hanks CL'90; Mikolov NeurIPS'13) — the
    # promote-collocations-to-phrases pass before tokenizer training.
    out = text.pmi_collocations(_t(spark, sf, "documents"), min_count=5)
    return out.select(
        "w1", "w2", "n_pair",
        _r6e("pmi").alias("pmi"),
        _r6e("phrase_score").alias("phrase_score"),
    )


def q_rrf_hybrid(spark, sf):  # pipeline: reciprocal-rank fusion (Cormack
    # SIGIR'09) of two BM25 configurations over the same query workload —
    # the hybrid-retrieval combiner, rank-based so no score calibration.
    # Exactly deterministic: each fused score is a sum of <= 2 doubles.
    from eth2dgraph_spark.pipeline import retrieval

    d = _t(spark, sf, "documents")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id long, query_text string")
    a = retrieval.bm25_topk(d, qdf, k=20, score_dp=6)
    b = retrieval.bm25_topk(d, qdf, k=20, k1=0.4, b=0.2, score_dp=6)
    return retrieval.rrf_fuse(a, b, k=60.0, topk=10)


def q_winnow_overlap(spark, sf):  # pipeline: MOSS partial-overlap pairs —
    # docs sharing >= 2 winnowing fingerprints. k=3/w=4 on this corpus
    # surfaces a real pair set (the 31-word vocab repeats trigrams across
    # docs); cap far above any posting size here so it can't bind away
    # rows (its own unit test covers the capped branch).
    return text.winnow_overlap_pairs(
        _t(spark, sf, "documents"), k=3, w=4, min_shared=2
    )


def q_tfidf_terms(spark, sf):  # pipeline: tf-idf top-k keyword extraction
    # (smoothed idf, rank ties by term) — the per-doc dual of bm25_topk.
    # score_dp=6: libm ln() may differ in the last ulp across engines.
    from eth2dgraph_spark.pipeline import retrieval

    return retrieval.tfidf_topk_terms(
        _t(spark, sf, "documents"), k=5, score_dp=6
    )


def q_kmeans_centroids(spark, sf):  # pipeline: the IVF k-means TRAINER
    # itself, cross-engine (previously certified only indirectly — the
    # ivf_topk/semantic_dedup gates are deliberately centroid-independent).
    # iters=2 so the oracle can unroll both Lloyd rounds; nlist=4 keeps
    # the unrolled SQL bounded. Output long-form (list_id, pos, x) so each
    # centroid component is value-compared, tie-nudged 6dp.
    from eth2dgraph_spark.pipeline import similarity_search

    cents = similarity_search.ivf_index(
        _t(spark, sf, "embeddings"), nlist=4, iters=2
    )
    return cents.select(
        "list_id", F.posexplode("c").alias("pos", "x")
    ).select("list_id", "pos", _r6e("x").alias("x"))


# Pinned unigram-LM piece table for the unigram_encode gate: vocab_size=48
# pieces unigram_train() fits on sf0.01 documents (deterministic hard-EM —
# re-derivable with the training snippet in BASELINE.md round-8). Pinning
# lets the ORACLE replay the identical Viterbi DP as a recursive CTE, the
# _BPE_MERGES_PIN discipline; training itself is reference-pinned in
# tests/test_unigram.py (local == distributed, exact).
_UNIGRAM_PIECES_PIN = [
    ("a", -2.681223), ("b", -4.299752), ("batc", -4.232435), ("c", -11.768265),
    ("co", -4.235641), ("cust", -4.235641), ("d", -4.259478), ("data", -4.263874),
    ("e", -2.674459), ("er", -4.236713), ("f", -4.325187), ("filt", -4.236713),
    ("g", -2.898726), ("h", -3.592436), ("hash", -4.221819), ("i", -3.600913),
    ("j", -11.768265), ("join", -4.204027), ("k", -3.592999), ("l", -4.276062),
    ("line", -4.261673), ("lumn", -4.235641), ("m", -4.286146), ("mall", -4.242086),
    ("merg", -4.252921), ("n", -4.288401), ("o", -3.599779), ("omer", -4.235641),
    ("or", -3.588505), ("orde", -4.259478), ("p", -11.768265), ("par", -3.603186),
    ("q", -4.305476), ("r", -2.900697), ("row", -4.226052), ("s", -3.181546),
    ("scan", -4.233502), ("slow", -4.252921), ("st", -3.612329), ("t", -3.215705),
    ("tabl", -4.263874), ("u", -11.768265), ("ue", -3.597514), ("up", -4.268289),
    ("v", -4.276062), ("vect", -4.259478), ("w", -3.595254), ("y", -3.598079),
]


def q_unigram_encode(spark, sf):  # unigram-LM (SentencePiece-family) Viterbi
    # encoding under the pinned piece table: per-doc word/piece counts +
    # the summed best-segmentation log-prob. The (score, n_pieces) pair
    # per word is engine-portable (deterministic DP tie-break: score
    # desc, n asc); logp_sum is a per-doc float sum -> _r6e rounding.
    from eth2dgraph_spark.pipeline import unigram

    d = _t(spark, sf, "documents")
    pieces = spark.createDataFrame(_UNIGRAM_PIECES_PIN, "piece string, logp double")
    out = unigram.unigram_token_counts(d, pieces)
    return out.select(
        F.col("id").alias("doc_id"), "n_words", "n_pieces",
        _r6e("logp_sum").alias("logp_sum"),
    )


def q_phash_bits(spark, sf):  # DCT perceptual hash (pHash) cross-engine:
    # the embeddings table reinterpreted as 8x8 grayscale images (a
    # deterministic pixel-array table both engines share), hash_size=4 /
    # dct_size=8 so the oracle can replay the full pipeline — orthonormal
    # DCT-II as literal basis constants, 6dp tie-nudged coefficient
    # rounding BEFORE the median/compare (accumulation order differs:
    # numpy matmul vs nested list_sum), 16-bit hash. The production
    # 64-bit/32x32 path is covered by tests/test_phash.py invariance
    # properties (shift/upscale collide, distinct don't).
    from eth2dgraph_spark.pipeline import multimodal

    e = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("px")
    )
    return multimodal.phash_from_arrays(
        e, id_col="vec_id", vec_col="px",
        height=8, width=8, hash_size=4, dct_size=8, coef_dp=6,
    )


def q_pq_topk(spark, sf):  # product-quantized ANN (Jégou TPAMI'11): ADC
    # top-k under the PINNED iters=0 codebook (first-ksub init — no Lloyd
    # rounds, so the oracle rebuilds the identical codebook and replays
    # encode + ADC; the trainer's Lloyd math is separately certified by
    # kmeans_centroids and the pure-Python pin in tests/test_pq.py).
    # score_dp=6: the ADC sum's accumulation order differs across engines
    # (in-row fold vs GROUP BY), so ranking is on tie-nudged 6dp scores.
    from eth2dgraph_spark.pipeline import pq

    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cb = pq.pq_train(e, dim=64, m=8, ksub=8, iters=0)
    out = pq.pq_topk(e, q, cb, k=10, dim=64, m=8, score_dp=6)
    return out.select(
        "query_id", "vec_id", "adc_d2", F.col("rank").cast("long").alias("rank")
    )


def q_hll_distinct(spark, sf):  # HyperLogLog distinct-count sketch
    # (Flajolet AofA'07) cross-engine: the oracle replays the md5-60bit
    # hash, bin-length rho, register max, the EXACT-integer harmonic sum
    # (HUGEINT in DuckDB vs DECIMAL(38,0) in Spark — no float summation
    # order anywhere), and the one-division estimate. event_id per type
    # (~2k distinct) exercises the raw-harmonic branch; user_id (~150)
    # the linear-counting branch; exact distincts ride along so the gate
    # also pins calibration. Only ln() in the LC branch touches libm —
    # tie-nudged 6dp rounding, the repo's standard defense.
    from eth2dgraph_spark.pipeline import hll

    ev = _t(spark, sf, "events")
    ids = hll.hll_count_distinct(ev, "event_id", p=8, key_cols=["event_type"]).select(
        "event_type",
        _r6e("est_distinct").alias("est_ids"),
        F.col("hit_registers").alias("hit_ids"),
    )
    usr = hll.hll_count_distinct(ev, "user_id", p=8, key_cols=["event_type"]).select(
        "event_type",
        _r6e("est_distinct").alias("est_users"),
        F.col("zero_registers").alias("zero_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("exact_ids"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return ids.join(usr, "event_type").join(exact, "event_type")


def q_domain_cap(spark, sf):  # deterministic per-key cap (bottom-k by
    # hash): the web-curation "at most k docs per domain" sampler as a
    # pure function of row ids — reservoir-equivalent uniformity, stable
    # under reruns/appends/partitioning. Oracle replays the identical
    # md5-ranked window; hex-string ordering is byte-identical across
    # engines, so no rounding hooks are needed.
    from eth2dgraph_spark.pipeline.split import cap_per_key

    d = _t(spark, sf, "documents")
    return cap_per_key(d, ["lang"], k=30, id_col="doc_id").select(
        "lang", "doc_id", "source"
    )


# WordPiece piece table pinned for the wordpiece_encode gate: what
# wordpiece_train learns on the sf0.01 documents at num_merges=24,
# min_pair_freq=2 (rank -1 = seed alphabet, 0..23 = merges). Pinning
# makes greedy longest-match encoding a pure function both engines
# replay exactly; the trainer itself is covered by the hand-computed and
# local==distributed tests in tests/test_wordpiece.py.
_WORDPIECE_PIECES_PIN = [
    ("##a", -1), ("##b", -1), ("##bl", 15), ("##c", -1), ("##ch", 14),
    ("##d", -1), ("##e", -1), ("##g", -1), ("##h", -1), ("##i", -1),
    ("##in", 8), ("##k", -1), ("##l", -1), ("##lu", 20), ("##lum", 22),
    ("##lumn", 23), ("##m", -1), ("##n", -1), ("##o", -1), ("##p", -1),
    ("##r", -1), ("##s", -1), ("##sh", 13), ("##t", -1), ("##u", -1),
    ("##up", 19), ("##us", 17), ("##w", -1), ("##y", -1), ("a", -1),
    ("ag", 10), ("agg", 11), ("b", -1), ("bi", 7), ("big", 9), ("c", -1),
    ("cus", 18), ("d", -1), ("f", -1), ("fi", 6), ("fil", 16), ("g", -1),
    ("h", -1), ("j", -1), ("k", -1), ("l", -1), ("li", 1), ("lin", 3),
    ("m", -1), ("o", -1), ("p", -1), ("q", -1), ("qu", 0), ("r", -1),
    ("s", -1), ("sp", 21), ("t", -1), ("th", 12), ("v", -1), ("w", -1),
    ("wi", 2), ("win", 4), ("wind", 5),
]


def q_wordpiece_encode(spark, sf):  # WordPiece greedy longest-match-first
    # encoding (Schuster & Nakajima ICASSP'12 / the BERT tokenizer) under
    # the pinned piece table — completes the subword-family triad's
    # cross-engine rows (bpe_encode: rank-sequential merges;
    # unigram_encode: Viterbi DP; here: longest-match recursion). The
    # oracle replays the greedy scan as a recursive CTE over the inline
    # piece list (argmax by raw length via list ops — ties impossible:
    # one piece per (position-kind, length)). pieces_md5 pins each
    # document's FULL piece sequence in token order.
    from eth2dgraph_spark.pipeline import wordpiece as wp

    pieces = spark.createDataFrame(_WORDPIECE_PIECES_PIN, "piece string, rank long")
    out = wp.wordpiece_token_counts(_t(spark, sf, "documents"), pieces)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_words",
        "n_pieces",
        "n_unk_words",
        F.md5("pieces_text").alias("pieces_md5"),
    )


def q_int8_quant(spark, sf):  # int8 affine embedding quantization (the
    # 4x storage pass before ANN): codes via floor(x+0.5) — NOT round(),
    # whose half-up (Spark) vs half-even (DuckDB) semantics would break
    # integer equality — plus the scale and the in-row max reconstruction
    # error (order-independent fold). Codes md5-compared as a sequence.
    from eth2dgraph_spark.pipeline import quantize as qz

    e = _t(spark, sf, "embeddings")
    # single quantize pass: join the original vectors onto the codes and
    # compute the error in-row (int8_reconstruction_error re-quantizes
    # internally — measured 2.9 -> 1.6 s at sf0.1 by reusing q here)
    q = qz.int8_quantize(e)
    orig = e.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("_v"),
    )
    j = qz.int8_dequantize(q.join(orig, "id"))
    err = F.array_max(
        F.zip_with(F.col("_v"), F.col("vec_approx"), lambda a, b: F.abs(a - b))
    )
    return j.select(
        F.col("id").alias("vec_id"),
        _r6e("scale").alias("scale"),
        _r6e("zero").alias("zero"),
        F.md5(F.array_join("codes", ",")).alias("codes_md5"),
        _r6e(err).alias("max_abs_err"),
    )


def q_gopher_rep(spark, sf):  # Gopher/RedPajama word-n-gram repetition
    # filters: top-{2,3,4}-gram character fraction (deterministic
    # lexicographic tie-break on the argmax — load-bearing) and
    # duplicated-{5,6}-gram character fraction (per-occurrence, the
    # RedPajama convention). Set-based explode + (id, gram) hash agg —
    # the shingle-pipeline shuffle discipline, not O(m^2) in-row scans.
    from eth2dgraph_spark.pipeline.text import ngram_repetition_fractions

    out = ngram_repetition_fractions(_t(spark, sf, "documents"))
    return out.select(
        F.col("id").alias("doc_id"),
        "n_chars",
        _r6e("top2_frac").alias("top2_frac"),
        _r6e("top3_frac").alias("top3_frac"),
        _r6e("top4_frac").alias("top4_frac"),
        _r6e("dup5_frac").alias("dup5_frac"),
        _r6e("dup6_frac").alias("dup6_frac"),
    )


def q_ppl_buckets(spark, sf):  # CCNet head/middle/tail perplexity
    # partitioning (Wenzek LREC'20): discrete-percentile cuts over the
    # 6dp-rounded self-scored bigram perplexity (one bounded aggregate
    # broadcast back — NOT a global ntile sort), bucket by comparison.
    # Oracle composes over the lm_perplexity oracle verbatim (its ppl is
    # already the rounded value) + quantile_disc, whose equivalence to
    # Spark's percentile_disc the percentile_disc gate already certifies.
    from eth2dgraph_spark.pipeline.importance import ppl_buckets

    out = ppl_buckets(_t(spark, sf, "documents"))
    return out.select("id", "n_grams", "ppl", "bucket")


def q_shard_assign(spark, sf):  # deterministic training-shard layout
    # (WebDataset/MDS): shard = md5-hash mod n, in-shard order by a second
    # independent hash — 'shuffle once at materialization', rerun-stable.
    # Hex-string ordering is byte-identical cross-engine; no rounding.
    from eth2dgraph_spark.pipeline.split import shard_assign

    d = _t(spark, sf, "documents")
    return shard_assign(d, n_shards=8).select(
        "doc_id", "shard", "pos_in_shard"
    )


def q_kcore_2rounds(spark, sf):  # k-core decomposition (Seidman'83
    # iterative peeling), 2 fixed rounds on the customer-supplier
    # bipartite graph at k=12 (which genuinely peels ~20 vertices at
    # sf0.01) — oracled by unrolling both peels, the lpa_communities
    # pattern. An extra round after convergence is the identity, so the
    # fixed-round gate equals the fixpoint whenever the graph settles
    # early.
    from eth2dgraph_spark.graph import k_core

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return k_core(edges, k=12, max_iters=2)


def q_coreness_capped(spark, sf):  # per-node coreness (core number),
    # capped fixed-shape mode: layers k=2..4 with exactly 2 peel rounds
    # each on the customer-supplier bipartite graph — no data-dependent
    # driver decisions (no fixpoint counts; per-round lineage cuts keep
    # the plan linear in rounds). Measured at sf0.01 the three layers
    # settle in 0/0/1 peel rounds, so 2 rounds/layer equals the exact
    # fixpoint truncated at k=4 with a whole spare round of margin; the
    # oracle unrolls all 3x2 peel blocks (the kcore_2rounds pattern) and
    # labels each layer's dropped set k-1, survivors 4. Full uncapped
    # coreness (data-dependent layers to kmax=47 here) is pinned against
    # a pure-Python layered peeler in tests/test_graph.py.
    from eth2dgraph_spark.graph import coreness

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return coreness(edges, max_k=4, rounds_per_layer=2)


def q_modularity(spark, sf):  # Newman modularity of the LPA partition
    # (Newman & Girvan PRE'04): per-community q_contrib = e_c/m -
    # (deg_c/2m)^2, every term pinned per community, not just the sum.
    # Oracle composes the lpa_communities oracle verbatim as the label
    # CTE + the same edge/degree math; only the final double arithmetic
    # needs the 6dp tie-nudge.
    from pyspark.storagelevel import StorageLevel

    from eth2dgraph_spark.graph import label_propagation, modularity

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    # the edge derivation is a real join consumed by BOTH the detector
    # and the evaluator — persist once at the composition level
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = label_propagation(edges, num_iter=2)
    out = modularity(edges, labels)
    edges.unpersist()  # both consumers have materialized (LPA rounds +
    # modularity's eager checkpoint), safe to release
    # + 0.0 normalizes IEEE negative zero (a tiny negative q_contrib
    # rounds to -0.0 in DuckDB but 0.0 in Spark; -0.0 + 0.0 = +0.0 in
    # both) — mirrored in the oracle
    return out.select(
        "label", "n_nodes", "intra_edges", "deg_sum",
        (_r6e("q_contrib") + F.lit(0.0)).alias("q_contrib"),
    )


def q_format_roundtrips(spark, sf):  # batch-format coverage: documents
    # written-and-re-read as ORC, CSV (quoted/escaped, schema enforced),
    # and line-JSON, each arm aggregated per lang -- a format that mangles
    # types, quoting, nulls, or row/field pairing diverges from the
    # parquet-derived oracle. Writes stay inside the repo's gitignored
    # spark-warehouse/. The content fingerprint is an ORDER-INDEPENDENT
    # bit_xor of per-row md5-60bit(doc_id || ':' || text): a first cut
    # used md5-over-array_sort(collect_list(...)) and in THIS triple-join
    # plan Spark evaluated the hash over the UNSORTED collect buffer
    # (reproduced: correct standalone, wrong -- a partition-merge-order
    # concat -- only inside the 3-way join; adding any sibling projection
    # of the same array flipped it back). XOR needs no order at all, and
    # doesn't materialize a corpus-sized concat string either.
    import os

    from eth2dgraph_spark.sources.formats import write_read

    d = _t(spark, sf, "documents").select("doc_id", "lang", "text", "n_chars")
    tag = os.path.basename(sf.rstrip("/"))
    arms = {}
    for fmt in ("orc", "csv", "json"):
        path = os.path.join("spark-warehouse", f"_fmt_rt_{tag}_{fmt}")
        r = write_read(d, path, fmt)
        arms[fmt] = r.groupBy("lang").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{fmt}"),
            F.sum("n_chars").cast("long").alias(f"chars_{fmt}"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(concat(cast(doc_id as string), "
                "':', text)), 1, 15), 16, 10) as bigint))"
            ).alias(f"texts_fp_{fmt}"),
        )
    out = arms["orc"].join(arms["csv"], "lang").join(arms["json"], "lang")
    return out


def q_dedup_stream(spark, sf):  # exact dedup PHYSICALLY EXECUTED as a
    # Structured Streaming query: the (fingerprint -> min id, count)
    # dedup state is a declarative stream-safe aggregation, so the final
    # complete-mode table equals the batch group-by — the stream==batch
    # property the ohlc_stream gate certifies, applied to the curation
    # op a 100 TB incremental ingest actually runs. Same injected-dup
    # union as dedup_exact (the raw corpus has no exact dups — the
    # vacuous-gate lesson); both engines build the identical frame.
    # Production note: this is the complete-mode state table; an
    # append-mode emit-once variant is dropDuplicatesWithinWatermark,
    # whose kept representative is arrival-order-dependent and therefore
    # not gateable cross-engine.
    from eth2dgraph_spark.pipeline.text import norm_ws
    from eth2dgraph_spark.sources.testdata import read_table_stream
    from eth2dgraph_spark.streaming.windows import execute_stream_to_batch

    d = read_table_stream(spark, sf, "documents").select("doc_id", "text")
    shifted = d.select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    out = (
        d.unionByName(shifted)
        .select(F.md5(norm_ws("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
    return execute_stream_to_batch(out)


def q_source_kl(spark, sf):  # data-mixing diagnostic: per-source unigram
    # KL divergence + cross-entropy vs the whole corpus, add-alpha
    # smoothed over the full vocabulary WITHOUT a (source x vocab) grid
    # (absent words fold into closed-form scalars — see
    # importance.source_divergence). Oracle mirrors the identical
    # decomposition; final sums are tie-nudged 6dp (summation order is
    # the only cross-engine difference, ~1e-14 relative).
    from eth2dgraph_spark.pipeline.importance import source_divergence

    d = _t(spark, sf, "documents")
    out = source_divergence(d, group_col="source", alpha=0.5)
    return out.select(
        "source",
        "n_tokens",
        "n_types",
        _r6e("kl_from_corpus").alias("kl_from_corpus"),
        _r6e("cross_entropy").alias("cross_entropy"),
    )


# Fixed query workload for the BM25 gate: literal strings over the
# corpus vocabulary ('dup' is the one rare term — high idf; the rest are
# near-uniform, so tf and length normalization do the ranking work).
_BM25_QUERIES = [
    (1, "dup hash join"),
    (2, "window stream batch sort"),
    (3, "slow vector merge"),
    (4, "customer order query"),
]


def q_bm25_topk(spark, sf):  # pipeline: lexical BM25 top-k retrieval
    # (Robertson FnTIR'09, Lucene idf form) — the lexical counterpart of
    # ann_topk. score_dp=6 ranks on tie-nudged rounded scores so
    # mathematically-tied docs order by id identically on both engines.
    from eth2dgraph_spark.pipeline import retrieval

    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id long, query_text string")
    return retrieval.bm25_topk(
        _t(spark, sf, "documents"), qdf, k=10, score_dp=6
    )


# Pinned BPE merge table for the bpe_encode gate: the first 24 merges
# bpe_train() learns on sf0.01 documents (deterministic — re-derivable
# with tools/measure_r7.py's training snippet). Pinning lets the ORACLE
# apply the identical table, turning encoding into deterministic column
# work while training itself stays bench-only (iterative, no SQL oracle).
# Applying merges in RANK ORDER (one left-to-right non-overlap pass each)
# equals the kernel's priority-greedy loop on any table whose operands
# are single chars or earlier merges' products — the validity invariant
# training guarantees; tests/test_bpe.py pins the equivalence on
# randomized trained tables.
_BPE_MERGES_PIN = [
    (0, "e", "r"), (1, "e", "</w>"), (2, "n", "</w>"), (3, "er", "</w>"),
    (4, "o", "w"), (5, "ow", "</w>"), (6, "o", "r"), (7, "s", "t"),
    (8, "h", "</w>"), (9, "a", "t"), (10, "l", "u"), (11, "i", "n"),
    (12, "a", "</w>"), (13, "g", "</w>"), (14, "y", "</w>"), (15, "a", "r"),
    (16, "p", "ar"), (17, "t", "</w>"), (18, "i", "n</w>"), (19, "j", "o"),
    (20, "jo", "in</w>"), (21, "a", "s"), (22, "as", "h</w>"),
    (23, "h", "ash</w>"),
]


def q_bpe_encode(spark, sf):  # pipeline: BPE ENCODING under the pinned
    # merge table — the real mapInPandas kernel (encode each distinct
    # word once, hash-join back, per-doc sum), cross-checked against the
    # oracle's rank-sequential guarded-delimiter string-replace encoding.
    from eth2dgraph_spark.pipeline import bpe

    merges = spark.createDataFrame(
        _BPE_MERGES_PIN, "rank long, left string, right string"
    )
    return bpe.bpe_token_counts(_t(spark, sf, "documents"), merges)


def q_bpe_merges(spark, sf):  # pipeline: the BPE TRAINER itself,
    # cross-engine (previously certified only by the pure-Python pin in
    # tests/test_bpe.py — this closes the last certification asymmetry
    # alongside byte_kernel_fixture). num_merges=2 so the oracle can
    # unroll both argmax+fold rounds (the kmeans_centroids fixed-rounds
    # pattern): per round, adjacent-pair frequencies weighted by word
    # count, argmax with (freq DESC, left, right) tie order, then the
    # guarded-delimiter string replace that IS the greedy left-to-right
    # non-overlap merge (the bpe_encode oracle's trick, run in reverse:
    # training derives the table the encoder replays).
    from eth2dgraph_spark.pipeline import bpe

    return bpe.bpe_train(_t(spark, sf, "documents"), num_merges=2)


def q_quality_clf(spark, sf):  # pipeline: trained quality classifier
    # (GPT-3 Appendix A / CCNet fastText analogue, pipeline/classifier.py)
    # — hashed-feature logistic regression, full-batch GD. 2 epochs so the
    # oracle can UNROLL the identical math in SQL (zero init makes epoch 1
    # closed-form); positives = src0/src1 docs, the dsir_weights target
    # convention. Scores rounded 6dp on both engines: cross-partition
    # double-sum order is the only nondeterminism and it sits at ~1e-15.
    from pyspark.storagelevel import StorageLevel

    from eth2dgraph_spark.pipeline import classifier

    d = _t(spark, sf, "documents")
    labeled = d.withColumn(
        "label", F.col("source").isin("src0", "src1").cast("double")
    )
    # ONE shared feature frame for train + score: the label column plays
    # no part in l1_hashed_features, so training on `labeled` and scoring
    # on `d` hash the identical corpus — without this the whole-corpus
    # tokenize+hash+normalize ran twice (r14 plan audit: two duplicate
    # feature subtrees). Persist is inside the timed query path; the
    # feature rows are (id, bucket, x) scalars, not documents. Pinned on
    # id (classifier.pin_features) so every epoch's id-keyed join/groupBy
    # reuses the cached layout instead of re-exchanging the corpus frame.
    feats = classifier.pin_features(
        classifier.l1_hashed_features(d, num_buckets=512)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    w = classifier.train_quality_classifier(
        labeled, num_buckets=512, epochs=2, feats=feats
    )
    s = classifier.quality_classifier_scores(d, w, num_buckets=512, feats=feats)
    return s.select("id", _r6e("clf_score").alias("clf_score"))


def q_dsir_weights(spark, sf):  # pipeline: DSIR hashed-ngram importance
    # weights (Xie et al. NeurIPS'23). Target = src0/src1 docs; raw = all.
    # num_buckets=512 keeps both model tables broadcast-sized while still
    # spreading the synthetic vocab across many buckets.
    d = _t(spark, sf, "documents")
    target = d.filter(F.col("source").isin("src0", "src1"))
    w = importance.dsir_logweights(d, target, num_buckets=512)
    return w.select("id", "n_features", _r6e("log_weight").alias("log_weight"))


def q_dsir_select(spark, sf):  # pipeline: the DSIR resample itself —
    # deterministic Gumbel-top-50 by log_weight, cross-engine. Rank-50
    # boundary gap measured 1.7e-3..8.5e-2 across sfs, so double noise
    # cannot flip the selected set.
    d = _t(spark, sf, "documents")
    target = d.filter(F.col("source").isin("src0", "src1"))
    w = importance.dsir_logweights(d, target, num_buckets=512)
    sel = importance.dsir_select(w, 50)
    return sel.select("id", "n_features", _r6e("log_weight").alias("log_weight"))


def q_lm_perplexity(spark, sf):  # pipeline: bigram-LM perplexity scoring
    # (CCNet-style quality filter, self-scored corpus LM).
    s = importance.bigram_lm_scores(_t(spark, sf, "documents"))
    return s.select(
        "id",
        "n_bigrams",
        _r6e("avg_logp").alias("avg_logp"),
        _r6e("ppl").alias("ppl"),
    )


def q_lm_perplexity_tri(spark, sf):  # the generalized n-gram LM at n=3
    # (CCNet proper is a 5-gram; 3 is what the synthetic corpus supports
    # without the smoothed-zero term dominating every score).
    s = importance.ngram_lm_scores(_t(spark, sf, "documents"), n=3)
    return s.select(
        "id",
        F.col("n_bigrams").alias("n_trigrams"),
        _r6e("avg_logp").alias("avg_logp"),
        _r6e("ppl").alias("ppl"),
    )


def q_semantic_dedup(spark, sf):  # pipeline: SemDeDup prune decisions.
    # nlist=1 makes the gate centroid-independent (the ivf_topk trick:
    # every vector lands in the one cluster, so the result must equal the
    # global brute-force rule the oracle computes); multi-cluster
    # separation is unit-tested. threshold=0.4 BINDS on the synthetic
    # embeddings (59-66 near-dup pairs per sf; nearest pair sits ~1e-5
    # from the boundary, far outside double-rounding noise).
    e = _t(spark, sf, "embeddings")
    cents = similarity_search.ivf_index(e, nlist=1, iters=1)
    return similarity_search.semantic_dedup(e, cents, threshold=0.4)


def q_embedding_near_dups(spark, sf):  # pipeline: the embedding near-dup
    # pair op itself, through the blocked-GEMM kernel. num_planes=0 puts
    # every vector in ONE bucket (the ivf_topk trick), so the output must
    # equal global brute-force pairs at the threshold; bucketed-recall
    # behavior is unit-tested. threshold=0.4 binds (59-66 pairs per sf,
    # nearest pair ~1e-5 from the boundary).
    e = _t(spark, sf, "embeddings")
    out = similarity_search.embedding_near_dup_pairs(
        e, threshold=0.4, dim=64, num_planes=0, max_bucket_size=None
    )
    return out.select("id_a", "id_b", _r6e("cosine").alias("cosine"))


def q_events_extrema(spark, sf):  # W3 per-key extrema (lifetimes.rs:210-226)
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        _r6e(F.min("value")).alias("min_value"),
        _r6e(F.max("value")).alias("max_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


def q_cosine_ngram_pairs(spark, sf):  # A6/J5 via the real similarity operator
    from eth2dgraph_spark.operators.similarity import cosine_similarity_pairs

    rows = dedup.shingle_counts(_t(spark, sf, "documents"), k=3).withColumnRenamed(
        "shingle", "ngram"
    )
    # max_posting_len=None: the gate certifies the EXACT algorithm against
    # the oracle; the finite default cap is the 100TB hot-posting guard,
    # unit-tested separately (like the pinned num_shards in the pack gates)
    pairs = cosine_similarity_pairs(rows, threshold=0.2, max_posting_len=None)
    return _r6(pairs, "similarity")


def q_running_sum(spark, sf):  # window frame (engine surface; SURVEY §2.6 note)
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", _r6e(F.sum("value").over(w)).alias("running_value")
    )


def q_tumbling_window(spark, sf):  # event-time tumbling agg (streaming shape)
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), _r6e(F.avg("value")).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "avg_value",
        )
    )


def q_windowed_stream(spark, sf):  # the SAME tumbling-window aggregation as
    # tumbling_window, but PHYSICALLY EXECUTED as a Structured Streaming
    # query (file source -> watermarked window agg -> availableNow trigger ->
    # complete-mode memory sink). Checks the stream==batch property the
    # reference's idempotent per-block overwrite story (T3,
    # src/extraction/stream.rs:70-166) needs: same oracle as the batch gate.
    # The helper raises if the stream never made progress, so this gate can
    # only go green with a stream that actually ran.
    from eth2dgraph_spark.sources.testdata import read_table_stream
    from eth2dgraph_spark.streaming.windows import execute_stream_to_batch

    ev = read_table_stream(spark, sf, "events")
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), _r6e(F.avg("value")).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "avg_value",
        )
    )
    return execute_stream_to_batch(agg)


def q_windowed_append(spark, sf):  # APPEND-mode watermark semantics,
    # physically executed and cross-engine gated — the two effects
    # complete mode can't show: (1) LATE DROP: the LAST batch carries
    # injected duplicates of the earliest events (ts < Jan 3); (2)
    # HOLDBACK: windows ending after (global max ts - 2h) are never
    # emitted. THREE ordered batches, not two, because of a measured
    # Spark subtlety: a late row merges into a window whose state is
    # still live — the watermark drop (numRowsDroppedByWatermark) only
    # binds once the target window was evicted in an EARLIER batch. With
    # early/mid/tail+injected batches, the early windows emit at the end
    # of batch 1 and every injected row arriving in batch 2 is dropped
    # (verified: counts double with a 2-batch layout, exactly-once with
    # this one). maxFilesPerTrigger=1 + pinned mtimes make the sequence
    # deterministic; the oracle is the batch aggregation over the
    # ORIGINAL events only, filtered to windows closed by the final
    # watermark.
    import os
    import tempfile

    from eth2dgraph_spark.streaming.windows import execute_stream_append

    ev = _t(spark, sf, "events").select("event_id", "ts", "event_type", "value")
    cut1, cut2, early = (
        "2024-01-10 00:00:00",
        "2024-01-20 00:00:00",
        "2024-01-03 00:00:00",
    )
    tmp = tempfile.mkdtemp(prefix="windowed_append_")
    landing = os.path.join(tmp, "landing")
    b1 = ev.filter(F.col("ts") < cut1)
    b2 = ev.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2))
    b3 = ev.filter(F.col("ts") >= cut2).unionByName(ev.filter(F.col("ts") < early))
    for sub, frame in (("b1", b1), ("b2", b2), ("b3", b3)):
        frame.coalesce(1).write.parquet(os.path.join(landing, sub))
    # the file source orders micro-batches by modification time; pin it
    # explicitly so same-millisecond writes can't flip the arrival order
    now = int(__import__("time").time())
    for i, sub in enumerate(("b1", "b2", "b3")):
        d = os.path.join(landing, sub)
        mt = now - 180 + i * 30
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (mt, mt))
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(landing, "*"))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), _r6e(F.avg("value")).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "avg_value",
        )
    )
    return execute_stream_append(agg, checkpoint_dir=os.path.join(tmp, "ckpt"))


def q_motif_paths(spark, sf):  # general motif finder (J4 / Dgraph traversal
    # parity): typed 2-hop pattern over a heterogeneous edge set, plain-join
    # implementation (GraphFrames delegation when that library is present)
    from eth2dgraph_spark.plans.views import motif

    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    edges = (
        s.select(
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
            F.lit("in_nation").alias("type"),
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("r"), F.col("n_regionkey")).alias("dst"),
                F.lit("in_region").alias("type"),
            )
        )
    )
    return motif(edges, "(a)-[in_nation]->(b); (b)-[in_region]->(c)", use_graphframes=False)


def q_graph_degrees(spark, sf):  # graph layer: degrees over a derived edge set
    from eth2dgraph_spark.graph import degrees

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return degrees(edges)


def q_dedup_clusters(spark, sf):  # CC over near-dup pairs -> duplicate clusters
    from eth2dgraph_spark.graph import duplicate_clusters

    pairs = dedup.ngram_jaccard_pairs(_t(spark, sf, "documents"), k=3, threshold=0.05)
    return duplicate_clusters(pairs.select("id_a", "id_b"))


def q_cosine_one_vs_all(spark, sf):  # J6 one-vs-all broadcast cosine
    from eth2dgraph_spark.operators.similarity import one_vs_all_cosine

    rows = dedup.shingle_counts(_t(spark, sf, "documents"), k=3).withColumnRenamed(
        "shingle", "ngram"
    )
    first = _t(spark, sf, "documents").agg(F.min("doc_id")).first()[0]
    out = one_vs_all_cosine(rows, first, threshold=0.05)
    return _r6(out, "similarity")


def q_khop_reach(spark, sf):  # J4 multi-hop traversal (BFS) with min distance
    from eth2dgraph_spark.graph import k_hop

    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    edges = (
        s.select(
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("src"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
        )
        .unionByName(
            n.select(
                F.concat(F.lit("n"), F.col("n_nationkey")).alias("src"),
                F.concat(F.lit("r"), F.col("n_regionkey")).alias("dst"),
            )
        )
    )
    seeds = s.filter(F.col("s_suppkey") < 3).select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("node")
    )
    return k_hop(edges, seeds, k=2).select("node", F.col("hops").cast("long").alias("hops"))


def q_sssp_dists(spark, sf):  # weighted SSSP traversal (Dgraph `shortest` parity)
    # Graph: supplier keys as vertices, a +1 "local" edge with weight
    # (key % 7) + 1 and a +5 "skip" edge with weight 3 (kept only where the
    # destination key exists). Seeds every 25th key. This gate certifies the
    # k-BOUNDED relaxation invariant with k=8 on BOTH sides: after k rounds
    # Bellman-Ford holds the exact min over paths of <= k edges, and the
    # oracle unrolls the same 8 rounds — 8 REACHES every node (worst in-gap
    # offset 24 = 4 skips + 4 locals), though final convergence takes 9
    # (cross-gap routes — see sssp_paths, which certifies the CONVERGED
    # answer). Integer-valued weights keep every path sum exact in double —
    # no float-noise boundary in the hash.
    from eth2dgraph_spark.graph import shortest_paths

    s = _t(spark, sf, "supplier").select("s_suppkey")
    cand = (
        s.select(
            F.col("s_suppkey").alias("src"),
            (F.col("s_suppkey") + 1).alias("dst"),
            ((F.col("s_suppkey") % 7) + 1).cast("double").alias("w"),
        )
        .unionByName(
            s.select(
                F.col("s_suppkey").alias("src"),
                (F.col("s_suppkey") + 5).alias("dst"),
                F.lit(3.0).alias("w"),
            )
        )
    )
    edges = cand.join(
        s.select(F.col("s_suppkey").alias("dst")), "dst", "left_semi"
    )
    seeds = s.filter(F.col("s_suppkey") % 25 == 0).select(
        F.col("s_suppkey").alias("node")
    )
    out = shortest_paths(edges, seeds, weight="w", max_iter=8)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.round(F.col("dist") + 1e-9, 6).alias("dist"),
    )


def q_sssp_targeted(spark, sf):  # point-to-point shortest path with EARLY
    # STOP (Dgraph's `shortest` is from->to): same weighted graph and seeds
    # as sssp_dists, targets = suppliers with key % 25 == 1 above the first
    # seed (key > 25 — all reachable, so the early-stop precondition "every
    # target settled" can fire; key 1 would never be reached on this
    # upward-edge graph and would pin the loop to the full fixpoint).
    # Target dists settle within a few rounds (direct seed->seed+1 edge,
    # weight (s%7)+1 <= 7) while the fixpoint needs 9; the stop rule
    # (max settled target dist <= min frontier dist, valid for
    # non-negative weights) cuts the tail rounds without changing any
    # reported dist — the oracle replays the CONVERGED walk (12-hop
    # recursive CTE covers the 9-round fixpoint) filtered to the targets,
    # so a premature stop that froze a still-improvable dist would
    # hash-mismatch.
    from eth2dgraph_spark.graph import shortest_paths_targeted

    s = _t(spark, sf, "supplier").select("s_suppkey")
    cand = (
        s.select(
            F.col("s_suppkey").alias("src"),
            (F.col("s_suppkey") + 1).alias("dst"),
            ((F.col("s_suppkey") % 7) + 1).cast("double").alias("w"),
        )
        .unionByName(
            s.select(
                F.col("s_suppkey").alias("src"),
                (F.col("s_suppkey") + 5).alias("dst"),
                F.lit(3.0).alias("w"),
            )
        )
    )
    edges = cand.join(
        s.select(F.col("s_suppkey").alias("dst")), "dst", "left_semi"
    )
    seeds = s.filter(F.col("s_suppkey") % 25 == 0).select(
        F.col("s_suppkey").alias("node")
    )
    targets = s.filter(
        (F.col("s_suppkey") % 25 == 1) & (F.col("s_suppkey") > 25)
    ).select(F.col("s_suppkey").alias("node"))
    out = shortest_paths_targeted(edges, seeds, targets, weight="w", max_iter=12)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.round(F.col("dist") + 1e-9, 6).alias("dist"),
    )


def q_betweenness_landmarks(spark, sf):  # landmark-sampled Brandes
    # betweenness over a 3-level supplier graph whose dependency values
    # have a CLOSED FORM the oracle replays with per-group SQL aggregates:
    # two synthetic roots R and R2 (identical edges — the batching arm:
    # every dependency doubles and n_sources = 2) -> one hub per 25-key
    # group (key 25g — supplier keys are 0-based) -> the group's 24
    # members, where each member of
    # group g >= 1 ALSO has an in-edge from hub g-1 (sigma = 2, exercising
    # fractional sigma ratios), members with key % 10 == 5 carry a leaf
    # (delta = 1, exercising the (1 + delta) chain), and hub g -> hub g+1
    # chain edges are NON-shortest (dist 1 -> 1) so they must drop at the
    # DAG filter. All dependency terms are exact binary halves (1/sigma in
    # {1, 0.5}), so sums match cross-engine with no rounding tolerance.
    # The general algorithm is pinned separately by a randomized textbook-
    # Brandes test (tests/test_graph.py).
    from eth2dgraph_spark.graph import betweenness_landmarks

    s = _t(spark, sf, "supplier").select("s_suppkey")
    k = F.col("s_suppkey")

    def pad(c):
        return F.lpad(c.cast("string"), 7, "0")

    grp = F.floor(k / 25)
    hub_of = lambda gexpr: pad(gexpr * 25)  # noqa: E731
    hubs = s.filter(k % 25 == 0)
    members = s.filter(k % 25 != 0)
    e_roots = hubs.select(F.lit("R").alias("src"), pad(k).alias("dst")).unionByName(
        hubs.select(F.lit("R2").alias("src"), pad(k).alias("dst"))
    )
    e_own = members.select(hub_of(grp).alias("src"), pad(k).alias("dst"))
    e_prev = members.filter(grp >= 1).select(
        hub_of(grp - 1).alias("src"), pad(k).alias("dst")
    )
    e_chain = (
        hubs.select(pad(k).alias("src"), (k + 25).alias("nk"))
        .join(s.select(F.col("s_suppkey").alias("nk")), "nk", "left_semi")
        .select("src", pad(F.col("nk")).alias("dst"))
    )
    e_leaf = members.filter(k % 10 == 5).select(
        pad(k).alias("src"), F.concat(F.lit("x"), pad(k)).alias("dst")
    )
    edges = e_roots.unionByName(e_own).unionByName(e_prev).unionByName(
        e_chain
    ).unionByName(e_leaf)
    lm = spark.createDataFrame([("R",), ("R2",)], "node string")
    return betweenness_landmarks(edges, lm, max_iter=6)


def q_betweenness_weighted(spark, sf):  # WEIGHTED Brandes betweenness
    # (r13 VERDICT item 7 — closes the one centrality-family asymmetry:
    # betweenness_landmarks is hop-count by design) over a 3-level
    # supplier graph whose dependency values have a CLOSED FORM, built so
    # the gate FAILS under hop-count semantics: two roots R/R2 (identical
    # edges — batching arm, everything doubles, n_sources=2) -> hubs
    # (key 25g, w=2) -> the group's 24 members (w=3, so dist 5 via hub),
    # plus per-member DIRECT root edges that pin the weighted DAG rules:
    #   k%5==1: direct w=5  TIES the 2-hop path  -> sigma=2 across
    #           DIFFERENT hop counts (the exact-hop sigma accumulation),
    #           hub contribution 1/2;
    #   k%5==2: direct w=4  WINS (4 < 5)         -> hub edge drops;
    #   k%5==3: direct w=7  LOSES (7 > 5)        -> direct edge drops —
    #           hop-count Brandes would route 1-hop here, so an
    #           unweighted engine hash-mismatches;
    # members with k%10==5 carry a w=1 leaf (delta=1, the (1+delta)
    # chain), and hub_g -> hub_{g+1} w=10 edges are non-shortest (2 < 12,
    # the weighted DAG filter). All terms are exact binary halves. The
    # general algorithm is pinned separately by the randomized
    # Dijkstra-Brandes test (tests/test_graph.py).
    from eth2dgraph_spark.graph import betweenness_weighted

    s = _t(spark, sf, "supplier").select("s_suppkey")
    k = F.col("s_suppkey")

    def pad(c):
        return F.lpad(c.cast("string"), 7, "0")

    grp = F.floor(k / 25)
    hubs = s.filter(k % 25 == 0)
    members = s.filter(k % 25 != 0)
    parts_list = []
    for root in ("R", "R2"):
        parts_list.append(
            hubs.select(F.lit(root).alias("src"), pad(k).alias("dst"), F.lit(2.0).alias("w"))
        )
        for rem, w in ((1, 5.0), (2, 4.0), (3, 7.0)):
            parts_list.append(
                members.filter(k % 5 == rem).select(
                    F.lit(root).alias("src"), pad(k).alias("dst"), F.lit(w).alias("w")
                )
            )
    parts_list.append(
        members.select(pad(grp * 25).alias("src"), pad(k).alias("dst"), F.lit(3.0).alias("w"))
    )
    parts_list.append(
        hubs.select(pad(k).alias("src"), (k + 25).alias("nk"))
        .join(s.select(F.col("s_suppkey").alias("nk")), "nk", "left_semi")
        .select("src", pad(F.col("nk")).alias("dst"), F.lit(10.0).alias("w"))
    )
    parts_list.append(
        members.filter(k % 10 == 5).select(
            pad(k).alias("src"),
            F.concat(F.lit("x"), pad(k)).alias("dst"),
            F.lit(1.0).alias("w"),
        )
    )
    edges = parts_list[0]
    for p in parts_list[1:]:
        edges = edges.unionByName(p)
    lm = spark.createDataFrame([("R",), ("R2",)], "node string")
    return betweenness_weighted(edges, lm, weight="w", max_iter=8)


def q_sssp_paths(spark, sf):  # SSSP with PATH RECONSTRUCTION (Dgraph's
    # `shortest` returns the path, not the length): same graph/seeds as
    # sssp_dists but through graph.shortest_path_tree, which also emits
    # pred = the lexicographically-smallest previous hop on a shortest
    # path (NULL at seeds). Ids are zero-padded to 7 so the engine's
    # string tie-break equals the oracle's numeric min(src). Unlike
    # sssp_dists (deliberately k-BOUNDED relaxation, k=8 both sides),
    # this gate certifies FULL convergence: the graph's weight pattern
    # repeats mod lcm(25,7)=175, and measured Bellman-Ford convergence is
    # 9 rounds at every size (8 at 100 nodes; cross-gap 9-edge routes
    # from the PREVIOUS seed's gap undercut within-gap paths — two gaps
    # back costs >= 30 and never pays). max_iter=12 = 9 dist rounds + 1
    # pred-settle round + margin; the oracle unrolls 12 (any K >= 9
    # yields the converged minimum). The oracle derives pred in closed
    # form from the final dist table: min src over edges with
    # dist(src) + w = dist(dst) — exact equality is safe, every path sum
    # is an integer in double.
    from eth2dgraph_spark.graph import shortest_path_tree

    s = _t(spark, sf, "supplier").select("s_suppkey")

    def pad(c):
        return F.lpad(c.cast("string"), 7, "0")

    cand = (
        s.select(
            pad(F.col("s_suppkey")).alias("src"),
            pad(F.col("s_suppkey") + 1).alias("dst"),
            ((F.col("s_suppkey") % 7) + 1).cast("double").alias("w"),
        )
        .unionByName(
            s.select(
                pad(F.col("s_suppkey")).alias("src"),
                pad(F.col("s_suppkey") + 5).alias("dst"),
                F.lit(3.0).alias("w"),
            )
        )
    )
    edges = cand.join(
        s.select(pad(F.col("s_suppkey")).alias("dst")), "dst", "left_semi"
    )
    seeds = s.filter(F.col("s_suppkey") % 25 == 0).select(
        pad(F.col("s_suppkey")).alias("node")
    )
    out = shortest_path_tree(edges, seeds, weight="w", max_iter=12)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.round(F.col("dist") + 1e-9, 6).alias("dist"),
        F.col("pred").cast("long").alias("pred"),
    )


def q_embedding_topk(spark, sf):  # exact ANN baseline: brute-force cosine top-k
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity_search.brute_force_topk(e, q, k=10)
    return out.select(
        "query_id", "vec_id", _r6e("cosine").alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


# --- non-SQL-expressible (rows-only check): LSH paths are engine-specific ---

def q_session_count(spark, sf):  # session windows == SQL gaps-and-islands
    from eth2dgraph_spark.streaming.windows import session_windows

    ev = _t(spark, sf, "events")
    out = session_windows(ev, "user_id", "ts", gap="30 minutes")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.col("n_events").cast("long").alias("n_events"),
    )


def q_asof_attach(spark, sf):  # as-of join (engine surface; DuckDB ASOF oracle)
    from eth2dgraph_spark.operators.asof import asof_join

    ev = _t(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "event_id", "ts")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("sv"))  # unique (key, ts): deterministic ties
    )
    out = asof_join(views, signups, "user_id", "ts", "ts", ["sv"])
    return out.select(
        "event_id", "user_id", _r6e("sv").alias("last_signup_value")
    )


def q_interval_attach(spark, sf):  # bucketized range join (engine surface)
    from eth2dgraph_spark.operators.asof import interval_join

    o = _t(spark, sf, "orders")
    points = o.select("o_orderkey", F.unix_timestamp("o_orderdate").alias("e"))
    intervals = (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("iid"),
            F.unix_timestamp("o_orderdate").alias("lo"),
            (F.unix_timestamp("o_orderdate") + F.lit(14 * 86400)).alias("hi"),
        )
    )
    out = interval_join(points, intervals, "e", "lo", "hi", bucket=7 * 86400)
    return out.select(F.col("o_orderkey").alias("pid"), "iid")


def q_small_qty_revenue(spark, sf):  # TPC-H Q17 shape: correlated avg per key
    li = _t(spark, sf, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(avg_qty, li["l_partkey"] == avg_qty["pk"])
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_segment_pivot(spark, sf):  # conditional-agg pivot (engine surface)
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    j = c.join(o, c["c_custkey"] == o["o_custkey"])
    seg = F.col("c_mktsegment")
    return j.groupBy("c_nationkey").agg(
        F.round(F.sum(F.when(seg == "BUILDING", F.col("o_totalprice")).otherwise(0.0)), 2).alias("building_rev"),
        F.round(F.sum(F.when(seg == "MACHINERY", F.col("o_totalprice")).otherwise(0.0)), 2).alias("machinery_rev"),
        F.count(F.when(seg == "AUTOMOBILE", F.lit(1))).alias("auto_orders"),
    )


def q_array_funcs(spark, sf):  # higher-order array functions (§2.7 surface)
    e = _t(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        _r6e(F.aggregate(v, F.lit(0.0), lambda a, x: a + x)).alias("vec_sum"),
        _r6e(
            F.aggregate(F.filter(v, lambda x: x > 0), F.lit(0.0), lambda a, x: a + x)).alias("pos_sum"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        _r6e(F.array_max(F.transform(v, lambda x: F.abs(x)))).alias("max_abs"),
    )


def q_ivf_topk(spark, sf):  # IVF ANN, exhaustive probe -> must equal brute force
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = similarity_search.ivf_index(e, nlist=8, iters=2)
    out = similarity_search.ivf_topk(e, q, cents, k=10, nprobe=8)
    return out.select(
        "query_id", "vec_id", _r6e("cosine").alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_interface_jaccard(spark, sf):  # A7 via the real operator: token-SET Jaccard
    from eth2dgraph_spark.operators.similarity import jaccard_similarity_pairs

    d = _t(spark, sf, "documents")
    toks = d.select(
        F.col("doc_id").alias("id"),
        F.explode(_ws_tokens()).alias(
            "token"
        ),
    )
    # None: exact mode for the oracle gate (word postings at sf0.1 exceed
    # the finite default cap, which is the 100TB guard — unit-tested)
    return _r6(jaccard_similarity_pairs(toks, threshold=0.6, max_posting_len=None), "similarity")


def q_simhash_near_pairs(spark, sf):  # banded-Hamming SimHash near-dups
    # scheme pinned: 6 chunks -> C(6,3)=20 tables on 30-bit keys. The
    # VERIFIED output is scheme-independent (chunk-combination banding has
    # exact recall for hamming <= 3), which is why the all-pairs oracle
    # below stays valid; the pin documents the candidate-set determinism key.
    sigs = dedup.simhash_signatures(_t(spark, sf, "documents"))
    return dedup.simhash_near_pairs(sigs, max_hamming=3, num_chunks=6)


def q_pagerank_ranks(spark, sf):  # iterative graph kernel, oracled by
    # unrolling the 5 power iterations as chained CTEs in DuckDB
    from eth2dgraph_spark.graph import pagerank

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, num_iter=5)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def q_ppr_ranks(spark, sf):  # personalized PageRank (reset vector on a
    # seed set — random walk with restart), the "related to THESE nodes"
    # variant; same customer->supplier bipartite graph as pagerank_ranks,
    # seeds = customers with custkey % 97 == 0. Oracle unrolls the 4
    # power iterations as chained CTEs with the source-masked reset
    # vector (teleport AND dangling mass restart at the seeds).
    from eth2dgraph_spark.graph import personalized_pagerank

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    srcs = o.filter(F.col("o_custkey") % 97 == 0).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("node")
    )
    ranks = personalized_pagerank(edges, srcs, num_iter=4)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def q_wav_envelope(spark, sf):  # the stdlib WAV-PCM codec driven
    # end-to-end on REAL container bytes, one synthesized clip per
    # document: 16 constant segments at amplitude ((doc_id*31+i) % 20)/20
    # are encoded (functions/wav.py encode_wav, 16-bit quantization),
    # decoded back, and reduced to the 16-bin RMS envelope — all in
    # float64 so the only engine-visible arithmetic is the quantization
    # round((k/20)*32768)/32768, which the oracle replays in closed form
    # (fractional parts are multiples of 0.2: no round-half ties).
    from eth2dgraph_spark.functions.wav import synthetic_envelope_udf

    wav_env = synthetic_envelope_udf()
    d = _t(spark, sf, "documents").select("doc_id")
    return d.select("doc_id", F.posexplode(wav_env("doc_id"))).select(
        "doc_id",
        F.col("pos").cast("long").alias("bin"),
        _r6e("col").alias("rms"),
    )


def q_flac_envelope(spark, sf):  # the stdlib FLAC codec driven end-to-end
    # on REAL COMPRESSED container bytes (r13 VERDICT item 4 — the first
    # audio gate whose payload is not PCM): the wav_envelope clip verbatim
    # — 16 constant segments at amplitude ((doc_id*31+i) % 20)/20 — but
    # encoded as FLAC (functions/flac.py: fixed-predictor subframes, Rice
    # residuals, CRC-8/16 + STREAMINFO MD5), decoded back through the
    # full frame parser, and reduced to the 16-bin RMS envelope. FLAC is
    # LOSSLESS and quantizes float input exactly like encode_wav's 16-bit
    # path, so the oracle is wav_envelope's closed form UNCHANGED — the
    # gif_luma property (exact values through a real compression
    # roundtrip) transferred to audio.
    from eth2dgraph_spark.functions.flac import synthetic_envelope_flac_udf

    flac_env = synthetic_envelope_flac_udf()
    # spread the per-row encode->decode roundtrip (single parquet split
    # otherwise — the jpeg/gif luma gates' measured pattern; FLAC pays a
    # real per-row Rice encode+decode: 5.07-5.26 s single-split draws)
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    return d.select("doc_id", F.posexplode(flac_env("doc_id"))).select(
        "doc_id",
        F.col("pos").cast("long").alias("bin"),
        _r6e("col").alias("rms"),
    )


def q_audio_near_dups_flac(spark, sf):  # the audio near-dup chain on REAL
    # FLAC container bytes — the same pipeline as audio_near_dups reached
    # through the magic-byte dispatch (_decode_audio_samples_stdlib:
    # fLaC -> functions/flac.py decode_flac). synthetic_clip_flac_udf
    # carries EXACTLY the WAV gate's clip (same amplitudes, same 16-bit
    # quantization; FLAC lossless), so both containers decode to
    # bit-identical float32 samples and the WAV gate's collision property
    # transfers verbatim: distinct (group, frame) signatures cannot
    # collide, and the output is exactly the closed-form same-group pair
    # set with n_shared=3 (the oracle is the same doc_id self-join).
    from eth2dgraph_spark.functions.flac import synthetic_clip_flac_udf
    from eth2dgraph_spark.pipeline.multimodal import audio_near_pairs

    clip = synthetic_clip_flac_udf()
    # repartition BEFORE the synth UDF (the video/image gates' measured
    # pattern): FLAC pays a real per-row Rice decode; spread doc_ids
    # parallelize synth and audio_fingerprints' min_partitions floor
    # passes through without a second shuffle
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("modality"),
        clip("doc_id").alias("payload"),
    )
    return audio_near_pairs(assets, frame_ms=200, min_shared=2)


def q_avi_luma(spark, sf):  # the stdlib uncompressed-AVI codec driven
    # end-to-end on REAL container bytes, one synthesized 2-frame 8x8 clip
    # per document: pooled block b of frame f is the constant gray
    # v = ((doc_id*31 + f*16 + b) % 32) * 8, encoded (functions/avi.py
    # encode_avi, BI_RGB 24-bit bottom-up BGR + idx1), decoded back, and
    # pooled to the two 16-bin BT.601 luma grids — all float64, and the
    # integer-ratio luma (299v+587v+114v)/1000 of a gray plus the exact
    # 2x2 block mean make every bin EXACTLY v/255, which the oracle
    # replays in closed form (no rounding tolerance needed; bins are
    # multiples of 8/255).
    from eth2dgraph_spark.functions.avi import synthetic_luma_udf

    avi_luma = synthetic_luma_udf()
    d = _t(spark, sf, "documents").select("doc_id")
    return d.select("doc_id", F.posexplode(avi_luma("doc_id"))).select(
        "doc_id",
        F.col("pos").cast("long").alias("bin"),
        _r6e("col").alias("luma"),
    )


def q_hits_scores(spark, sf):  # HITS hubs & authorities (Kleinberg) —
    # the directed link-analysis companion to pagerank_ranks, on the same
    # customer->supplier bipartite graph (hubs score customers,
    # authorities suppliers). Oracle unrolls the 2 iterations as chained
    # CTEs with the L2 norms as scalar subqueries, exactly mirroring
    # graph.hits's update rule (auth <- A^T hub, normalize; hub <- A
    # auth_new, normalize; hub0 = 1).
    from eth2dgraph_spark.graph import hits

    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    scores = hits(edges, num_iter=2)
    return scores.select(
        "node", F.round("auth", 9).alias("auth"), F.round("hub", 9).alias("hub")
    )


def q_audio_near_dups(spark, sf):  # audio near-dup END-TO-END on real
    # container bytes: one synthesized 3-frame WAV clip per document
    # (functions/wav.py synthetic_clip_udf — bit-identical within group
    # doc_id % 25), decoded by the stdlib codec, per-frame energy-signature
    # hashed (multimodal.audio_fingerprints: 8 segment RMS values, 8-bit
    # quantized, packed to one long), and paired by the capped postings
    # overlap (fingerprint_overlap_pairs). Segment 0 pins the group and
    # segment 1 the frame index, so distinct (group, frame) signatures
    # CANNOT collide — the output is exactly the closed-form same-group
    # pair set with n_shared=3, replayed by the oracle as a doc_id
    # self-join, no signal math needed.
    from eth2dgraph_spark.functions.wav import synthetic_clip_udf
    from eth2dgraph_spark.pipeline.multimodal import audio_near_pairs

    clip = synthetic_clip_udf()
    # repartition BEFORE the synth UDF (the video/flac gates' measured
    # pattern): documents is one input split at these sfs, so synth ran on
    # one core — and since r14's eager cut in fingerprint_overlap_pairs
    # the single-core synth sits on the critical path ONCE instead of
    # hiding behind the duplicated subtree (measured pair: 3.77 s
    # single-split-with-cut vs 3.01 before the cut vs spread+cut below)
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("modality"),
        clip("doc_id").alias("payload"),
    )
    return audio_near_pairs(assets, frame_ms=200, min_shared=2)


def q_video_near_dups(spark, sf):  # video near-dup END-TO-END on real
    # container bytes: one synthesized 3-frame AVI clip per document
    # (functions/avi.py synthetic_clip_udf — bit-identical within group
    # doc_id % 25), decoded by the stdlib codec, per-frame pHashed
    # (multimodal.video_frame_phashes), and paired by the capped postings
    # overlap (video_overlap_pairs, the winnow_overlap shape). Same-group
    # pairs share all 3 frame hashes; the measured worst cross-group
    # collision is ONE shared hash (see synthetic_clip_udf), so
    # min_shared=2 makes the output exactly the closed-form same-group
    # pair set with n_shared=3 — which the oracle replays as a doc_id
    # self-join, no pHash math needed.
    from eth2dgraph_spark.functions.avi import synthetic_clip_udf
    from eth2dgraph_spark.pipeline.multimodal import video_near_pairs

    clip = synthetic_clip_udf()
    # repartition BEFORE the synth UDF (the jpeg gates' measured pattern):
    # documents is one input split at these sfs; spreading doc_ids here
    # parallelizes synth AND lets video_frame_phashes' engine-level
    # min_partitions floor pass through without a second shuffle
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        clip("doc_id").alias("payload"),
        F.lit(2500).cast("long").alias("duration_ms"),
    )
    return video_near_pairs(assets, every_ms=1000, min_shared=2)


def q_video_near_dups_gif(spark, sf):  # the video near-dup chain on REAL
    # ANIMATED-GIF container bytes — the same pipeline as video_near_dups
    # reached through the magic-byte dispatch (_decode_video_gray_stdlib:
    # GIF8 -> functions/gif.py decode_gif_frames with per-frame delays).
    # gif.synthetic_clip_gif_udf carries EXACTLY the AVI gate's frame
    # construction, and both containers decode those frames
    # pixel-identically (GIF lossless over its gray palette, AVI
    # uncompressed — parity asserted in tests), so the AVI gate's
    # measured collision property transfers verbatim: same-group clips
    # share all 3 frame hashes, no two groups share more than one, and
    # min_shared=2 yields exactly the closed-form same-group pair set
    # with n_shared=3 (the oracle is the same doc_id self-join).
    from eth2dgraph_spark.functions.gif import synthetic_clip_gif_udf
    from eth2dgraph_spark.pipeline.multimodal import video_near_pairs

    clip = synthetic_clip_gif_udf()
    # repartition BEFORE the synth UDF: the GIF arm pays pure-Python LZW
    # per frame, the costliest codec kernel in the suite — single-split
    # input ran it on ONE core (6.91 s, the r12 perf weak); spread doc_ids
    # parallelize synth and the decode inherits video_frame_phashes'
    # min_partitions floor without a second shuffle
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        clip("doc_id").alias("payload"),
        F.lit(2500).cast("long").alias("duration_ms"),
    )
    return video_near_pairs(assets, every_ms=1000, min_shared=2)


def q_sssp_route(spark, sf):  # the full Dgraph-`shortest` answer shape:
    # the NODE SEQUENCE of one shortest path per requested target
    # (graph.reconstruct_paths walking the sssp_paths tree — state is one
    # row per target, rounds = path length). Targets are the deepest
    # in-gap offsets (s_suppkey % 25 == 24). The oracle rebuilds the same
    # tree closed-form (dist walk + min-pred, the sssp_paths oracle) and
    # follows pred with a recursive CTE, emitting the row whose cursor
    # has no pred entry (= reached a seed). Padded engine ids are cast
    # back to decimal before joining with '->' so both engines render
    # identical route strings.
    from eth2dgraph_spark.graph import reconstruct_paths, shortest_path_tree

    s = _t(spark, sf, "supplier").select("s_suppkey")

    def pad(c):
        return F.lpad(c.cast("string"), 7, "0")

    cand = (
        s.select(
            pad(F.col("s_suppkey")).alias("src"),
            pad(F.col("s_suppkey") + 1).alias("dst"),
            ((F.col("s_suppkey") % 7) + 1).cast("double").alias("w"),
        )
        .unionByName(
            s.select(
                pad(F.col("s_suppkey")).alias("src"),
                pad(F.col("s_suppkey") + 5).alias("dst"),
                F.lit(3.0).alias("w"),
            )
        )
    )
    edges = cand.join(
        s.select(pad(F.col("s_suppkey")).alias("dst")), "dst", "left_semi"
    )
    seeds = s.filter(F.col("s_suppkey") % 25 == 0).select(
        pad(F.col("s_suppkey")).alias("node")
    )
    tree = shortest_path_tree(edges, seeds, weight="w", max_iter=12)
    targets = s.filter(F.col("s_suppkey") % 25 == 24).select(
        pad(F.col("s_suppkey")).alias("node")
    )
    out = reconstruct_paths(tree, targets, max_len=20)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.round(F.col("dist") + 1e-9, 6).alias("dist"),
        F.concat_ws(
            "->",
            F.transform("path", lambda x: x.cast("long").cast("string")),
        ).alias("route"),
    )


def q_harmonic_landmarks(spark, sf):  # landmark-sampled harmonic
    # centrality (Eppstein-Wang style sampling) over the sssp gate graph:
    # h(v) = sum over landmarks s != v of 1/d(s, v), one shortest_paths
    # run on the landmark-tagged product graph (k-bounded broadcast).
    # Landmarks every 250th key (1 at sf0.01, 4 at sf0.1 — the sf0.1 leg
    # exercises real multi-landmark sums). max_iter=12 on BOTH sides:
    # even pre-convergence, k-round Bellman-Ford == the oracle's k-round
    # walk by construction. The 1/d reciprocal sums are accumulation-
    # order sensitive across engines, hence the standard tie-nudged 6dp
    # rounding (terms <= 4, error ~1e-16, nudge 1e-9).
    from eth2dgraph_spark.graph import harmonic_closeness_sampled

    s = _t(spark, sf, "supplier").select("s_suppkey")

    def pad(c):
        return F.lpad(c.cast("string"), 7, "0")

    cand = (
        s.select(
            pad(F.col("s_suppkey")).alias("src"),
            pad(F.col("s_suppkey") + 1).alias("dst"),
            ((F.col("s_suppkey") % 7) + 1).cast("double").alias("w"),
        )
        .unionByName(
            s.select(
                pad(F.col("s_suppkey")).alias("src"),
                pad(F.col("s_suppkey") + 5).alias("dst"),
                F.lit(3.0).alias("w"),
            )
        )
    )
    edges = cand.join(
        s.select(pad(F.col("s_suppkey")).alias("dst")), "dst", "left_semi"
    )
    landmarks = s.filter(F.col("s_suppkey") % 250 == 0).select(
        pad(F.col("s_suppkey")).alias("node")
    )
    out = harmonic_closeness_sampled(edges, landmarks, weight="w", max_iter=12)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.round(F.col("harmonic") + 1e-9, 6).alias("harmonic"),
        F.col("n_landmarks").cast("long").alias("n_landmarks"),
    )


def _sssp_weighted_edges(spark, sf):
    """Padded-id weighted supplier graph shared by the MSF gates: tree
    edges (s, s+1, 10 + s%7) and skip edges (s, s+5, 100 + s%13). Every
    skip edge is the unique maximum of its cycle (>= 100 vs <= 16 tree
    weights), so by the cycle property the minimum spanning forest is
    EXACTLY the tree-edge set — closed form for the oracle — while the
    Borůvka kernel still needs multiple merge rounds to discover it
    (round 1 only links each node to its cheapest neighbor)."""
    s = _t(spark, sf, "supplier").select("s_suppkey")

    def pad(c):
        return F.lpad(c.cast("string"), 7, "0")

    cand = (
        s.select(
            pad(F.col("s_suppkey")).alias("src"),
            pad(F.col("s_suppkey") + 1).alias("dst"),
            (F.lit(10) + F.col("s_suppkey") % 7).cast("double").alias("w"),
        )
        .unionByName(
            s.select(
                pad(F.col("s_suppkey")).alias("src"),
                pad(F.col("s_suppkey") + 5).alias("dst"),
                (F.lit(100) + F.col("s_suppkey") % 13).cast("double").alias("w"),
            )
        )
    )
    return cand.join(
        s.select(pad(F.col("s_suppkey")).alias("dst")), "dst", "left_semi"
    )


def q_msf_edges(spark, sf):  # minimum spanning forest (distributed Borůvka)
    # — the single-linkage dendrogram of a similarity graph; see
    # graph.minimum_spanning_forest for why a dedup engine wants it.
    from eth2dgraph_spark.graph import minimum_spanning_forest

    out = minimum_spanning_forest(_sssp_weighted_edges(spark, sf))
    return out.select(
        F.col("u").cast("long").alias("u"),
        F.col("v").cast("long").alias("v"),
        F.round(F.col("w") + 1e-9, 6).alias("w"),
    )


def q_sl_clusters(spark, sf):  # single-linkage clusters at threshold 12
    # from the MSF dendrogram: cut forest edges with w > 12 (keeps tree
    # edges with s%7 <= 2), components = maximal runs [7k, 7k+3];
    # nodes 7k+4..7k+6 turn isolated and don't appear. Closed-form
    # oracle: cluster = n - n%7 over the nodes with a kept incident edge.
    from eth2dgraph_spark.graph import (
        minimum_spanning_forest,
        single_linkage_clusters,
    )

    msf = minimum_spanning_forest(_sssp_weighted_edges(spark, sf))
    out = single_linkage_clusters(msf, threshold=12.0)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("cluster").cast("long").alias("cluster"),
    )


def q_image_near_dups(spark, sf):  # image near-dup END-TO-END on real
    # container bytes — closes the modality asymmetry (video and audio had
    # full bytes->fingerprint->pairs gates since r10; the image pairing was
    # unit-tested only): one synthesized 32x32 PNG per document
    # (functions/png.py synthetic_image_udf — bit-identical within group
    # doc_id % 25), decoded by the stdlib PNG codec inside phash_features,
    # 64-bit pHashed, and paired by the banded Hamming kernel
    # (phash_near_pairs -> simhash_near_pairs chunk-combination banding).
    # Same-group images share the exact hash (hamming 0); the measured min
    # CROSS-group hamming over groups 0..24 is 22 (see the UDF docstring),
    # so max_hamming=2 makes the output exactly the closed-form same-group
    # pair set — which the oracle replays as a doc_id self-join, no pHash
    # math needed. max_bucket=None (cap-parity rule: the oracle's pair set
    # is uncapped, so the engine's hot-bucket cap must be off — a finite
    # default would silently drop same-group pairs once groups outgrow it
    # at a larger sf).
    from eth2dgraph_spark.functions.png import synthetic_image_udf
    from eth2dgraph_spark.pipeline.multimodal import (
        phash_features,
        phash_near_pairs,
    )

    img = synthetic_image_udf()
    # repartition BEFORE the synth UDF — the jpeg arm's measured pattern,
    # applied to the PNG arm in r13 (measured pair: 5.35-5.72 s
    # single-split vs 2.63-4.14 s spread at sf0.1). The r12 cap-parity
    # change is exonerated for the r12 draw elevation: groups are 400
    # docs at sf0.1, under the old 1024 cap, so capped and uncapped run
    # the identical plan (same 497,500 pairs; overlapping timings).
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"), img("doc_id").alias("payload")
    )
    return phash_near_pairs(phash_features(assets), max_hamming=2, max_bucket=None)


def q_jpeg_luma(spark, sf):  # the stdlib baseline JPEG codec driven
    # end-to-end on REAL container bytes, one synthesized 32x32 grayscale
    # image per document: block k of the 4x4 constant-8x8-block grid is
    # (doc_id*31 + k*17) % 256, encoded (functions/jpeg.py encode_jpeg,
    # quality=100 -> all-ones quantization tables), Huffman/DCT-decoded
    # back, and pooled to the 16-bin block-mean grid. A constant block's
    # DCT is a lone integer DC coefficient, so quantize/dequantize is the
    # identity and bin k equals the block value EXACTLY in float64 — the
    # oracle replays the closed form with no rounding tolerance (the
    # avi_luma/wav_envelope pattern for the JPEG container).
    from eth2dgraph_spark.functions.jpeg import synthetic_luma_jpeg_udf

    jl = synthetic_luma_jpeg_udf()
    # spread the per-row encode->decode roundtrip (single parquet split
    # otherwise; decode parallelism = partitions — see image_near_dups_jpeg)
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    return d.select("doc_id", F.posexplode(jl("doc_id"))).select(
        "doc_id",
        F.col("pos").cast("long").alias("bin"),
        F.col("col").alias("luma"),
    )


def q_gif_luma(spark, sf):  # the stdlib GIF codec driven end-to-end on
    # REAL container bytes, the jpeg_luma pattern for the THIRD image
    # format: one 32x32 grayscale image per document (4x4 grid of
    # constant 8x8 blocks, block k = (doc_id*29 + k*13) % 256), encoded
    # (functions/gif.py encode_gif — real LZW with width growth and the
    # 4096-entry reset), LZW-decoded back, and pooled to the 16-bin
    # block-mean grid. GIF is LOSSLESS over its palette, so every bin
    # equals the block value EXACTLY (channel 0 of the decoded RGB — see
    # synthetic_luma_gif_udf for why not the Rec.601 sum) and the oracle
    # replays the closed form with no rounding tolerance.
    from eth2dgraph_spark.functions.gif import synthetic_luma_gif_udf

    gl = synthetic_luma_gif_udf()
    # spread the per-row encode->decode roundtrip (single parquet split
    # otherwise — the jpeg gates' measured pair)
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    return d.select("doc_id", F.posexplode(gl("doc_id"))).select(
        "doc_id",
        F.col("pos").cast("long").alias("bin"),
        F.col("col").alias("luma"),
    )


def q_image_near_dups_jpeg(spark, sf):  # the image near-dup chain on REAL
    # JPEG container bytes — the dominant image format in any real corpus
    # (the PNG arm is image_near_dups): one synthesized 32x32 grayscale
    # baseline JPEG per document (functions/jpeg.py synthetic_jpeg_udf —
    # bit-identical within group doc_id % 25), Huffman/IDCT-decoded by the
    # stdlib JPEG codec inside phash_features' magic-byte dispatch, 64-bit
    # pHashed, and paired by the banded Hamming kernel. Same-group images
    # share exact bytes (hamming 0); measured min CROSS-group hamming over
    # groups 0..24 is 22 (seed g*6151+29 — see synthetic_group_jpeg), so
    # max_hamming=2 yields exactly the closed-form same-group pair set the
    # oracle replays as a doc_id self-join. max_bucket=None (cap-parity
    # rule: the oracle's pair set is uncapped).
    from eth2dgraph_spark.functions.jpeg import synthetic_jpeg_udf
    from eth2dgraph_spark.pipeline.multimodal import (
        phash_features,
        phash_near_pairs,
    )

    img = synthetic_jpeg_udf()
    # repartition BEFORE the synth+decode kernels: the documents parquet
    # is one input split at these sfs, which would run the whole
    # Huffman/IDCT decode on one core — decode parallelism equals
    # partition count (measured pair: 12.4 s single-split vs ~6 s spread;
    # the shuffle moves 5000 longs, nothing)
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"), img("doc_id").alias("payload")
    )
    return phash_near_pairs(phash_features(assets), max_hamming=2, max_bucket=None)


def q_audio_near_frames(spark, sf):  # Hamming-TOLERANT audio matching on
    # REAL container bytes: one synthesized 2-frame WAV clip per document
    # (functions/wav.py synthetic_drift_clip_udf), decoded and quantized by
    # the production fingerprint kernel (multimodal.audio_fingerprints),
    # then paired within hamming 1 (fingerprint_overlap_pairs_hamming) —
    # the re-encode-drift case the exact audio_near_dups gate misses:
    # documents with doc_id % 4 == 0 carry a one-quantization-step drift
    # that flips exactly bit 16 of the packed signature. Because every
    # segment byte roundtrips the 16-bit PCM codec exactly (the
    # wav_envelope argument), the oracle replays the WHOLE pipeline closed
    # form: same byte formula, brute-force XOR-popcount value matching
    # (valid against the banded engine by the chunk-combination
    # exact-recall guarantee), same postings join and distinct-unordered-
    # pair count. max_bucket=None (cap-parity rule).
    from eth2dgraph_spark.functions.wav import synthetic_drift_clip_udf
    from eth2dgraph_spark.pipeline.multimodal import (
        audio_fingerprints,
        fingerprint_overlap_pairs_hamming,
    )

    clip = synthetic_drift_clip_udf()
    # repartition BEFORE the synth UDF (the video/flac gates' measured
    # pattern — single-split input otherwise runs synth on one core)
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("modality"),
        clip("doc_id").alias("payload"),
    )
    fh = audio_fingerprints(assets, frame_ms=200)
    return fingerprint_overlap_pairs_hamming(
        fh, max_hamming=1, min_shared=2, hash_col="ahash", max_bucket=None
    )


def q_video_near_frames(spark, sf):  # Hamming-TOLERANT frame matching
    # (fingerprint_overlap_pairs_hamming): asset pairs whose per-frame
    # fingerprints match within hamming 2, the re-encode-drift case exact
    # matching misses. Frame hashes are synthesized CLOSED-FORM from
    # doc_id (group base (g*2654435761) % 2^59, per-doc 1-bit
    # perturbation for doc_id%4==0, frame bits 40/48) so the oracle can
    # replay the ENTIRE pipeline in SQL: same hash formula, brute-force
    # XOR-popcount value matching (valid against the banded engine by the
    # chunk-combination exact-recall guarantee, the simhash_near_pairs
    # oracle discipline), the same symmetrized+identity match table, the
    # same postings join and distinct-unordered-pair count. pHash itself
    # is separately gated (phash_bits); this gate pins the tolerant
    # MATCHING machinery cross-engine. max_bucket=None (cap-parity rule).
    from eth2dgraph_spark.pipeline.multimodal import (
        fingerprint_overlap_pairs_hamming,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    base = F.expr(
        "(doc_id % 25) * 2654435761L % 576460752303423488L"
    )
    pert = F.expr(
        "CASE WHEN doc_id % 4 = 0 THEN shiftleft(1L, cast(doc_id % 16 AS int)) "
        "ELSE 0L END"
    )
    bp = base.bitwiseXOR(pert)
    fh = d.select(
        F.col("doc_id").alias("asset_id"),
        F.explode(
            F.array(
                bp,
                bp.bitwiseXOR(F.lit(1099511627776)),  # frame 1: bit 40
                bp.bitwiseXOR(F.lit(281474976710656)),  # frame 2: bit 48
            )
        ).alias("phash"),
    )
    return fingerprint_overlap_pairs_hamming(
        fh, max_hamming=2, min_shared=2, max_bucket=None
    )


def q_asset_cluster_reps(spark, sf):  # the full multimodal dedup POLICY
    # composed end-to-end: real AVI bytes -> per-frame pHash -> capped
    # postings near-dup pairs (video_near_pairs) -> connected components
    # -> keep ONE representative per cluster (cluster_representatives,
    # keep-min-asset_id policy). Every stage is individually gated
    # (video_near_dups, cluster_reps); this gate pins the COMPOSITION a
    # production asset-dedup run executes. Clusters are exactly the clip
    # groups doc_id % 25, so the kept set is the closed-form per-group
    # min id + group size. `component` (a lexicographic-min string label)
    # is dropped from the output so the oracle stays closed-form.
    from eth2dgraph_spark.functions.avi import synthetic_clip_udf
    from eth2dgraph_spark.graph import cluster_representatives
    from eth2dgraph_spark.pipeline.multimodal import video_near_pairs

    clip = synthetic_clip_udf()
    # repartition BEFORE the synth UDF (the video_near_dups gate's
    # measured pattern — this composition gate was the last caller
    # synthesizing AVI clips from the single-split documents scan)
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    assets = d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        clip("doc_id").alias("payload"),
        F.lit(2500).cast("long").alias("duration_ms"),
    )
    pairs = video_near_pairs(assets, every_ms=1000, min_shared=2)
    meta = d.select(F.col("doc_id").alias("asset_id"))
    reps = cluster_representatives(
        meta, pairs, "asset_id", id_col="asset_id", descending=False
    )
    return reps.select(
        "asset_id", F.col("cluster_size").cast("long").alias("cluster_size")
    )


def q_audio_dedup_stream(spark, sf):  # incremental multimodal ingest
    # PHYSICALLY EXECUTED as a foreachBatch stream over two ordered
    # micro-batches of ASSETS (multimodal.fingerprint_cross_pairs_stream):
    # per batch, clips are fingerprinted through the stdlib WAV codec and
    # paired against a fingerprint history that starts as H0 and grows per
    # batch. Group design proves the history actually grew: H0 holds only
    # groups 0..19, batch 1 introduces groups 20..24 (pairs with NOTHING
    # in H0 — the negative control), batch 2's group-20..24 clips pair
    # ONLY against batch 1's, and batch 2 also re-sends four group-0/1
    # clips that pair against H0. Oracle = the closed-form group joins
    # (pairs(B1,H0) = empty; pairs(B2, H0 ∪ B1) by group), n_shared=3.
    import os
    import tempfile
    import time

    from eth2dgraph_spark.functions.wav import synthetic_clip_udf
    from eth2dgraph_spark.pipeline.multimodal import (
        audio_fingerprints,
        fingerprint_cross_pairs_stream,
    )

    clip = synthetic_clip_udf()
    # repartition BEFORE the synth UDF (the near-dup gates' measured
    # pattern): H0's 4000-clip synth+fingerprint and the landing-file
    # builds below otherwise run the WAV encode on one core
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )

    def assets(ids):
        return ids.select(
            F.col("aid").alias("asset_id"),
            F.lit("audio").alias("modality"),
            clip("aid").alias("payload"),
        )

    g = F.col("doc_id") % 25
    h0 = assets(d.filter(g < 20).select(F.col("doc_id").alias("aid")))
    b1 = assets(
        d.filter((g >= 20) & (F.col("doc_id") < 250)).select(
            (F.col("doc_id") + 100000).alias("aid")
        )
    )
    b2 = assets(
        d.filter((g >= 20) & (F.col("doc_id") >= 250))
        .select((F.col("doc_id") + 100000).alias("aid"))
        .unionByName(
            d.filter((g < 2) & (F.col("doc_id") < 50)).select(
                (F.col("doc_id") + 200000).alias("aid")
            )
        )
    )
    tmp = tempfile.mkdtemp(prefix="audio_dedup_stream_")
    landing = os.path.join(tmp, "landing")

    # repartition(1), NOT coalesce(1): coalesce collapses the synth
    # UDF into the single writer task (one-core encode); repartition
    # keeps synth wide and shuffles only the finished payload bytes
    # into the one landing file (r14 measured pattern)
    def _land(sub, frame):
        return lambda: frame.repartition(1).write.parquet(os.path.join(landing, sub))

    # overlap the three independent setup jobs (guide §2.6): both landing
    # writes and the H0 fingerprint (4000 clips through the WAV codec —
    # materialized here so the stream helper's history write is a cached
    # scan) run concurrently instead of paying three scheduling floors
    hist_hashes, _, _ = _overlap_jobs(
        lambda: audio_fingerprints(h0, frame_ms=200)
        .select("asset_id", "ahash")
        .localCheckpoint(eager=True),
        _land("b1", b1),
        _land("b2", b2),
    )
    now = int(time.time())
    for i, sub in enumerate(("b1", "b2")):
        dd = os.path.join(landing, sub)
        mt = now - 120 + i * 30
        for fn in os.listdir(dd):
            os.utime(os.path.join(dd, fn), (mt, mt))
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(landing, "*"))
    )
    out = fingerprint_cross_pairs_stream(
        stream,
        hist_hashes,
        os.path.join(tmp, "work"),
        fingerprinter=lambda df: audio_fingerprints(df, frame_ms=200),
        min_shared=2,
    )
    return out.select("new_id", "hist_id", "n_shared")


def q_image_dedup_stream(spark, sf):  # incremental IMAGE ingest PHYSICALLY
    # EXECUTED as a foreachBatch stream (the stream-side sibling of
    # image_near_dups_jpeg, closing the modality asymmetry the audio/cross
    # streams left: fingerprint_cross_pairs_stream is fingerprinter-
    # generic, so the SAME history/pairs/checkpoint machinery runs with
    # the pHash kernel over REAL baseline-JPEG container bytes —
    # synthetic_jpeg_udf payloads decoded by the stdlib JPEG codec inside
    # phash_features). One hash per image (not per-frame), so
    # min_shared=1 and the oracle's n_shared is 1. max_posting=1<<30 —
    # the cap-parity rule applied BETTER than the audio gate: the
    # oracle's group join is uncapped at ANY sf, so the engine's history-
    # side posting cap is effectively off rather than relying on group
    # sizes staying under a default. Group design proves the history
    # grew, exactly the audio gate's: H0 holds groups 0..19, batch 1
    # introduces groups 20..24 (pairs with NOTHING in H0 — negative
    # control), batch 2's group-20..24 images pair ONLY against batch
    # 1's, and batch 2 re-sends four group-0/1 images that pair against
    # H0 (the +100000/+200000 id shifts are multiples of 25, preserving
    # doc_id % 25).
    import os
    import tempfile
    import time

    from eth2dgraph_spark.functions.jpeg import synthetic_jpeg_udf
    from eth2dgraph_spark.pipeline.multimodal import (
        fingerprint_cross_pairs_stream,
        phash_features,
    )

    img = synthetic_jpeg_udf()
    # repartition BEFORE the synth UDF (the near-dup gates' measured
    # pattern): H0's 4000-image JPEG synth+decode and the landing-file
    # builds below otherwise run on one core
    d = _t(spark, sf, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )

    def assets(ids):
        return ids.select(
            F.col("aid").alias("asset_id"),
            F.lit("image").alias("modality"),
            img("aid").alias("payload"),
        )

    g = F.col("doc_id") % 25
    h0 = assets(d.filter(g < 20).select(F.col("doc_id").alias("aid")))
    b1 = assets(
        d.filter((g >= 20) & (F.col("doc_id") < 250)).select(
            (F.col("doc_id") + 100000).alias("aid")
        )
    )
    b2 = assets(
        d.filter((g >= 20) & (F.col("doc_id") >= 250))
        .select((F.col("doc_id") + 100000).alias("aid"))
        .unionByName(
            d.filter((g < 2) & (F.col("doc_id") < 50)).select(
                (F.col("doc_id") + 200000).alias("aid")
            )
        )
    )
    tmp = tempfile.mkdtemp(prefix="image_dedup_stream_")
    landing = os.path.join(tmp, "landing")

    # repartition(1), NOT coalesce(1): coalesce collapses the synth
    # UDF into the single writer task (one-core JPEG encode);
    # repartition keeps synth wide and shuffles only payload bytes
    def _land(sub, frame):
        return lambda: frame.repartition(1).write.parquet(os.path.join(landing, sub))

    # overlap the three independent setup jobs (guide §2.6; same as the
    # audio stream gate): landing writes + the H0 pHash build run
    # concurrently, and the materialized H0 makes the helper's history
    # write a cached scan
    hist_hashes, _, _ = _overlap_jobs(
        lambda: phash_features(h0)
        .select("asset_id", "phash")
        .localCheckpoint(eager=True),
        _land("b1", b1),
        _land("b2", b2),
    )
    now = int(time.time())
    for i, sub in enumerate(("b1", "b2")):
        dd = os.path.join(landing, sub)
        mt = now - 120 + i * 30
        for fn in os.listdir(dd):
            os.utime(os.path.join(dd, fn), (mt, mt))
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(landing, "*"))
    )
    out = fingerprint_cross_pairs_stream(
        stream,
        hist_hashes,
        os.path.join(tmp, "work"),
        fingerprinter=phash_features,
        min_shared=1,
        max_posting=1 << 30,
        hash_col="phash",
    )
    return out.select("new_id", "hist_id", "n_shared")


def q_cross_dedup_stream(spark, sf):  # cross-corpus near-dup PHYSICALLY
    # EXECUTED as a foreachBatch stream over two ordered micro-batches,
    # history growing per batch (pipeline/dedup.minhash_cross_pairs_stream):
    # batch 1 = mutated docs 0..24 + gibberish 450..474; batch 2 = mutated
    # 25..49 + gibberish 475.. + SECOND-GENERATION mutations of batch-1
    # docs (ids 300000..300004) that only pair if history actually grew.
    # Oracle = pairs(B1, H0) UNION ALL pairs(B2, H0 ∪ B1), replayed with
    # the same signature/banding SQL as cross_dedup. Uncapped band join on
    # both sides (the cross_dedup cap-parity rule).
    import os
    import tempfile
    import time

    from eth2dgraph_spark.pipeline.dedup import minhash_cross_pairs_stream

    # ONE definition of the shingle/signature shape (r15, ADVICE): the H0
    # feature build and the stream helper MUST agree on k/num_hashes or the
    # history features silently diverge from the batch features.
    K, NUM_HASHES = 3, 32
    hist = _t(spark, sf, "documents").select("doc_id", "text")
    b1 = hist.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz extra token")).alias("text"),
    ).unionByName(
        hist.filter((F.col("doc_id") >= 450) & (F.col("doc_id") < 475)).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.md5(F.col("text")).alias("text"),
        )
    )
    b2 = (
        hist.filter((F.col("doc_id") >= 25) & (F.col("doc_id") < 50))
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzz extra token")).alias("text"),
        )
        .unionByName(
            hist.filter(F.col("doc_id") >= 475).select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                F.md5(F.col("text")).alias("text"),
            )
        )
        .unionByName(
            hist.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zzz extra token qqq")).alias("text"),
            )
        )
    )
    tmp = tempfile.mkdtemp(prefix="cross_dedup_stream_")
    landing = os.path.join(tmp, "landing")
    # overlap the three independent setup jobs (guide §2.6): both landing
    # writes and the H0 feature build (signature + shingle set for the
    # whole initial corpus — minhash_doc_features is eagerly
    # checkpointed, so the thunk materializes it); the stream helper's
    # history write then reads the cached frame
    from eth2dgraph_spark.pipeline.dedup import minhash_doc_features

    h0_feats, _, _ = _overlap_jobs(
        lambda: minhash_doc_features(hist, "doc_id", "text", K, NUM_HASHES),
        *(
            (lambda s, f: lambda: f.coalesce(1).write.parquet(os.path.join(landing, s)))(
                sub, frame
            )
            for sub, frame in (("b1", b1), ("b2", b2))
        ),
    )
    now = int(time.time())
    for i, sub in enumerate(("b1", "b2")):
        d = os.path.join(landing, sub)
        mt = now - 120 + i * 30
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (mt, mt))
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(landing, "*"))
    )
    out = minhash_cross_pairs_stream(
        stream,
        hist,
        os.path.join(tmp, "work"),
        k=K,
        num_hashes=NUM_HASHES,
        num_bands=8,
        threshold=0.5,
        max_band_bucket=None,
        initial_history_features=h0_feats,
    )
    return out.select("new_id", "hist_id", _r6e("jaccard").alias("jaccard"))


def q_minhash_lsh_pairs(spark, sf):
    return dedup.minhash_dedup_pairs(
        _t(spark, sf, "documents"), k=3, num_hashes=32, num_bands=8, threshold=0.05
    ).select("id_a", "id_b", _r6e("jaccard").alias("jaccard"))


def q_ann_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity_search.lsh_topk(e, q, k=10, dim=64, num_planes=6)
    return out.select("query_id", "vec_id", _r6e("cosine").alias("cosine"), F.col("rank").cast("long").alias("rank"))


def q_simhash_dup_groups(spark, sf):
    sigs = dedup.simhash_signatures(_t(spark, sf, "documents"))
    g = dedup.simhash_duplicate_groups(sigs)
    return g.select("simhash", "dup_count", F.element_at("doc_ids", 1).alias("min_doc"))


def q_approx_sketches(spark, sf):  # approx sketches vs their exact baselines
    """approx_count_distinct (HLL++) and approx_percentile (Greenwald-Khanna)
    checked IN-QUERY against the exact aggregates: sketch outputs differ
    across engines, so the deterministic gate output is (exact value, flags
    that the sketch landed within tolerance). Spark's sketches are
    deterministic for fixed input, so the flags hash-match a TRUE literal."""
    li = _t(spark, sf, "lineitem")
    g = li.groupBy("l_suppkey").agg(
        F.count_distinct("l_partkey").alias("exact_nd"),
        F.approx_count_distinct("l_partkey").alias("_a_nd"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("_e_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("_a_p50"),
    )
    nd_tol = F.greatest(F.lit(2.0), F.col("exact_nd") * F.lit(0.15))
    return g.select(
        "l_suppkey",
        "exact_nd",
        (F.abs(F.col("_a_nd") - F.col("exact_nd")) <= nd_tol).alias("nd_ok"),
        (F.abs(F.col("_a_p50") - F.col("_e_p50"))
         <= F.abs(F.col("_e_p50")) * 0.05 + 0.01).alias("p50_ok"),
    )


def q_percentile_disc(spark, sf):  # discrete percentiles (actual elements)
    c = _t(spark, sf, "customer")
    c.createOrReplaceTempView("_pd_customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               round(percentile_disc(0.25) WITHIN GROUP (ORDER BY c_acctbal) + 1e-9, 6) AS p25,
               round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY c_acctbal) + 1e-9, 6) AS p50,
               round(percentile_disc(0.75) WITHIN GROUP (ORDER BY c_acctbal) + 1e-9, 6) AS p75
        FROM _pd_customer GROUP BY c_nationkey"""
    )


def q_map_funcs(spark, sf):  # map_from_entries -> map_filter -> explode(map)
    o = _t(spark, sf, "orders")
    per = o.groupBy("o_custkey", "o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("m")
    )
    return m.select(
        "o_custkey",
        F.size("m").alias("n_statuses"),
        F.explode(F.map_filter("m", lambda k, v: v > 4)).alias("status", "cnt"),
    )


def q_lateral_topk(spark, sf):  # correlated LATERAL subquery (top-2 per key)
    _t(spark, sf, "nation").createOrReplaceTempView("_lt_nation")
    _t(spark, sf, "customer").createOrReplaceTempView("_lt_customer")
    return spark.sql(
        """
        SELECT n_name, c.c_custkey, round(c.c_acctbal, 2) AS acctbal
        FROM _lt_nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM _lt_customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c"""
    )


def q_window_ignore_nulls(spark, sf):  # first/last/lead/lag over nulls
    """ignoreNulls window family: forward-fill (last non-null at-or-before),
    backfill, previous/next non-null — via first()/last() with ignorenulls
    over one-sided frames. The oracle emulates IGNORE NULLS (absent in this
    DuckDB build) with count-of-non-nulls groups + lag/lead of the fills."""
    ev = _t(spark, sf, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.when(F.col("value") >= 0.3, F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    ffill = F.last("v", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_nn = F.last("v", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    bfill = F.first("v", ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
    next_nn = F.first("v", ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return base.select(
        "user_id",
        "event_id",
        _r6e(ffill).alias("ffill"),
        _r6e(prev_nn).alias("prev_nn"),
        _r6e(bfill).alias("bfill"),
        _r6e(next_nn).alias("next_nn"),
    )


def q_min_cost_lineitem(spark, sf):  # TPC-H Q2 shape: correlated scalar
    # subquery (per-part minimum) — every line hitting its part's min price
    _t(spark, sf, "part").createOrReplaceTempView("_q2_part")
    _t(spark, sf, "lineitem").createOrReplaceTempView("_q2_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, l_orderkey, round(l_extendedprice, 2) AS price
        FROM _q2_part JOIN _q2_lineitem ON p_partkey = l_partkey
        WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
                                 FROM _q2_lineitem l2
                                 WHERE l2.l_partkey = p_partkey)"""
    )


def q_waiting_supplier(spark, sf):  # TPC-H Q21 shape: EXISTS + NOT EXISTS
    # both correlated on the same order — the classic decorrelation stress
    # (adapted to the slimmed schema: late = shipped >60 days after order)
    _t(spark, sf, "supplier").createOrReplaceTempView("_q21_supplier")
    _t(spark, sf, "lineitem").createOrReplaceTempView("_q21_lineitem")
    _t(spark, sf, "orders").createOrReplaceTempView("_q21_orders")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM _q21_supplier
        JOIN _q21_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN _q21_orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT 1 FROM _q21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM _q21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY s_name"""
    )


def q_unpivot_metrics(spark, sf):  # wide -> long reshape (UNPIVOT / melt)
    c = _t(spark, sf, "customer")
    wide = c.groupBy("c_nationkey").agg(
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        _r6e(F.avg("c_acctbal")).alias("avg_bal"),
        F.count(F.lit(1)).cast("double").alias("n_cust"),
    )
    return wide.unpivot(
        ids=["c_nationkey"],
        values=["sum_bal", "avg_bal", "n_cust"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def q_small_qty_avg(spark, sf):  # TPC-H Q17 shape: correlated AVG scalar
    # subquery per part (lines below 20% of their part's average quantity),
    # rolled up per brand so all 25 groups pin — the classic
    # "decorrelate-to-aggregate-then-join" optimizer stress. The slimmed
    # schema has no p_container, so the brand rollup replaces Q17's
    # brand+container point filter; the correlated skeleton is identical.
    _t(spark, sf, "part").createOrReplaceTempView("_q17_part")
    _t(spark, sf, "lineitem").createOrReplaceTempView("_q17_lineitem")
    return spark.sql(
        """
        SELECT p_brand,
               round(sum(l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM _q17_lineitem JOIN _q17_part ON p_partkey = l_partkey
        WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM _q17_lineitem l2
                            WHERE l2.l_partkey = p_partkey)
        GROUP BY p_brand"""
    )


def q_recent_part_suppliers(spark, sf):  # TPC-H Q20 shape: nested semi-join
    # chain (supplier IN -> part IN) through a correlated scalar SUM on TWO
    # correlation columns plus a date filter — the deepest decorrelation
    # stress in the family. The slimmed schema has no partsupp, so per-pair
    # availability is derived from lineitem (all-time quantity per
    # (supplier, part)); the correlated condition keeps pairs whose
    # shipments skew into the last 7 months (>90% of all-time quantity
    # ordered since 2001-01-01), which genuinely binds: 52 of 100
    # suppliers qualify at sf0.01.
    _t(spark, sf, "supplier").createOrReplaceTempView("_q20_supplier")
    _t(spark, sf, "part").createOrReplaceTempView("_q20_part")
    _t(spark, sf, "lineitem").createOrReplaceTempView("_q20_lineitem")
    _t(spark, sf, "orders").createOrReplaceTempView("_q20_orders")
    return spark.sql(
        """
        SELECT s_name, round(s_acctbal + 1e-9, 2) AS bal
        FROM _q20_supplier
        WHERE s_suppkey IN (
            SELECT sp.l_suppkey
            FROM (SELECT l_suppkey, l_partkey, sum(l_quantity) AS total_qty
                  FROM _q20_lineitem GROUP BY l_suppkey, l_partkey) sp
            WHERE sp.l_partkey IN (SELECT p_partkey FROM _q20_part
                                   WHERE p_name = 'small ring')
              AND (SELECT sum(l2.l_quantity)
                   FROM _q20_lineitem l2
                   JOIN _q20_orders o ON l2.l_orderkey = o.o_orderkey
                   WHERE l2.l_partkey = sp.l_partkey
                     AND l2.l_suppkey = sp.l_suppkey
                     AND o.o_orderdate >= DATE '2001-01-01')
                  > 0.9 * sp.total_qty)"""
    )


_CJK26 = "一二三四五六七八九十百千万上下左右中大小人口手目日月"  # 26 chars


def q_line_profile(spark, sf):  # per-doc LINE-level structural quality
    # signals (RedPajama-Data/Dolma filters: terminal punctuation, bullet
    # lines, all-caps lines, within-doc duplicate lines). The synthetic
    # docs are single-line, so the gate synthesizes a 5-line document per
    # row (the script_profile injection discipline): the doc text twice
    # (duplicate-line signal), a "- "-prefixed bullet, an UPPER() header,
    # and a doc_id-length prefix ending in "." (terminal punctuation).
    # Ratios are small-integer divisions — bit-identical across engines —
    # 6dp tie-nudged anyway.
    from eth2dgraph_spark.pipeline.text import line_profile

    d = _t(spark, sf, "documents").select("doc_id", "text")
    multi = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(F.lit("- "), F.substring("text", 1, 10)),
            F.upper(F.substring("text", 1, 12)),
            F.col("text"),
            F.concat(F.expr("substring(text, 1, CAST(doc_id % 20 + 1 AS INT))"), F.lit(".")),
        ).alias("text"),
    )
    out = line_profile(multi)
    return out.select(
        "id",
        "n_lines",
        _r6e("mean_line_len").alias("mean_line_len"),
        _r6e("frac_lines_end_punct").alias("frac_lines_end_punct"),
        _r6e("frac_lines_bullet").alias("frac_lines_bullet"),
        _r6e("frac_lines_upper").alias("frac_lines_upper"),
        _r6e("frac_dup_lines").alias("frac_dup_lines"),
    )


def q_script_profile(spark, sf):  # per-doc unicode-script profile (the
    # mixed-script / mislabeled-language curation signal lang_id can't
    # see). The synthetic docs are pure Latin, so the gate would be
    # vacuous on them alone — the dedup_stream injection discipline:
    # three deterministic variants (vowels->Cyrillic via translate;
    # a-z->26 CJK chars; appended digits+Greek) make every script column
    # bind. Both engines implement the Unicode Script property and
    # translate() identically (verified before this landed); counts are
    # exact integers, fractions 6dp tie-nudged.
    from eth2dgraph_spark.pipeline.text import _SCRIPTS, script_profile

    d = _t(spark, sf, "documents").select("doc_id", "text")
    aug = (
        d.unionByName(
            d.select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.translate(F.col("text"), "aeiou", "аеіоу").alias("text"),
            )
        )
        .unionByName(
            d.select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                F.translate(
                    F.col("text"), "abcdefghijklmnopqrstuvwxyz", _CJK26
                ).alias("text"),
            )
        )
        .unionByName(
            d.select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" 0123456789 αβγψ")).alias("text"),
            )
        )
    )
    names = [*_SCRIPTS, "digit", "other"]
    return script_profile(aug).select(
        "id",
        "n_chars",
        *[f"{s}_chars" for s in names],
        *[_r6e(f"{s}_frac").alias(f"{s}_frac") for s in names],
    )


def q_entropy_profile(spark, sf):  # per-doc Shannon entropy of the char
    # and word distributions (bits) — the gibberish/boilerplate filter
    # complementing gopher_rep. Injected variants make the extremes bind
    # on the synthetic corpus: repeated-char spam (entropy -> 0) and a
    # doc_id-seeded md5 hex blob (char entropy -> ~4 bits, the hex
    # alphabet ceiling). H computed as log2(n) - sum(c*log2(c))/n in both
    # engines; libm log2 -> 6dp tie-nudged.
    from eth2dgraph_spark.pipeline.text import entropy_profile

    d = _t(spark, sf, "documents").select("doc_id", "text")
    aug = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.lit("aaaa aaaa "), F.repeat(F.lit("a"), 40)).alias("text"),
        )
    ).unionByName(
        d.select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.md5(F.col("text")), F.lit(" "), F.md5(F.concat(F.col("text"), F.lit("x")))).alias("text"),
        )
    )
    out = entropy_profile(aug)
    return out.select(
        "id",
        "n_chars",
        _r6e("char_entropy").alias("char_entropy"),
        "n_words",
        _r6e("word_entropy").alias("word_entropy"),
    )


def q_cross_dedup(spark, sf):  # cross-corpus MinHash near-dup — the
    # incremental FUZZY-dedup step (incr_curate_bloom's near-dup sibling):
    # a synthetic new batch (50 lightly-mutated history copies that must
    # match + 50 md5-gibberish docs that must not) deduped against the
    # full documents history. Bipartite banding, never new x new or
    # hist x hist; candidate-driven exact-Jaccard verification. The
    # oracle replays signatures on BOTH corpora and the band-equality
    # join (the minhash_lsh_pairs discipline, bipartite form).
    from eth2dgraph_spark.pipeline import dedup

    hist = _t(spark, sf, "documents").select("doc_id", "text")
    new = hist.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz extra token")).alias("text"),
    ).unionByName(
        hist.filter(F.col("doc_id") >= 450).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.md5(F.col("text")).alias("text"),
        )
    )
    # max_band_bucket=None: the oracle's band join is uncapped, so the gate
    # must run uncapped too — with the default star cap a history band
    # bucket >1024 members would make engine and oracle diverge at larger
    # sf (cap behavior is unit-tested separately in tests/test_dedup.py).
    out = dedup.minhash_cross_pairs(
        new, hist, k=3, num_hashes=32, num_bands=8, threshold=0.5,
        max_band_bucket=None,
    )
    return out.select("new_id", "hist_id", _r6e("jaccard").alias("jaccard"))


def q_cluster_reps(spark, sf):  # quality-ranked cluster dedup: keep the
    # LONGEST member of each ngram-Jaccard near-dup cluster (the
    # keep-longest policy real curation pipelines use instead of the
    # min-id rule), singletons kept as their own clusters. Oracle composes
    # the dedup_clusters recursive-CTE components verbatim + the
    # token_count expression + the same (tokens DESC, id) rank. Pins the
    # whole composition: pair generation, transitive closure, singleton
    # coalesce, and the argmax choice.
    from eth2dgraph_spark.graph import cluster_representatives
    from eth2dgraph_spark.pipeline import dedup

    d = _t(spark, sf, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, k=3, threshold=0.05).select("id_a", "id_b")
    docs = d.withColumn(
        "n_tokens_ws", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    )
    out = cluster_representatives(docs, pairs, order_col="n_tokens_ws")
    return out.select(
        "doc_id", "component", F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_tokens_ws",
    )


def q_token_mix(spark, sf):  # token-budgeted source mixing (the "train on
    # B tokens at these weights" knob — GPT-3/LLaMA recipes quote
    # per-source TOKEN shares, not doc counts): per source, the
    # md5-hash-ordered document prefix whose cumulative whitespace-token
    # count first covers weight * 2000 tokens. Budgets 1000/500/300/200
    # all BIND (every source holds ~1300-1550 tokens) and the 16
    # unweighted sources drop — both effects pinned by the row set. The
    # oracle replays the same hash order, running sum, and
    # prefix-strictly-under-budget rule.
    from eth2dgraph_spark.pipeline import split as sp

    out = sp.token_budget_mix(
        _t(spark, sf, "documents"),
        weights={"src0": 0.5, "src1": 0.25, "src2": 0.15, "src3": 0.10},
        budget_tokens=2000,
    )
    return out.select("doc_id", "source", "n_tokens_ws")


def q_stream_join(spark, sf):  # watermarked STREAM-STREAM join physically
    # executed (the windowed_append sibling): purchases joined to views of
    # the same user within +/-12h, each side arriving as two ordered
    # micro-batches (file source, maxFilesPerTrigger=1, pinned mtimes).
    # The 5-day watermark delay dwarfs the 12h bound, so no cross-boundary
    # match's buffered state is evicted before its partner arrives
    # (eviction horizon = delay + within) and the appended match set
    # EQUALS the batch join — which is the oracle. The join itself runs
    # with real symmetric stream state, not a batch rewrite; the unit
    # suite covers the eviction/outer-emission semantics.
    import os
    import tempfile
    import time as _time

    from eth2dgraph_spark.streaming.windows import (
        execute_stream_append,
        stream_stream_join,
    )

    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id", "event_type")
    cut = "2024-01-16 00:00:00"
    tmp = tempfile.mkdtemp(prefix="stream_join_")
    sides = {
        "l": ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
        ),
        "r": ev.filter(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
        ),
    }
    streams = {}
    now = int(_time.time())
    for s, frame in sides.items():
        landing = os.path.join(tmp, s)
        ts_col = f"{s}_ts"
        for i, (lo, hi) in enumerate(((None, cut), (cut, None)), 1):
            part = frame
            if lo:
                part = part.filter(F.col(ts_col) >= lo)
            if hi:
                part = part.filter(F.col(ts_col) < hi)
            sub = os.path.join(landing, f"b{i}")
            part.coalesce(1).write.parquet(sub)
            mt = now - 180 + i * 30
            for fn in os.listdir(sub):
                os.utime(os.path.join(sub, fn), (mt, mt))
        streams[s] = (
            spark.readStream.schema(frame.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(landing, "*"))
        )
    joined = stream_stream_join(
        streams["l"], streams["r"], "user_id", "l_ts", "r_ts",
        watermark="5 days", within="12 hours",
    ).select("user_id", "l_id", "r_id")
    return execute_stream_append(joined, checkpoint_dir=os.path.join(tmp, "ckpt"))


def q_market_share(spark, sf):  # TPC-H Q8 shape: 7-table join chain
    # (lineitem-orders-customer-nation-region + supplier-nation under an
    # alias) feeding a conditional-sum-over-sum ratio per year — the
    # classic "market share" rollup. One nation's share of ASIA-region
    # order volume by order year; the slimmed schema drops Q8's part
    # filter but keeps the double nation join and the ratio shape intact.
    for t in ("lineitem", "orders", "customer", "nation", "region", "supplier"):
        _t(spark, sf, t).createOrReplaceTempView(f"_q8_{t}")
    return spark.sql(
        """
        SELECT o_year,
               round(sum(CASE WHEN s_nation = 'NATION_3' THEN volume ELSE 0 END)
                     / sum(volume) + 1e-9, 6) AS mkt_share,
               count(*) AS n_lines
        FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS s_nation
              FROM _q8_lineitem
              JOIN _q8_orders   ON l_orderkey = o_orderkey
              JOIN _q8_customer ON o_custkey = c_custkey
              JOIN _q8_nation n1 ON c_nationkey = n1.n_nationkey
              JOIN _q8_region   ON n1.n_regionkey = r_regionkey
                                AND r_name = 'ASIA'
              JOIN _q8_supplier ON l_suppkey = s_suppkey
              JOIN _q8_nation n2 ON s_nationkey = n2.n_nationkey) v
        GROUP BY o_year"""
    )


def q_nation_profit(spark, sf):  # TPC-H Q9 shape: multi-join with a LIKE
    # part filter and a computed profit measure, grouped by (nation,
    # year). The slimmed schema has no partsupp/ps_supplycost, so cost is
    # proxied by p_retailprice * quantity * 0.1 — the join tree (lineitem
    # x supplier x part x orders x nation) and the year/nation rollup are
    # the Q9 skeleton.
    for t in ("lineitem", "orders", "part", "nation", "supplier"):
        _t(spark, sf, t).createOrReplaceTempView(f"_q9_{t}")
    return spark.sql(
        """
        SELECT nation, o_year, round(sum(amount) + 1e-9, 2) AS sum_profit
        FROM (SELECT n_name AS nation,
                     CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount)
                       - p_retailprice * l_quantity * 0.1 AS amount
              FROM _q9_lineitem
              JOIN _q9_supplier ON l_suppkey = s_suppkey
              JOIN _q9_part     ON l_partkey = p_partkey
              JOIN _q9_orders   ON l_orderkey = o_orderkey
              JOIN _q9_nation   ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%gear%') v
        GROUP BY nation, o_year"""
    )


def q_try_funcs(spark, sf):  # ANSI-safe error-handling scalar surface:
    # this engine runs with spark.sql.ansi.enabled=true, so the try_*
    # family is the sanctioned way to get null-on-error semantics
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.expr("try_cast(substring(c_name, 10, 9) AS LONG)").alias("name_num"),
        _r6e(F.try_divide(F.col("c_acctbal"), F.col("c_nationkey"))).alias(
            "bal_per_nat"
        ),  # c_nationkey=0 rows -> null, not an ANSI error
        F.expr("try_cast(c_mktsegment AS DOUBLE)").alias("seg_num"),  # null
    )


def q_regexp_funcs(spark, sf):  # regexp scalar family over documents
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[a-z]{4,}")).alias("long_words"),
        F.regexp_extract(F.col("text"), "([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)).alias("n_numbers"),
    )


def q_date_funcs(spark, sf):  # date arithmetic scalar family
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("qtr"),
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.last_day("o_orderdate").alias("eom"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_98"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
    )


def q_null_funcs(spark, sf):  # null-handling scalar family
    c = _t(spark, sf, "customer")
    seg_or_null = F.nullif("c_mktsegment", F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        F.coalesce(seg_or_null, F.lit("(building)")).alias("seg"),
        F.expr("nvl2(nullif(c_mktsegment, 'BUILDING'), 'other', 'bld')").alias("kind"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_floor"),
        F.round(F.least(F.col("c_acctbal"), F.lit(1000.0)), 2).alias("bal_cap"),
        F.isnull(seg_or_null).alias("is_bld"),
    )


def q_explode_outer(spark, sf):  # outer explode: null/empty arrays keep rows
    d = _t(spark, sf, "documents")
    arr = F.when(
        F.length("text") >= 120, F.split(F.lower(F.trim("text")), r"\s+")
    )  # short docs -> null array
    return (
        d.select("doc_id", F.explode_outer(arr).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("w").alias("n_words"),  # null word rows not counted
        )
    )


def q_byte_kernels(spark, sf):  # bench-only: the eth byte-kernel pipeline
    """P6+P8+P13+P15 end to end over a synthetic distinct-bytecode frame:
    metadata split, skeleton extraction, keccak skeleton hash, opcode n-gram
    rows — the extract-path kernels (SURVEY §7 hard part (b)), which the
    driver tables can't exercise relationally. Bytecode is deterministic
    md5-derived pseudo-code (4 KB per document row), so timings are
    comparable across rounds. Not oracle-gated (keccak/CBOR aren't DuckDB-
    expressible); byte-exactness is covered by the golden CSV unit tests."""
    from eth2dgraph_spark.functions import keccak as _kk
    from eth2dgraph_spark.functions.metadata import split_and_decode_hex
    from eth2dgraph_spark.functions.ngrams import ngram_rows
    from eth2dgraph_spark.functions.skeleton import extract_skeleton_hex

    docs = _t(spark, sf, "documents")
    block = F.concat(
        *[F.md5(F.concat(F.col("text"), F.lit(str(i)))) for i in range(16)]
    )  # 512 hex chars = 256 bytes
    code = F.concat(F.lit("0x"), F.repeat(block, 16))  # 4 KB of pseudo-bytecode
    frame = docs.select(F.col("doc_id").alias("id"), code.alias("deployed_bytecode"))
    # documents is 1-2 parquet files; without a repartition the Arrow UDF
    # stage runs on 1-2 cores. One narrow-ish shuffle buys full parallelism
    # for the kernel stage — the same layout a real distinct-bytecode frame
    # has after its dedup shuffle.
    frame = frame.repartition(spark.sparkContext.defaultParallelism)

    # ONE fused mapInPandas for the metadata/skeleton/keccak chain (r14,
    # guide §4.1): the three-UDF form evaluated as TWO chained
    # ArrowEvalPython nodes (meta+skeleton batch together; keccak depends
    # on skeleton), so every 4 KB skeleton crossed the JVM<->Python
    # boundary twice more than needed. The fused kernel runs the SAME
    # batch entry points (split_and_decode_hex, extract_skeleton_hex,
    # keccak256_batch via _to_raw — the exact metadata_udf/skeleton_udf/
    # keccak256_udf bodies), so every value is bit-identical; the P6
    # metadata decode stays in the workload, surfaced as the n_meta
    # parity column. Bytecode now crosses the boundary once.
    def _fused(batches):
        import pandas as pd  # noqa: F811

        for pdf in batches:
            codes = pdf["deployed_bytecode"]
            metas = [split_and_decode_hex(c) for c in codes]  # P6
            skels = [extract_skeleton_hex(c) for c in codes]  # P8
            live = [(i, _kk._to_raw(s)) for i, s in enumerate(skels) if s is not None]
            digests = _kk.keccak256_batch([r for _, r in live])  # P13
            hashes = [None] * len(skels)
            for (i, _), d in zip(live, digests):
                hashes[i] = "0x" + d.hex()
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "skeleton": pd.Series(skels, dtype=object),
                    "skeleton_hash": pd.Series(hashes, dtype=object),
                    "n_meta": [
                        sum(v is not None for v in m.values()) for m in metas
                    ],
                }
            )

    enriched = frame.mapInPandas(
        _fused, "id long, skeleton string, skeleton_hash string, n_meta int"
    ).persist()  # both agg branches read it; never recompute the kernels
    ng = ngram_rows(enriched, id_col="skeleton_hash", code_col="skeleton")
    return enriched.agg(
        F.count(F.lit(1)).alias("n_codes"),
        F.count_distinct("skeleton_hash").alias("n_skeletons"),
    ).crossJoin(
        ng.agg(
            F.count(F.lit(1)).alias("n_ngram_rows"),
            F.sum("cnt").alias("total_ngrams"),
        )
    )


def q_byte_kernel_fixture(spark, sf):  # the eth byte-kernels on the
    # UPSTREAM GOLDEN fixture (tests/data/bytecodes.csv, credited to
    # gsalzer/ethutils via the reference's test corpus) — gives the
    # skeleton/keccak/ngram family a driver-visible correctness row (they
    # were previously certified only by unit goldens; the synthetic tables
    # have no chain-shaped bytes). The ORACLE is the expected-output table:
    # skeleton_md5 is derived from the upstream bytecodes_skeleton.csv at
    # oracle-generation time (trailing-zero-trimmed — codeid 3's upstream
    # golden trims one trailing zero byte the reference algorithm keeps,
    # see tests/test_kernels.py); skeleton_keccak and the ngram counts are
    # engine-pinned literals whose absolute anchoring is the known-vector
    # keccak tests and the hand-computed ngram tests in tests/.
    import os

    from eth2dgraph_spark.functions.keccak import keccak256_udf
    from eth2dgraph_spark.functions.ngrams import ngram_rows
    from eth2dgraph_spark.functions.skeleton import skeleton_udf

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "data")
    raw = (
        spark.read.option("sep", ";")
        .option("header", "true")
        .csv(os.path.join(data, "bytecodes.csv"))
    )
    frame = raw.select(
        F.col("codeid").cast("long").alias("codeid"),
        F.when(F.col("code").startswith("0x"), F.col("code"))
        .otherwise(F.concat(F.lit("0x"), F.col("code")))
        .alias("code"),
    )
    # no persist: the fixture is 5 rows — recomputing the branch is cheaper
    # than leaking executor storage memory into subsequent gates in the
    # same session (a never-unpersisted cache outlives this query).
    enriched = frame.withColumn("skeleton", skeleton_udf(F.col("code"))).withColumn(
        "skeleton_keccak", keccak256_udf(F.col("skeleton"))
    )
    ng = (
        ngram_rows(enriched, id_col="codeid", code_col="skeleton")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngram_rows"),
            F.sum("cnt").alias("total_ngrams"),
        )
    )
    return (
        enriched.select(
            "codeid",
            F.md5(
                F.regexp_replace(
                    F.regexp_replace("skeleton", "^0x", ""), "0+$", ""
                )
            ).alias("skeleton_md5"),
            "skeleton_keccak",
        )
        .join(ng, enriched["codeid"] == ng["id"])
        .select("codeid", "skeleton_md5", "skeleton_keccak", "n_ngram_rows", "total_ngrams")
    )


def q_order_priority(spark, sf):  # TPC-H Q4 shape: correlated EXISTS with a
    # range predicate — compound-condition left-semi join (equi + non-equi)
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    cond = (o["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_custdist(spark, sf):  # TPC-H Q13 shape: left outer join + double agg
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_brand_supplier_count(spark, sf):  # TPC-H Q16 shape: NOT LIKE + countDistinct
    p = _t(spark, sf, "part").filter(~F.col("p_type").startswith("SMALL"))
    li = _t(spark, sf, "lineitem")
    return (
        p.join(li, p["p_partkey"] == li["l_partkey"])
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_large_orders(spark, sf):  # TPC-H Q18 shape: grouped HAVING + join back
    li = _t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(big, o["o_orderkey"] == big["l_orderkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("sum_qty", 2).alias("sum_qty"),
            F.round("o_totalprice", 2).alias("total"),
        )
    )


def q_top_balance_idle(spark, sf):  # TPC-H Q22 shape: scalar-subquery filter +
    # anti join + substring bucketing
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(F.col("o_orderstatus") == "P"),
            c["c_custkey"] == o["o_custkey"],
            "left_anti",
        )
        .groupBy(F.col("c_name").substr(F.length("c_name") - 1, F.lit(2)).alias("tail2"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q_important_parts(spark, sf):  # TPC-H Q11 shape: HAVING vs global scalar agg
    li = _t(spark, sf, "lineitem")
    per = li.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("val"))
    thr = li.agg((F.sum("l_extendedprice") * F.lit(0.0005)).alias("thr"))
    return (
        per.crossJoin(F.broadcast(thr))
        .filter(F.col("val") > F.col("thr"))
        .select("l_partkey", F.round("val", 2).alias("val"))
    )


def q_nation_flows(spark, sf):  # TPC-H Q7 shape: same dim joined twice (aliases)
    n = _t(spark, sf, "nation")
    s = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    n1 = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    # decimal accumulation: double-sum is accumulation-order-dependent and this
    # grouping sits right at the cent rounding boundary on some groups
    rev = F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("snk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("cnk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").cast("long").alias("l_year"))
        .agg(F.round(rev, 2).cast("double").alias("revenue"))
    )


def q_rank_funcs(spark, sf):  # §2.6 engine surface: full ranking-function set
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        _r6e(F.percent_rank().over(w)).alias("prank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        _r6e(F.cume_dist().over(w)).alias("cdist"),
    )


def q_set_ops(spark, sf):  # INTERSECT / EXCEPT / UNION surface
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("k"))
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(F.col("c_custkey").alias("k"))
    active = o.select(F.col("o_custkey").alias("k")).distinct()
    r1 = bld.intersect(active).withColumn("op", F.lit("building_active"))
    r2 = bld.exceptAll(active).withColumn("op", F.lit("building_inactive"))
    r3 = bld.union(auto).distinct().withColumn("op", F.lit("building_or_auto"))
    return r1.unionByName(r2).unionByName(r3)


def q_percentiles(spark, sf):  # exact percentile (linear interpolation) per group
    c = _t(spark, sf, "customer")
    q = F.expr("percentile(c_acctbal, array(0.25, 0.5, 0.75))")
    return (
        c.groupBy("c_nationkey")
        .agg(q.alias("qs"))
        .select(
            "c_nationkey",
            _r6e(F.element_at("qs", 1)).alias("q25"),
            _r6e(F.element_at("qs", 2)).alias("median"),
            _r6e(F.element_at("qs", 3)).alias("q75"),
        )
    )


def q_string_agg(spark, sf):  # ordered distinct string aggregation per group
    c = _t(spark, sf, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.count(F.lit(1)).alias("n"),
    )


def q_sliding_window(spark, sf):  # event-time sliding window (1h window, 30m slide)
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), _r6e(F.avg("value")).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "avg_value",
        )
    )


def q_corr_stats(spark, sf):  # statistical aggregates: corr / covar_pop / var_pop
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _r6e(F.corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
        _r6e(F.covar_pop("l_quantity", "l_discount")).alias("qty_disc_covar"),
        _r6e(F.var_pop("l_quantity")).alias("qty_var"),
        _r6e(F.stddev_samp("l_extendedprice")).alias("price_sd"),
    )


def q_filter_agg(spark, sf):  # TPC-H Q6 shape: pure scan-filter-aggregate
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_late_shipments(spark, sf):  # TPC-H Q12 shape: conditional counts by urgency
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q_promo_revenue(spark, sf):  # TPC-H Q14 shape: conditional-to-total ratio
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            _r6e(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_pct")
        )
    )


def q_disjunctive_filter(spark, sf):  # TPC-H Q19 shape: OR-of-ANDs join predicate
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 11)) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 20)) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#3") & (F.col("l_quantity").between(20, 30)) & (F.col("p_size") <= 15))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")), 2
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_range_frame(spark, sf):  # RANGE window frame (value-based, not row-based)
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id"))
        .rangeBetween(-5, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        _r6e(F.sum("value").over(w)).alias("range_sum"),
        F.count(F.lit(1)).over(w).alias("range_cnt"),
    )


def q_value_window(spark, sf):  # first_value / last_value / nth_value over frames
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first_value("event_type").over(wf).alias("first_type"),
        F.last_value("event_type").over(wf).alias("last_type"),
        F.nth_value("event_type", 2).over(wf).alias("second_type"),
        F.lead("event_type", 1, "NONE").over(w).alias("next_type"),
    )


def q_posexplode_tokens(spark, sf):  # positional explode (LATERAL VIEW surface)
    d = _t(spark, sf, "documents")
    toks = _ws_tokens()
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos", "token"))
        .filter(F.col("pos") < 5)
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
    )


def q_length_histogram(spark, sf):  # corpus length distribution (fixed-width buckets)
    d = _t(spark, sf, "documents")
    b = F.floor(F.length("text") / 50).cast("long")
    return (
        d.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.length("text")).cast("long").alias("min_len"),
            F.max(F.length("text")).cast("long").alias("max_len"),
        )
    )


def q_argmax_customer(spark, sf):  # max_by with composite (deterministic) order
    c = _t(spark, sf, "customer")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", F.struct("c_acctbal", "c_custkey")).alias("richest"),
        F.min_by("c_name", F.struct("c_acctbal", "c_custkey")).alias("poorest"),
    )


def q_bool_aggs(spark, sf):  # bool_and / bool_or / count_if surface
    c = _t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
        F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
    )


def q_heavy_hitters(spark, sf):  # corpus-level top-k token frequencies — the
    # exact baseline a count-min/TopK sketch would approximate at 100 TB
    d = _t(spark, sf, "documents")
    toks = _ws_tokens()
    return (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


def q_source_mix(spark, sf):  # domain mixing: per-source deterministic
    # downsampling with nested thresholds (re-weighting one domain never
    # churns the others' rows)
    from eth2dgraph_spark.pipeline.split import sample_by_source

    d = _t(spark, sf, "documents")
    mixed = sample_by_source(d, "lang", {"en": 1.0, "de": 0.5, "fr": 0.25}, default_rate=0.1)
    return mixed.select("doc_id", "lang")


def q_rep_stats(spark, sf):  # Gopher-style repetition filters: duplicate-word
    # ratio and top-word coverage — boilerplate/spam signals
    return text.repetition_stats(_t(spark, sf, "documents")).select(
        "doc_id", "dup_word_ratio", "top_word_ratio"
    )


def q_seq_pack(spark, sf):  # sequence packing: shard-parallel concat-then-
    # chunk assignment of docs to fixed-token-budget training sequences
    from eth2dgraph_spark.pipeline.pack import greedy_pack
    from eth2dgraph_spark.pipeline.text import token_count

    d = token_count(_t(spark, sf, "documents"))
    return greedy_pack(d, budget=512, num_shards=4).select(
        "doc_id", "shard", "pack_id", "pack_offset", "n_tokens"
    )


def q_pack_texts(spark, sf):  # training-sequence materialization: per-pack
    # ordered concat of member docs; gated on md5 of the final text so the
    # exact byte-for-byte sequences are compared, not just counts
    from eth2dgraph_spark.pipeline.pack import greedy_pack, materialize_packs
    from eth2dgraph_spark.pipeline.text import token_count

    d = _t(spark, sf, "documents")
    packed = greedy_pack(token_count(d), budget=512, num_shards=4)
    seqs = materialize_packs(d, packed)
    return seqs.select(
        "pack_id",
        "n_docs",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("long").alias("text_len"),
    )


def q_pii_redact(spark, sf):  # PII scrubbing pass: deterministic synthetic
    # PII is injected in-query (the corpus text has none), then redaction
    # counts + redacted length gate the regexp semantics against DuckDB.
    # Only the regex classes whose Java-regex/RE2 behavior is identical
    # (email, ipv4) are gated; phone/card are unit-tested.
    d = _t(spark, sf, "documents")
    inject = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".7 today"),
    )
    aug = d.withColumn("text", F.when(F.col("doc_id") % 5 == 0, inject).otherwise(F.col("text")))
    pats = {k: v for k, v in text.PII_PATTERNS.items() if k in ("email", "ipv4")}
    r = text.redact_pii(aug, patterns=pats)
    return r.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_pii_total",
        F.length("text_redacted").cast("long").alias("redacted_len"),
    )


def q_decontam(spark, sf):  # benchmark decontamination: corpus docs sharing
    # >= 2 distinct 3-shingles with an eval set (here: the 3 lowest doc_ids),
    # benchmark side broadcast — no corpus-wide shuffle before the filter
    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") < 3)
    pairs = dedup.contamination_pairs(d, bench, k=3, min_overlap=2)
    return (
        pairs.filter(F.col("id") != F.col("bench_id"))
        .select(F.col("id").alias("doc_id"), "bench_id", "n_shared_shingles")
    )


def q_temperature_mix(spark, sf):  # pipeline: temperature-scaled source
    # mixing (XLM-R q_i ∝ p_i^alpha) solved into per-source sample rates.
    # lang is the skewed grouping on this testdata (en ~4x fr), so the
    # upweighting actually binds; budget=300 leaves some rates < 1.
    from eth2dgraph_spark.pipeline import split as split_mod

    out = split_mod.temperature_mix_rates(
        _t(spark, sf, "documents"), "lang", alpha=0.3, budget=300
    )
    return out.select(
        "lang", "n_docs", _r6e("p").alias("p"),
        _r6e("mix_weight").alias("mix_weight"),
        _r6e("sample_rate").alias("sample_rate"),
    )


def q_ohlc_bars(spark, sf):  # time-series OHLC downsampling: 5-minute
    # epoch-aligned bars per event_type; open/close deterministic via the
    # (ts, event_id, value) struct-extremum.
    from eth2dgraph_spark.operators.asof import ohlc_bars

    ev = _t(spark, sf, "events")
    out = ohlc_bars(
        ev, "5 minutes", key_cols=["event_type"], tiebreak_col="event_id"
    )
    return out.select(
        "event_type",
        F.date_format("bar_start", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        "open", "high", "low", "close", "n_events",
        _r6e("v_sum").alias("v_sum"),
    )


def q_ohlc_stream(spark, sf):  # the SAME OHLC bar aggregation PHYSICALLY
    # EXECUTED as a Structured Streaming query (file source -> tumbling
    # window -> availableNow -> complete-mode memory sink): struct-extremum
    # open/close and the whole bar shape are stream-safe declarative aggs,
    # so stream==batch against the identical ohlc_bars oracle.
    from eth2dgraph_spark.operators.asof import ohlc_bars
    from eth2dgraph_spark.sources.testdata import read_table_stream
    from eth2dgraph_spark.streaming.windows import execute_stream_to_batch

    ev = read_table_stream(spark, sf, "events")
    out = ohlc_bars(
        ev, "5 minutes", key_cols=["event_type"], tiebreak_col="event_id"
    ).select(
        "event_type",
        F.date_format("bar_start", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        "open", "high", "low", "close", "n_events",
        _r6e("v_sum").alias("v_sum"),
    )
    return execute_stream_to_batch(out)


def q_contam_stats(spark, sf):  # per-doc contamination fraction vs the
    # same 3-doc eval set as decontam (GPT-3 Appx C "dirty document"
    # statistic) — every corpus doc gets a row; bench side broadcast.
    d = _t(spark, sf, "documents")
    out = dedup.contamination_stats(d, d.filter(F.col("doc_id") < 3), k=3)
    return out.select(
        "doc_id", "n_shingles", "n_contaminated",
        _r6e("contaminated_frac").alias("contaminated_frac"),
    )


def q_corpus_pipeline(spark, sf):  # the composed training-data curation DAG:
    # exact-dedup -> quality floor -> lang ID -> token counts -> hash split,
    # reported per (lang, split). One dedup shuffle (16-byte digests), then
    # pure column math — the end-to-end shape of a pretraining-data job.
    from eth2dgraph_spark.pipeline.corpus import corpus_report, curate_corpus

    d = _t(spark, sf, "documents")
    return corpus_report(curate_corpus(d)).select(
        "lang_pred",
        "split",
        "n_docs",
        F.col("total_tokens_ws").cast("long").alias("total_tokens_ws"),
        F.col("total_tokens_bpe").cast("long").alias("total_tokens_bpe"),
    )


def q_incr_curate(spark, sf):  # incremental curation: the new batch
    # (doc_id >= 250) curated against the fingerprint history of everything
    # already ingested — the append-only refresh a production pipeline runs
    from eth2dgraph_spark.pipeline.corpus import curate_increment
    from eth2dgraph_spark.pipeline.text import fingerprint as fp

    d = _t(spark, sf, "documents")
    seen = fp(d.filter(F.col("doc_id") < 250)).select("fingerprint")
    newb = d.filter(F.col("doc_id") >= 250)
    return curate_increment(newb, seen).select("doc_id", "lang_pred", "n_tokens_ws", "split")


def q_incr_curate_bloom(spark, sf):  # the SAME increment as incr_curate but
    # routed through the Dolma-style Bloom screen (pipeline/bloom.py):
    # bloom-negative rows skip the history anti-join, positives fall back
    # to it. The oracle is incr_curate's verbatim — hash-matching it IS the
    # zero-false-drop proof, cross-engine. 2^16 bits/4 hashes over ~250
    # history fingerprints keeps a real (but tiny) positive sliver.
    from eth2dgraph_spark.pipeline.corpus import curate_increment
    from eth2dgraph_spark.pipeline.text import fingerprint as fp

    d = _t(spark, sf, "documents")
    seen = fp(d.filter(F.col("doc_id") < 250)).select("fingerprint")
    newb = d.filter(F.col("doc_id") >= 250)
    return curate_increment(
        newb, seen, bloom_num_bits=1 << 16, bloom_num_hashes=4
    ).select("doc_id", "lang_pred", "n_tokens_ws", "split")


def q_cms_topk(spark, sf):  # count-min + Misra-Gries sketch heavy hitters,
    # gated against the exact baseline (the approx_sketches pattern: sketch
    # internals differ across engines, so the deterministic output is the
    # exact top-20 plus flags that the sketch behaved — candidate coverage
    # and the CMS overestimate bound landing within tolerance)
    from eth2dgraph_spark.pipeline import sketch

    d = _t(spark, sf, "documents")
    toks_col = _ws_tokens()
    toks = d.select(F.explode(toks_col).alias("token"))
    approx, n_total = sketch.countmin_topk_and_total(toks, "token", k=64)
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )
    # CMS overshoot bound scales with total-count/width: tolerate 3 rows'
    # worth of expected collision mass (+1 slack for tiny inputs). The total
    # comes off the sketch itself (each row sums to N exactly), so the gate
    # makes 2 passes over the tokens (sketch + exact baseline), not 3.
    total = spark.createDataFrame([(n_total,)], "n_total long")
    joined = exact.crossJoin(F.broadcast(total)).join(approx, "token", "left")
    tol = F.ceil(F.lit(3.0) * F.col("n_total") / F.lit(sketch.DEFAULT_WIDTH)) + F.lit(1)
    return joined.select(
        "token",
        "freq",
        F.col("cms_est").isNotNull().alias("cand_ok"),
        (
            F.col("cms_est").isNotNull()
            & (F.col("cms_est") >= F.col("freq"))
            & (F.col("cms_est") <= F.col("freq") + tol)
        ).alias("est_ok"),
    )


def q_triangle_count(spark, sf):  # degree-oriented triangle counting over the
    # near-dup pair graph (orientation is perf-only; count is invariant, which
    # lets the simple-enumeration DuckDB oracle check the skew-safe algorithm)
    from eth2dgraph_spark.graph import triangle_count

    pairs = dedup.ngram_jaccard_pairs(_t(spark, sf, "documents"), k=3, threshold=0.02)
    return triangle_count(pairs.select("id_a", "id_b"), "id_a", "id_b")


def q_returned_revenue(spark, sf):  # TPC-H Q10 shape: wide group-by + top-k
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .agg(F.round(rev, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_top_supplier(spark, sf):  # TPC-H Q15 shape: grouped view + max-of-agg
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    srev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")), 2
        )
        .cast("double")
        .alias("total_revenue")
    )
    mx = srev.agg(F.max("total_revenue").alias("mx"))
    return (
        srev.join(F.broadcast(mx), srev["total_revenue"] == mx["mx"])
        .join(s, srev["sk"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_train_split(spark, sf):  # deterministic hash-based train/val/test split
    from eth2dgraph_spark.pipeline.split import hash_split

    return hash_split(_t(spark, sf, "documents")).select("doc_id", "split")


def q_stratified_split(spark, sf):  # exact per-stratum split proportions
    from eth2dgraph_spark.pipeline.split import stratified_split

    return stratified_split(_t(spark, sf, "documents"), "lang").select(
        "doc_id", "lang", "split"
    )


def q_cube_grouping(spark, sf):  # CUBE + grouping_id (grouping-sets surface)
    o = _t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


# ---------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's per-block gas stats (A1) on sf0.001."""
    return q_gas_stats(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order matters: the driver's CORRECTNESS gate certifies only
    # the FIRST 50 entries (in dict order). Round-12 window policy (VERDICT
    # r11 item 1 + the standing freshness rule): (a) the 7 gates NEW this
    # round (jpeg_luma, image_near_dups_jpeg — the stdlib JPEG codec
    # end-to-end; gif_luma, video_near_dups_gif — the stdlib GIF codec,
    # still + animated; image_dedup_stream — the pHash arm of the
    # incremental ingest stream; sssp_targeted — point-to-point early
    # stop; betweenness_landmarks — landmark Brandes); (b) the 4 whose
    # CODE
    # changed since their r11 driver row (image_near_dups — uncapped
    # banding, cap-parity fix; sssp_route — reconstruct_paths
    # malformed-tree guard; msf_edges/sl_clusters — MSF single-count round
    # + checkpoint_dir forwarding); (c) the full 35-gate r8-stale overflow
    # (fingerprint .. unigram_encode — last driver-certified in r8, the
    # oldest cohort, named at round 11's boundary); (d) the r9 cohort
    # fills the window — 4 of 41 fit (sliding_window .. window_ignore_nulls);
    # its 34-gate overflow (try_funcs onward) is round 13's leading
    # rotation target (named at the boundary below).
    # Every gate outside the window is re-verified locally this round via
    # tools/check_oracle.py at sf0.01 (full sweep recorded in BASELINE.md
    # round-12 notes).
    return {
        # --- round-13 window (entries 1-50) ---
        # Window policy (the standing freshness rule + VERDICT r12 item
        # 1): (a) the 3 gates NEW this round (flac_envelope /
        # audio_near_dups_flac — the stdlib FLAC codec end-to-end;
        # betweenness_weighted — weighted Brandes, closing the
        # centrality-family asymmetry); (b) the 7 whose CODE changed
        # since their last driver row (gif_luma / video_near_dups_gif —
        # RGB-compositing local-palette fix in functions/gif.py + the
        # repartition-before-synth pattern; video_near_dups /
        # image_near_dups — gate-level repartition + the
        # min_partitions engine floor; audio_near_dups /
        # audio_near_frames / audio_dedup_stream — audio_fingerprints'
        # engine floor + the fLaC magic-dispatch default decoder);
        # (c) the 3 r9 fills displaced from the r12 window by its new
        # gates (min_cost_lineitem, waiting_supplier, unpivot_metrics —
        # named at the r12 boundary); (d) the r9-cohort overflow in
        # registry order (try_funcs .. interface_jaccard, 37 of 40 —
        # last driver-certified in r9, the oldest cohort). The overflow
        # remainder (large_orders, length_histogram, minhash_signatures)
        # leads round 14's rotation (named at the boundary below).
        # Every gate outside the window is re-verified locally this
        # round via tools/check_oracle.py at sf0.01 (full sweep recorded
        # in BASELINE.md round-13 notes).
        # (a) NEW this round:
        "flac_envelope": q_flac_envelope,
        "audio_near_dups_flac": q_audio_near_dups_flac,
        "betweenness_weighted": q_betweenness_weighted,
        # (b) code changed since their last driver row:
        "gif_luma": q_gif_luma,
        "video_near_dups_gif": q_video_near_dups_gif,
        "video_near_dups": q_video_near_dups,
        "image_near_dups": q_image_near_dups,
        "audio_near_dups": q_audio_near_dups,
        "audio_near_frames": q_audio_near_frames,
        "audio_dedup_stream": q_audio_dedup_stream,
        # (c) r9 fills displaced from the r12 window:
        "min_cost_lineitem": q_min_cost_lineitem,
        "waiting_supplier": q_waiting_supplier,
        "unpivot_metrics": q_unpivot_metrics,
        # (d) the r9-cohort overflow, registry order (37 of 40):
        "try_funcs": q_try_funcs,
        "regexp_funcs": q_regexp_funcs,
        "date_funcs": q_date_funcs,
        "null_funcs": q_null_funcs,
        "explode_outer": q_explode_outer,
        "rep_stats": q_rep_stats,
        "segment_stats": q_segment_stats,
        "coreness_capped": q_coreness_capped,
        "small_qty_avg": q_small_qty_avg,
        "recent_part_suppliers": q_recent_part_suppliers,
        "bpe_merges": q_bpe_merges,
        "windowed_append": q_windowed_append,
        "market_share": q_market_share,
        "nation_profit": q_nation_profit,
        "stream_join": q_stream_join,
        "cluster_reps": q_cluster_reps,
        "script_profile": q_script_profile,
        "entropy_profile": q_entropy_profile,
        "wordpiece_encode": q_wordpiece_encode,
        "dedup_clusters": q_dedup_clusters,
        "lpa_communities": q_lpa_communities,
        "pagerank_ranks": q_pagerank_ranks,
        "khop_reach": q_khop_reach,
        "kcore_2rounds": q_kcore_2rounds,
        "modularity": q_modularity,
        "ann_topk": q_ann_topk,
        "approx_sketches": q_approx_sketches,
        "boilerplate_clean": q_boilerplate_clean,
        "boilerplate_stats": q_boilerplate_stats,
        "brand_supplier_count": q_brand_supplier_count,
        "cosine_ngram_pairs": q_cosine_ngram_pairs,
        "custdist": q_custdist,
        "decontam": q_decontam,
        "embedding_near_dups": q_embedding_near_dups,
        "heavy_hitters": q_heavy_hitters,
        "important_parts": q_important_parts,
        "interface_jaccard": q_interface_jaccard,
        # ================= 50-gate window boundary (entry 50 ends) =======
        # Round-14's leading rotation target: the r9-overflow remainder
        # (large_orders, length_histogram, minhash_signatures), then the
        # r10 cohort in prior registry order below.
        "jpeg_luma": q_jpeg_luma,
        "image_near_dups_jpeg": q_image_near_dups_jpeg,
        "image_dedup_stream": q_image_dedup_stream,
        "sssp_targeted": q_sssp_targeted,
        "betweenness_landmarks": q_betweenness_landmarks,
        "sssp_route": q_sssp_route,
        "msf_edges": q_msf_edges,
        "sl_clusters": q_sl_clusters,
        "fingerprint": q_fingerprint,
        "first_per_key": q_first_per_key,
        "format_roundtrips": q_format_roundtrips,
        "gas_stats": q_gas_stats,
        "gopher_rep": q_gopher_rep,
        "hll_distinct": q_hll_distinct,
        "incr_curate": q_incr_curate,
        "incr_curate_bloom": q_incr_curate_bloom,
        "int8_quant": q_int8_quant,
        "ivf_topk": q_ivf_topk,
        "json_extract": q_json_extract,
        "kmeans_centroids": q_kmeans_centroids,
        "lang_id": q_lang_id,
        "last_block": q_last_block,
        "lifetimes_rq1": q_lifetimes_rq1,
        "lifetimes_rq2": q_lifetimes_rq2,
        "lifetimes_rq3": q_lifetimes_rq3,
        "lifetimes_rq4": q_lifetimes_rq4,
        "pagination": q_pagination,
        "phash_bits": q_phash_bits,
        "pmi_phrases": q_pmi_phrases,
        "ppl_buckets": q_ppl_buckets,
        "pq_topk": q_pq_topk,
        "quality_score": q_quality_score,
        "rank_funcs": q_rank_funcs,
        "running_sum": q_running_sum,
        "semantic_dedup": q_semantic_dedup,
        "shard_assign": q_shard_assign,
        "source_kl": q_source_kl,
        "string_funcs": q_string_funcs,
        "tfidf_terms": q_tfidf_terms,
        "timestamp_funcs": q_timestamp_funcs,
        "token_count": q_token_count,
        "tumbling_window": q_tumbling_window,
        "unigram_encode": q_unigram_encode,
        "sliding_window": q_sliding_window,
        "map_funcs": q_map_funcs,
        "lateral_topk": q_lateral_topk,
        "window_ignore_nulls": q_window_ignore_nulls,
        "sssp_dists": q_sssp_dists,
        "sssp_paths": q_sssp_paths,
        "harmonic_landmarks": q_harmonic_landmarks,
        "cross_dedup_stream": q_cross_dedup_stream,
        "dsir_weights": q_dsir_weights,
        "filter_agg": q_filter_agg,
        "graph_degrees": q_graph_degrees,
        "interval_attach": q_interval_attach,
        "late_shipments": q_late_shipments,
        "lm_perplexity": q_lm_perplexity,
        "lm_perplexity_tri": q_lm_perplexity_tri,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_jaccard_capped": q_ngram_jaccard_capped,
        "ohlc_bars": q_ohlc_bars,
        "ohlc_stream": q_ohlc_stream,
        "parts_top_per_brand": q_parts_top_per_brand,
        "percentiles": q_percentiles,
        "posexplode_tokens": q_posexplode_tokens,
        "promo_revenue": q_promo_revenue,
        "quality_clf": q_quality_clf,
        "range_frame": q_range_frame,
        "rollup": q_rollup,
        "rrf_hybrid": q_rrf_hybrid,
        "segment_pivot": q_segment_pivot,
        "semi_join": q_semi_join,
        "session_count": q_session_count,
        "set_ops": q_set_ops,
        "string_agg": q_string_agg,
        "substring_clean": q_substring_clean,
        "substring_keep_first": q_substring_keep_first,
        "substring_stats": q_substring_stats,
        "temperature_mix": q_temperature_mix,
        "value_window": q_value_window,
        "windowed_stream": q_windowed_stream,
        "winnow_fp": q_winnow_fp,
        "winnow_overlap": q_winnow_overlap,
        "array_funcs": q_array_funcs,
        "corpus_pipeline": q_corpus_pipeline,
        "dedup_stream": q_dedup_stream,
        "domain_cap": q_domain_cap,
        "embedding_cosine": q_embedding_cosine,
        "embedding_topk": q_embedding_topk,
        "event_gaps": q_event_gaps,
        "events_extrema": q_events_extrema,
        "large_orders": q_large_orders,
        "length_histogram": q_length_histogram,
        "minhash_signatures": q_minhash_signatures,
        "wav_envelope": q_wav_envelope,
        "avi_luma": q_avi_luma,
        "hits_scores": q_hits_scores,
        "line_profile": q_line_profile,
        "ppr_ranks": q_ppr_ranks,
        "asset_cluster_reps": q_asset_cluster_reps,
        "video_near_frames": q_video_near_frames,
        "cross_dedup": q_cross_dedup,
        "token_mix": q_token_mix,
        "byte_kernel_fixture": q_byte_kernel_fixture,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "motif_paths": q_motif_paths,
        "nation_flows": q_nation_flows,
        "order_priority": q_order_priority,
        "pack_texts": q_pack_texts,
        "percentile_disc": q_percentile_disc,
        "pii_redact": q_pii_redact,
        "pricing_summary": q_pricing_summary,
        "region_revenue": q_region_revenue,
        "returned_revenue": q_returned_revenue,
        "seq_pack": q_seq_pack,
        "shipping_priority": q_shipping_priority,
        "simhash": q_simhash,
        "simhash_dup_groups": q_simhash_dup_groups,
        "simhash_near_pairs": q_simhash_near_pairs,
        "small_qty_revenue": q_small_qty_revenue,
        "source_mix": q_source_mix,
        "stratified_split": q_stratified_split,
        "top_balance_idle": q_top_balance_idle,
        "top_supplier": q_top_supplier,
        "train_split": q_train_split,
        "triangle_count": q_triangle_count,
        "anti_join": q_anti_join,
        "argmax_customer": q_argmax_customer,
        "asof_attach": q_asof_attach,
        "bm25_topk": q_bm25_topk,
        "bool_aggs": q_bool_aggs,
        "bpe_encode": q_bpe_encode,
        "cms_topk": q_cms_topk,
        "contam_stats": q_contam_stats,
        "corr_stats": q_corr_stats,
        "cosine_one_vs_all": q_cosine_one_vs_all,
        "cube_grouping": q_cube_grouping,
        "dedup_exact": q_dedup_exact,
        "disjunctive_filter": q_disjunctive_filter,
        "dsir_select": q_dsir_select,
    }


def q_bpe_tokens(spark, sf):  # bench-only: BPE tokenizer train + encode.
    # Iterative by nature (each merge depends on the previous argmax), so
    # no ANSI-SQL oracle exists; correctness is pinned by the pure-Python
    # reference comparison in tests/test_bpe.py. 24 merges keeps the
    # bench's job count bounded while still exercising multi-round
    # checkpointed training plus the vocab-encode join.
    from eth2dgraph_spark.pipeline import bpe

    d = _t(spark, sf, "documents")
    merges = bpe.bpe_train(d, num_merges=24)
    return bpe.bpe_token_counts(d, merges)


def bench_only_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries bench.py times but the oracle gate skips: kernels whose
    semantics aren't DuckDB-expressible (keccak, CBOR; iterative BPE
    training) and are instead golden-tested byte-for-byte in
    tests/test_kernels.py / reference-compared in tests/test_bpe.py."""
    return {
        "byte_kernels": q_byte_kernels,
        "bpe_tokens": q_bpe_tokens,
    }


# ---------------------------------------------------------------- oracles

_NORM = r"regexp_replace(lower(trim(text)),'\s+',' ','g')"
_SHINGLES_CTE = (
    "toks AS (SELECT doc_id AS id, string_split(" + _NORM + ", ' ') AS w FROM documents), "
    "sh AS (SELECT DISTINCT id, array_to_string(w[i.i:i.i+2],' ') AS shingle "
    "FROM toks, UNNEST(range(1, greatest(len(w)-2,1)+1)) AS i(i))"
)

_STOPS_ALL = "['the','and','of','to','a','der','die','und','das','ist','le','la','et','les','des','el','que','de','los']"
_LANG_STOPS = {
    "en": "['the','and','of','to','a']",
    "de": "['der','die','und','das','ist']",
    "fr": "['le','la','et','les','des']",
    "es": "['el','la','que','de','los']",
}


def _minhash_oracle() -> str:
    p = 2147483647
    cols = []
    for i in range(8):
        a = 2 * i + 1
        b = 104729 * (i + 1) % p
        cols.append(f"CAST(min((x*{a}+{b})%{p}) AS BIGINT) AS h{i}")
    return (
        f"WITH {_SHINGLES_CTE}, "
        f"hx AS (SELECT id, ('0x'||substr(md5(shingle),1,15))::BIGINT % {p} AS x FROM sh) "
        f"SELECT id, {', '.join(cols)} FROM hx GROUP BY id"
    )


def _simhash_oracle() -> str:
    sums = ", ".join(
        f"CAST(sum(CASE WHEN (hh >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS b{i}"
        for i in range(60)
    )
    bits = " + ".join(f"(CASE WHEN b{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(60))
    return (
        "WITH toks AS (SELECT doc_id AS id, unnest(string_split(" + _NORM + ", ' ')) AS wd FROM documents), "
        "h AS (SELECT id, ('0x'||substr(md5(wd),1,15))::BIGINT AS hh FROM toks), "
        f"v AS (SELECT id, {sums} FROM h GROUP BY id) "
        f"SELECT id, CAST({bits} AS BIGINT) AS simhash FROM v"
    )


def _minhash_cross_sql(new_sql: str, hist_sql: str, threshold: float) -> str:
    """Parametrized DuckDB replica of minhash_cross_pairs over arbitrary
    (doc_id, text) corpus subqueries: signatures on BOTH corpora (same
    affine family), bipartite band-equality candidates, exact Jaccard
    verification — the _minhash_lsh_oracle construction with two sides."""
    p = 2147483647
    cols = []
    for i in range(32):
        a = 2 * i + 1
        b = 104729 * (i + 1) % p
        cols.append(f"CAST(min((x*{a}+{b})%{p}) AS BIGINT) AS h{i}")
    band_clauses = []
    for bnd in range(8):
        band_clauses.append(
            "(" + " AND ".join(f"n.h{i}=h.h{i}" for i in range(bnd * 4, bnd * 4 + 4)) + ")"
        )
    norm = _NORM
    shingles = (
        "toks_{s} AS (SELECT doc_id AS id, string_split(" + norm + ", ' ') AS w "
        "FROM {src}), "
        "sh_{s} AS (SELECT DISTINCT id, array_to_string(w[i.i:i.i+2],' ') AS shingle "
        "FROM toks_{s}, UNNEST(range(1, greatest(len(w)-2,1)+1)) AS i(i))"
    )
    return f"""
        WITH newdocs AS ({new_sql}),
        histdocs AS ({hist_sql}),
        {shingles.format(s="h", src="histdocs")},
        {shingles.format(s="n", src="newdocs")},
        hx_h AS (SELECT id, ('0x'||substr(md5(shingle),1,15))::BIGINT % {p} AS x FROM sh_h),
        hx_n AS (SELECT id, ('0x'||substr(md5(shingle),1,15))::BIGINT % {p} AS x FROM sh_n),
        sig_h AS (SELECT id, {', '.join(cols)} FROM hx_h GROUP BY id),
        sig_n AS (SELECT id, {', '.join(cols)} FROM hx_n GROUP BY id),
        cand AS (SELECT DISTINCT n.id AS new_id, h.id AS hist_id
                 FROM sig_n n JOIN sig_h h ON ({' OR '.join(band_clauses)})),
        sz_h AS (SELECT id, count(*)::BIGINT AS sz FROM sh_h GROUP BY id),
        sz_n AS (SELECT id, count(*)::BIGINT AS sz FROM sh_n GROUP BY id),
        inter AS (SELECT c.new_id, c.hist_id, count(*)::BIGINT AS i
                  FROM cand c JOIN sh_n sa ON sa.id = c.new_id
                       JOIN sh_h sb ON sb.id = c.hist_id AND sa.shingle = sb.shingle
                  GROUP BY c.new_id, c.hist_id)
        SELECT new_id, hist_id, round(j + 1e-9, 6) AS jaccard FROM (
            SELECT new_id, hist_id, CAST(i AS DOUBLE)/(sn.sz+sh2.sz-i) AS j
            FROM inter JOIN sz_n sn ON sn.id=new_id JOIN sz_h sh2 ON sh2.id=hist_id)
        WHERE j >= {threshold}"""


def _minhash_cross_oracle(threshold: float = 0.5) -> str:
    """The cross_dedup gate's corpora: synthetic new batch vs the documents
    history."""
    return _minhash_cross_sql(
        """SELECT doc_id + 100000 AS doc_id, text || ' zzz extra token' AS text
            FROM documents WHERE doc_id < 50
            UNION ALL
            SELECT doc_id + 200000, md5(text) FROM documents WHERE doc_id >= 450""",
        "SELECT doc_id, text FROM documents",
        threshold,
    )


_CROSS_B1_SQL = """SELECT doc_id + 100000 AS doc_id, text || ' zzz extra token' AS text
            FROM documents WHERE doc_id < 25
            UNION ALL
            SELECT doc_id + 200000, md5(text)
            FROM documents WHERE doc_id >= 450 AND doc_id < 475"""

_CROSS_B2_SQL = """SELECT doc_id + 100000 AS doc_id, text || ' zzz extra token' AS text
            FROM documents WHERE doc_id >= 25 AND doc_id < 50
            UNION ALL
            SELECT doc_id + 200000, md5(text) FROM documents WHERE doc_id >= 475
            UNION ALL
            SELECT doc_id + 300000, text || ' zzz extra token qqq'
            FROM documents WHERE doc_id < 5"""


def _minhash_cross_stream_oracle(threshold: float = 0.5) -> str:
    """cross_dedup_stream's incremental semantics in closed form:
    pairs(B1, H0) ∪ pairs(B2, H0 ∪ B1) — batch 2 sees batch 1 as history."""
    q1 = _minhash_cross_sql(
        _CROSS_B1_SQL, "SELECT doc_id, text FROM documents", threshold
    )
    q2 = _minhash_cross_sql(
        _CROSS_B2_SQL,
        f"SELECT doc_id, text FROM documents UNION ALL {_CROSS_B1_SQL}",
        threshold,
    )
    return f"SELECT * FROM ({q1}) UNION ALL SELECT * FROM ({q2})"


def _minhash_lsh_oracle() -> str:
    """DuckDB replica of the full MinHash+LSH pipeline (k=3, 32 hashes,
    8 bands of 4): same md5-60 shingle hash, same affine minhash family,
    band-slice-equality candidates (the Spark side keys bands on the raw
    4-long slice, so equality here is the identical candidate set), exact
    Jaccard verification over distinct shingles."""
    p = 2147483647
    cols = []
    for i in range(32):
        a = 2 * i + 1
        b = 104729 * (i + 1) % p
        cols.append(f"CAST(min((x*{a}+{b})%{p}) AS BIGINT) AS h{i}")
    band_clauses = []
    for bnd in range(8):
        band_clauses.append(
            "(" + " AND ".join(f"a.h{i}=b.h{i}" for i in range(bnd * 4, bnd * 4 + 4)) + ")"
        )
    return f"""
        WITH {_SHINGLES_CTE},
        hx AS (SELECT id, ('0x'||substr(md5(shingle),1,15))::BIGINT % {p} AS x FROM sh),
        sig AS (SELECT id, {', '.join(cols)} FROM hx GROUP BY id),
        cand AS (SELECT a.id AS id_a, b.id AS id_b FROM sig a JOIN sig b
                 ON a.id < b.id AND ({' OR '.join(band_clauses)})),
        sz AS (SELECT id, count(*)::BIGINT AS sz FROM sh GROUP BY id),
        inter AS (SELECT c.id_a, c.id_b, count(*)::BIGINT AS i
                  FROM cand c JOIN sh sa ON sa.id = c.id_a
                       JOIN sh sb ON sb.id = c.id_b AND sa.shingle = sb.shingle
                  GROUP BY c.id_a, c.id_b)
        SELECT id_a, id_b, round(j + 1e-9, 6) AS jaccard FROM (
            SELECT id_a, id_b, CAST(i AS DOUBLE)/(sa.sz+sb.sz-i) AS j
            FROM inter JOIN sz sa ON sa.id=id_a JOIN sz sb ON sb.id=id_b)
        WHERE j >= 0.05"""


def _ann_topk_oracle(dim: int = 64, num_planes: int = 6, k: int = 10) -> str:
    """DuckDB replica of random-hyperplane LSH top-k: the xorshift64 plane
    constants are emitted as SQL literals, the sign-bucket join and the
    in-bucket cosine re-rank mirror lsh_topk. Dot products are written as
    explicit left-to-right sums so the IEEE result (and therefore bucket
    signs and tie-breaks) is bit-identical to Spark's aggregate() fold."""
    from eth2dgraph_spark.pipeline.similarity_search import _hyperplanes

    planes = _hyperplanes(dim, num_planes)

    def dot_plane(vec, plane):
        return " + ".join(f"{vec}[{j + 1}]*({plane[j]!r})" for j in range(dim))

    def dot_vv(va, vb):
        return " + ".join(f"{va}[{j + 1}]*{vb}[{j + 1}]" for j in range(dim))

    bucket = " + ".join(
        f"(CASE WHEN {dot_plane('v', planes[i])} > 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(num_planes)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (SELECT vec_id, v, ({bucket}) AS bucket FROM e),
        q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5),
        s AS (SELECT q.query_id, b.vec_id,
                     ({dot_vv('b.v', 'q.qv')}) /
                     (sqrt({dot_vv('b.v', 'b.v')}) * sqrt({dot_vv('q.qv', 'q.qv')})) AS c
              FROM b JOIN q ON b.bucket = q.bucket),
        r AS (SELECT query_id, vec_id, c,
                     row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id)::BIGINT AS rank
              FROM s)
        SELECT query_id, vec_id, round(c + 1e-9, 6) AS cosine, rank FROM r WHERE rank <= {k}"""


def _kmeans_oracle(nlist: int = 4) -> str:
    """DuckDB replica of similarity_search.ivf_index(nlist, iters=2):
    init = the nlist lowest STRING-ordered vec_ids' vectors; per round,
    assign by squared-L2 argmin (list_id tie-break) with the distance
    accumulated left-to-right exactly like the Spark zip_with fold, then
    per-dimension mean with empty lists keeping their previous centroid."""

    def assign(cent: str, out: str) -> str:
        return f"""{out}_rn AS (
          SELECT e.id, e.v, c.list_id,
                 row_number() OVER (PARTITION BY e.id ORDER BY
                   list_sum(list_transform(range(1, len(e.v) + 1),
                            i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))),
                   c.list_id) AS rn
          FROM e CROSS JOIN {cent} c),
        {out} AS (SELECT id, v, list_id FROM {out}_rn WHERE rn = 1)"""

    def update(assigned: str, prev: str, out: str) -> str:
        return f"""{out}_d AS (
          SELECT list_id, i.i AS pos, avg(v[i.i]) AS x
          FROM {assigned}, UNNEST(range(1, len(v) + 1)) AS i(i)
          GROUP BY list_id, i.i),
        {out}_a AS (SELECT list_id, array_agg(x ORDER BY pos) AS c
                    FROM {out}_d GROUP BY list_id),
        {out} AS (SELECT p.list_id, COALESCE(a.c, p.c) AS c
                  FROM {prev} p LEFT JOIN {out}_a a USING (list_id))"""

    return f"""
        WITH e AS (SELECT CAST(vec_id AS VARCHAR) AS id,
                          CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        init AS (SELECT row_number() OVER (ORDER BY id) - 1 AS list_id, v AS c
                 FROM e ORDER BY id LIMIT {nlist}),
        {assign('init', 'a1')},
        {update('a1', 'init', 'c1')},
        {assign('c1', 'a2')},
        {update('a2', 'c1', 'c2')}
        SELECT list_id, i.i - 1 AS pos, round(c[i.i] + 1e-9, 6) AS x
        FROM c2, UNNEST(range(1, len(c) + 1)) AS i(i)"""


def _phash_oracle(hash_size: int = 4, dct_size: int = 8) -> str:
    """DuckDB replica of multimodal.phash_from_arrays at the gate's pinned
    shape: the identical orthonormal DCT-II basis (constants serialized at
    17 significant digits so both engines parse the same doubles),
    coefficients rounded 6dp tie-nudged before the median (average of the
    two middle sorted values, numpy's even-count rule) and the strict >
    compare; bit i (row-major u*hash_size+v) contributes 2^i."""
    import numpy as np

    from eth2dgraph_spark.pipeline.multimodal import _dct_matrix

    m = _dct_matrix(dct_size)
    mm = "[" + ", ".join(
        "[" + ", ".join("CAST({:.17g} AS DOUBLE)".format(v) for v in row) + "]"
        for row in m
    ) + "]"
    hs, n = hash_size, dct_size
    nb = hs * hs
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        c AS (
          SELECT vec_id,
                 list_transform(range({nb}), uv ->
                   round(list_sum(list_transform(range({n}), x ->
                     {mm}[uv // {hs} + 1][x + 1]
                     * list_sum(list_transform(range({n}), y ->
                         v[x * {n} + y + 1] * {mm}[uv % {hs} + 1][y + 1]))))
                   + 1e-9, 6)) AS coefs
          FROM e),
        md AS (SELECT vec_id, coefs,
                      (list_sort(coefs)[{nb // 2}] + list_sort(coefs)[{nb // 2 + 1}])
                        / 2.0 AS med
               FROM c)
        SELECT vec_id,
               list_sum(list_transform(range({nb}),
                 i -> CASE WHEN coefs[i + 1] > med
                           THEN 1 << i ELSE 0 END))::BIGINT AS phash
        FROM md"""


def _unigram_encode_oracle(max_len: int = 4) -> str:
    """DuckDB replica of unigram.unigram_token_counts under the pinned
    piece table: per distinct word a recursive CTE runs the identical
    Viterbi DP (carry the dp score/n_pieces prefix as LISTS, extend one
    position per iteration; candidates compared by score desc then
    n_pieces asc — the kernel's exact tie-break, with identical operand
    order so the doubles agree bitwise), then the stats join back to the
    exploded corpus and aggregate per doc. Unsegmentable words carry
    (NULL score, 0 pieces), matching the kernel's OOV contract."""
    ps = ", ".join("'{}'".format(p) for p, _ in _UNIGRAM_PIECES_PIN)
    lps = ", ".join("CAST({!r} AS DOUBLE)".format(lp) for _, lp in _UNIGRAM_PIECES_PIN)
    return f"""
        WITH RECURSIVE
        pieces AS (SELECT MAP([{ps}], [{lps}]) AS m),
        toks AS (SELECT doc_id, list_filter(string_split({_NORM}, ' '),
                                            x -> len(x) > 0) AS ws
                 FROM documents),
        occ AS (SELECT doc_id, unnest(ws) AS word FROM toks),
        words AS (SELECT DISTINCT word FROM occ),
        dp AS (
          SELECT word, 0 AS k, [CAST(0.0 AS DOUBLE)] AS scores, [0] AS ns
          FROM words
          UNION ALL
          SELECT word, k + 1,
                 list_append(scores, best.s),
                 list_append(ns, COALESCE(best.n, 0))
          FROM (
            SELECT word, k, scores, ns,
                   CASE WHEN len(cands) = 0 THEN NULL
                        ELSE list_reduce(cands,
                          (a, b) -> CASE WHEN b.s > a.s
                                          OR (b.s = a.s AND b.n < a.n)
                                    THEN b ELSE a END)
                   END AS best
            FROM (
              SELECT word, k, scores, ns,
                     list_filter(
                       list_transform(range(greatest(0, k + 1 - {max_len}), k + 1),
                         j -> CASE WHEN scores[j + 1] IS NOT NULL
                                    AND map_extract(m, substr(word, j + 1, k + 1 - j))[1]
                                        IS NOT NULL
                              THEN {{s: scores[j + 1]
                                       + CAST(map_extract(m,
                                           substr(word, j + 1, k + 1 - j))[1] AS DOUBLE),
                                    n: ns[j + 1] + 1}}
                              END),
                       x -> x IS NOT NULL) AS cands
              FROM dp, pieces
              WHERE k < len(word)
            )
          )
        ),
        enc AS (SELECT word, scores[len(word) + 1] AS logp,
                       CASE WHEN scores[len(word) + 1] IS NULL THEN 0
                            ELSE ns[len(word) + 1] END AS n_pieces
                FROM dp WHERE k = len(word)),
        agg AS (SELECT o.doc_id, count(*) AS n_words,
                       sum(e.n_pieces)::BIGINT AS n_pieces,
                       sum(e.logp) AS logp_sum
                FROM occ o JOIN enc e USING (word)
                GROUP BY o.doc_id)
        SELECT t.doc_id, COALESCE(a.n_words, 0)::BIGINT AS n_words,
               COALESCE(a.n_pieces, 0)::BIGINT AS n_pieces,
               round(a.logp_sum + 1e-9, 6) AS logp_sum
        FROM toks t LEFT JOIN agg a USING (doc_id)"""


def _hll_oracle(p: int = 8) -> str:
    """DuckDB replica of hll.hll_count_distinct at 2^p registers: the same
    md5-60bit hash, register = h mod m, rho via bin-string length (exact —
    both engines strip leading zeros), per-register max, the EXACT-integer
    scaled harmonic sum (HUGEINT here, DECIMAL(38,0) on the Spark side),
    and the identical one-division estimate with the published linear-
    counting small-range branch. The alpha*m^2*2^61 numerator is inlined
    as the SAME Python float literal both engines parse to one double."""
    m = 1 << p
    wbits1 = 60 - p + 1  # rho for w=0; rho(w>0) = wbits1 - length(bin(w))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numer = repr(alpha * m * m * float(1 << 61))
    est = (
        f"CASE WHEN ({numer} / s) <= {2.5 * m!r} AND ({m} - hit) > 0 "
        f"THEN {float(m)!r} * ln({float(m)!r} / ({m} - hit)::DOUBLE) "
        f"ELSE {numer} / s END"
    )

    def arm(col: str, tag: str) -> str:
        return f"""
        h_{tag} AS (SELECT event_type,
                    ('0x'||substr(md5({col}::VARCHAR),1,15))::BIGINT AS h
             FROM events WHERE {col} IS NOT NULL),
        r_{tag} AS (SELECT event_type, (h % {m}) AS register,
                    CASE WHEN (h >> {p}) = 0 THEN {wbits1}
                         ELSE {wbits1} - length(bin(h >> {p})) END AS rho
             FROM h_{tag}),
        m_{tag} AS (SELECT event_type, register, max(rho) AS rho
             FROM r_{tag} GROUP BY 1, 2),
        g_{tag} AS (SELECT event_type,
                    (sum((1::BIGINT << (61 - rho))::HUGEINT)
                     + ({m} - count(*))::HUGEINT
                       * (1::BIGINT << 61)::HUGEINT)::DOUBLE AS s,
                    count(*) AS hit
             FROM m_{tag} GROUP BY 1),
        e_{tag} AS (SELECT event_type, round(({est}) + 1e-9, 6) AS est,
                    hit, ({m} - hit) AS zero
             FROM g_{tag})"""

    return f"""
        WITH {arm("event_id", "i")}, {arm("user_id", "u")},
        x AS (SELECT event_type, count(DISTINCT event_id)::BIGINT AS exact_ids,
                     count(DISTINCT user_id)::BIGINT AS exact_users
              FROM events GROUP BY 1)
        SELECT e_i.event_type, e_i.est AS est_ids, e_i.hit::BIGINT AS hit_ids,
               e_u.est AS est_users, e_u.zero::BIGINT AS zero_users,
               exact_ids, exact_users
        FROM e_i JOIN e_u USING (event_type) JOIN x USING (event_type)"""


def _gopher_rep_oracle(top_ns=(2, 3, 4), dup_ns=(5, 6)) -> str:
    """DuckDB replica of text.ngram_repetition_fractions: per n, windows
    from UNNEST(range) (empty below n words — matching _with_ngrams' []),
    an (id, gram) count, then the struct-min argmax for the top fraction
    (lexicographic tie-break mirrored) and the per-occurrence duplicated-
    chars sum. Non-space gram length == summed word lengths."""
    ctes = [
        f"""toks AS (SELECT doc_id AS id,
                 list_filter(string_split({_NORM}, ' '),
                             x -> len(x) > 0) AS ws
          FROM documents)""",
        """base AS (SELECT id,
                 length(array_to_string(ws, ''))::DOUBLE AS total
          FROM toks)""",
    ]
    joins, cols = [], []
    for n in sorted(set(top_ns) | set(dup_ns)):
        ctes.append(
            f"""g{n} AS (SELECT id, array_to_string(ws[i.i:i.i+{n - 1}], ' ') AS g
              FROM toks,
                   UNNEST(range(1, greatest(len(ws)-{n}+1, 0)+1)) AS i(i)),
        c{n} AS (SELECT id, g, count(*)::DOUBLE AS cnt,
                        length(replace(g, ' ', ''))::DOUBLE AS gc
                 FROM g{n} GROUP BY id, g),
        a{n} AS (SELECT id,
                        (min({{'nc': -cnt, 'g': g,
                               'chars': cnt*gc}})).chars AS topchars,
                        sum(CASE WHEN cnt >= 2 THEN cnt*gc
                                 ELSE 0.0 END) AS dupchars
                 FROM c{n} GROUP BY id)"""
        )
        joins.append(f"LEFT JOIN a{n} USING (id)")
        if n in top_ns:
            cols.append(
                f"round(coalesce(a{n}.topchars, 0.0)"
                f" / greatest(total, 1.0) + 1e-9, 6) AS top{n}_frac"
            )
    for n in sorted(dup_ns):
        cols.append(
            f"round(coalesce(a{n}.dupchars, 0.0)"
            f" / greatest(total, 1.0) + 1e-9, 6) AS dup{n}_frac"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + " SELECT id AS doc_id, total::BIGINT AS n_chars, "
        + ", ".join(cols)
        + " FROM base "
        + " ".join(joins)
    )


def _wordpiece_encode_oracle() -> str:
    """DuckDB replica of wordpiece_token_counts under the pinned piece
    table: greedy longest-match-first per distinct word as a recursive CTE
    — at each position, candidates = pinned pieces whose continuation flag
    matches (pos > 0) and whose raw content prefixes the remainder; take
    the longest (exactly one exists per length, so list_filter to the max
    length and take [1]); no candidate anywhere -> the whole word is
    [UNK]. Per-doc reassembly via string_agg ORDER BY token position,
    md5-compared — the same rebuilt-sequence discipline as pack_texts."""
    vl = ", ".join(
        "{{'p': '{p}', 'raw': '{r}', 'cont': {c}}}".format(
            p=p,
            r=p[2:] if p.startswith("##") else p,
            c="true" if p.startswith("##") else "false",
        )
        for p, _ in _WORDPIECE_PIECES_PIN
    )
    return f"""
        WITH RECURSIVE
        v AS (SELECT [{vl}] AS vl),
        toks AS (SELECT doc_id, list_filter(string_split({_NORM}, ' '),
                                            x -> len(x) > 0) AS ws
                 FROM documents),
        occ AS (SELECT doc_id, unnest(ws) AS word,
                       generate_subscripts(ws, 1) AS pos
                FROM toks),
        words AS (SELECT DISTINCT word FROM occ),
        steps AS (
          SELECT word, 0 AS wpos, CAST([] AS VARCHAR[]) AS pieces,
                 false AS failed
          FROM words
          UNION ALL
          SELECT word,
                 CASE WHEN ml IS NULL THEN length(word)
                      ELSE wpos + ml END AS wpos,
                 CASE WHEN ml IS NULL THEN ['[UNK]']
                      ELSE list_append(pieces,
                             list_filter(c0,
                               x -> length(x.raw) = ml)[1].p) END AS pieces,
                 failed OR ml IS NULL AS failed
          FROM (
            SELECT word, wpos, pieces, failed, c0,
                   list_max(list_transform(c0, y -> length(y.raw))) AS ml
            FROM (
              SELECT s.word, s.wpos, s.pieces, s.failed,
                     list_filter(v.vl, x -> x.cont = (s.wpos > 0)
                       AND substr(s.word, s.wpos + 1,
                                  length(x.raw)) = x.raw) AS c0
              FROM steps s, v
              WHERE s.wpos < length(s.word) AND NOT s.failed
            )
          )
        ),
        enc AS (SELECT word, array_to_string(pieces, ' ') AS ptxt,
                       len(pieces)::BIGINT AS n_tokens,
                       failed AS is_unk
                FROM steps WHERE wpos >= length(word))
        SELECT t.doc_id, count(o.word)::BIGINT AS n_words,
               coalesce(sum(e.n_tokens), 0)::BIGINT AS n_pieces,
               coalesce(sum(CASE WHEN e.is_unk THEN 1 ELSE 0 END), 0)::BIGINT
                 AS n_unk_words,
               md5(coalesce(string_agg(e.ptxt, ' ' ORDER BY o.pos), ''))
                 AS pieces_md5
        FROM toks t
        LEFT JOIN occ o USING (doc_id)
        LEFT JOIN enc e USING (word)
        GROUP BY t.doc_id"""


def _coreness_oracle(max_k: int = 4, rounds: int = 2) -> str:
    """Unrolled layered-peeling replica of coreness(max_k, rounds_per_layer)
    on the customer-supplier graph: per layer k, `rounds` fixed peel blocks
    (degree agg + both-endpoint membership filter — the kcore_2rounds
    block); each layer's dropped node set labels k-1, survivors of the
    last layer label max_k."""
    parts = [
        "e AS (SELECT DISTINCT least('c' || o_custkey, 's' || l_suppkey) AS u, "
        "greatest('c' || o_custkey, 's' || l_suppkey) AS v "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)",
        "a1 AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)",
        "s1 AS (SELECT DISTINCT u FROM a1)",
    ]
    prev = "a1"
    for k in range(2, max_k + 1):
        for r in range(1, rounds + 1):
            d, kk, a = f"d{k}_{r}", f"k{k}_{r}", f"a{k}_{r}"
            parts.append(f"{d} AS (SELECT u, count(*) AS deg FROM {prev} GROUP BY u)")
            parts.append(f"{kk} AS (SELECT u FROM {d} WHERE deg >= {k})")
            parts.append(
                f"{a} AS (SELECT t.u, t.v FROM {prev} t "
                f"WHERE t.u IN (SELECT u FROM {kk}) "
                f"AND t.v IN (SELECT u FROM {kk}))"
            )
            prev = a
        parts.append(f"s{k} AS (SELECT DISTINCT u FROM {prev})")
    selects = [
        f"SELECT u AS node, {k}::BIGINT AS coreness FROM s{k} "
        f"WHERE u NOT IN (SELECT u FROM s{k + 1})"
        for k in range(1, max_k)
    ]
    selects.append(f"SELECT u AS node, {max_k}::BIGINT AS coreness FROM s{max_k}")
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(selects)


def _pq_topk_oracle(m: int = 8, dsub: int = 8, ksub: int = 8, k: int = 10) -> str:
    """DuckDB replica of pq.pq_topk under the pinned iters=0 codebook:
    init = first-ksub STRING-ordered vec_ids' vectors sliced per subspace
    (the _kmeans_oracle init rule), encode = per-(vec, sub) squared-L2
    argmin with code tie-break and the distance accumulated left-to-right
    like the Spark zip_with fold, ADC = sum of the per-subspace LUT
    entries, ranked on the tie-nudged 6dp score with ascending-id ties."""
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        init AS (SELECT row_number() OVER (ORDER BY CAST(vec_id AS VARCHAR)) - 1
                        AS code, v
                 FROM e ORDER BY CAST(vec_id AS VARCHAR) LIMIT {ksub}),
        subs AS (SELECT unnest(range({m})) AS sub),
        cb AS (SELECT s.sub, i.code,
                      i.v[s.sub * {dsub} + 1 : s.sub * {dsub} + {dsub}] AS c
               FROM init i CROSS JOIN subs s),
        sv AS (SELECT e.vec_id, s.sub,
                      e.v[s.sub * {dsub} + 1 : s.sub * {dsub} + {dsub}] AS sv
               FROM e CROSS JOIN subs s),
        enc_rn AS (
          SELECT sv.vec_id, sv.sub, cb.code,
                 row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
                   list_sum(list_transform(range(1, {dsub} + 1),
                            i -> (sv.sv[i] - cb.c[i]) * (sv.sv[i] - cb.c[i]))),
                   cb.code) AS rn
          FROM sv JOIN cb ON sv.sub = cb.sub),
        enc AS (SELECT vec_id, sub, code FROM enc_rn WHERE rn = 1),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 97 = 0),
        lut AS (SELECT q.qid, cb.sub, cb.code,
                       list_sum(list_transform(range(1, {dsub} + 1),
                         i -> (q.qv[cb.sub * {dsub} + i] - cb.c[i])
                            * (q.qv[cb.sub * {dsub} + i] - cb.c[i]))) AS d2
                FROM q CROSS JOIN cb),
        scored AS (SELECT l.qid, enc.vec_id, sum(l.d2) AS s
                   FROM enc JOIN lut l ON enc.sub = l.sub AND enc.code = l.code
                   GROUP BY l.qid, enc.vec_id),
        ranked AS (SELECT qid, vec_id, round(s + 1e-9, 6) AS adc_d2,
                          row_number() OVER (PARTITION BY qid
                            ORDER BY round(s + 1e-9, 6), vec_id) AS rank
                   FROM scored)
        SELECT qid AS query_id, vec_id, adc_d2, rank
        FROM ranked WHERE rank <= {k}"""


def _bm25_oracle(k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB replica of retrieval.bm25_topk over the literal query
    workload: distinct query terms, tf per (doc, term) restricted to
    them, df per term, N/avgdl over ALL docs, Lucene idf, rank on the
    tie-nudged 6dp-rounded score with ascending-id tie-break."""
    vals = ", ".join("({}, '{}')".format(i, t) for i, t in _BM25_QUERIES)
    return f"""
        WITH q(query_id, query_text) AS (VALUES {vals}),
        qterms AS (SELECT DISTINCT query_id AS qid, unnest(
                     list_filter(string_split_regex(lower(trim(query_text)),
                                                    '\\s+'), x -> len(x) > 0)
                   ) AS term FROM q),
        toks AS (SELECT doc_id, list_filter(string_split({_NORM}, ' '),
                                            x -> len(x) > 0) AS w
                 FROM documents),
        lens AS (SELECT doc_id, len(w)::DOUBLE AS dl FROM toks),
        consts AS (SELECT count(*)::DOUBLE AS n_docs,
                          COALESCE(avg(dl), 0.0) AS avgdl FROM lens),
        tf AS (SELECT t.doc_id, x.term, count(*)::DOUBLE AS tf
               FROM toks t, UNNEST(w) AS x(term)
               WHERE x.term IN (SELECT DISTINCT term FROM qterms)
               GROUP BY t.doc_id, x.term),
        dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        scored AS (
          SELECT qt.qid, tf.doc_id,
                 sum(ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
                     * tf.tf * {k1 + 1.0}
                     / (tf.tf + {k1} * (1.0 - {b} + {b} * l.dl / c.avgdl))
                 ) AS s
          FROM tf JOIN dft d USING (term) JOIN lens l USING (doc_id)
          JOIN qterms qt USING (term) CROSS JOIN consts c
          GROUP BY qt.qid, tf.doc_id),
        ranked AS (SELECT qid, doc_id, round(s + 1e-9, 6) AS score,
                          row_number() OVER (PARTITION BY qid
                            ORDER BY round(s + 1e-9, 6) DESC, doc_id) AS rank
                   FROM scored)
        SELECT qid AS query_id, doc_id, score, rank
        FROM ranked WHERE rank <= {k}"""


def _bpe_encode_oracle() -> str:
    """DuckDB replica of bpe.bpe_token_counts under the pinned merge
    table. Tokens ride a guarded-delimiter string: every token enclosed
    as chr(2)||tok||chr(3), so replace(s, <2>l<3><2>r<3>, <2>lr<3>) is
    exactly the kernel's left-to-right non-overlap merge of WHOLE tokens
    (the delimiters can't occur inside document text). A recursive CTE
    applies the 24 merges in rank order; token count = count of chr(2)."""
    vals = ", ".join(
        "({}, '{}', '{}')".format(k, l, r) for k, l, r in _BPE_MERGES_PIN
    )
    n = len(_BPE_MERGES_PIN)
    return f"""
        WITH RECURSIVE m(rank, l, r) AS (VALUES {vals}),
        toklist AS (SELECT doc_id,
                           list_filter(string_split({_NORM}, ' '),
                                       x -> len(x) > 0) AS ws
                    FROM documents),
        words AS (SELECT DISTINCT unnest(ws) AS word FROM toklist),
        enc AS (
          SELECT word,
                 chr(2) || array_to_string(string_split(word, ''),
                                           chr(3) || chr(2)) || chr(3)
                        || chr(2) || '</w>' || chr(3) AS s,
                 0 AS k
          FROM words
          UNION ALL
          SELECT e.word,
                 replace(e.s,
                         chr(2) || m.l || chr(3) || chr(2) || m.r || chr(3),
                         chr(2) || m.l || m.r || chr(3)),
                 e.k + 1
          FROM enc e JOIN m ON m.rank = e.k),
        fin AS (SELECT word,
                       len(s) - len(replace(s, chr(2), '')) AS n_toks
                FROM enc WHERE k = {n}),
        ww AS (SELECT doc_id, unnest(ws) AS word FROM toklist),
        agg AS (SELECT ww.doc_id, count(*) AS n_words, sum(f.n_toks) AS nb
                FROM ww JOIN fin f USING (word) GROUP BY ww.doc_id)
        SELECT d.doc_id AS id, COALESCE(a.n_words, 0)::BIGINT AS n_words,
               COALESCE(a.nb, 0)::BIGINT AS n_bpe_tokens
        FROM documents d LEFT JOIN agg a USING (doc_id)"""


# engine pins for byte_kernel_fixture: keccak256(skeleton bytes) and the
# 5-gram stats per fixture codeid. Absolute anchoring: keccak known-vector
# tests (tests/test_kernels.py, batch==scalar) and the hand-computed ngram
# tests; the skeleton itself is NOT pinned here — its md5 is derived from
# the upstream golden CSV at oracle-generation time.
_BYTE_KERNEL_PINS = {
    "1": ("0x572e8db1c4a65becd4fbdc48d122b438eb27d2862ac05d27a3027616828e0b92", 8290, 14345),
    "2": ("0xcd15d59f8e0222c83794b4ecad4b1cb72efb2c91183dd7d79214eb0d1976ed0f", 2756, 8883),
    "3": ("0x91d0ffe2370450748cf179a9caf9d3849216f26c2edef92e667a1752fd6c7337", 4035, 16671),
    "4": ("0xd17c4ae305f65aced2c3adf53fc1a91bd8647fdb75320635aea5dd5e54bd736e", 973, 1833),
    "5": ("0xc8f78dc3ebace2ead18a24b5a68cf6eb53a7fe4b5828350dcb428c3eaec9ebfe", 2374, 7571),
}


def _byte_kernel_fixture_oracle() -> str:
    """Expected-output table for byte_kernel_fixture: skeleton_md5 read
    from the UPSTREAM golden skeleton CSV (trailing-zero-trimmed, utf-8
    md5 of the un-prefixed hex), keccak/ngram columns from the anchored
    engine pins above."""
    import csv
    import hashlib
    import os

    data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "data")
    rows = []
    with open(os.path.join(data, "bytecodes_skeleton.csv")) as f:
        for row in csv.DictReader(f, delimiter=";"):
            cid = row["codeid"]
            if cid not in _BYTE_KERNEL_PINS:
                continue
            sk = row["skeleton"].removeprefix("0x").rstrip("0")
            kec, n_rows, total = _BYTE_KERNEL_PINS[cid]
            rows.append(
                f"({cid}, '{hashlib.md5(sk.encode()).hexdigest()}', "
                f"'{kec}', {n_rows}, {total})"
            )
    return (
        "SELECT codeid::BIGINT AS codeid, skeleton_md5, skeleton_keccak, "
        "n_ngram_rows::BIGINT AS n_ngram_rows, total_ngrams::BIGINT AS total_ngrams "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(codeid, skeleton_md5, "
        "skeleton_keccak, n_ngram_rows, total_ngrams)"
    )


def _bpe_merges_oracle(rounds: int = 2, min_pair_freq: int = 2) -> str:
    """DuckDB replica of bpe.bpe_train(num_merges=rounds): word counts ->
    guarded-delimiter token strings (chr(2)||tok||chr(3) — the bpe_encode
    oracle's representation) -> per round: adjacent-pair frequencies
    weighted by word count, argmax by (freq DESC, left, right), then ONE
    replace() that performs the greedy left-to-right non-overlap merge.
    Round k emits its merge row only if every round <= k passed the
    min_pair_freq early-stop, mirroring the trainer's break."""
    d2, d3 = "chr(2)", "chr(3)"
    parts = [
        "wc AS (SELECT w AS word, count(*) AS cnt FROM ("
        f"SELECT unnest(list_filter(string_split({_NORM}, ' '), "
        "x -> len(x) > 0)) AS w FROM documents) GROUP BY w)",
        # s0: every char a guarded token, plus the end-of-word marker
        f"t0 AS (SELECT word, cnt, {d2} || array_to_string(string_split(word, ''), "
        f"{d3} || {d2}) || {d3} || {d2} || '</w>' || {d3} AS s FROM wc)",
    ]
    for r in range(1, rounds + 1):
        prev, lst, b, t = f"t{r - 1}", f"l{r}", f"b{r}", f"t{r}"
        parts.append(
            f"{lst} AS (SELECT cnt, list_transform(string_split(s, {d3} || {d2}), "
            f"x -> replace(replace(x, {d2}, ''), {d3}, '')) AS lst FROM {prev})"
        )
        parts.append(
            f"{b} AS (SELECT lst[i.i] AS lft, lst[i.i + 1] AS rgt, "
            f"sum(cnt) AS freq FROM {lst}, "
            "UNNEST(range(1, greatest(len(lst) - 1, 0) + 1)) AS i(i) "
            "GROUP BY lft, rgt ORDER BY freq DESC, lft, rgt LIMIT 1)"
        )
        parts.append(
            f"{t} AS (SELECT word, cnt, replace(s, "
            f"{d2} || b.lft || {d3} || {d2} || b.rgt || {d3}, "
            f"{d2} || b.lft || b.rgt || {d3}) AS s FROM {prev}, {b} b)"
        )
    selects = []
    for r in range(1, rounds + 1):
        guards = " AND ".join(
            f"(SELECT freq FROM b{q}) >= {min_pair_freq}" for q in range(1, r + 1)
        )
        selects.append(
            f"SELECT {r - 1}::BIGINT AS rank, lft AS \"left\", rgt AS \"right\", "
            f"freq::BIGINT AS freq FROM b{r} WHERE {guards}"
        )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(selects)


def _substring_oracle(w: int, keep_first: bool, clean: bool) -> str:
    """DuckDB replica of pipeline/substring: sliding w-token windows of
    the trimmed original text (zero-length tokens dropped), 60-bit md5
    window hashes (collision-identical to Spark's md5_60bit), global
    occurrence count via a window aggregate, optional global-first
    exemption, gaps-and-islands span merge, and either the per-doc stats
    or the md5 of the rebuilt text."""
    if keep_first:
        dup = f"""dup AS (SELECT doc_id, off FROM (
                    SELECT doc_id, off,
                           count(*) OVER (PARTITION BY wh) AS n,
                           row_number() OVER (PARTITION BY wh ORDER BY doc_id, off) AS rn
                    FROM wins) WHERE n >= 2 AND rn > 1)"""
    else:
        dup = f"""cnt AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2),
        dup AS (SELECT w.doc_id, w.off FROM wins w JOIN cnt USING (wh))"""
    base = f"""
        WITH toks AS (SELECT doc_id,
                             list_filter(string_split_regex(trim(text), '\\s+'),
                                         x -> len(x) > 0) AS w
                      FROM documents),
        wins AS (SELECT doc_id, i.i - 1 AS off,
                        ('0x'||substr(md5(array_to_string(w[i.i:i.i+{w - 1}], ' ')),1,15))::BIGINT AS wh
                 FROM toks, UNNEST(range(1, greatest(len(w) - {w} + 1, 0) + 1)) AS i(i)),
        {dup},
        brk AS (SELECT doc_id, off,
                       CASE WHEN off - lag(off) OVER (PARTITION BY doc_id ORDER BY off) <= {w}
                            THEN 0 ELSE 1 END AS b
                FROM dup),
        grp AS (SELECT doc_id, off,
                       sum(b) OVER (PARTITION BY doc_id ORDER BY off) AS g
                FROM brk),
        spans AS (SELECT doc_id, min(off) AS s, max(off) + {w} AS e
                  FROM grp GROUP BY doc_id, g),
        drops AS (SELECT doc_id, sum(e - s) AS nd FROM spans GROUP BY doc_id)"""
    if clean:
        return f"""{base},
        kept AS (SELECT t.doc_id, j.j AS pos, t.w[j.j] AS tok
                 FROM toks t, UNNEST(range(1, len(t.w) + 1)) AS j(j)
                 WHERE NOT EXISTS (SELECT 1 FROM spans s
                                   WHERE s.doc_id = t.doc_id
                                     AND j.j - 1 >= s.s AND j.j - 1 < s.e)),
        cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt
               FROM kept GROUP BY doc_id)
        SELECT d.doc_id, md5(COALESCE(c.txt, '')) AS clean_md5,
               COALESCE(dr.nd, 0)::BIGINT AS n_tokens_dropped
        FROM documents d LEFT JOIN cl c USING (doc_id)
        LEFT JOIN drops dr USING (doc_id)"""
    return f"""{base},
        dw AS (SELECT doc_id, count(*) AS ndw FROM dup GROUP BY doc_id)
        SELECT d.doc_id, len(t.w)::BIGINT AS n_tokens,
               greatest(len(t.w) - {w - 1}, 0)::BIGINT AS n_windows,
               COALESCE(dw.ndw, 0)::BIGINT AS n_dup_windows,
               COALESCE(dr.nd, 0)::BIGINT AS n_dropped_tokens
        FROM documents d JOIN toks t USING (doc_id)
        LEFT JOIN dw USING (doc_id) LEFT JOIN drops dr USING (doc_id)"""


def _langid_oracle() -> str:
    hits = ", ".join(
        f"len(list_intersect(string_split({_NORM},' '), {stops})) AS h_{lang}"
        for lang, stops in _LANG_STOPS.items()
    )
    # fold in sorted lang order with strict-greater updates (first-wins ties)
    fold_b, fold_m = "'und'", "0"
    for lang in sorted(_LANG_STOPS):
        fold_b = f"CASE WHEN h_{lang} > {fold_m} THEN '{lang}' ELSE {fold_b} END"
        fold_m = f"greatest(h_{lang}, {fold_m})"
    return (
        f"WITH x AS (SELECT doc_id, lang, {hits} FROM documents) "
        f"SELECT doc_id, lang, {fold_b} AS lang_pred, CAST({fold_m} AS BIGINT) AS lang_hits FROM x"
    )


def _quality_oracle() -> str:
    words = f"string_split_regex(lower(trim(text)),'\\s+')"
    n_words = f"len(string_split_regex(trim(text),'\\s+'))"
    n_chars = "length(text)"
    n_punct = f"({n_chars} - length(regexp_replace(text,'[^\\p{{L}}\\p{{N}}_\\s]','','g')))"
    punct_ratio = f"({n_punct}*1.0/greatest({n_chars},1))"
    n_stop = f"len(list_filter({words}, x -> list_contains({_STOPS_ALL}, x)))"
    stop_ratio = f"({n_stop}*1.0/greatest({n_words},1))"
    mwl = f"(({n_chars} - {n_words} + 1)*1.0/greatest({n_words},1))"
    score = (
        f"CASE WHEN {n_words} < 5 THEN 0.0 WHEN {punct_ratio} > 0.3 THEN 0.2 "
        f"ELSE least(1.0, 0.5 + {stop_ratio} + CASE WHEN {mwl} >= 3 AND {mwl} <= 10 THEN 0.2 ELSE 0.0 END) END"
    )
    return (
        f"SELECT doc_id, CAST({n_words} AS BIGINT) AS n_words, round({punct_ratio} + 1e-9, 6) AS punct_ratio, "
        f"round({stop_ratio} + 1e-9, 6) AS stopword_ratio, round({mwl} + 1e-9, 6) AS mean_word_len, "
        f"round({score} + 1e-9, 6) AS quality_score FROM documents"
    )


def _pagerank_oracle(num_iter: int = 5, damping: float = 0.85) -> str:
    """Fixed-iteration PageRank unrolled as chained CTEs — one (contribs,
    dangling-mass, ranks) layer per power iteration, exactly mirroring
    eth2dgraph_spark.graph.pagerank's update rule."""
    d = damping
    parts = [
        """WITH e AS (SELECT DISTINCT 'c'||o_custkey AS src, 's'||l_suppkey AS dst
               FROM orders JOIN lineitem ON o_orderkey=l_orderkey),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        outdeg AS (SELECT src, count(*)::DOUBLE AS od FROM e GROUP BY src),
        r0 AS (SELECT node, (SELECT 1.0/n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, num_iter + 1):
        parts.append(
            f""",
        dm{i} AS (SELECT coalesce(sum(r.rank),0) AS dm FROM r{i - 1} r
                  LEFT JOIN outdeg o ON o.src = r.node WHERE o.src IS NULL),
        c{i} AS (SELECT e.dst AS node, sum(r.rank / o.od) AS s
                 FROM e JOIN r{i - 1} r ON r.node = e.src
                      JOIN outdeg o ON o.src = e.src GROUP BY e.dst),
        r{i} AS (SELECT n.node,
                        (1-{d})/(SELECT n FROM nn)
                        + {d} * (coalesce(c.s, 0) + (SELECT dm FROM dm{i})/(SELECT n FROM nn)) AS rank
                 FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"""
        )
    parts.append(f"\n        SELECT node, round(rank, 9) AS rank FROM r{num_iter}")
    return "".join(parts)


def _hits_oracle(num_iter: int = 2) -> str:
    """Fixed-iteration HITS unrolled as chained CTEs — one (auth-raw,
    auth-norm, auth, hub-raw, hub-norm, hub) layer per iteration, exactly
    mirroring eth2dgraph_spark.graph.hits's update rule (L2 norms as
    scalar subqueries; hub0 = 1 on every node)."""
    parts = [
        """WITH e AS (SELECT DISTINCT 'c'||o_custkey AS src, 's'||l_suppkey AS dst
               FROM orders JOIN lineitem ON o_orderkey=l_orderkey),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        h0 AS (SELECT node, 1.0 AS hub FROM nodes)"""
    ]
    for i in range(1, num_iter + 1):
        parts.append(
            f""",
        ar{i} AS (SELECT e.dst AS node, sum(h.hub) AS s
                  FROM e JOIN h{i - 1} h ON h.node = e.src GROUP BY e.dst),
        an{i} AS (SELECT sqrt(sum(s*s)) AS nm FROM ar{i}),
        a{i} AS (SELECT n.node, coalesce(ar.s, 0)/(SELECT nm FROM an{i}) AS auth
                 FROM nodes n LEFT JOIN ar{i} ar ON ar.node = n.node),
        hr{i} AS (SELECT e.src AS node, sum(a.auth) AS s
                  FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src),
        hn{i} AS (SELECT sqrt(sum(s*s)) AS nm FROM hr{i}),
        h{i} AS (SELECT n.node, coalesce(hr.s, 0)/(SELECT nm FROM hn{i}) AS hub
                 FROM nodes n LEFT JOIN hr{i} hr ON hr.node = n.node)"""
        )
    parts.append(
        f"""
        SELECT a.node, round(a.auth, 9) AS auth, round(h.hub, 9) AS hub
        FROM a{num_iter} a JOIN h{num_iter} h ON h.node = a.node"""
    )
    return "".join(parts)


def _ppr_oracle(num_iter: int = 4, damping: float = 0.85) -> str:
    """Fixed-iteration PERSONALIZED PageRank unrolled as chained CTEs —
    the _pagerank_oracle construction with the uniform 1/n terms replaced
    by the source-masked reset vector rv (1/|S∩V| on seeds, 0 elsewhere);
    teleport AND dangling mass both restart at the seeds, ranks start at
    the reset vector. Seeds are intersected with graph nodes exactly as
    personalized_pagerank does."""
    d = damping
    parts = [
        """WITH e AS (SELECT DISTINCT 'c'||o_custkey AS src, 's'||l_suppkey AS dst
               FROM orders JOIN lineitem ON o_orderkey=l_orderkey),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        outdeg AS (SELECT src, count(*)::DOUBLE AS od FROM e GROUP BY src),
        sv AS (SELECT node FROM nodes WHERE node IN
                  (SELECT DISTINCT 'c'||o_custkey FROM orders WHERE o_custkey % 97 = 0)),
        ns AS (SELECT count(*)::DOUBLE AS m FROM sv),
        rv AS (SELECT n.node,
                      CASE WHEN s.node IS NOT NULL THEN 1.0/(SELECT m FROM ns)
                           ELSE 0.0 END AS rv
               FROM nodes n LEFT JOIN sv s ON s.node = n.node),
        r0 AS (SELECT node, rv AS rank FROM rv)"""
    ]
    for i in range(1, num_iter + 1):
        parts.append(
            f""",
        dm{i} AS (SELECT coalesce(sum(r.rank),0) AS dm FROM r{i - 1} r
                  LEFT JOIN outdeg o ON o.src = r.node WHERE o.src IS NULL),
        c{i} AS (SELECT e.dst AS node, sum(r.rank / o.od) AS s
                 FROM e JOIN r{i - 1} r ON r.node = e.src
                      JOIN outdeg o ON o.src = e.src GROUP BY e.dst),
        r{i} AS (SELECT v.node,
                        (1-{d}) * v.rv
                        + {d} * (coalesce(c.s, 0) + (SELECT dm FROM dm{i}) * v.rv) AS rank
                 FROM rv v LEFT JOIN c{i} c ON c.node = v.node)"""
        )
    parts.append(f"\n        SELECT node, round(rank, 9) AS rank FROM r{num_iter}")
    return "".join(parts)


_WAV_ENVELOPE_ORACLE = """
        SELECT d.doc_id, i.i AS bin,
               round(round(((d.doc_id * 31 + i.i) % 20) * 1638.4) / 32768
                     + 1e-9, 6) AS rms
        FROM documents d, range(16) i(i)"""


_AVI_LUMA_ORACLE = """
        SELECT d.doc_id, i.i AS bin,
               round(((d.doc_id * 31 + i.i) % 32) * 8 / 255.0 + 1e-9, 6) AS luma
        FROM documents d, range(32) i(i)"""


_LINE_PROFILE_ORACLE = r"""
        WITH m AS (
          SELECT doc_id,
                 concat_ws(chr(10), text,
                           '- ' || substring(text, 1, 10),
                           upper(substring(text, 1, 12)),
                           text,
                           substring(text, 1, CAST(doc_id % 20 + 1 AS INT)) || '.') AS t
          FROM documents),
        l AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(t, chr(10)),
                                            x -> trim(x)),
                             x -> length(x) > 0) AS ls
          FROM m)
        SELECT doc_id AS id,
               len(ls)::BIGINT AS n_lines,
               round(CASE WHEN len(ls) > 0
                     THEN list_sum(list_transform(ls, x -> length(x))) / len(ls)
                     ELSE 0.0 END + 1e-9, 6) AS mean_line_len,
               round(CASE WHEN len(ls) > 0
                     THEN len(list_filter(ls, x -> regexp_matches(x, '[.!?"'']$'))) / len(ls)
                     ELSE 0.0 END + 1e-9, 6) AS frac_lines_end_punct,
               round(CASE WHEN len(ls) > 0
                     THEN len(list_filter(ls, x -> regexp_matches(x, '^[-*•‣◦]'))) / len(ls)
                     ELSE 0.0 END + 1e-9, 6) AS frac_lines_bullet,
               round(CASE WHEN len(ls) > 0
                     THEN len(list_filter(ls, x -> regexp_matches(x, '\p{L}')
                                              AND NOT regexp_matches(x, '\p{Ll}'))) / len(ls)
                     ELSE 0.0 END + 1e-9, 6) AS frac_lines_upper,
               round(CASE WHEN len(ls) > 0
                     THEN 1.0 - len(list_distinct(ls)) / len(ls)
                     ELSE 0.0 END + 1e-9, 6) AS frac_dup_lines
        FROM l"""


_VIDEO_NEAR_FRAMES_ORACLE = """
        WITH f AS (
          SELECT doc_id AS aid,
                 xor(xor((doc_id % 25) * 2654435761 % 576460752303423488,
                         CASE WHEN doc_id % 4 = 0
                              THEN (1::BIGINT << CAST(doc_id % 16 AS INT))
                              ELSE 0 END),
                     fb.b) AS h
          FROM documents,
               (VALUES (0::BIGINT), (1099511627776::BIGINT),
                       (281474976710656::BIGINT)) fb(b)),
        p AS (SELECT DISTINCT aid, h FROM f),
        v AS (SELECT DISTINCT h FROM p),
        m AS (SELECT a.h AS h1, b.h AS h2 FROM v a JOIN v b
              ON bit_count(xor(a.h, b.h)) <= 2)
        SELECT pa.aid AS id_a, pb.aid AS id_b,
               count(DISTINCT (least(m.h1, m.h2), greatest(m.h1, m.h2)))::BIGINT
                 AS n_shared
        FROM p pa JOIN m ON m.h1 = pa.h JOIN p pb ON pb.h = m.h2
        WHERE pa.aid < pb.aid
        GROUP BY pa.aid, pb.aid
        HAVING count(DISTINCT (least(m.h1, m.h2), greatest(m.h1, m.h2))) >= 2"""


_IMAGE_NEAR_DUPS_ORACLE = """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::BIGINT AS hamming
        FROM documents a JOIN documents b
          ON a.doc_id % 25 = b.doc_id % 25 AND a.doc_id < b.doc_id"""


_JPEG_LUMA_ORACLE = """
        SELECT d.doc_id, k.k AS bin,
               CAST((d.doc_id * 31 + k.k * 17) % 256 AS DOUBLE) AS luma
        FROM documents d, range(16) k(k)"""


_GIF_LUMA_ORACLE = """
        SELECT d.doc_id, k.k AS bin,
               CAST((d.doc_id * 29 + k.k * 13) % 256 AS DOUBLE) AS luma
        FROM documents d, range(16) k(k)"""


_AUDIO_NEAR_FRAMES_ORACLE = """
        WITH docs AS (
          SELECT doc_id, doc_id % 25 AS g,
                 CASE WHEN doc_id % 4 = 0 THEN 65536::BIGINT ELSE 0::BIGINT END
                   AS drift
          FROM documents),
        fh AS (
          SELECT doc_id AS aid,
                 xor(  (g * 10)::BIGINT
                     + (f.f * 80)::BIGINT * 256
                     + (2 * ((g*31 + f.f*16 + 14) % 128))::BIGINT * 65536
                     + (2 * ((g*31 + f.f*16 + 21) % 128))::BIGINT * 16777216
                     + (2 * ((g*31 + f.f*16 + 28) % 128))::BIGINT * 4294967296
                     + (2 * ((g*31 + f.f*16 + 35) % 128))::BIGINT * 1099511627776
                     + (2 * ((g*31 + f.f*16 + 42) % 128))::BIGINT * 281474976710656
                     + (2 * ((g*31 + f.f*16 + 49) % 64))::BIGINT * 72057594037927936,
                     drift) AS h
          FROM docs, range(2) f(f)),
        p AS (SELECT DISTINCT aid, h FROM fh),
        v AS (SELECT DISTINCT h FROM p),
        m AS (SELECT a.h AS h1, b.h AS h2 FROM v a JOIN v b
              ON bit_count(xor(a.h, b.h)) <= 1)
        SELECT pa.aid AS id_a, pb.aid AS id_b,
               count(DISTINCT (least(m.h1, m.h2), greatest(m.h1, m.h2)))::BIGINT
                 AS n_shared
        FROM p pa JOIN m ON m.h1 = pa.h JOIN p pb ON pb.h = m.h2
        WHERE pa.aid < pb.aid
        GROUP BY pa.aid, pb.aid
        HAVING count(DISTINCT (least(m.h1, m.h2), greatest(m.h1, m.h2))) >= 2"""


_ASSET_CLUSTER_REPS_ORACLE = """
        SELECT doc_id % 25 AS asset_id, count(*)::BIGINT AS cluster_size
        FROM documents GROUP BY doc_id % 25"""


_AUDIO_DEDUP_STREAM_ORACLE = """
        WITH h0 AS (SELECT doc_id AS aid, doc_id % 25 AS g FROM documents
                    WHERE doc_id % 25 < 20),
        b1 AS (SELECT doc_id + 100000 AS aid, doc_id % 25 AS g FROM documents
               WHERE doc_id % 25 >= 20 AND doc_id < 250),
        b2a AS (SELECT doc_id + 100000 AS aid, doc_id % 25 AS g FROM documents
                WHERE doc_id % 25 >= 20 AND doc_id >= 250),
        b2b AS (SELECT doc_id + 200000 AS aid, doc_id % 25 AS g FROM documents
                WHERE doc_id % 25 < 2 AND doc_id < 50)
        SELECT a.aid AS new_id, b.aid AS hist_id, 3::BIGINT AS n_shared
        FROM b2a a JOIN b1 b ON b.g = a.g
        UNION ALL
        SELECT a.aid AS new_id, h.aid AS hist_id, 3::BIGINT AS n_shared
        FROM b2b a JOIN h0 h ON h.g = a.g"""


# the image stream shares the audio stream's group algebra; one pHash per
# image instead of per-frame fingerprints, so n_shared = 1
_IMAGE_DEDUP_STREAM_ORACLE = """
        WITH h0 AS (SELECT doc_id AS aid, doc_id % 25 AS g FROM documents
                    WHERE doc_id % 25 < 20),
        b1 AS (SELECT doc_id + 100000 AS aid, doc_id % 25 AS g FROM documents
               WHERE doc_id % 25 >= 20 AND doc_id < 250),
        b2a AS (SELECT doc_id + 100000 AS aid, doc_id % 25 AS g FROM documents
                WHERE doc_id % 25 >= 20 AND doc_id >= 250),
        b2b AS (SELECT doc_id + 200000 AS aid, doc_id % 25 AS g FROM documents
                WHERE doc_id % 25 < 2 AND doc_id < 50)
        SELECT a.aid AS new_id, b.aid AS hist_id, 1::BIGINT AS n_shared
        FROM b2a a JOIN b1 b ON b.g = a.g
        UNION ALL
        SELECT a.aid AS new_id, h.aid AS hist_id, 1::BIGINT AS n_shared
        FROM b2b a JOIN h0 h ON h.g = a.g"""


_VIDEO_NEAR_DUPS_ORACLE = """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, 3::BIGINT AS n_shared
        FROM documents a JOIN documents b
          ON a.doc_id % 25 = b.doc_id % 25 AND a.doc_id < b.doc_id"""


_OHLC_ORACLE = """
            WITH b AS (SELECT event_type,
                              time_bucket(INTERVAL '5 minutes', ts) AS bar,
                              ts, event_id, value FROM events),
            oc AS (SELECT event_type, bar, value,
                          row_number() OVER (PARTITION BY event_type, bar
                                             ORDER BY ts, event_id) AS rn_a,
                          row_number() OVER (PARTITION BY event_type, bar
                                             ORDER BY ts DESC, event_id DESC) AS rn_d
                   FROM b),
            agg AS (SELECT event_type, bar, max(value) AS high,
                           min(value) AS low, count(*)::BIGINT AS n_events,
                           sum(value) AS v_sum
                    FROM b GROUP BY event_type, bar)
            SELECT a.event_type,
                   strftime(a.bar, '%Y-%m-%d %H:%M:%S') AS bar_start,
                   o.value AS open, a.high, a.low, c.value AS close,
                   a.n_events, round(a.v_sum + 1e-9, 6) AS v_sum
            FROM agg a
            JOIN oc o ON o.event_type = a.event_type AND o.bar = a.bar
                      AND o.rn_a = 1
            JOIN oc c ON c.event_type = a.event_type AND c.bar = a.bar
                      AND c.rn_d = 1"""


def oracle_sql() -> dict[str, str]:
    out = {
        "pq_topk": _pq_topk_oracle(),
        "unigram_encode": _unigram_encode_oracle(),
        "phash_bits": _phash_oracle(),
        "hll_distinct": _hll_oracle(),
        "wordpiece_encode": _wordpiece_encode_oracle(),
        "gopher_rep": _gopher_rep_oracle(),
        # all three re-read arms must equal the parquet-derived aggregate:
        # the roundtrip IS the operator under test
        "format_roundtrips": """
            WITH a AS (SELECT lang, count(*)::BIGINT AS n,
                              sum(n_chars)::BIGINT AS chars,
                              bit_xor(('0x'||substr(md5(doc_id::VARCHAR || ':' || text),1,15))::BIGINT) AS fp
                       FROM documents GROUP BY lang)
            SELECT lang, n AS n_orc, chars AS chars_orc,
                   fp AS texts_fp_orc,
                   n AS n_csv, chars AS chars_csv, fp AS texts_fp_csv,
                   n AS n_json, chars AS chars_json, fp AS texts_fp_json
            FROM a""",
        # two unrolled peel rounds; u < v canonicalization matches
        # _canonical_undirected + least/greatest in graph.k_core
        "coreness_capped": _coreness_oracle(max_k=4, rounds=2),
        "kcore_2rounds": """
            WITH e AS (SELECT DISTINCT least('c' || o_custkey, 's' || l_suppkey) AS u,
                              greatest('c' || o_custkey, 's' || l_suppkey) AS v
                       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
            n0 AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
            d1 AS (SELECT u, count(*) AS deg FROM n0 GROUP BY u),
            k1 AS (SELECT u FROM d1 WHERE deg >= 12),
            n1 AS (SELECT n0.u, n0.v FROM n0
                   WHERE n0.u IN (SELECT u FROM k1)
                     AND n0.v IN (SELECT u FROM k1)),
            d2 AS (SELECT u, count(*) AS deg FROM n1 GROUP BY u),
            k2 AS (SELECT u FROM d2 WHERE deg >= 12),
            n2 AS (SELECT n1.u, n1.v FROM n1
                   WHERE n1.u IN (SELECT u FROM k2)
                     AND n1.v IN (SELECT u FROM k2))
            SELECT u AS node, count(*)::BIGINT AS degree
            FROM n2 GROUP BY u""",
        "shard_assign": """
            SELECT doc_id,
                   (('0x'||substr(md5(doc_id::VARCHAR || ':shard-v1'),1,8))::BIGINT
                    % 8)::INT AS shard,
                   row_number() OVER (
                     PARTITION BY (('0x'||substr(md5(doc_id::VARCHAR || ':shard-v1'),1,8))::BIGINT % 8)
                     ORDER BY md5(doc_id::VARCHAR || ':shard-v1:pos'), doc_id
                   )::BIGINT AS pos_in_shard
            FROM documents""",
        # floor(x+0.5) mirrors quantize.int8_quantize exactly (round()
        # would diverge: Spark half-up vs DuckDB half-even); FLOAT[] ->
        # DOUBLE[] widening is exact in both engines
        "int8_quant": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            s AS (SELECT vec_id, v, list_min(v) AS lo,
                         (list_max(v) - list_min(v)) / 255.0 AS sc
                  FROM e),
            q AS (SELECT vec_id, v, lo, sc,
                         CASE WHEN sc = 0
                              THEN list_transform(v, x -> 0)
                              ELSE list_transform(v, x ->
                                least(255, greatest(0,
                                  floor((x - lo) / sc + 0.5)::INT)))
                         END AS codes
                  FROM s),
            x AS (SELECT vec_id, sc, lo, codes,
                         unnest(v) AS val,
                         generate_subscripts(v, 1) AS i
                  FROM q),
            err AS (SELECT vec_id,
                           max(abs(val - (lo + codes[i] * sc))) AS me
                    FROM x GROUP BY vec_id)
            SELECT q.vec_id, round(sc + 1e-9, 6) AS scale,
                   round(lo + 1e-9, 6) AS zero,
                   md5(array_to_string(codes, ',')) AS codes_md5,
                   round(me + 1e-9, 6) AS max_abs_err
            FROM q JOIN err USING (vec_id)""",
        "domain_cap": """
            WITH r AS (SELECT lang, doc_id, source,
                              row_number() OVER (
                                PARTITION BY lang
                                ORDER BY md5(doc_id::VARCHAR || ':cap-v1'), doc_id
                              ) AS rn
                       FROM documents)
            SELECT lang, doc_id, source FROM r WHERE rn <= 30""",
        "dedup_stream": f"""
            WITH dd AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, upper(text) AS text
              FROM documents)
            SELECT md5({_NORM}) AS fingerprint, count(*)::BIGINT AS dup_count,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc
            FROM dd GROUP BY 1""",
        # mirrors importance.source_divergence's grid-free decomposition:
        # absent-word mass folds into closed-form scalars of (T_s, V_s, V,
        # Lc); alpha = 0.5
        "source_kl": f"""
            WITH toks AS (SELECT source AS src,
                                 unnest(list_filter(string_split({_NORM}, ' '),
                                                    x -> len(x) > 0)) AS w
                          FROM documents),
            cw AS (SELECT w, count(*)::DOUBLE AS cw FROM toks GROUP BY w),
            tot AS (SELECT sum(cw) AS t, count(*)::DOUBLE AS v FROM cw),
            cl AS (SELECT w, ln((cw + 0.5) / (t + 0.5 * v)) AS ln_pc
                   FROM cw, tot),
            lcs AS (SELECT sum(ln_pc) AS lc FROM cl),
            sw AS (SELECT src, w, count(*)::DOUBLE AS cs
                   FROM toks GROUP BY 1, 2),
            ps AS (SELECT src, sum(cs) AS t_s, count(*)::DOUBLE AS v_s,
                          sum((cs + 0.5) * ln(cs + 0.5)) AS sa,
                          sum((cs + 0.5) * ln_pc) AS sb,
                          sum(ln_pc) AS sc
                   FROM sw JOIN cl USING (w) GROUP BY src)
            SELECT src AS source, t_s::BIGINT AS n_tokens,
                   v_s::BIGINT AS n_types,
                   round(((sa - (t_s + 0.5 * v_s) * ln(t_s + 0.5 * v))
                            / (t_s + 0.5 * v)
                          + (v - v_s) * (0.5 / (t_s + 0.5 * v))
                            * ln(0.5 / (t_s + 0.5 * v))
                          - sb / (t_s + 0.5 * v)
                          - (0.5 / (t_s + 0.5 * v)) * (lc - sc))
                         + 1e-9, 6) AS kl_from_corpus,
                   round((-(sb / (t_s + 0.5 * v)
                            + (0.5 / (t_s + 0.5 * v)) * (lc - sc)))
                         + 1e-9, 6) AS cross_entropy
            FROM ps, tot, lcs""",
        "gas_stats": """
            SELECT user_id AS block_number, count(*)::BIGINT AS tx_count,
                   round(min(value*1e9/1e9) + 1e-9, 6) AS gas_price_min,
                   round(max(value*1e9/1e9) + 1e-9, 6) AS gas_price_max,
                   round(avg(value*1e9/1e9) + 1e-9, 6) AS gas_price_avg,
                   round(stddev_pop(value*1e9/1e9) + 1e-9, 6) AS gas_price_std_dev
            FROM events GROUP BY user_id""",
        "last_block": "SELECT max(event_id) AS last_block FROM events",
        "lifetimes_rq1": """
            WITH dep AS (SELECT DISTINCT user_id FROM events WHERE event_type='signup'),
                 des AS (SELECT user_id, count(*) AS dc FROM events WHERE event_type='error' GROUP BY user_id)
            SELECT count(CASE WHEN coalesce(dc,0)>0 THEN 1 END)::BIGINT AS destroyed,
                   count(CASE WHEN coalesce(dc,0)=0 THEN 1 END)::BIGINT AS never_destroyed
            FROM dep LEFT JOIN des USING(user_id)""",
        "lifetimes_rq2": """
            WITH dep AS (SELECT DISTINCT user_id FROM events WHERE event_type='signup'),
                 des AS (SELECT user_id, count(*) AS dc FROM events WHERE event_type='error' GROUP BY user_id)
            SELECT count(CASE WHEN dc=1 THEN 1 END)::BIGINT AS destroyed_once,
                   count(CASE WHEN dc>1 THEN 1 END)::BIGINT AS destroyed_multiple
            FROM dep JOIN des USING(user_id)""",
        "lifetimes_rq3": """
            WITH dep AS (SELECT user_id, strftime(ts,'%Y%m%d')::BIGINT AS b, strftime(ts,'%Y%m%d%H') AS tx
                         FROM events WHERE event_type='signup'),
                 des AS (SELECT user_id, strftime(ts,'%Y%m%d')::BIGINT AS b, strftime(ts,'%Y%m%d%H') AS tx
                         FROM events WHERE event_type='error'),
                 p AS (SELECT dep.user_id, dep.b AS db, des.b AS sb, dep.tx AS dt, des.tx AS st
                       FROM dep JOIN des ON dep.user_id=des.user_id)
            SELECT (SELECT count(*) FROM p WHERE db=sb)::BIGINT AS same_block_pairs,
                   (SELECT count(DISTINCT user_id) FROM p WHERE db=sb)::BIGINT AS same_block_contracts,
                   (SELECT count(*) FROM p WHERE dt=st)::BIGINT AS same_tx_pairs,
                   (SELECT count(DISTINCT user_id) FROM p WHERE dt=st)::BIGINT AS same_tx_contracts""",
        "lifetimes_rq4": """
            WITH dep AS (SELECT user_id, min(event_id) AS fd FROM events WHERE event_type='signup' GROUP BY user_id),
                 des AS (SELECT user_id, max(event_id) AS ld FROM events WHERE event_type='error' GROUP BY user_id)
            SELECT round(avg(ld-fd) + 1e-9, 6) AS avg_lifetime_blocks,
                   round(stddev_pop(ld-fd) + 1e-9, 6) AS stddev_lifetime_blocks
            FROM dep JOIN des USING(user_id)""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(CAST(l_quantity AS DECIMAL(18,4))),2)::DOUBLE AS sum_qty,
                   round(sum(CAST(l_extendedprice AS DECIMAL(18,4))),2)::DOUBLE AS sum_base_price,
                   round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2)::DOUBLE AS sum_disc_price,
                   round(avg(l_quantity) + 1e-9, 6) AS avg_qty, round(avg(l_extendedprice) + 1e-9, 6) AS avg_price,
                   count(*)::BIGINT AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-01-01' GROUP BY l_returnflag, l_linestatus""",
        "shipping_priority": """
            SELECT l_orderkey, strftime(o_orderdate,'%Y-%m-%d') AS orderdate,
                   round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2)::DOUBLE AS revenue
            FROM customer JOIN orders ON c_custkey=o_custkey JOIN lineitem ON o_orderkey=l_orderkey
            WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, orderdate ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        "region_revenue": """
            SELECT r_name, round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))),2)::DOUBLE AS revenue,
                   count(*)::BIGINT AS n_items
            FROM region JOIN nation ON r_regionkey=n_regionkey JOIN customer ON n_nationkey=c_nationkey
                 JOIN orders ON c_custkey=o_custkey JOIN lineitem ON o_orderkey=l_orderkey
            GROUP BY r_name""",
        "parts_top_per_brand": """
            SELECT p_brand, p_partkey, round(p_retailprice,2) AS price, rn FROM (
              SELECT p_brand, p_partkey, p_retailprice,
                     row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) ::BIGINT AS rn
              FROM part) WHERE rn <= 3""",
        "segment_stats": """
            SELECT c_mktsegment, count(*)::BIGINT AS n_customers, round(avg(c_acctbal) + 1e-9, 6) AS avg_acctbal,
                   count(DISTINCT c_nationkey)::BIGINT AS n_nations
            FROM customer GROUP BY c_mktsegment""",
        "semi_join": """
            SELECT c_nationkey, count(*)::BIGINT AS n_customers FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)
            GROUP BY c_nationkey""",
        "anti_join": """
            SELECT c_nationkey, count(*)::BIGINT AS n_customers FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey
                              AND o.o_orderpriority='1-URGENT')
            GROUP BY c_nationkey""",
        "pagination": """
            SELECT o_orderkey, round(o_totalprice,2) AS total FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""",
        "first_per_key": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn = 1""",
        "json_extract": """
            SELECT json_extract_string(props,'$.k')::BIGINT AS k, count(*)::BIGINT AS cnt
            FROM events GROUP BY 1""",
        "string_funcs": """
            SELECT doc_id, upper(substr(trim(text),1,10)) AS prefix10, length(text)::BIGINT AS n_chars_calc,
                   md5(lower(trim(text))) AS sig,
                   length(regexp_replace(text,'[aeiou]','','g'))::BIGINT AS vowelless_len
            FROM documents""",
        "timestamp_funcs": """
            SELECT event_id, strftime(ts,'%Y-%m-%d %H:%M:%S') AS ts_str,
                   year(ts)::BIGINT AS y, month(ts)::BIGINT AS m FROM events""",
        "rollup": """
            SELECT event_type, strftime(ts,'%Y-%m-%d') AS d, count(*)::BIGINT AS cnt
            FROM events GROUP BY ROLLUP(event_type, strftime(ts,'%Y-%m-%d'))""",
        "event_gaps": """
            WITH x AS (SELECT user_id, epoch_us(ts) AS us,
                              lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT user_id, round(avg((us-prev)/1000000.0) + 1e-9, 6) AS avg_gap_secs, count(prev)::BIGINT AS n_gaps
            FROM x GROUP BY user_id""",
        "dedup_exact": f"""
            WITH dd AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, upper(text) AS text
              FROM documents)
            SELECT fingerprint, dup_count, min_doc, max_doc FROM (
              SELECT md5({_NORM}) AS fingerprint, count(*)::BIGINT AS dup_count,
                     min(doc_id) AS min_doc, max(doc_id) AS max_doc
              FROM dd GROUP BY 1) WHERE dup_count > 1""",
        "ngram_jaccard": f"""
            WITH {_SHINGLES_CTE},
            sz AS (SELECT id, count(*)::BIGINT AS sz FROM sh GROUP BY id),
            inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS inter
                      FROM sh a JOIN sh b USING(shingle) WHERE a.id < b.id GROUP BY 1,2)
            SELECT id_a, id_b, round(j + 1e-9, 6) AS jaccard FROM (
              SELECT id_a, id_b, inter*1.0/(sa.sz+sb.sz-inter) AS j
              FROM inter JOIN sz sa ON sa.id=id_a JOIN sz sb ON sb.id=id_b)
            WHERE j >= 0.05""",
        # mirrors ngram_jaccard_pairs' drop rule: postings longer than the cap
        # contribute NO intersection evidence; per-doc sizes stay uncapped
        "ngram_jaccard_capped": f"""
            WITH {_SHINGLES_CTE},
            pc AS (SELECT shingle, count(*)::BIGINT AS dc FROM sh GROUP BY shingle),
            ok AS (SELECT id, sh.shingle FROM sh JOIN pc USING(shingle) WHERE pc.dc <= 3),
            sz AS (SELECT id, count(*)::BIGINT AS sz FROM sh GROUP BY id),
            inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS inter
                      FROM ok a JOIN ok b USING(shingle) WHERE a.id < b.id GROUP BY 1,2)
            SELECT id_a, id_b, round(j + 1e-9, 6) AS jaccard FROM (
              SELECT id_a, id_b, inter*1.0/(sa.sz+sb.sz-inter) AS j
              FROM inter JOIN sz sa ON sa.id=id_a JOIN sz sb ON sb.id=id_b)
            WHERE j >= 0.05""",
        "minhash_signatures": _minhash_oracle(),
        "simhash": _simhash_oracle(),
        "embedding_cosine": """
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) + 1e-9, 6) AS cosine
            FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q""",
        "quality_score": _quality_oracle(),
        "lang_id": _langid_oracle(),
        "token_count": """
            SELECT doc_id, len(string_split_regex(trim(text),'\\s+'))::BIGINT AS n_tokens_ws,
                   ceil(length(text)/4.0)::BIGINT AS n_tokens_bpe_est FROM documents""",
        "fingerprint": f"""
            SELECT doc_id, md5({_NORM}) AS fingerprint,
                   ('0x'||substr(md5({_NORM}),1,15))::BIGINT AS fingerprint64 FROM documents""",
        "events_extrema": """
            SELECT user_id, round(min(value) + 1e-9, 6) AS min_value, round(max(value) + 1e-9, 6) AS max_value,
                   strftime(min(ts),'%Y-%m-%d %H:%M:%S') AS first_ts,
                   strftime(max(ts),'%Y-%m-%d %H:%M:%S') AS last_ts
            FROM events GROUP BY user_id""",
        "cosine_ngram_pairs": f"""
            WITH toks AS (SELECT doc_id AS id, string_split({_NORM}, ' ') AS w FROM documents),
            sh AS (SELECT id, array_to_string(w[i.i:i.i+2],' ') AS shingle
                   FROM toks, UNNEST(range(1, greatest(len(w)-2,1)+1)) AS i(i)),
            cnts AS (SELECT id, shingle, count(*)::BIGINT AS cnt FROM sh GROUP BY 1,2),
            norms AS (SELECT id, CAST(sum(cnt*cnt) AS BIGINT) AS norm2 FROM cnts GROUP BY id),
            dots AS (SELECT a.id AS id_a, b.id AS id_b, CAST(sum(a.cnt*b.cnt) AS BIGINT) AS dot
                     FROM cnts a JOIN cnts b USING(shingle) WHERE a.id < b.id GROUP BY 1,2)
            SELECT id_a, id_b, round(c + 1e-9, 6) AS similarity FROM (
              SELECT id_a, id_b, dot*1.0/sqrt(na.norm2*nb.norm2) AS c
              FROM dots JOIN norms na ON na.id=id_a JOIN norms nb ON nb.id=id_b)
            WHERE c >= 0.2""",
        "running_sum": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-9, 6) AS running_value
            FROM events""",
        "tumbling_window": """
            SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*)::BIGINT AS cnt, round(avg(value) + 1e-9, 6) AS avg_value
            FROM events GROUP BY 1, 2""",
        "windowed_stream": """
            SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*)::BIGINT AS cnt, round(avg(value) + 1e-9, 6) AS avg_value
            FROM events GROUP BY 1, 2""",
        # original events only (Spark drops every injected late duplicate),
        # windows closed by the final watermark (global max ts - 2h) only
        "windowed_append": """
            WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events)
            SELECT strftime(date_trunc('hour', ts),'%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*)::BIGINT AS cnt, round(avg(value) + 1e-9, 6) AS avg_value
            FROM events, wm
            WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
            GROUP BY 1, 2""",
        "cosine_one_vs_all": f"""
            WITH toks AS (SELECT doc_id AS id, string_split({_NORM}, ' ') AS w FROM documents),
            sh AS (SELECT id, array_to_string(w[i.i:i.i+2],' ') AS shingle
                   FROM toks, UNNEST(range(1, greatest(len(w)-2,1)+1)) AS i(i)),
            cnts AS (SELECT id, shingle, count(*)::BIGINT AS cnt FROM sh GROUP BY 1,2),
            norms AS (SELECT id, CAST(sum(cnt*cnt) AS BIGINT) AS norm2 FROM cnts GROUP BY id),
            tgt AS (SELECT min(doc_id) AS tid FROM documents),
            t AS (SELECT shingle, cnt FROM cnts, tgt WHERE id = tid),
            dots AS (SELECT c.id, CAST(sum(c.cnt*t.cnt) AS BIGINT) AS dot
                     FROM cnts c JOIN t USING(shingle), tgt WHERE c.id != tid GROUP BY c.id)
            SELECT id, round(c + 1e-9, 6) AS similarity FROM (
              SELECT d.id, d.dot*1.0/sqrt(n.norm2*tn.norm2) AS c
              FROM dots d JOIN norms n ON n.id=d.id
                   JOIN tgt ON true JOIN norms tn ON tn.id=tgt.tid)
            WHERE c >= 0.05""",
        "khop_reach": """
            WITH RECURSIVE e AS (
                SELECT 's'||s_suppkey AS src, 'n'||s_nationkey AS dst FROM supplier
                UNION ALL
                SELECT 'n'||n_nationkey, 'r'||n_regionkey FROM nation),
            seeds AS (SELECT 's'||s_suppkey AS node FROM supplier WHERE s_suppkey < 3),
            walk(node, hops) AS (
                SELECT node, 0 FROM seeds
                UNION
                SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
                WHERE w.hops < 2)
            SELECT node, min(hops)::BIGINT AS hops FROM walk GROUP BY node""",
        "sssp_dists": """
            WITH RECURSIVE e0 AS (
                SELECT s_suppkey AS src, s_suppkey + 1 AS dst,
                       CAST(s_suppkey % 7 + 1 AS DOUBLE) AS w FROM supplier
                UNION ALL
                SELECT s_suppkey, s_suppkey + 5, 3.0 FROM supplier),
            e AS (SELECT e0.* FROM e0 JOIN supplier s ON e0.dst = s.s_suppkey),
            seeds AS (SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 25 = 0),
            walk(node, dist, hops) AS (
                SELECT node, CAST(0.0 AS DOUBLE), 0 FROM seeds
                UNION ALL
                SELECT e.dst, w.dist + e.w, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
                WHERE w.hops < 8)
            SELECT node::BIGINT AS node, round(min(dist) + 1e-9, 6) AS dist
            FROM walk GROUP BY node""",
        "sssp_targeted": """
            WITH RECURSIVE e0 AS (
                SELECT s_suppkey AS src, s_suppkey + 1 AS dst,
                       CAST(s_suppkey % 7 + 1 AS DOUBLE) AS w FROM supplier
                UNION ALL
                SELECT s_suppkey, s_suppkey + 5, 3.0 FROM supplier),
            e AS (SELECT e0.* FROM e0 JOIN supplier s ON e0.dst = s.s_suppkey),
            seeds AS (SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 25 = 0),
            walk(node, dist, hops) AS (
                SELECT node, CAST(0.0 AS DOUBLE), 0 FROM seeds
                UNION ALL
                SELECT e.dst, w.dist + e.w, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
                WHERE w.hops < 12)
            SELECT node::BIGINT AS node, round(min(dist) + 1e-9, 6) AS dist
            FROM walk WHERE node % 25 = 1 AND node > 25 GROUP BY node""",
        "betweenness_landmarks": """
            WITH mem AS (
                SELECT s_suppkey AS k, s_suppkey // 25 AS g,
                       CASE WHEN s_suppkey // 25 = 0 THEN 1.0 ELSE 2.0 END AS sigma,
                       CASE WHEN s_suppkey % 10 = 5 THEN 1.0 ELSE 0.0 END AS delta
                FROM supplier WHERE s_suppkey % 25 <> 0),
            grp AS (
                SELECT g, sum((1.0 / sigma) * (1.0 + delta)) AS dep
                FROM mem GROUP BY g),
            hubs AS (
                SELECT s.s_suppkey AS k,
                       coalesce(own.dep, 0) + coalesce(nxt.dep, 0) AS dep
                FROM supplier s
                LEFT JOIN grp own ON own.g = s.s_suppkey // 25
                LEFT JOIN grp nxt ON nxt.g = s.s_suppkey // 25 + 1
                WHERE s.s_suppkey % 25 = 0)
            SELECT lpad(CAST(k AS VARCHAR), 7, '0') AS node,
                   2.0 * dep AS betweenness, 2::BIGINT AS n_sources
            FROM hubs WHERE dep > 0
            UNION ALL
            SELECT lpad(CAST(k AS VARCHAR), 7, '0') AS node,
                   2.0 AS betweenness, 2::BIGINT AS n_sources
            FROM mem WHERE k % 10 = 5""",
        "betweenness_weighted": """
            WITH mem AS (
                SELECT s_suppkey AS k, s_suppkey // 25 AS g,
                       CAST(CASE WHEN s_suppkey % 5 = 1 THEN 0.5
                                 WHEN s_suppkey % 5 = 2 THEN 0.0
                                 ELSE 1.0 + (CASE WHEN s_suppkey % 10 = 5
                                                  THEN 1.0 ELSE 0.0 END)
                            END AS DOUBLE) AS contrib
                FROM supplier WHERE s_suppkey % 25 <> 0),
            grp AS (SELECT g, sum(contrib) AS dep FROM mem GROUP BY g),
            hubs AS (
                SELECT s.s_suppkey AS k, grp.dep
                FROM supplier s JOIN grp ON grp.g = s.s_suppkey // 25
                WHERE s.s_suppkey % 25 = 0)
            SELECT lpad(CAST(k AS VARCHAR), 7, '0') AS node,
                   CAST(2.0 * dep AS DOUBLE) AS betweenness,
                   2::BIGINT AS n_sources
            FROM hubs WHERE dep > 0
            UNION ALL
            SELECT lpad(CAST(k AS VARCHAR), 7, '0') AS node,
                   CAST(2.0 AS DOUBLE) AS betweenness, 2::BIGINT AS n_sources
            FROM mem WHERE k % 10 = 5""",
        "sssp_paths": """
            WITH RECURSIVE e0 AS (
                SELECT s_suppkey AS src, s_suppkey + 1 AS dst,
                       CAST(s_suppkey % 7 + 1 AS DOUBLE) AS w FROM supplier
                UNION ALL
                SELECT s_suppkey, s_suppkey + 5, 3.0 FROM supplier),
            e AS (SELECT e0.* FROM e0 JOIN supplier s ON e0.dst = s.s_suppkey),
            seeds AS (SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 25 = 0),
            walk(node, dist, hops) AS (
                SELECT node, CAST(0.0 AS DOUBLE), 0 FROM seeds
                UNION ALL
                SELECT e.dst, w.dist + e.w, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
                WHERE w.hops < 12),
            d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node),
            p AS (SELECT e.dst AS node, min(e.src) AS pred
                  FROM e JOIN d du ON du.node = e.src JOIN d dv ON dv.node = e.dst
                  WHERE du.dist + e.w = dv.dist
                  GROUP BY e.dst)
            SELECT d.node::BIGINT AS node, round(d.dist + 1e-9, 6) AS dist,
                   p.pred::BIGINT AS pred
            FROM d LEFT JOIN p ON p.node = d.node""",
        "harmonic_landmarks": """
            WITH RECURSIVE e0 AS (
                SELECT s_suppkey AS src, s_suppkey + 1 AS dst,
                       CAST(s_suppkey % 7 + 1 AS DOUBLE) AS w FROM supplier
                UNION ALL
                SELECT s_suppkey, s_suppkey + 5, 3.0 FROM supplier),
            e AS (SELECT e0.* FROM e0 JOIN supplier s ON e0.dst = s.s_suppkey),
            lm AS (SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 250 = 0),
            walk(seed, node, dist, hops) AS (
                SELECT node, node, CAST(0.0 AS DOUBLE), 0 FROM lm
                UNION ALL
                SELECT w.seed, e.dst, w.dist + e.w, w.hops + 1
                FROM walk w JOIN e ON e.src = w.node
                WHERE w.hops < 12),
            d AS (SELECT seed, node, min(dist) AS dist FROM walk GROUP BY seed, node)
            SELECT node::BIGINT AS node,
                   round(sum(1.0 / dist) + 1e-9, 6) AS harmonic,
                   count(*)::BIGINT AS n_landmarks
            FROM d WHERE seed != node GROUP BY node""",
        "sssp_route": """
            WITH RECURSIVE e0 AS (
                SELECT s_suppkey AS src, s_suppkey + 1 AS dst,
                       CAST(s_suppkey % 7 + 1 AS DOUBLE) AS w FROM supplier
                UNION ALL
                SELECT s_suppkey, s_suppkey + 5, 3.0 FROM supplier),
            e AS (SELECT e0.* FROM e0 JOIN supplier s ON e0.dst = s.s_suppkey),
            seeds AS (SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 25 = 0),
            walk(node, dist, hops) AS (
                SELECT node, CAST(0.0 AS DOUBLE), 0 FROM seeds
                UNION ALL
                SELECT e.dst, w.dist + e.w, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
                WHERE w.hops < 12),
            d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node),
            p AS (SELECT e.dst AS node, min(e.src) AS pred
                  FROM e JOIN d du ON du.node = e.src JOIN d dv ON dv.node = e.dst
                  WHERE du.dist + e.w = dv.dist
                  GROUP BY e.dst),
            walk2(tgt, cur, route) AS (
                SELECT s_suppkey, s_suppkey, s_suppkey::VARCHAR
                FROM supplier WHERE s_suppkey % 25 = 24
                UNION ALL
                SELECT w.tgt, p.pred, p.pred::VARCHAR || '->' || w.route
                FROM walk2 w JOIN p ON p.node = w.cur)
            SELECT w.tgt::BIGINT AS node, round(d.dist + 1e-9, 6) AS dist,
                   w.route AS route
            FROM walk2 w
            JOIN d ON d.node = w.tgt
            LEFT JOIN p pc ON pc.node = w.cur
            WHERE pc.node IS NULL""",
        "msf_edges": """
            SELECT s.s_suppkey::BIGINT AS u, (s.s_suppkey + 1)::BIGINT AS v,
                   round(CAST(10 + s.s_suppkey % 7 AS DOUBLE) + 1e-9, 6) AS w
            FROM supplier s JOIN supplier t ON t.s_suppkey = s.s_suppkey + 1""",
        "sl_clusters": """
            SELECT s_suppkey::BIGINT AS node,
                   (s_suppkey - s_suppkey % 7)::BIGINT AS cluster
            FROM supplier s
            WHERE s_suppkey % 7 IN (1, 2, 3)
               OR (s_suppkey % 7 = 0 AND EXISTS (
                     SELECT 1 FROM supplier t
                     WHERE t.s_suppkey = s.s_suppkey + 1))""",
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
            s AS (SELECT q.query_id, e.vec_id,
                         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS c
                  FROM embeddings e CROSS JOIN q),
            r AS (SELECT query_id, vec_id, c,
                         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id)::BIGINT AS rank
                  FROM s)
            SELECT query_id, vec_id, round(c + 1e-9, 6) AS cosine, rank FROM r WHERE rank <= 10""",
        "session_count": """
            WITH x AS (SELECT user_id, ts,
                              CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                        >= INTERVAL 30 MINUTE OR
                                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                   THEN 1 ELSE 0 END AS new_s
                       FROM events),
                 g AS (SELECT user_id, ts,
                              sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                       FROM x)
            SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*)::BIGINT AS n_events
            FROM g GROUP BY user_id, sid""",
        "asof_attach": """
            WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type='view'),
                 r AS (SELECT user_id, ts, max(value) AS sv
                       FROM events WHERE event_type='signup' GROUP BY 1, 2)
            SELECT l.event_id, l.user_id, round(r.sv + 1e-9, 6) AS last_signup_value
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "interval_attach": """
            WITH p AS (SELECT o_orderkey, epoch(o_orderdate)::BIGINT AS e FROM orders),
                 i AS (SELECT o_orderkey AS iid, epoch(o_orderdate)::BIGINT AS lo,
                              epoch(o_orderdate)::BIGINT + 14*86400 AS hi
                       FROM orders WHERE o_orderkey % 100 = 0)
            SELECT p.o_orderkey AS pid, i.iid
            FROM p JOIN i ON p.e BETWEEN i.lo AND i.hi""",
        "small_qty_revenue": """
            WITH a AS (SELECT l_partkey AS pk, avg(l_quantity)*0.5 AS half_avg
                       FROM lineitem GROUP BY l_partkey)
            SELECT round(sum(CAST(l_extendedprice AS DECIMAL(18,4)))/7.0, 2)::DOUBLE AS avg_yearly,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN a ON l_partkey = pk
            WHERE l_quantity < half_avg""",
        "segment_pivot": """
            SELECT c_nationkey,
                   round(sum(CASE WHEN c_mktsegment='BUILDING' THEN o_totalprice ELSE 0 END),2) AS building_rev,
                   round(sum(CASE WHEN c_mktsegment='MACHINERY' THEN o_totalprice ELSE 0 END),2) AS machinery_rev,
                   count(CASE WHEN c_mktsegment='AUTOMOBILE' THEN 1 END)::BIGINT AS auto_orders
            FROM customer JOIN orders ON c_custkey=o_custkey
            GROUP BY c_nationkey""",
        "array_funcs": """
            SELECT vec_id,
                   round(list_sum(CAST(embedding AS DOUBLE[])) + 1e-9, 6) AS vec_sum,
                   round(coalesce(list_sum(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)), 0.0) + 1e-9, 6) AS pos_sum,
                   len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))::BIGINT AS n_pos,
                   round(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) + 1e-9, 6) AS max_abs
            FROM embeddings""",
        "ivf_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
            s AS (SELECT q.query_id, e.vec_id,
                         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS c
                  FROM embeddings e CROSS JOIN q),
            r AS (SELECT query_id, vec_id, c,
                         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id)::BIGINT AS rank
                  FROM s)
            SELECT query_id, vec_id, round(c + 1e-9, 6) AS cosine, rank FROM r WHERE rank <= 10""",
        "graph_degrees": """
            WITH e AS (SELECT DISTINCT 'c'||o_custkey AS src, 's'||l_suppkey AS dst
                       FROM orders JOIN lineitem ON o_orderkey=l_orderkey),
            v AS (SELECT src AS node, 1 AS o FROM e UNION ALL SELECT dst, 0 FROM e)
            SELECT node, sum(CASE WHEN o=0 THEN 1 ELSE 0 END)::BIGINT AS in_degree,
                   sum(o)::BIGINT AS out_degree, count(*)::BIGINT AS degree
            FROM v GROUP BY node""",
        "dedup_clusters": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            sz AS (SELECT id, count(*)::BIGINT AS sz FROM sh GROUP BY id),
            inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS inter
                      FROM sh a JOIN sh b USING(shingle) WHERE a.id < b.id GROUP BY 1,2),
            pairs AS (SELECT id_a, id_b FROM (
                        SELECT id_a, id_b, inter*1.0/(sa.sz+sb.sz-inter) AS j
                        FROM inter JOIN sz sa ON sa.id=id_a JOIN sz sb ON sb.id=id_b)
                      WHERE j >= 0.05),
            edges AS (SELECT id_a::VARCHAR AS u, id_b::VARCHAR AS v FROM pairs
                      UNION SELECT id_b::VARCHAR, id_a::VARCHAR FROM pairs),
            walk(node, lab) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.v, w.lab FROM walk w JOIN edges e ON e.u = w.node)
            SELECT node, min(lab) AS component FROM walk GROUP BY node""",
        "pagerank_ranks": _pagerank_oracle(num_iter=5, damping=0.85),
        "interface_jaccard": f"""
            WITH toks AS (SELECT DISTINCT doc_id AS id, unnest(string_split({_NORM},' ')) AS token
                          FROM documents),
            sz AS (SELECT id, count(*)::BIGINT AS sz FROM toks GROUP BY id),
            inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS inter
                      FROM toks a JOIN toks b USING(token) WHERE a.id < b.id GROUP BY 1,2)
            SELECT id_a, id_b, round(j + 1e-9, 6) AS similarity FROM (
              SELECT id_a, id_b, inter*1.0/(sa.sz+sb.sz-inter) AS j
              FROM inter JOIN sz sa ON sa.id=id_a JOIN sz sb ON sb.id=id_b)
            WHERE j >= 0.6""",
        "simhash_near_pairs": f"""
            WITH v AS ({_simhash_oracle()})
            SELECT a.id AS id_a, b.id AS id_b,
                   bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM v a JOIN v b ON a.id < b.id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "order_priority": """
            SELECT o_orderpriority, count(*)::BIGINT AS order_count FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority""",
        "custdist": """
            SELECT c_count, count(*)::BIGINT AS custdist FROM (
              SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
              FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus != 'F') o
                   ON c_custkey = o_custkey
              GROUP BY c_custkey)
            GROUP BY c_count""",
        "brand_supplier_count": """
            SELECT p_brand, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM part JOIN lineitem ON p_partkey = l_partkey
            WHERE p_type NOT LIKE 'SMALL%'
            GROUP BY p_brand""",
        "large_orders": """
            SELECT c_custkey, o_orderkey, round(sum_qty, 2) AS sum_qty,
                   round(o_totalprice, 2) AS total
            FROM customer JOIN orders ON c_custkey = o_custkey
                 JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 300) b
                 ON o_orderkey = b.l_orderkey""",
        "top_balance_idle": """
            SELECT substr(c_name, length(c_name) - 1, 2) AS tail2,
                   count(*)::BIGINT AS numcust, round(sum(c_acctbal), 2) AS totacctbal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'P')
            GROUP BY 1""",
        "important_parts": """
            SELECT l_partkey, round(val, 2) AS val FROM (
              SELECT l_partkey, sum(l_extendedprice) AS val FROM lineitem GROUP BY l_partkey)
            WHERE val > (SELECT sum(l_extendedprice) * 0.0005 FROM lineitem)""",
        "nation_flows": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(o_orderdate)::BIGINT AS l_year,
                   round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation n1 ON s_nationkey = n1.n_nationkey
                 JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name < n2.n_name
            GROUP BY 1, 2, 3""",
        "rank_funcs": """
            SELECT c_custkey, c_nationkey,
                   dense_rank() OVER w ::BIGINT AS drank,
                   round(percent_rank() OVER w + 1e-9, 6) AS prank,
                   ntile(4) OVER w ::BIGINT AS quartile,
                   round(cume_dist() OVER w + 1e-9, 6) AS cdist
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""",
        "set_ops": """
            WITH bld AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
                 auto AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
                 active AS (SELECT DISTINCT o_custkey AS k FROM orders)
            SELECT k, 'building_active' AS op FROM (SELECT k FROM bld INTERSECT SELECT k FROM active)
            UNION ALL
            SELECT k, 'building_inactive' FROM (SELECT k FROM bld EXCEPT ALL SELECT k FROM active)
            UNION ALL
            SELECT k, 'building_or_auto' FROM (SELECT k FROM bld UNION SELECT k FROM auto)""",
        "percentiles": """
            SELECT c_nationkey,
                   round(quantile_cont(c_acctbal, 0.25) + 1e-9, 6) AS q25,
                   round(quantile_cont(c_acctbal, 0.5) + 1e-9, 6) AS median,
                   round(quantile_cont(c_acctbal, 0.75) + 1e-9, 6) AS q75
            FROM customer GROUP BY c_nationkey""",
        "string_agg": """
            SELECT c_nationkey,
                   array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
                   count(*)::BIGINT AS n
            FROM customer GROUP BY c_nationkey""",
        "sliding_window": """
            WITH s AS (SELECT event_type, value,
                              date_trunc('hour', ts)
                              + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                                     ELSE INTERVAL 0 MINUTE END AS w1
                       FROM events),
                 w AS (SELECT event_type, value, w1 AS ws FROM s
                       UNION ALL
                       SELECT event_type, value, w1 - INTERVAL 30 MINUTE FROM s)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
                   count(*)::BIGINT AS cnt, round(avg(value) + 1e-9, 6) AS avg_value
            FROM w GROUP BY 1, 2""",
        "corr_stats": """
            SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice) + 1e-9, 6) AS qty_price_corr,
                   round(covar_pop(l_quantity, l_discount) + 1e-9, 6) AS qty_disc_covar,
                   round(var_pop(l_quantity) + 1e-9, 6) AS qty_var,
                   round(stddev_samp(l_extendedprice) + 1e-9, 6) AS price_sd
            FROM lineitem GROUP BY l_returnflag""",
        "cube_grouping": """
            SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS cnt,
                   round(sum(o_totalprice), 2) AS total,
                   GROUPING(o_orderstatus, o_orderpriority)::BIGINT AS gid
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
        "filter_agg": """
            SELECT round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2)::DOUBLE AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",
        "late_shipments": """
            SELECT l_linestatus,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                   sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
            GROUP BY l_linestatus""",
        "promo_revenue": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)) + 1e-9, 6) AS promo_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey""",
        "disjunctive_filter": """
            SELECT round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
               OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
               OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)""",
        "range_frame": """
            SELECT event_id, user_id,
                   round(sum(value) OVER w + 1e-9, 6) AS range_sum,
                   count(*) OVER w ::BIGINT AS range_cnt
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                         RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)""",
        "value_window": """
            SELECT event_id, user_id,
                   first_value(event_type) OVER wf AS first_type,
                   last_value(event_type) OVER wf AS last_type,
                   nth_value(event_type, 2) OVER wf AS second_type,
                   coalesce(lead(event_type, 1) OVER w, 'NONE') AS next_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                   wf AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
        "posexplode_tokens": f"""
            WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
            SELECT doc_id, CAST(i.i - 1 AS BIGINT) AS pos, w[i.i] AS token
            FROM toks, UNNEST(range(1, least(len(w), 5) + 1)) AS i(i)""",
        "length_histogram": """
            SELECT floor(length(text) / 50)::BIGINT AS bucket,
                   count(*)::BIGINT AS n_docs,
                   min(length(text))::BIGINT AS min_len,
                   max(length(text))::BIGINT AS max_len
            FROM documents GROUP BY 1""",
        "argmax_customer": """
            WITH r AS (SELECT c_nationkey, c_name,
                              row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey DESC) AS rhi,
                              row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal ASC, c_custkey ASC) AS rlo
                       FROM customer)
            SELECT c_nationkey,
                   max(CASE WHEN rhi = 1 THEN c_name END) AS richest,
                   max(CASE WHEN rlo = 1 THEN c_name END) AS poorest
            FROM r GROUP BY c_nationkey""",
        "bool_aggs": """
            SELECT c_mktsegment,
                   bool_and(c_acctbal > 0) AS all_positive,
                   bool_or(c_acctbal > 9000) AS any_rich,
                   count_if(c_acctbal < 0)::BIGINT AS n_negative
            FROM customer GROUP BY c_mktsegment""",
        "heavy_hitters": f"""
            SELECT token, count(*)::BIGINT AS freq
            FROM (SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents)
            GROUP BY token ORDER BY freq DESC, token LIMIT 20""",
        "motif_paths": """
            SELECT 's' || s_suppkey AS a, 'n' || s_nationkey AS b, 'r' || n_regionkey AS c
            FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
        "source_mix": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     ('0x'||substr(md5(doc_id::VARCHAR||':mix-v1'),1,8))::BIGINT % 10000 AS b
              FROM documents)
            WHERE b < CASE lang WHEN 'en' THEN 10000 WHEN 'de' THEN 5000
                                WHEN 'fr' THEN 2500 ELSE 1000 END""",
        "rep_stats": r"""
            WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)),'\s+') AS ws FROM documents)
            SELECT doc_id,
                   round((len(ws) - len(list_distinct(ws)))*1.0/greatest(len(ws),1) + 1e-9, 6) AS dup_word_ratio,
                   round(coalesce(list_max(list_transform(list_distinct(ws),
                                  x -> len(list_filter(ws, y -> y = x)))), 0)*1.0
                         / greatest(len(ws),1) + 1e-9, 6) AS top_word_ratio
            FROM w""",
        "seq_pack": r"""
            WITH t AS (
              SELECT doc_id,
                     len(string_split_regex(trim(text),'\s+'))::BIGINT AS n_tokens,
                     ('0x'||substr(md5(doc_id::VARCHAR||':pack-v1'),1,8))::BIGINT AS h
              FROM documents),
            s AS (SELECT doc_id, n_tokens, h, h % 4 AS shard FROM t),
            c AS (SELECT doc_id, shard, n_tokens,
                         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
                  FROM s)
            SELECT doc_id, shard,
                   (shard * 1099511627776 + (cum_excl // 512))::BIGINT AS pack_id,
                   (cum_excl - (cum_excl // 512) * 512)::BIGINT AS pack_offset,
                   n_tokens
            FROM c""",
        "incr_curate": f"""
            WITH seen AS (SELECT DISTINCT md5({_NORM}) AS fp FROM documents WHERE doc_id < 250),
            newf AS (SELECT doc_id, text, md5({_NORM}) AS fp FROM documents WHERE doc_id >= 250),
            fresh AS (SELECT * FROM newf WHERE fp NOT IN (SELECT fp FROM seen)),
            kept AS (SELECT f.doc_id, f.text FROM fresh f
                     JOIN (SELECT fp, min(doc_id) AS mdoc FROM fresh GROUP BY fp) w
                       ON w.mdoc = f.doc_id AND w.fp = f.fp),
            feat AS (
              SELECT doc_id, text,
                len(string_split_regex(trim(text),'\\s+')) AS n_words,
                (length(text) - length(regexp_replace(text,'[^\\p{{L}}\\p{{N}}_\\s]','','g')))*1.0/greatest(length(text),1) AS punct_ratio,
                len(list_filter(string_split_regex(lower(trim(text)),'\\s+'), x -> list_contains({_STOPS_ALL}, x)))*1.0
                  / greatest(len(string_split_regex(trim(text),'\\s+')),1) AS stop_ratio,
                (length(text) - len(string_split_regex(trim(text),'\\s+')) + 1)*1.0
                  / greatest(len(string_split_regex(trim(text),'\\s+')),1) AS mwl
              FROM kept
            ),
            filt AS (
              SELECT doc_id, text, n_words FROM feat
              WHERE (CASE WHEN n_words < 5 THEN 0.0 WHEN punct_ratio > 0.3 THEN 0.2
                          ELSE least(1.0, 0.5 + stop_ratio
                               + CASE WHEN mwl >= 3 AND mwl <= 10 THEN 0.2 ELSE 0.0 END) END) >= 0.5
            ),
            lang AS (
              SELECT doc_id, n_words,
                len(list_intersect(string_split({_NORM},' '), {_LANG_STOPS['en']})) AS h_en,
                len(list_intersect(string_split({_NORM},' '), {_LANG_STOPS['de']})) AS h_de,
                len(list_intersect(string_split({_NORM},' '), {_LANG_STOPS['fr']})) AS h_fr,
                len(list_intersect(string_split({_NORM},' '), {_LANG_STOPS['es']})) AS h_es
              FROM filt
            )
            SELECT doc_id,
                CASE WHEN h_fr > greatest(h_es, greatest(h_en, greatest(h_de, 0))) THEN 'fr'
                     ELSE CASE WHEN h_es > greatest(h_en, greatest(h_de, 0)) THEN 'es'
                          ELSE CASE WHEN h_en > greatest(h_de, 0) THEN 'en'
                               ELSE CASE WHEN h_de > 0 THEN 'de' ELSE 'und' END END END END AS lang_pred,
                n_words::BIGINT AS n_tokens_ws,
                CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR||':split-v1'),1,8))::BIGINT % 10000 < 9000 THEN 'train'
                     WHEN ('0x'||substr(md5(doc_id::VARCHAR||':split-v1'),1,8))::BIGINT % 10000 < 9500 THEN 'val'
                     ELSE 'test' END AS split
            FROM lang""",
        "pack_texts": r"""
            WITH t AS (
              SELECT doc_id, text,
                     len(string_split_regex(trim(text),'\s+'))::BIGINT AS n_tokens,
                     ('0x'||substr(md5(doc_id::VARCHAR||':pack-v1'),1,8))::BIGINT AS h
              FROM documents),
            s AS (SELECT doc_id, text, n_tokens, h, h % 4 AS shard FROM t),
            c AS (SELECT doc_id, text, shard, n_tokens,
                         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
                  FROM s),
            p AS (SELECT doc_id, text,
                         (shard * 1099511627776 + (cum_excl // 512))::BIGINT AS pack_id,
                         (cum_excl - (cum_excl // 512) * 512)::BIGINT AS pack_offset
                  FROM c)
            SELECT pack_id, count(*)::BIGINT AS n_docs,
                   md5(string_agg(text, ' ' ORDER BY pack_offset)) AS text_md5,
                   length(string_agg(text, ' ' ORDER BY pack_offset))::BIGINT AS text_len
            FROM p GROUP BY pack_id""",
        "pii_redact": r"""
            WITH aug AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0
                          THEN text || ' reach user' || doc_id || '@example.com or 10.0.' || (doc_id % 200) || '.7 today'
                          ELSE text END AS text
              FROM documents),
            r1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
                     regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
              FROM aug),
            r2 AS (
              SELECT doc_id, n_email,
                     len(regexp_extract_all(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))::BIGINT AS n_ipv4,
                     regexp_replace(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g') AS t2
              FROM r1)
            SELECT doc_id, n_email, n_ipv4, (n_email + n_ipv4)::BIGINT AS n_pii_total,
                   length(t2)::BIGINT AS redacted_len
            FROM r2""",
        "decontam": f"""
            WITH {_SHINGLES_CTE},
            b AS (SELECT id AS bench_id, shingle FROM sh WHERE id < 3)
            SELECT a.id AS doc_id, b.bench_id, count(DISTINCT a.shingle)::BIGINT AS n_shared_shingles
            FROM sh a JOIN b ON a.shingle = b.shingle
            WHERE a.id != b.bench_id
            GROUP BY 1, 2 HAVING count(DISTINCT a.shingle) >= 2""",
        "corpus_pipeline": f"""
            WITH kept AS (
              SELECT d.doc_id, d.text FROM documents d
              JOIN (SELECT md5({_NORM}) AS fp, min(doc_id) AS mdoc
                    FROM documents GROUP BY 1) w ON w.mdoc = d.doc_id
            ),
            feat AS (
              SELECT doc_id, text,
                len(string_split_regex(trim(text),'\\s+')) AS n_words,
                (length(text) - length(regexp_replace(text,'[^\\p{{L}}\\p{{N}}_\\s]','','g')))*1.0/greatest(length(text),1) AS punct_ratio,
                len(list_filter(string_split_regex(lower(trim(text)),'\\s+'), x -> list_contains({_STOPS_ALL}, x)))*1.0
                  / greatest(len(string_split_regex(trim(text),'\\s+')),1) AS stop_ratio,
                (length(text) - len(string_split_regex(trim(text),'\\s+')) + 1)*1.0
                  / greatest(len(string_split_regex(trim(text),'\\s+')),1) AS mwl
              FROM kept
            ),
            filt AS (
              SELECT doc_id, text, n_words, ceil(length(text)/4.0)::BIGINT AS n_tokens_bpe
              FROM feat
              WHERE (CASE WHEN n_words < 5 THEN 0.0 WHEN punct_ratio > 0.3 THEN 0.2
                          ELSE least(1.0, 0.5 + stop_ratio
                               + CASE WHEN mwl >= 3 AND mwl <= 10 THEN 0.2 ELSE 0.0 END) END) >= 0.5
            ),
            lang AS (
              SELECT doc_id, n_words, n_tokens_bpe,
                len(list_intersect(string_split({_NORM},' '), {_LANG_STOPS['en']})) AS h_en,
                len(list_intersect(string_split({_NORM},' '), {_LANG_STOPS['de']})) AS h_de,
                len(list_intersect(string_split({_NORM},' '), {_LANG_STOPS['fr']})) AS h_fr,
                len(list_intersect(string_split({_NORM},' '), {_LANG_STOPS['es']})) AS h_es
              FROM filt
            ),
            tagged AS (
              SELECT doc_id, n_words, n_tokens_bpe,
                CASE WHEN h_fr > greatest(h_es, greatest(h_en, greatest(h_de, 0))) THEN 'fr'
                     ELSE CASE WHEN h_es > greatest(h_en, greatest(h_de, 0)) THEN 'es'
                          ELSE CASE WHEN h_en > greatest(h_de, 0) THEN 'en'
                               ELSE CASE WHEN h_de > 0 THEN 'de' ELSE 'und' END END END END AS lang_pred,
                CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR||':split-v1'),1,8))::BIGINT % 10000 < 9000 THEN 'train'
                     WHEN ('0x'||substr(md5(doc_id::VARCHAR||':split-v1'),1,8))::BIGINT % 10000 < 9500 THEN 'val'
                     ELSE 'test' END AS split
              FROM lang
            )
            SELECT lang_pred, split, count(*)::BIGINT AS n_docs,
                   sum(n_words)::BIGINT AS total_tokens_ws,
                   sum(n_tokens_bpe)::BIGINT AS total_tokens_bpe
            FROM tagged GROUP BY 1, 2""",
        "cms_topk": f"""
            SELECT token, freq, TRUE AS cand_ok, TRUE AS est_ok
            FROM (SELECT token, count(*)::BIGINT AS freq
                  FROM (SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents)
                  GROUP BY token ORDER BY freq DESC, token LIMIT 20)""",
        "triangle_count": f"""
            WITH {_SHINGLES_CTE},
            sz AS (SELECT id, count(*)::BIGINT AS sz FROM sh GROUP BY id),
            inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS inter
                      FROM sh a JOIN sh b USING(shingle) WHERE a.id < b.id GROUP BY 1,2),
            p AS (SELECT id_a, id_b FROM (
                    SELECT id_a, id_b, inter*1.0/(sa.sz+sb.sz-inter) AS j
                    FROM inter JOIN sz sa ON sa.id=id_a JOIN sz sb ON sb.id=id_b)
                  WHERE j >= 0.02)
            SELECT count(*)::BIGINT AS n_triangles
            FROM p e1 JOIN p e2 ON e1.id_b = e2.id_a
                 JOIN p e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b""",
        "returned_revenue": """
            SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
                   round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
                 JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_returnflag = 'R'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey LIMIT 20""",
        "top_supplier": """
            WITH srev AS (SELECT l_suppkey AS sk,
                                 round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)::DOUBLE AS total_revenue
                          FROM lineitem GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM srev JOIN supplier ON sk = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM srev)""",
        "train_split": """
            SELECT doc_id,
                   CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x'||substr(md5(doc_id::VARCHAR||':split-v1'),1,8))::BIGINT % 10000 AS b
                  FROM documents)""",
        "stratified_split": """
            WITH h AS (SELECT doc_id, lang,
                              ('0x'||substr(md5(doc_id::VARCHAR||':split-v1'),1,8))::BIGINT % 10000 AS b
                       FROM documents),
                 r AS (SELECT doc_id, lang,
                              row_number() OVER (PARTITION BY lang ORDER BY b, doc_id) AS rn,
                              count(*) OVER (PARTITION BY lang) AS n
                       FROM h)
            SELECT doc_id, lang,
                   CASE WHEN rn <= ceil(round(n * 0.9, 9)) THEN 'train'
                        WHEN rn <= ceil(round(n * 0.95, 9)) THEN 'val'
                        ELSE 'test' END AS split
            FROM r""",
        "approx_sketches": """
            SELECT l_suppkey, count(DISTINCT l_partkey)::BIGINT AS exact_nd,
                   TRUE AS nd_ok, TRUE AS p50_ok
            FROM lineitem GROUP BY l_suppkey""",
        "percentile_disc": """
            -- percentile_disc semantics (smallest value with cume_dist >= p)
            -- emulated portably: this DuckDB's quantile_disc uses a
            -- different tie rule (floor((n-1)p) indexing)
            WITH cd AS (SELECT c_nationkey, c_acctbal,
                               cume_dist() OVER (PARTITION BY c_nationkey
                                                 ORDER BY c_acctbal) AS cd
                        FROM customer)
            SELECT c_nationkey,
                   round(min(CASE WHEN cd >= 0.25 THEN c_acctbal END) + 1e-9, 6) AS p25,
                   round(min(CASE WHEN cd >= 0.5  THEN c_acctbal END) + 1e-9, 6) AS p50,
                   round(min(CASE WHEN cd >= 0.75 THEN c_acctbal END) + 1e-9, 6) AS p75
            FROM cd GROUP BY c_nationkey""",
        "map_funcs": """
            WITH per AS (SELECT o_custkey, o_orderstatus AS status,
                                count(*)::BIGINT AS cnt
                         FROM orders GROUP BY 1, 2),
                 n AS (SELECT o_custkey, count(*)::INTEGER AS n_statuses
                       FROM per GROUP BY o_custkey)
            SELECT per.o_custkey, n.n_statuses, per.status, per.cnt
            FROM per JOIN n ON per.o_custkey = n.o_custkey
            WHERE per.cnt > 4""",
        "lateral_topk": """
            SELECT n_name, c.c_custkey, round(c.c_acctbal, 2) AS acctbal
            FROM nation n,
            LATERAL (SELECT c_custkey, c_acctbal FROM customer
                     WHERE c_nationkey = n.n_nationkey
                     ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c""",
        "window_ignore_nulls": """
            WITH base AS (SELECT user_id, event_id,
                                 CASE WHEN value >= 0.3 THEN value END AS v
                          FROM events),
            g AS (SELECT user_id, event_id, v,
                         count(v) OVER (PARTITION BY user_id ORDER BY event_id
                                        ROWS UNBOUNDED PRECEDING) AS gf,
                         count(v) OVER (PARTITION BY user_id ORDER BY event_id DESC
                                        ROWS UNBOUNDED PRECEDING) AS gb
                  FROM base),
            f AS (SELECT user_id, event_id,
                         max(v) OVER (PARTITION BY user_id, gf) AS ffill,
                         max(v) OVER (PARTITION BY user_id, gb) AS bfill
                  FROM g)
            SELECT user_id, event_id, round(ffill + 1e-9, 6) AS ffill,
                   round(lag(ffill) OVER (PARTITION BY user_id ORDER BY event_id) + 1e-9, 6) AS prev_nn,
                   round(bfill + 1e-9, 6) AS bfill,
                   round(lead(bfill) OVER (PARTITION BY user_id ORDER BY event_id) + 1e-9, 6) AS next_nn
            FROM f""",
        "min_cost_lineitem": """
            SELECT p_partkey, l_orderkey, round(l_extendedprice, 2) AS price
            FROM part JOIN lineitem ON p_partkey = l_partkey
            WHERE l_extendedprice = (SELECT min(l2.l_extendedprice)
                                     FROM lineitem l2
                                     WHERE l2.l_partkey = p_partkey)""",
        "entropy_profile": f"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, 'aaaa aaaa ' || repeat('a', 40)
              FROM documents
              UNION ALL
              SELECT doc_id + 200000, md5(text) || ' ' || md5(text || 'x')
              FROM documents),
            cs AS (SELECT doc_id AS id, unnest(string_split(
                     regexp_replace(coalesce(text, ''), '\\s', '', 'g'), '')) AS s
                   FROM aug),
            cc AS (SELECT id, s, count(*)::BIGINT AS c FROM cs
                   WHERE length(s) > 0 GROUP BY 1, 2),
            ce AS (SELECT id, sum(c)::BIGINT AS n_chars,
                          log2(sum(c)) - sum(c * log2(c)) / sum(c) AS h
                   FROM cc GROUP BY id),
            ws AS (SELECT doc_id AS id, unnest(list_filter(
                     string_split_regex(trim(coalesce(text, '')), '\\s+'),
                     x -> len(x) > 0)) AS w
                   FROM aug),
            wc AS (SELECT id, w, count(*)::BIGINT AS c FROM ws GROUP BY 1, 2),
            we AS (SELECT id, sum(c)::BIGINT AS n_words,
                          log2(sum(c)) - sum(c * log2(c)) / sum(c) AS h
                   FROM wc GROUP BY id)
            SELECT a.doc_id AS id,
                   coalesce(ce.n_chars, 0)::BIGINT AS n_chars,
                   round(coalesce(ce.h, 0) + 1e-9, 6) AS char_entropy,
                   coalesce(we.n_words, 0)::BIGINT AS n_words,
                   round(coalesce(we.h, 0) + 1e-9, 6) AS word_entropy
            FROM aug a LEFT JOIN ce ON ce.id = a.doc_id
                       LEFT JOIN we ON we.id = a.doc_id""",
        "script_profile": f"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, translate(text, 'aeiou', 'аеіоу')
              FROM documents
              UNION ALL
              SELECT doc_id + 200000,
                     translate(text, 'abcdefghijklmnopqrstuvwxyz', '{_CJK26}')
              FROM documents
              UNION ALL
              SELECT doc_id + 300000, text || ' 0123456789 αβγψ'
              FROM documents),
            b AS (SELECT doc_id AS id,
                         regexp_replace(coalesce(text, ''), '\\s', '', 'g') AS s
                  FROM aug),
            c AS (SELECT id, length(s)::BIGINT AS n_chars,
                   length(regexp_replace(s, '[^\\p{{Latin}}]', '', 'g'))::BIGINT AS latin_chars,
                   length(regexp_replace(s, '[^\\p{{Cyrillic}}]', '', 'g'))::BIGINT AS cyrillic_chars,
                   length(regexp_replace(s, '[^\\p{{Han}}]', '', 'g'))::BIGINT AS han_chars,
                   length(regexp_replace(s, '[^\\p{{Greek}}]', '', 'g'))::BIGINT AS greek_chars,
                   length(regexp_replace(s, '[^\\p{{Arabic}}]', '', 'g'))::BIGINT AS arabic_chars,
                   length(regexp_replace(s, '[^\\p{{Hangul}}]', '', 'g'))::BIGINT AS hangul_chars,
                   length(regexp_replace(s, '[^\\p{{Hebrew}}]', '', 'g'))::BIGINT AS hebrew_chars,
                   length(regexp_replace(s, '[^0-9]', '', 'g'))::BIGINT AS digit_chars
                  FROM b),
            d AS (SELECT *,
                   (n_chars - latin_chars - cyrillic_chars - han_chars
                    - greek_chars - arabic_chars - hangul_chars
                    - hebrew_chars - digit_chars)::BIGINT AS other_chars
                  FROM c)
            SELECT id, n_chars, latin_chars, cyrillic_chars, han_chars,
                   greek_chars, arabic_chars, hangul_chars, hebrew_chars,
                   digit_chars, other_chars,
                   round(CASE WHEN n_chars > 0 THEN latin_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS latin_frac,
                   round(CASE WHEN n_chars > 0 THEN cyrillic_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS cyrillic_frac,
                   round(CASE WHEN n_chars > 0 THEN han_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS han_frac,
                   round(CASE WHEN n_chars > 0 THEN greek_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS greek_frac,
                   round(CASE WHEN n_chars > 0 THEN arabic_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS arabic_frac,
                   round(CASE WHEN n_chars > 0 THEN hangul_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS hangul_frac,
                   round(CASE WHEN n_chars > 0 THEN hebrew_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS hebrew_frac,
                   round(CASE WHEN n_chars > 0 THEN digit_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS digit_frac,
                   round(CASE WHEN n_chars > 0 THEN other_chars*1.0/n_chars ELSE 0 END + 1e-9, 6) AS other_frac
            FROM d""",
        "cluster_reps": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            sz AS (SELECT id, count(*)::BIGINT AS sz FROM sh GROUP BY id),
            inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS inter
                      FROM sh a JOIN sh b USING(shingle) WHERE a.id < b.id GROUP BY 1,2),
            prs AS (SELECT id_a, id_b FROM (
                        SELECT id_a, id_b, inter*1.0/(sa.sz+sb.sz-inter) AS j
                        FROM inter JOIN sz sa ON sa.id=id_a JOIN sz sb ON sb.id=id_b)
                      WHERE j >= 0.05),
            edges AS (SELECT id_a::VARCHAR AS u, id_b::VARCHAR AS v FROM prs
                      UNION SELECT id_b::VARCHAR, id_a::VARCHAR FROM prs),
            walk(node, lab) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.v, w.lab FROM walk w JOIN edges e ON e.u = w.node),
            comp AS (SELECT node, min(lab) AS component FROM walk GROUP BY node),
            dd AS (SELECT doc_id,
                          len(string_split_regex(trim(text),'\\s+'))::BIGINT
                            AS n_tokens_ws
                   FROM documents),
            jj AS (SELECT d.doc_id, d.n_tokens_ws,
                          coalesce(c.component, d.doc_id::VARCHAR) AS component
                   FROM dd d LEFT JOIN comp c ON c.node = d.doc_id::VARCHAR),
            rr AS (SELECT *,
                          count(*) OVER (PARTITION BY component)::BIGINT
                            AS cluster_size,
                          row_number() OVER (PARTITION BY component
                            ORDER BY n_tokens_ws DESC, doc_id) AS rn
                   FROM jj)
            SELECT doc_id, component, cluster_size, n_tokens_ws
            FROM rr WHERE rn = 1""",
        "token_mix": """
            WITH t AS (SELECT doc_id, source,
                              len(string_split_regex(trim(text),'\\s+'))::BIGINT
                                AS n_tokens_ws,
                              md5(doc_id::VARCHAR || ':tokmix-v1') AS h,
                              CASE source WHEN 'src0' THEN 1000.0
                                          WHEN 'src1' THEN 500.0
                                          WHEN 'src2' THEN 300.0
                                          WHEN 'src3' THEN 200.0 END AS budget
                       FROM documents),
            c AS (SELECT *, sum(n_tokens_ws) OVER (
                              PARTITION BY source ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
                  FROM t WHERE budget IS NOT NULL)
            SELECT doc_id, source, n_tokens_ws
            FROM c WHERE cum - n_tokens_ws < budget""",
        "stream_join": """
            SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id
            FROM events l JOIN events r
              ON l.user_id = r.user_id
             AND l.event_type = 'purchase' AND r.event_type = 'view'
             AND r.ts BETWEEN l.ts - INTERVAL 12 HOUR
                          AND l.ts + INTERVAL 12 HOUR""",
        "market_share": """
            SELECT o_year,
                   round(sum(CASE WHEN s_nation = 'NATION_3' THEN volume ELSE 0 END)
                         / sum(volume) + 1e-9, 6) AS mkt_share,
                   count(*)::BIGINT AS n_lines
            FROM (SELECT extract(year FROM o_orderdate)::BIGINT AS o_year,
                         l_extendedprice * (1 - l_discount) AS volume,
                         n2.n_name AS s_nation
                  FROM lineitem
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region   ON n1.n_regionkey = r_regionkey
                                AND r_name = 'ASIA'
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey) v
            GROUP BY o_year""",
        "nation_profit": """
            SELECT nation, o_year, round(sum(amount) + 1e-9, 2) AS sum_profit
            FROM (SELECT n_name AS nation,
                         extract(year FROM o_orderdate)::BIGINT AS o_year,
                         l_extendedprice * (1 - l_discount)
                           - p_retailprice * l_quantity * 0.1 AS amount
                  FROM lineitem
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN part     ON l_partkey = p_partkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  WHERE p_name LIKE '%gear%') v
            GROUP BY nation, o_year""",
        "small_qty_avg": """
            SELECT p_brand,
                   round(sum(l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly,
                   count(*)::BIGINT AS n_lines
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = p_partkey)
            GROUP BY p_brand""",
        "recent_part_suppliers": """
            SELECT s_name, round(s_acctbal + 1e-9, 2) AS bal
            FROM supplier
            WHERE s_suppkey IN (
                SELECT sp.l_suppkey
                FROM (SELECT l_suppkey, l_partkey, sum(l_quantity) AS total_qty
                      FROM lineitem GROUP BY l_suppkey, l_partkey) sp
                WHERE sp.l_partkey IN (SELECT p_partkey FROM part
                                       WHERE p_name = 'small ring')
                  AND (SELECT sum(l2.l_quantity)
                       FROM lineitem l2
                       JOIN orders o ON l2.l_orderkey = o.o_orderkey
                       WHERE l2.l_partkey = sp.l_partkey
                         AND l2.l_suppkey = sp.l_suppkey
                         AND o.o_orderdate >= DATE '2001-01-01')
                      > 0.9 * sp.total_qty)""",
        "waiting_supplier": """
            SELECT s_name, count(*)::BIGINT AS numwait
            FROM supplier
            JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
            JOIN orders ON o_orderkey = l1.l_orderkey
            WHERE o_orderstatus = 'F'
              AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
            GROUP BY s_name""",
        "unpivot_metrics": """
            WITH wide AS (SELECT c_nationkey,
                                 round(sum(c_acctbal), 2) AS sum_bal,
                                 round(avg(c_acctbal) + 1e-9, 6) AS avg_bal,
                                 count(*)::DOUBLE AS n_cust
                          FROM customer GROUP BY c_nationkey)
            SELECT c_nationkey, 'sum_bal' AS metric, sum_bal AS value FROM wide
            UNION ALL
            SELECT c_nationkey, 'avg_bal', avg_bal FROM wide
            UNION ALL
            SELECT c_nationkey, 'n_cust', n_cust FROM wide""",
        "try_funcs": """
            SELECT c_custkey,
                   TRY_CAST(substr(c_name, 10, 9) AS BIGINT) AS name_num,
                   CASE WHEN c_nationkey = 0 THEN NULL
                        ELSE round(c_acctbal / c_nationkey + 1e-9, 6) END AS bal_per_nat,
                   TRY_CAST(c_mktsegment AS DOUBLE) AS seg_num
            FROM customer""",
        "regexp_funcs": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '[a-z]{4,}'))::INTEGER AS long_words,
                   regexp_extract(text, '([a-z]+)', 1) AS first_word,
                   len(regexp_extract_all(text, '[0-9]+'))::INTEGER AS n_numbers
            FROM documents""",
        "date_funcs": """
            SELECT o_orderkey,
                   date_trunc('quarter', o_orderdate)::DATE AS qtr,
                   (o_orderdate + INTERVAL 3 MONTH)::DATE AS plus3m,
                   last_day(o_orderdate) AS eom,
                   date_diff('day', o_orderdate, DATE '1998-01-01')::INTEGER AS days_to_98,
                   (dayofweek(o_orderdate) + 1)::INTEGER AS dow,
                   weekofyear(o_orderdate)::INTEGER AS woy
            FROM orders""",
        "null_funcs": """
            SELECT c_custkey,
                   coalesce(nullif(c_mktsegment, 'BUILDING'), '(building)') AS seg,
                   CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                        THEN 'other' ELSE 'bld' END AS kind,
                   round(greatest(c_acctbal, 0.0), 2) AS bal_floor,
                   round(least(c_acctbal, 1000.0), 2) AS bal_cap,
                   (nullif(c_mktsegment, 'BUILDING') IS NULL) AS is_bld
            FROM customer""",
        "explode_outer": f"""
            WITH base AS (SELECT doc_id,
                                 CASE WHEN length(text) >= 120
                                      THEN string_split({_NORM}, ' ') END AS arr
                          FROM documents),
            ex AS (SELECT b.doc_id, t.w
                   FROM base b LEFT JOIN LATERAL (SELECT unnest(arr) AS w) t ON TRUE)
            SELECT doc_id, count(*)::BIGINT AS n_rows, count(w)::BIGINT AS n_words
            FROM ex GROUP BY doc_id""",
        "minhash_lsh_pairs": _minhash_lsh_oracle(),
        "cross_dedup": _minhash_cross_oracle(threshold=0.5),
        "cross_dedup_stream": _minhash_cross_stream_oracle(threshold=0.5),
        "ppr_ranks": _ppr_oracle(num_iter=4, damping=0.85),
        "wav_envelope": _WAV_ENVELOPE_ORACLE,
        "flac_envelope": _WAV_ENVELOPE_ORACLE,  # FLAC lossless + same 16-bit
        # quantization => the wav closed form replays unchanged
        "audio_near_dups_flac": _VIDEO_NEAR_DUPS_ORACLE,  # same closed form:
        # group pairs, n_shared=3 (the containers decode bit-identically)
        "avi_luma": _AVI_LUMA_ORACLE,
        "video_near_dups": _VIDEO_NEAR_DUPS_ORACLE,
        # same closed form: pixel-identical frames in both containers
        "video_near_dups_gif": _VIDEO_NEAR_DUPS_ORACLE,
        "audio_near_dups": _VIDEO_NEAR_DUPS_ORACLE,  # same closed form: group pairs, n_shared=3
        "audio_dedup_stream": _AUDIO_DEDUP_STREAM_ORACLE,
        "image_dedup_stream": _IMAGE_DEDUP_STREAM_ORACLE,
        "asset_cluster_reps": _ASSET_CLUSTER_REPS_ORACLE,
        "video_near_frames": _VIDEO_NEAR_FRAMES_ORACLE,
        "image_near_dups": _IMAGE_NEAR_DUPS_ORACLE,
        # same closed form: bit-identical JPEG bytes within a group pair
        # at hamming 0, cross-group hamming >= 22 stays out at threshold 2
        "image_near_dups_jpeg": _IMAGE_NEAR_DUPS_ORACLE,
        "jpeg_luma": _JPEG_LUMA_ORACLE,
        "gif_luma": _GIF_LUMA_ORACLE,
        "audio_near_frames": _AUDIO_NEAR_FRAMES_ORACLE,
        "line_profile": _LINE_PROFILE_ORACLE,
        "hits_scores": _hits_oracle(num_iter=2),
        "ann_topk": _ann_topk_oracle(),
        "simhash_dup_groups": f"""
            WITH v AS ({_simhash_oracle()})
            SELECT simhash, count(*)::BIGINT AS dup_count, min(id) AS min_doc
            FROM v GROUP BY simhash HAVING count(*) > 1""",
        "boilerplate_stats": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(trim(text), ' ')) AS tok,
                     generate_subscripts(string_split(trim(text), ' '), 1) AS i
              FROM documents
            ), passages AS (
              SELECT doc_id, CAST(floor((i - 1) / 3) AS BIGINT) AS pidx,
                     md5(string_agg(tok, ' ' ORDER BY i)) AS ph
              FROM toks GROUP BY doc_id, floor((i - 1) / 3)
            ), freq AS (
              SELECT ph, count(DISTINCT doc_id) AS doc_freq FROM passages GROUP BY ph
            )
            SELECT p.doc_id,
                   count(*)::BIGINT AS n_passages,
                   CAST(sum(CASE WHEN f.doc_freq > 5 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dropped
            FROM passages p JOIN freq f USING (ph)
            GROUP BY p.doc_id""",
        "boilerplate_clean": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(trim(text), ' ')) AS tok,
                     generate_subscripts(string_split(trim(text), ' '), 1) AS i
              FROM documents
            ), passages AS (
              SELECT doc_id, CAST(floor((i - 1) / 3) AS BIGINT) AS pidx,
                     string_agg(tok, ' ' ORDER BY i) AS ptext,
                     md5(string_agg(tok, ' ' ORDER BY i)) AS ph
              FROM toks GROUP BY doc_id, floor((i - 1) / 3)
            ), freq AS (
              SELECT ph, count(DISTINCT doc_id) AS doc_freq FROM passages GROUP BY ph
            ), rebuilt AS (
              SELECT p.doc_id, string_agg(p.ptext, ' ' ORDER BY p.pidx) AS text_clean
              FROM passages p JOIN freq f USING (ph)
              WHERE f.doc_freq <= 5 GROUP BY p.doc_id
            ), drops AS (
              SELECT p.doc_id,
                     CAST(sum(CASE WHEN f.doc_freq > 5 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_passages_dropped
              FROM passages p JOIN freq f USING (ph) GROUP BY p.doc_id
            )
            SELECT d.doc_id, md5(coalesce(r.text_clean, '')) AS clean_md5,
                   dr.n_passages_dropped
            FROM documents d
            LEFT JOIN rebuilt r USING (doc_id)
            JOIN drops dr ON dr.doc_id = d.doc_id""",
        # DSIR: unigram+bigram grams hashed into 512 buckets (same md5-60bit
        # rule), add-1 models over raw (=all docs) and target (src0/src1),
        # per-doc sum of cnt * (ln p_t - ln p_r). Mirrors
        # pipeline/importance.dsir_logweights exactly, smoothed-zero
        # target lookups included.
        # substring-level exact dedup (ExactSubstr): sliding 25-token
        # windows hashed 60-bit, occurrence count >= 2 (multiplicity, not
        # doc frequency), gaps-and-islands span merge (off - lag(off) <= W
        # <=> the Spark fold's o <= running_end), drop-token sum per doc
        "substring_stats": _substring_oracle(25, keep_first=False, clean=False),
        "substring_keep_first": _substring_oracle(25, keep_first=True, clean=False),
        # BPE encoding under the pinned merge table (rank-sequential
        # guarded-delimiter replaces == the kernel's priority-greedy loop
        # on valid tables)
        "bpe_encode": _bpe_encode_oracle(),
        "bpe_merges": _bpe_merges_oracle(rounds=2),
        "byte_kernel_fixture": _byte_kernel_fixture_oracle(),
        # lexical BM25 top-k over the literal query workload
        "bm25_topk": _bm25_oracle(),
        # MOSS partial-overlap pairs: the winnow_fp CTE machinery at
        # k=3/w=4, distinct (doc, fp) postings, triangular self-join,
        # pairs sharing >= 2 fingerprints
        "winnow_overlap": f"""
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            grams AS (SELECT doc_id, i.i - 1 AS p,
                             ('0x'||substr(md5(array_to_string(w[i.i:i.i+2],
                                                               ' ')),1,15))::BIGINT AS h
                      FROM toks,
                           UNNEST(range(1, greatest(len(w) - 2, 0) + 1)) AS i(i)),
            n AS (SELECT doc_id, count(*) AS m FROM grams GROUP BY doc_id),
            starts AS (SELECT n.doc_id, s.s
                       FROM n, UNNEST(range(0, n.m - 3)) AS s(s)
                       WHERE n.m >= 4),
            winsel AS (SELECT doc_id, h FROM (
                SELECT st.doc_id, st.s, g.h,
                       row_number() OVER (PARTITION BY st.doc_id, st.s
                                          ORDER BY g.h, g.p DESC) AS rn
                FROM starts st JOIN grams g
                  ON g.doc_id = st.doc_id AND g.p >= st.s AND g.p < st.s + 4)
                WHERE rn = 1),
            shortsel AS (SELECT doc_id, h FROM (
                SELECT g.doc_id, g.h,
                       row_number() OVER (PARTITION BY g.doc_id
                                          ORDER BY g.h, g.p DESC) AS rn
                FROM grams g JOIN n USING (doc_id) WHERE n.m < 4)
                WHERE rn = 1),
            post AS (SELECT DISTINCT doc_id, h
                     FROM (SELECT * FROM winsel UNION ALL SELECT * FROM shortsel))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*)::BIGINT AS n_shared
            FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2""",
        # temperature mixing: per-source counts -> p^alpha normalized ->
        # budget-solved sample rates (two bounded aggregates)
        "temperature_mix": """
            WITH c AS (SELECT lang, count(*)::BIGINT AS n_docs
                       FROM documents GROUP BY lang),
            t AS (SELECT sum(n_docs)::DOUBLE AS N FROM c),
            w AS (SELECT lang, n_docs, n_docs / t.N AS p,
                         pow(n_docs / t.N, 0.3) AS pa
                  FROM c CROSS JOIN t),
            z AS (SELECT sum(pa) AS Z FROM w)
            SELECT lang, n_docs, round(p + 1e-9, 6) AS p,
                   round(pa / z.Z + 1e-9, 6) AS mix_weight,
                   round(least(1.0, 300.0 * (pa / z.Z) / n_docs) + 1e-9, 6)
                     AS sample_rate
            FROM w CROSS JOIN z""",
        # OHLC bars: 5-minute epoch-aligned buckets (time_bucket's default
        # 2000-01-01 origin is :00-aligned, matching Spark's epoch-aligned
        # window); open/close via row_number over (ts, event_id). The
        # physically-executed streaming form shares the identical oracle
        # (stream==batch is exactly the property being certified).
        "ohlc_stream": _OHLC_ORACLE,
        "ohlc_bars": _OHLC_ORACLE,
        # per-doc contamination fraction vs the 3-doc eval set: distinct
        # shingles per doc, contaminated = those appearing in the bench set
        "contam_stats": f"""
            WITH {_SHINGLES_CTE},
            sz AS (SELECT id, count(*) AS n_shingles FROM sh GROUP BY id),
            b AS (SELECT DISTINCT shingle FROM sh WHERE id < 3),
            ct AS (SELECT s.id, count(*) AS n_cont
                   FROM sh s JOIN b USING (shingle) GROUP BY s.id)
            SELECT sz.id AS doc_id, sz.n_shingles::BIGINT AS n_shingles,
                   COALESCE(ct.n_cont, 0)::BIGINT AS n_contaminated,
                   round(COALESCE(ct.n_cont, 0) * 1.0
                         / greatest(sz.n_shingles, 1) + 1e-9, 6)
                     AS contaminated_frac
            FROM sz LEFT JOIN ct USING (id)""",
        # synchronous LPA, 2 rounds unrolled: undirected neighbor list,
        # per-round count-per-(node,label) + argmax (count desc, label asc)
        "lpa_communities": """
            WITH e AS (SELECT DISTINCT 'c' || o.o_custkey AS u,
                                       's' || l.l_suppkey AS v
                       FROM orders o JOIN lineitem l
                         ON o.o_orderkey = l.l_orderkey),
            nb AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
            l0 AS (SELECT DISTINCT u AS node, u AS label FROM nb),
            c1 AS (SELECT nb.u, l.label, count(*) AS c
                   FROM nb JOIN l0 l ON l.node = nb.v GROUP BY nb.u, l.label),
            l1 AS (SELECT u AS node, label FROM (
                     SELECT u, label,
                            row_number() OVER (PARTITION BY u
                              ORDER BY c DESC, label) AS rn FROM c1)
                   WHERE rn = 1),
            c2 AS (SELECT nb.u, l.label, count(*) AS c
                   FROM nb JOIN l1 l ON l.node = nb.v GROUP BY nb.u, l.label),
            l2 AS (SELECT u AS node, label FROM (
                     SELECT u, label,
                            row_number() OVER (PARTITION BY u
                              ORDER BY c DESC, label) AS rn FROM c2)
                   WHERE rn = 1)
            SELECT node, label FROM l2""",
        # PMI + word2vec phrase score over adjacent bigrams; totals from
        # one narrow agg, unigram/bigram counts mirrored
        "pmi_phrases": f"""
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            tot AS (SELECT sum(len(w))::DOUBLE AS n_tokens,
                           sum(greatest(len(w) - 1, 0))::DOUBLE AS n_bigrams
                    FROM toks),
            uni AS (SELECT u.u AS w, count(*) AS n_w
                    FROM toks, UNNEST(w) AS u(u) GROUP BY u.u),
            pair AS (SELECT w[i.i] AS w1, w[i.i + 1] AS w2,
                            count(*) AS n_pair
                     FROM toks, UNNEST(range(1, len(w))) AS i(i)
                     GROUP BY w1, w2 HAVING count(*) >= 5)
            SELECT p.w1, p.w2, p.n_pair,
                   round(ln((p.n_pair / t.n_bigrams)
                            / ((a.n_w / t.n_tokens) * (b.n_w / t.n_tokens)))
                         + 1e-9, 6) AS pmi,
                   round(p.n_pair * t.n_tokens / (a.n_w * b.n_w)
                         + 1e-9, 6) AS phrase_score
            FROM pair p JOIN uni a ON a.w = p.w1 JOIN uni b ON b.w = p.w2
            CROSS JOIN tot t""",
        # reciprocal-rank fusion of two BM25 configurations: each arm is
        # the full bm25 oracle as a CTE; fused score = sum of 1/(60+rank)
        "rrf_hybrid": f"""
            WITH A AS ({_bm25_oracle(k=20)}),
            B AS ({_bm25_oracle(k=20, k1=0.4, b=0.2)}),
            u AS (SELECT query_id, doc_id, 1.0/(60.0 + rank) AS r FROM A
                  UNION ALL
                  SELECT query_id, doc_id, 1.0/(60.0 + rank) AS r FROM B),
            s AS (SELECT query_id, doc_id, sum(r) AS score
                  FROM u GROUP BY query_id, doc_id),
            ranked AS (SELECT query_id, doc_id, score,
                              row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
                       FROM s)
            SELECT query_id, doc_id, score, rank FROM ranked
            WHERE rank <= 10""",
        # tf-idf top-5 keywords per doc (smoothed idf, term tie-break,
        # rank on the tie-nudged 6dp score)
        "tfidf_terms": f"""
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            tf AS (SELECT doc_id, x.term, count(*)::DOUBLE AS tf
                   FROM toks, UNNEST(w) AS x(term) GROUP BY doc_id, x.term),
            n AS (SELECT count(*)::DOUBLE AS n FROM documents),
            dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            scored AS (SELECT tf.doc_id, tf.term,
                              round(tf.tf * (ln((n.n + 1.0) / (d.df + 1.0))
                                             + 1.0) + 1e-9, 6) AS score
                       FROM tf JOIN dft d USING (term) CROSS JOIN n),
            ranked AS (SELECT doc_id, term, score,
                              row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank
                       FROM scored)
            SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 5""",
        # IVF k-means trainer, 2 Lloyd rounds unrolled
        "kmeans_centroids": _kmeans_oracle(),
        # winnowing: k-gram hashes, rightmost min per w-window (row_number
        # ORDER BY h, p DESC), single global min for under-window docs
        "winnow_fp": f"""
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            grams AS (SELECT doc_id, i.i - 1 AS p,
                             ('0x'||substr(md5(array_to_string(w[i.i:i.i+3],
                                                               ' ')),1,15))::BIGINT AS h
                      FROM toks,
                           UNNEST(range(1, greatest(len(w) - 3, 0) + 1)) AS i(i)),
            n AS (SELECT doc_id, count(*) AS m FROM grams GROUP BY doc_id),
            starts AS (SELECT n.doc_id, s.s
                       FROM n, UNNEST(range(0, n.m - 4)) AS s(s)
                       WHERE n.m >= 5),
            winsel AS (SELECT doc_id, p, h FROM (
                SELECT st.doc_id, st.s, g.p, g.h,
                       row_number() OVER (PARTITION BY st.doc_id, st.s
                                          ORDER BY g.h, g.p DESC) AS rn
                FROM starts st JOIN grams g
                  ON g.doc_id = st.doc_id AND g.p >= st.s AND g.p < st.s + 5)
                WHERE rn = 1),
            shortsel AS (SELECT doc_id, p, h FROM (
                SELECT g.doc_id, g.p, g.h,
                       row_number() OVER (PARTITION BY g.doc_id
                                          ORDER BY g.h, g.p DESC) AS rn
                FROM grams g JOIN n USING (doc_id) WHERE n.m < 5)
                WHERE rn = 1)
            SELECT DISTINCT doc_id, p AS pos, h AS fp
            FROM (SELECT * FROM winsel UNION ALL SELECT * FROM shortsel)""",
        # trained quality classifier: 2 epochs of full-batch logistic GD
        # UNROLLED (zero init => epoch-1 errors are the constant 0.5 - y,
        # so w1 is closed-form; epoch 2 recomputes margins under w1), then
        # the final sigmoid score under w2. lr=0.5, l2=1e-3, B=512 buckets
        # + bias bucket 512, L1-normalized unigram+bigram md5 features —
        # byte-for-byte the pipeline/classifier.py math.
        "quality_clf": f"""
            WITH toks AS (SELECT doc_id, source,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            grams AS (
              SELECT doc_id, w[i.i] AS g
              FROM toks, UNNEST(range(1, len(w) + 1)) AS i(i)
              UNION ALL
              SELECT doc_id, w[i.i] || ' ' || w[i.i + 1] AS g
              FROM toks, UNNEST(range(1, len(w))) AS i(i)),
            cnt AS (SELECT doc_id,
                           ('0x'||substr(md5(g),1,15))::BIGINT % 512 AS bucket,
                           count(*) AS c
                    FROM grams GROUP BY doc_id, bucket),
            tot AS (SELECT doc_id, sum(c) AS t FROM cnt GROUP BY doc_id),
            feats AS (SELECT doc_id, bucket, c / t AS x
                      FROM cnt JOIN tot USING (doc_id)
                      UNION ALL
                      SELECT doc_id, 512 AS bucket, 1.0 AS x FROM tot),
            lab AS (SELECT t.doc_id,
                           CASE WHEN d.source IN ('src0','src1')
                                THEN 1.0 ELSE 0.0 END AS y
                    FROM tot t JOIN documents d USING (doc_id)),
            n AS (SELECT count(*)::DOUBLE AS n FROM lab),
            g1 AS (SELECT f.bucket, sum(f.x * (0.5 - l.y)) / any_value(n.n) AS g
                   FROM feats f JOIN lab l USING (doc_id) CROSS JOIN n
                   GROUP BY f.bucket),
            w1 AS (SELECT bucket, -0.5 * g AS w FROM g1),
            m2 AS (SELECT f.doc_id, sum(f.x * w1.w) AS m
                   FROM feats f JOIN w1 USING (bucket) GROUP BY f.doc_id),
            e2 AS (SELECT l.doc_id, 1.0/(1.0 + exp(-m2.m)) - l.y AS e
                   FROM m2 JOIN lab l USING (doc_id)),
            g2 AS (SELECT f.bucket, sum(f.x * e2.e) / any_value(n.n) AS g
                   FROM feats f JOIN e2 USING (doc_id) CROSS JOIN n
                   GROUP BY f.bucket),
            w2 AS (SELECT w1.bucket, w1.w - 0.5 * (g2.g + 0.001 * w1.w) AS w
                   FROM w1 JOIN g2 USING (bucket)),
            m3 AS (SELECT f.doc_id, sum(f.x * w2.w) AS m
                   FROM feats f JOIN w2 USING (bucket) GROUP BY f.doc_id)
            SELECT doc_id AS id,
                   round(1.0/(1.0 + exp(-m)) + 1e-9, 6) AS clf_score
            FROM m3""",
        # the rebuild: tokens NOT covered by any merged span, re-joined in
        # order; md5-compared against Spark's in-row slice-and-rejoin
        "substring_clean": _substring_oracle(25, keep_first=False, clean=True),
        "dsir_weights": f"""
            WITH toks AS (SELECT doc_id, source,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            grams AS (
              SELECT doc_id, source, w[i.i] AS g
              FROM toks, UNNEST(range(1, len(w) + 1)) AS i(i)
              UNION ALL
              SELECT doc_id, source, w[i.i] || ' ' || w[i.i + 1] AS g
              FROM toks, UNNEST(range(1, len(w))) AS i(i)),
            feats AS (SELECT doc_id, source,
                             ('0x'||substr(md5(g),1,15))::BIGINT % 512 AS bucket,
                             count(*) AS cnt
                      FROM grams GROUP BY doc_id, source, bucket),
            raw AS (SELECT bucket, sum(cnt) AS c FROM feats GROUP BY bucket),
            rtot AS (SELECT sum(c) AS t FROM raw),
            tgt AS (SELECT bucket, sum(cnt) AS c FROM feats
                    WHERE source IN ('src0', 'src1') GROUP BY bucket),
            ttot AS (SELECT sum(c) AS t FROM tgt),
            scored AS (SELECT f.doc_id, f.cnt,
                              ln((COALESCE(tg.c, 0) + 1.0) / (ttot.t + 512.0))
                            - ln((r.c + 1.0) / (rtot.t + 512.0)) AS d
                       FROM feats f JOIN raw r USING (bucket)
                       LEFT JOIN tgt tg USING (bucket)
                       CROSS JOIN rtot CROSS JOIN ttot)
            SELECT doc_id AS id, sum(cnt)::BIGINT AS n_features,
                   round(sum(cnt * d) + 1e-9, 6) AS log_weight
            FROM scored GROUP BY doc_id""",
        # the DSIR resample: same weights CTEs, Gumbel key from the same
        # md5-slice formula, top-50 by (key desc, id)
        "dsir_select": f"""
            WITH toks AS (SELECT doc_id, source,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            grams AS (
              SELECT doc_id, source, w[i.i] AS g
              FROM toks, UNNEST(range(1, len(w) + 1)) AS i(i)
              UNION ALL
              SELECT doc_id, source, w[i.i] || ' ' || w[i.i + 1] AS g
              FROM toks, UNNEST(range(1, len(w))) AS i(i)),
            feats AS (SELECT doc_id, source,
                             ('0x'||substr(md5(g),1,15))::BIGINT % 512 AS bucket,
                             count(*) AS cnt
                      FROM grams GROUP BY doc_id, source, bucket),
            raw AS (SELECT bucket, sum(cnt) AS c FROM feats GROUP BY bucket),
            rtot AS (SELECT sum(c) AS t FROM raw),
            tgt AS (SELECT bucket, sum(cnt) AS c FROM feats
                    WHERE source IN ('src0', 'src1') GROUP BY bucket),
            ttot AS (SELECT sum(c) AS t FROM tgt),
            scored AS (SELECT f.doc_id, f.cnt,
                              ln((COALESCE(tg.c, 0) + 1.0) / (ttot.t + 512.0))
                            - ln((r.c + 1.0) / (rtot.t + 512.0)) AS d
                       FROM feats f JOIN raw r USING (bucket)
                       LEFT JOIN tgt tg USING (bucket)
                       CROSS JOIN rtot CROSS JOIN ttot),
            w AS (SELECT doc_id AS id, sum(cnt)::BIGINT AS n_features,
                         sum(cnt * d) AS lw
                  FROM scored GROUP BY doc_id),
            k AS (SELECT id, n_features, lw,
                         lw + -ln(-ln((('0x'||substr(md5(id::VARCHAR||':dsir-v1'),1,13))::BIGINT
                                       / power(16, 13)) + 1e-300)) AS gk
                  FROM w)
            SELECT id, n_features, round(lw + 1e-9, 6) AS log_weight
            FROM k ORDER BY gk DESC, id LIMIT 50""",
        # bigram LM: add-1 smoothing, hash-keyed count tables (collisions
        # merge identically on both engines), self-scored corpus.
        "lm_perplexity": f"""
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            bg AS (SELECT doc_id, w[i.i] AS w1, w[i.i] || ' ' || w[i.i + 1] AS g
                   FROM toks, UNNEST(range(1, len(w))) AS i(i)),
            h AS (SELECT doc_id, ('0x'||substr(md5(g),1,15))::BIGINT AS bgh,
                         ('0x'||substr(md5(w1),1,15))::BIGINT AS ctxh FROM bg),
            c2 AS (SELECT bgh, count(*) AS c2 FROM h GROUP BY bgh),
            c1 AS (SELECT ctxh, count(*) AS c1 FROM h GROUP BY ctxh),
            v AS (SELECT count(DISTINCT ('0x'||substr(md5(w[i.i]),1,15))::BIGINT) AS v
                  FROM toks, UNNEST(range(1, len(w) + 1)) AS i(i)),
            lp AS (SELECT h.doc_id,
                          ln((COALESCE(c2.c2, 0) + 1.0)
                             / (COALESCE(c1.c1, 0) + 1.0 * v.v)) AS logp
                   FROM h LEFT JOIN c2 USING (bgh) LEFT JOIN c1 USING (ctxh)
                   CROSS JOIN v),
            agg AS (SELECT doc_id, count(*) AS n, avg(logp) AS al
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id AS id, COALESCE(a.n, 0)::BIGINT AS n_bigrams,
                   round(a.al + 1e-9, 6) AS avg_logp,
                   round(exp(-a.al) + 1e-9, 6) AS ppl
            FROM documents d LEFT JOIN agg a USING (doc_id)""",
        # trigram LM: same scheme, context = first 2 tokens; DuckDB's
        # range(a, b) is empty when b <= a, so short docs fall out of bg
        # and re-enter via the documents left join with n=0/NULL
        "lm_perplexity_tri": f"""
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split({_NORM}, ' '),
                                             x -> len(x) > 0) AS w
                          FROM documents),
            bg AS (SELECT doc_id,
                          w[i.i] || ' ' || w[i.i + 1] AS ctx,
                          w[i.i] || ' ' || w[i.i + 1] || ' ' || w[i.i + 2] AS g
                   FROM toks, UNNEST(range(1, len(w) - 1)) AS i(i)),
            h AS (SELECT doc_id, ('0x'||substr(md5(g),1,15))::BIGINT AS bgh,
                         ('0x'||substr(md5(ctx),1,15))::BIGINT AS ctxh FROM bg),
            c2 AS (SELECT bgh, count(*) AS c2 FROM h GROUP BY bgh),
            c1 AS (SELECT ctxh, count(*) AS c1 FROM h GROUP BY ctxh),
            v AS (SELECT count(DISTINCT ('0x'||substr(md5(w[i.i]),1,15))::BIGINT) AS v
                  FROM toks, UNNEST(range(1, len(w) + 1)) AS i(i)),
            lp AS (SELECT h.doc_id,
                          ln((COALESCE(c2.c2, 0) + 1.0)
                             / (COALESCE(c1.c1, 0) + 1.0 * v.v)) AS logp
                   FROM h LEFT JOIN c2 USING (bgh) LEFT JOIN c1 USING (ctxh)
                   CROSS JOIN v),
            agg AS (SELECT doc_id, count(*) AS n, avg(logp) AS al
                    FROM lp GROUP BY doc_id)
            SELECT d.doc_id AS id, COALESCE(a.n, 0)::BIGINT AS n_trigrams,
                   round(a.al + 1e-9, 6) AS avg_logp,
                   round(exp(-a.al) + 1e-9, 6) AS ppl
            FROM documents d LEFT JOIN agg a USING (doc_id)""",
        # near-dup pairs at num_planes=0: one bucket -> global brute force
        "embedding_near_dups": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v) + 1e-9, 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.4""",
        # SemDeDup at nlist=1: the single cluster makes the Spark arm equal
        # the global brute-force greedy rule (drop iff a smaller-id
        # near-dup exists at cosine >= 0.4).
        "semantic_dedup": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            p AS (SELECT b.vec_id AS ib FROM e a JOIN e b ON a.vec_id < b.vec_id
                  WHERE list_cosine_similarity(a.v, b.v) >= 0.4),
            c AS (SELECT ib, count(*) AS n FROM p GROUP BY ib)
            SELECT e.vec_id AS id, COALESCE(c.n, 0)::BIGINT AS n_dup_neighbors,
                   COALESCE(c.n, 0) = 0 AS kept
            FROM e LEFT JOIN c ON c.ib = e.vec_id""",
    }
    # the Bloom-screened increment is CONTRACTED to produce byte-identical
    # output to the plain anti-join (no false negatives => zero false
    # drops), so its gate reuses the unscreened oracle verbatim — the
    # whole point of the gate is proving that equality cross-engine
    out["incr_curate_bloom"] = out["incr_curate"]
    # modularity composes the lpa_communities oracle verbatim as its label
    # CTE, then mirrors graph.modularity's edge/degree math term for term
    out["modularity"] = f"""
        WITH lab AS ({out["lpa_communities"]}),
        e AS (SELECT DISTINCT least('c'||o_custkey, 's'||l_suppkey) AS u,
                     greatest('c'||o_custkey, 's'||l_suppkey) AS v
              FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        mm AS (SELECT count(*)::DOUBLE AS m FROM e),
        nbrs AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        deg AS (SELECT u, count(*)::DOUBLE AS deg FROM nbrs GROUP BY u),
        pl AS (SELECT l.label AS l, count(*)::BIGINT AS n_nodes,
                      sum(d.deg) AS deg_sum
               FROM deg d JOIN lab l ON d.u = l.node GROUP BY 1),
        intra AS (SELECT lu.label AS l, count(*)::DOUBLE AS intra
                  FROM e JOIN lab lu ON e.u = lu.node
                         JOIN lab lv ON e.v = lv.node
                  WHERE lu.label = lv.label GROUP BY 1)
        SELECT pl.l AS label, pl.n_nodes,
               coalesce(intra.intra, 0.0)::BIGINT AS intra_edges,
               pl.deg_sum::BIGINT AS deg_sum,
               round(coalesce(intra.intra, 0.0) / mm.m
                     - (pl.deg_sum / (2.0 * mm.m))
                       * (pl.deg_sum / (2.0 * mm.m))
                     + 1e-9, 6) + 0.0 AS q_contrib
        FROM pl LEFT JOIN intra ON pl.l = intra.l, mm"""
    # ppl_buckets composes over the lm_perplexity oracle verbatim (its ppl
    # is already the tie-nudged 6dp value the Spark side buckets on); the
    # percentile_disc semantics (smallest value with cume_dist >= p) are
    # emulated portably, same as the percentile_disc oracle — DuckDB's
    # quantile_disc uses floor((n-1)p) indexing, a different tie rule.
    out["ppl_buckets"] = f"""
        WITH s AS ({out["lm_perplexity"]}),
        cd AS (SELECT ppl, cume_dist() OVER (ORDER BY ppl) AS cd
               FROM s WHERE ppl IS NOT NULL),
        c AS (SELECT min(CASE WHEN cd >= {1.0 / 3.0!r} THEN ppl END) AS c1,
                     min(CASE WHEN cd >= {2.0 / 3.0!r} THEN ppl END) AS c2
              FROM cd)
        SELECT s.id, s.n_bigrams AS n_grams, s.ppl,
               CASE WHEN s.ppl IS NULL THEN 'unscored'
                    WHEN s.ppl <= c.c1 THEN 'head'
                    WHEN s.ppl <= c.c2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM s, c"""
    return out


if __name__ == "__main__":
    from eth2dgraph_spark.session import get_spark

    spark = get_spark("entry-smoke")
    df = entry(spark)
    df.show(5)
    print("rows:", df.count())
