"""Lexical full-text retrieval: BM25 top-k search over the corpus.

The lexical counterpart of the embedding ANN path
(`pipeline/similarity_search.py`): Okapi BM25 (Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009)
with the Lucene/+1 idf form, the standard first-stage retriever both for
search over a curated corpus and for building retrieval training pairs.

    score(q, d) = sum_{t in q∩d} idf(t) * tf_td * (k1 + 1)
                  / (tf_td + k1 * (1 - b + b * |d| / avgdl))
    idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))

Scale shape (the 100 TB contract):
- queries are the SMALL side by construction (a query workload, not a
  corpus): their distinct terms broadcast into a semi-filter on the
  corpus explode, so per-(doc, term) stats are computed ONLY for query
  terms — corpus-scale work is one explode + one groupBy(id, term) over
  the filtered rows, keyed on (doc id, term);
- document lengths ride a separate narrow groupBy(id) (no explode
  needed: size(split)); N and avgdl are one broadcast 1-row aggregate
  (the pagerank dangling-mass pattern);
- df_t is bounded by the distinct query-term count — tiny — and
  broadcast back into scoring;
- top-k per query is a row_number window partitioned by query — the
  per-query result is k rows, and the pre-top-k frame is bounded by
  (matched docs x query terms), never all pairs.

All arithmetic is deterministic double math — oracle-gated cross-engine
(`bm25_topk` in __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import norm_ws

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _tokens(text_col: str):
    return F.filter(F.split(norm_ws(text_col), " "), lambda x: F.length(x) > 0)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    score_dp: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank): the top-k BM25 matches per query,
    rank 1 best, ties broken by ascending doc id (deterministic). Repeated
    query terms count once (the standard qtf=1 simplification); documents
    sharing no term with a query never appear.

    `score_dp` rounds the score (tie-nudged, the _r6e convention) BEFORE
    ranking: per-doc scores are sums of a few per-term doubles, and two
    mathematically-tied docs can come out 1 ulp apart in opposite
    directions on different engines, flipping their ranks — rounding
    first makes the id tie-break take over identically everywhere. Set it
    (6 is plenty) whenever results are compared across engines or
    partitionings; leave None for full-precision scores."""
    toks = _tokens(text_col)
    # narrow per-doc length pass + the corpus-wide constants
    lens = docs.select(F.col(id_col).alias("id"), F.size(toks).cast("double").alias("dl"))
    consts = F.broadcast(
        lens.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.coalesce(F.avg("dl"), F.lit(0.0)).alias("avgdl"),
        )
    )
    qterms = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.explode(_tokens(query_text_col)).alias("term"),
        )
        .distinct()
    )
    terms = F.broadcast(qterms.select("term").distinct())
    # corpus explode, immediately cut to query terms by the broadcast
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .join(terms, "term")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    scored = (
        tf.join(df_t, "term")
        .join(lens, "id")
        .crossJoin(consts)
        .withColumn(
            "_w",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .join(qterms, "term")
        .groupBy("qid", "id")
        .agg(F.sum("_w").alias("score"))
    )
    if score_dp is not None:
        scored = scored.withColumn(
            "score", F.round(F.col("score") + F.lit(1e-9), score_dp)
        )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("id").alias(id_col),
            "score",
            "rank",
        )
    )


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_dp: int | None = None,
) -> DataFrame:
    """(id_col, term, score, rank): each document's top-k terms by
    tf-idf — keyword extraction / corpus characterization, the per-doc
    dual of bm25_topk's per-query view. idf is the smoothed form
    ln((N + 1) / (df + 1)) + 1 (never negative, never divides by zero),
    score = tf * idf, rank ties broken by ascending term.

    Scale shape: one corpus explode feeding BOTH stats — tf =
    groupBy(id, term), df = countDistinct docs per term off the same
    frame; df is vocabulary-sized and joined back WITHOUT a forced
    broadcast hint (an open web-text vocabulary is not broadcast-sized
    at 100 TB — AQE picks broadcast vs shuffle from the measured table
    size). `score_dp` as in bm25_topk: libm ln() can differ in the last
    ulp across engines, so rank on rounded scores when comparing
    cross-engine."""
    toks = _tokens(text_col)
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).cast("double").alias("n")))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(n_docs)
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
        )
    )
    if score_dp is not None:
        scored = scored.withColumn(
            "score", F.round(F.col("score") + F.lit(1e-9), score_dp)
        )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "score", "rank")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: float = 60.0,
    topk: int = 10,
    query_id_col: str = "query_id",
    item_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    two ranked result lists: score(q, d) = sum over lists containing d of
    1 / (k + rank). The standard combiner for hybrid retrieval (lexical
    BM25 + embedding ANN) — rank-based, so the two retrievers' score
    scales never need calibrating. Returns (query_id, item, score, rank)
    with ties broken by ascending item id.

    Exactly deterministic cross-engine with NO rounding hook needed:
    every score is a sum of at most two machine-representable 1/(k+r)
    terms, and IEEE addition of two doubles is commutative — no
    accumulation-order sensitivity, unlike the retrievers themselves.

    Scale shape: input lists are per-query top-k (bounded by queries x
    k); one groupBy(query, item) + one per-query window over <= 2k rows."""
    cols = [
        F.col(query_id_col).alias("qid"),
        F.col(item_col).alias("item"),
        (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias("_r"),
    ]
    both = ranked_a.select(*cols).unionByName(ranked_b.select(*cols))
    scored = both.groupBy("qid", "item").agg(F.sum("_r").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("item"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("item").alias(item_col),
            "score",
            "rank",
        )
    )
