"""Product quantization (PQ / IVF-PQ) for embedding search.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 33(1), 2011: split each dim-d vector into `m`
subvectors of dim/m components, vector-quantize each subspace with its
own `ksub`-entry codebook, and answer queries with asymmetric distance
computation (ADC) — the query stays exact, every database vector is
represented by `m` small codes, and a query-specific lookup table turns
each distance evaluation into `m` table reads.

Why this exists next to `similarity_search.ivf_topk`: at 100 TB of
embeddings the IVF lists cannot hold raw float vectors (a 1k-dim float64
vector is 8 KB; its PQ code at m=64, ksub=256 is 64 BYTES — a 128×
compression). The scan side of this module therefore never ships or
holds vectors after encoding: the corpus-scale artifact is the
(id, codes array<tinyint-sized ints>) frame, and query-time work is one
broadcast of per-query LUTs (m × ksub doubles each) plus an in-row
O(m) fold per (query, vector) pair — no per-pair array math, no shuffle
of the corpus.

Scale shape:
- **training** touches only a bounded sample (the `ivf_index`
  discipline) and runs ALL `m` subspace k-means in ONE distributed
  Lloyd loop — subvectors are exploded to (id, sub, sv) rows once,
  persisted, and each round is one broadcast-argmin assignment plus one
  per-(sub, code, pos) mean; the per-round collect is the codebook
  (m × ksub × dim/m doubles — bounded by construction, the
  `classifier.py` bounded-collect discipline);
- **encoding** is one pass over the corpus: explode to m subvector
  rows, broadcast-join the codebook, argmin, regroup — one shuffle
  keyed on id, emitting m small ints per vector;
- **search** broadcasts (queries × codebook) LUTs and folds codes
  against them in-row; the codes frame is scanned once and never
  reshuffled (ranking is the standard per-query window top-k).

Correctness: the `pq_topk` gate in `__spark_entry__.py` pins the
codebook to `iters=0` (the deterministic first-ksub init, no Lloyd
rounds) so DuckDB can rebuild the identical codebook and replay
encode + ADC end-to-end; the trainer's Lloyd math is cross-engine
certified by the `kmeans_centroids` gate (same assign/update algebra)
and pinned against the pure-Python reference in tests/test_pq.py,
which also proves the exact-equivalence property: with the whole
corpus as codebook (m=1, ksub>=n), ADC degenerates to exact squared-L2
and pq_topk == brute-force L2 ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_TRAIN_ROWS = 1_000_000


def _subvectors(df: DataFrame, vec_col, m: int, dsub: int, out: str = "sv") -> DataFrame:
    """Explode (.., v) into m rows (.., sub, sv) — sv = the sub-th dim/m
    slice. One narrow pass; the m-way fan-out happens before any shuffle
    so downstream groupings see fixed-width dsub arrays only."""
    return df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    ).withColumn(
        out, F.slice(F.col(vec_col), F.col("sub") * dsub + 1, dsub)
    ).drop(vec_col)


def _d2(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_train(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    train_fraction: float | None = None,
    max_train_rows: int = DEFAULT_MAX_TRAIN_ROWS,
) -> DataFrame:
    """PQ codebooks (sub, code, c array<double>): per-subspace k-means,
    all m subspaces trained in one distributed Lloyd loop.

    Deterministic: initial codebook for EVERY subspace = the subvectors
    of the `ksub` lowest STRING-ordered ids (the `ivf_index` init rule);
    `iters=0` returns exactly that init — the pinned-codebook mode the
    cross-engine gate uses. Empty codes keep their previous centroid.
    Sampling as in `ivf_index`: deterministic md5-bucket sample sized to
    `max_train_rows` unless `train_fraction` is given."""
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    dsub = dim // m
    from pyspark.storagelevel import StorageLevel

    from .split import sample_fraction

    spark = embeddings.sparkSession
    base = embeddings.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if train_fraction is None:
        n = base.count()
        train_fraction = 1.0 if n <= max_train_rows else max_train_rows / n
    if train_fraction < 1.0:
        base = sample_fraction(base, train_fraction, id_col="id", salt="pq-train-v1")
    # init BEFORE the explode: one limit-collect of ksub full vectors,
    # sliced driver-side into every subspace's starting codebook
    seed = base.orderBy("id").limit(ksub).select("v").collect()
    cb_rows = [
        (s, i, list(r["v"][s * dsub : (s + 1) * dsub]))
        for s in range(m)
        for i, r in enumerate(seed)
    ]
    if not iters:
        return spark.createDataFrame(cb_rows, "sub int, code int, c array<double>")
    train = _subvectors(base, "v", m, dsub).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(iters):
            cdf = spark.createDataFrame(cb_rows, "sub int, code int, c array<double>")
            assigned = (
                train.join(F.broadcast(cdf), "sub")
                .withColumn("_d2", _d2("sv", "c"))
                .groupBy("id", "sub", "sv")
                .agg(F.min(F.struct("_d2", "code")).alias("_m"))
                .select("sub", "sv", F.col("_m.code").alias("code"))
            )
            upd = (
                assigned.select("sub", "code", F.posexplode("sv").alias("pos", "x"))
                .groupBy("sub", "code", "pos")
                .agg(F.avg("x").alias("x"))
                .groupBy("sub", "code")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "x"))).alias("px"))
                .select("sub", "code", F.transform("px", lambda e: e["x"]).alias("c"))
                .collect()
            )
            new = {(r["sub"], r["code"]): r["c"] for r in upd}
            cb_rows = [(s, i, new.get((s, i), c)) for s, i, c in cb_rows]
    finally:
        train.unpersist()
    return spark.createDataFrame(cb_rows, "sub int, code int, c array<double>")


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
) -> DataFrame:
    """(id_col, codes array<int>): each vector's per-subspace nearest
    codebook entries (squared-L2 argmin, code tie-break) — the corpus
    compression pass. One explode + broadcast join + one groupBy(id):
    the only corpus-scale shuffle, keyed on id, carrying m ints/row."""
    if dim % m:
        raise ValueError(f"pq_encode: dim {dim} not divisible by m {m}")
    dsub = dim // m
    sv = _subvectors(
        embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")),
        "v", m, dsub,
    )
    return (
        sv.join(F.broadcast(codebooks), "sub")
        .withColumn("_d2", _d2("sv", "c"))
        .groupBy(id_col, "sub", "sv")
        .agg(F.min(F.struct("_d2", "code")).alias("_m"))
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", F.col("_m.code").alias("code")))).alias("_sc")
        )
        .select(id_col, F.transform("_sc", lambda e: e["code"]).alias("codes"))
    )


def pq_lut(
    queries: DataFrame,
    codebooks: DataFrame,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int = 64,
    m: int = 8,
) -> DataFrame:
    """(query_id, luts array<array<double>>): per-query ADC lookup
    tables — luts[sub][code] = ||q_sub - c[sub][code]||². Query-side
    only (queries × m × ksub rows before regrouping): broadcast-sized
    by the same argument as the weight/centroid tables."""
    dsub = dim // m
    qsv = _subvectors(
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.col(query_vec_col).cast("array<double>").alias("v"),
        ),
        "v", m, dsub, out="qsv",
    )
    return (
        qsv.join(F.broadcast(codebooks), "sub")
        .select("qid", "sub", "code", _d2("qsv", "c").alias("d2"))
        .groupBy("qid", "sub")
        .agg(F.array_sort(F.collect_list(F.struct("code", "d2"))).alias("cd"))
        .select("qid", "sub", F.transform("cd", lambda e: e["d2"]).alias("lut"))
        .groupBy("qid")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "lut"))).alias("sl"))
        .select(
            F.col("qid").alias(query_id_col),
            F.transform("sl", lambda e: e["lut"]).alias("luts"),
        )
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int = 64,
    m: int = 8,
    score_dp: int | None = None,
) -> DataFrame:
    """ADC top-k: (query_id, id_col, adc_d2, rank) — rank 1 = smallest
    approximate squared-L2. The scan side is the codes frame (m ints per
    vector); scoring is one broadcast of the per-query LUTs and an
    in-row fold luts[sub][codes[sub]] summed over sub — O(m) per pair,
    no array arithmetic against raw vectors, corpus never reshuffled
    after encoding. Ties (identical codes ⇒ identical ADC) break by
    ascending id, the brute_force_topk convention. `score_dp` ranks on
    the tie-nudged rounded score (the bm25_topk convention): the ADC sum
    is an m-term float sum whose accumulation order differs across
    engines, so cross-engine comparisons must rank on rounded values."""
    codes = pq_encode(embeddings, codebooks, id_col, vec_col, dim, m)
    luts = pq_lut(queries, codebooks, query_id_col, query_vec_col, dim, m)
    scored = codes.crossJoin(F.broadcast(luts)).withColumn(
        "adc_d2",
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.col("luts"),
                lambda c, lt: F.element_at(lt, c + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if score_dp is not None:
        scored = scored.withColumn(
            "adc_d2", F.round(F.col("adc_d2") + F.lit(1e-9), score_dp)
        )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc_d2"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_d2", "rank")
    )
