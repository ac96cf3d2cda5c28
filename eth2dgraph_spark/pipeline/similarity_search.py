"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: exact baseline. The dot product is a JVM-side
    higher-order function (zip_with + aggregate) — no Python, no UDF. The
    query side is a broadcast (small), so the scan side never shuffles.
  - LSH/IVF-bucketed: the scale path. Random-hyperplane signs (deterministic
    seeded planes) bucket vectors; candidates come from bucket collisions and
    are re-ranked exactly. At 100 TB the bucket join replaces the full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine(a, b):
    """try_divide, not `/`: an all-zero vector (e.g. the multimodal stub
    decoders emit zeros for empty payloads) makes the denominator 0.0, and
    under ANSI mode (Spark 4 default, on in this engine) a plain division
    would kill the whole job with DIVIDE_BY_ZERO on that one row. null
    cosine instead: desc ordering ranks it last, thresholds drop it."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def _with_unit_vec(df: DataFrame, vec_col: str = "v") -> DataFrame:
    """Replace `vec_col` with its L2-normalized copy (double), so pair
    cosines downstream need ONE dot-product fold instead of three
    (dot + both norms): the higher-order array folds are interpreted, not
    codegen'd, so per-pair fold count is the direct cost driver of the
    O(f^2) in-bucket expansions. The norm lands in a real column first —
    inlining it in the transform lambda would re-evaluate the aggregate
    per element. Zero/empty vectors become NULL (dot null -> cosine null
    -> threshold-filtered), matching _cosine's try_divide semantics."""
    v = F.col(vec_col).cast("array<double>")
    return (
        df.withColumn("_l2", _norm(v))
        .withColumn(
            vec_col,
            F.when(F.col("_l2") > 0, F.transform(v, lambda x: x / F.col("_l2"))),
        )
        .drop("_l2")
    )


def with_cosine(df: DataFrame, vec_col: str, other_col: str, out_col: str = "cosine") -> DataFrame:
    a, b = F.col(vec_col).cast("array<double>"), F.col(other_col).cast("array<double>")
    return df.withColumn(out_col, _cosine(a, b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. Queries are broadcast;
    ranking is a per-query window over the scored scan."""
    scored = embeddings.crossJoin(F.broadcast(queries)).withColumn(
        "cosine",
        _cosine(F.col(vec_col).cast("array<double>"), F.col(query_vec_col).cast("array<double>")),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, num_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG seed — no RNG at
    plan time, reproducible across runs/engines)."""
    state = 88172645463325252
    planes = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((state % 2000003) / 1000001.5) - 1.0)  # ~U(-1,1)
        planes.append(row)
    return planes


def lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, num_planes: int = 8
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of <v, plane_i> packed into a bucket
    id. Vectors in the same bucket are candidate neighbors."""
    planes = _hyperplanes(dim, num_planes)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(_dot(v, plane) > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    # loud length check: a vector longer than `dim` would null-pad the
    # zip_with dot, fail every `> 0` test, and silently send EVERY row to
    # bucket 0 — degrading the bucketed join to an O(n^2) self-join with
    # no error. Better one task failure than a silent quadratic.
    # A NULL vector is NOT an env error (absent embeddings are data): it
    # keeps a null bucket, which every downstream inner join on lsh_bucket
    # drops — same tolerance as the null-cosine path. The error text is
    # built with format_string so it survives even a null size.
    guarded = (
        F.when(v.isNull(), F.lit(None).cast("long"))
        .when(F.size(v) == dim, bucket)
        .otherwise(
            F.raise_error(
                F.format_string(
                    f"lsh_bucket: embedding length %s != dim {dim}",
                    F.coalesce(F.size(v).cast("string"), F.lit("null")),
                )
            )
        )
    )
    return df.withColumn("lsh_bucket", guarded)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int = 64,
    num_planes: int = 8,
) -> DataFrame:
    """ANN: bucket both sides, join on bucket, re-rank exactly within the
    bucket. Recall < 1.0 by construction; multiply probe by lowering
    num_planes or probing neighboring buckets."""
    emb_b = lsh_bucket(embeddings, vec_col, dim, num_planes)
    q_b = lsh_bucket(queries.withColumnRenamed(query_vec_col, "_qv"), "_qv", dim, num_planes)
    scored = emb_b.join(F.broadcast(q_b), "lsh_bucket").withColumn(
        "cosine",
        _cosine(F.col(vec_col).cast("array<double>"), F.col("_qv").cast("array<double>")),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


DEFAULT_MAX_COLLECT_CENTROID_VALUES = 1 << 16


def ivf_index(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 3,
    train_fraction: float | None = None,
    max_train_rows: int = 1_000_000,
    max_collect_centroid_values: int = DEFAULT_MAX_COLLECT_CENTROID_VALUES,
) -> DataFrame:
    """IVF coarse quantizer: k-means centroids trained with `iters` Lloyd
    rounds, entirely in DataFrame ops (assign = argmin over broadcast
    centroids; update = per-dimension mean via posexplode+groupBy).

    Scale shape: training never rescans the source — the (sampled) training
    frame is projected once and PERSISTED, so each Lloyd round reads the
    cached columnar rows. Centroid quality needs only a sample (k-means
    converges on sketch-sized data); `train_fraction` takes a deterministic
    md5-bucket sample (same engine-portable scheme as pipeline/split.py —
    stable across runs/appends/partitionings, no RNG at plan time). When
    None, the fraction is auto-sized so expected training rows ~=
    `max_train_rows` (full corpus when it's already smaller). The exact
    full-corpus pass happens exactly once, in ivf_topk's assignment join —
    not per round. Each round issues ONE bounded collect: the nlist x dim
    centroid matrix, nothing row-scale.

    Deterministic: initial centroids are the `nlist` lowest-id training
    vectors. Returns (list_id, centroid array<double>).

    Driver traffic is capped: while nlist * dim <=
    `max_collect_centroid_values` (default 2^16 doubles = 512 KB) each
    round collects the centroid matrix and rebroadcasts it — the fastest
    local shape. Above the cap (a 100 TB-realistic nlist >= 2^16 at dim
    1k would push ~0.5 GB/round through the driver) the loop goes
    COLLECT-FREE: centroids live as a persisted DataFrame end to end,
    the update is a left join on list_id (empty lists keep their prior
    centroid, same semantics), and the driver never materializes a
    centroid until the caller acts on the returned frame. Both paths run
    the identical assign/update algebra — tests pin their equality."""
    from pyspark.storagelevel import StorageLevel

    from .split import sample_fraction

    ids = F.col(id_col).cast("string")
    v = F.col(vec_col).cast("array<double>")
    base = embeddings.select(ids.alias("id"), v.alias("v"))
    if train_fraction is None:
        n = base.count()
        train_fraction = 1.0 if n <= max_train_rows else max_train_rows / n
    train = base
    if train_fraction < 1.0:
        train = sample_fraction(base, train_fraction, id_col="id", salt="ivf-train-v1")
    train = train.persist(StorageLevel.MEMORY_AND_DISK)
    spark = embeddings.sparkSession
    # assign: nearest centroid by squared L2 (argmin via struct-min)
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _assign(cdf: DataFrame) -> DataFrame:
        return (
            train.crossJoin(F.broadcast(cdf))
            .withColumn("d2", d2)
            .groupBy("id", "v")
            .agg(F.min(F.struct("d2", "list_id")).alias("m"))
            .select("v", F.col("m.list_id").alias("list_id"))
        )

    def _mean_update(assigned: DataFrame) -> DataFrame:
        return (
            assigned.select("list_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("x"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "x"))).alias("px"))
            .select("list_id", F.transform("px", lambda e: e["x"]).alias("c"))
        )

    init = train.orderBy("id").limit(nlist)
    try:
        # peek one vector for the dim of the collect-cap test (cheap: the
        # init frame is nlist rows and is needed either way)
        first = init.select(F.size("v").alias("d")).limit(1).collect()
        dim = int(first[0]["d"]) if first else 0
        if nlist * max(dim, 1) <= max_collect_centroid_values:
            cents = init.select(F.col("v").alias("c")).collect()
            cent_rows = [(i, r["c"]) for i, r in enumerate(cents)]
            for _ in range(iters):
                cdf = spark.createDataFrame(cent_rows, "list_id long, c array<double>")
                # update: element-wise mean per list (bounded collect/round)
                upd = _mean_update(_assign(cdf)).collect()
                # empty lists keep their previous centroid, not vanish
                new = {r["list_id"]: r["c"] for r in upd}
                cent_rows = [(lid, new.get(lid, c)) for lid, c in cent_rows]
            return spark.createDataFrame(cent_rows, "list_id long, c array<double>")
        # collect-free path: centroids never leave the cluster
        w_init = Window.orderBy("id")
        cdf = (
            init.withColumn("list_id", F.row_number().over(w_init) - 1)
            .select(F.col("list_id").cast("long"), F.col("v").alias("c"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cdf.count()  # materialize so each round reads a settled frame
        for _ in range(iters):
            upd = _mean_update(_assign(cdf))
            nxt = (
                cdf.join(upd.withColumnRenamed("c", "_c"), "list_id", "left")
                .select("list_id", F.coalesce("_c", "c").alias("c"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            nxt.count()
            cdf.unpersist()
            cdf = nxt
        return cdf
    finally:
        train.unpersist()


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF search: assign every vector to its nearest centroid (one broadcast
    pass), probe each query's `nprobe` nearest lists, exact cosine re-rank
    inside the probed lists. nprobe == nlist degrades gracefully to exact
    brute force (tested); smaller nprobe trades recall for a 1/nlist scan.
    """
    v = F.col(vec_col).cast("array<double>")
    base = embeddings.select(F.col(id_col), v.alias("v"))
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        base.crossJoin(F.broadcast(centroids))
        .withColumn("d2", d2)
        .groupBy(id_col, "v")
        .agg(F.min(F.struct("d2", "list_id")).alias("m"))
        .select(id_col, "v", F.col("m.list_id").alias("list_id"))
    )
    qv = F.col(query_vec_col).cast("array<double>")
    qd2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.asc("qd2"), F.asc("list_id"))
    probes = (
        queries.select(F.col(query_id_col), qv.alias("qv"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("qd2", qd2)
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select(query_id_col, "qv", "list_id")
    )
    scored = assigned.join(F.broadcast(probes), "list_id").withColumn(
        "cosine", _cosine(F.col("v"), F.col("qv"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


DEFAULT_MAX_BUCKET_SIZE = 100_000

# members per hash sub-block in the blocked in-bucket expansion: each
# reduce key's pair work is <= BLOCK_ROWS^2 dot products (one GEMM)
DEFAULT_BLOCK_ROWS = 4096


def _blocked_cosine_pairs(
    members: DataFrame,
    bucket_col: str,
    threshold: float,
    block_rows: int = DEFAULT_BLOCK_ROWS,
) -> DataFrame:
    """All unordered in-bucket pairs with cosine >= threshold, computed as
    block-pair GEMMs: every pair exactly once, never keyed on the bare
    bucket id, never materialized as pair ROWS before the threshold.

    Why not a plain self-join on the bucket key: a single mega-bucket
    (the nlist=1 semantic-dedup shape, or an at-cap LSH bucket — 100k
    members = 5e9 pairs) lands its whole O(f^2) expansion on ONE reducer,
    serializing the job no matter how many executors exist. Why not
    column-expression cosines per pair row: higher-order array folds are
    interpreted (~us/pair), so f^2 pair rows dominate wall time even when
    distributed (measured on the sf0.1 semantic_dedup gate: 29.3 s
    single-reducer expression path, 12.1 s blocked expression path,
    ~3 s this kernel).

    Scheme: hash each bucket's members into R_b = ceil(size/block_rows)
    sub-blocks; a row in block b ships to every block-pair key
    (bucket, i, j) with i = b <= j (as the LEFT side) and i < j = b (as
    the RIGHT side; same-block keys reuse their left rows as both sides)
    — the symmetric triangular scheme, so every key's work is an even
    (size/R_b)^2 and each row is replicated R_b times. Each key's group runs one numpy float64 GEMM over unit
    vectors (L-side sliced to bound the score matrix's memory), applies
    the exactly-once rule (same-block keys keep id < id_r only), filters
    to the threshold INSIDE the kernel, and emits only qualifying
    (id_a < id_b, cosine) rows — Arrow-batched, BLAS-backed, the same
    vectorized-kernel discipline as functions/skeleton.py.

    The per-bucket size/R_b table is broadcast, so the helper assumes a
    BOUNDED bucket keyspace (true for both callers: <= 2^num_planes LSH
    buckets, <= nlist clusters).

    `members` must have (bucket_col, id, v) with v UNIT-NORMALIZED
    arrays (see _with_unit_vec; NULL v rows are dropped here, matching
    the null-cosine threshold-filter semantics of the expression path).

    The members frame is persisted for the duration and the thresholded
    pair output eagerly localCheckpoint'ed (r14): THREE consumers read
    members (the per-bucket size table and the left/right block arms),
    and for the production callers the upstream chain is the embedding
    normalization / IVF argmin assignment — without the cut that subtree
    ran ~4x per query (the semantic_dedup before-plan carried 62
    Exchanges). The checkpoint holds only qualifying (id_a, id_b,
    cosine) rows — the guide-§8 lightweight-proxy shape."""
    import numpy as np
    import pandas as pd

    from pyspark.storagelevel import StorageLevel

    members = members.persist(StorageLevel.MEMORY_AND_DISK)
    id_type = dict(members.dtypes)["id"]
    sizes = (
        members.groupBy(bucket_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            bucket_col,
            F.greatest(F.ceil(F.col("_n") / F.lit(int(block_rows))), F.lit(1))
            .cast("int")
            .alias("_r"),
        )
    )
    x = members.filter(F.col("v").isNotNull()).join(F.broadcast(sizes), bucket_col).select(
        F.col(bucket_col).alias("_bkt"),
        "id",
        "v",
        F.pmod(F.xxhash64(F.col("id")), F.col("_r")).cast("int").alias("_blk"),
        "_r",
    )
    left = x.select(
        "_bkt",
        F.col("_blk").alias("_i"),
        F.explode(F.sequence(F.col("_blk"), F.col("_r") - 1)).alias("_j"),
        F.lit(0).alias("_side"),
        "id",
        "v",
    )
    # the right side ships only to STRICTLY-lower block keys: a same-block
    # key (i, i) reuses its left rows as both sides, so shipping right rows
    # there would be a wasted replica. sequence() must be guarded — with
    # start > stop it COUNTS DOWN (sequence(0, -1) = [0, -1]), so block 0
    # gets an explicit empty array (explode drops the row).
    right = x.select(
        "_bkt",
        F.explode(
            F.when(F.col("_blk") > 0, F.sequence(F.lit(0), F.col("_blk") - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("_i"),
        F.col("_blk").alias("_j"),
        F.lit(1).alias("_side"),
        "id",
        "v",
    )
    tagged = left.unionByName(right)
    thr = float(threshold)

    def _kern(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        same_block = pdf["_i"].iat[0] == pdf["_j"].iat[0]
        lm = pdf[pdf["_side"] == 0]
        rm = pdf[pdf["_side"] == 1]
        if same_block:
            # i == j: right rows are never shipped here; the block is its
            # own right side
            rm = lm
        if lm.empty or rm.empty:
            return empty
        lv = np.vstack(lm["v"].to_numpy())
        rv = np.vstack(rm["v"].to_numpy())
        li = lm["id"].to_numpy()
        ri = rm["id"].to_numpy()
        out = []
        # slice the L side so the score matrix stays <= slice x block_rows
        step = 4096
        for s in range(0, lv.shape[0], step):
            c = lv[s : s + step] @ rv.T
            ii, jj = np.nonzero(c >= thr)
            if ii.size == 0:
                continue
            ia, ib = li[s + ii], ri[jj]
            keep = ia < ib if same_block else ia != ib
            # cross-block keys can still see equal hashes only via id
            # collisions (impossible: ids are unique); same-block keys own
            # the id_a < id_b dedup of the full ordered square
            ii, jj, ia, ib = ii[keep], jj[keep], ia[keep], ib[keep]
            if ii.size == 0:
                continue
            cos = c[ii, jj]
            swap = ia > ib
            if swap.any():
                ia2 = np.where(swap, ib, ia)
                ib2 = np.where(swap, ia, ib)
                ia, ib = ia2, ib2
            out.append(pd.DataFrame({"id_a": ia, "id_b": ib, "cosine": cos}))
        return pd.concat(out) if out else empty

    out = (
        tagged.groupBy("_bkt", "_i", "_j")
        .applyInPandas(_kern, f"id_a {id_type}, id_b {id_type}, cosine double")
        .localCheckpoint(eager=True)
    )
    members.unpersist()
    return out


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    num_planes: int = 6,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed self-join (scale
    path), exact cosine check inside the bucket.

    `max_bucket_size` (finite BY DEFAULT) drops buckets with more members
    than the cap before the O(f^2) in-bucket expansion — the same
    single-reducer defense as `dedup.DEFAULT_MAX_SHINGLE_DOCS`: a skewed
    bucket (e.g. the near-zero-vector bucket) would otherwise land its full
    quadratic pair expansion on one reducer. Pairs whose members sat only
    in capped buckets are lost (recall trade, like any LSH miss); pass
    None to disable. Raise num_planes so honest buckets stay under the cap.

    Under the cap, in-bucket expansion runs through the triangular
    blocked self-join (`_blocked_self_pairs`), so even an at-cap bucket
    spreads its pair work across ~cap/block_rows reduce keys instead of
    one."""
    b = lsh_bucket(embeddings, vec_col, dim, num_planes).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "lsh_bucket"
    )
    if max_bucket_size is not None:
        # <= 2^num_planes count rows: broadcast-joined, no extra shuffle of b
        ok_buckets = (
            b.groupBy("lsh_bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("lsh_bucket")
        )
        b = b.join(F.broadcast(ok_buckets), "lsh_bucket")
    return _blocked_cosine_pairs(_with_unit_vec(b), "lsh_bucket", threshold)

def semantic_dedup_pairs(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al., "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication", 2023): assign
    every embedding to its nearest k-means centroid (one broadcast argmin
    pass — centroids come from `ivf_index`, reusing the IVF coarse
    quantizer as the paper reuses its clustering), then exact cosine
    within each cluster. Pairs are (id_a < id_b, cosine >= threshold).

    The in-cluster expansion is O(f^2) on a single cluster key, so
    `max_cluster_size` (finite BY DEFAULT) drops over-cap clusters before
    the self-join — the same degenerate-bucket defense as
    `embedding_near_dup_pairs` / `dedup.DEFAULT_MAX_SHINGLE_DOCS`. Raise
    nlist so honest clusters stay under the cap. Under the cap the
    expansion runs through the triangular blocked self-join, so one big
    cluster parallelizes across ~size/block_rows reduce keys (measured on
    the nlist=1 sf0.1 gate shape: 29.3 s -> ~3 s)."""
    v = F.col(vec_col).cast("array<double>")
    base = embeddings.select(F.col(id_col).alias("id"), v.alias("v"))
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.storagelevel import StorageLevel

    # persist the argmin assignment: the over-cap count branch and the
    # blocked-pairs members both read it, and its crossJoin+groupBy
    # subtree is the expensive half of the query (r14 plan audit). The
    # cut downstream in _blocked_cosine_pairs is eager, so the cache is
    # released before this function returns.
    assigned = (
        base.crossJoin(F.broadcast(centroids))
        .withColumn("d2", d2)
        .groupBy("id", "v")
        .agg(F.min(F.struct("d2", "list_id")).alias("m"))
        .select("id", "v", F.col("m.list_id").alias("list_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if max_cluster_size is not None:
        # <= nlist count rows: broadcast-joined, no extra shuffle of assigned
        ok = (
            assigned.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_cluster_size)
            .select("list_id")
        )
        members = assigned.join(F.broadcast(ok), "list_id")
    else:
        members = assigned
    out = _blocked_cosine_pairs(
        _with_unit_vec(members.select("list_id", "id", "v")), "list_id", threshold
    )
    assigned.unpersist()
    return out


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """SemDeDup prune decision per embedding: (id, n_dup_neighbors, kept).

    Keep rule: drop a document iff some SMALLER-id document in its cluster
    is a near-duplicate (cosine >= threshold) — the deterministic greedy
    variant of the paper's keep-one-exemplar-per-group rule, matching the
    first-wins convention of `dedup.dedup_exact`. (The paper keeps the
    member farthest from the centroid; any single-representative rule
    removes the same duplicate mass, and min-id is order-free and
    engine-portable for the oracle gate.) One shuffle past the pair list:
    the drop set is the distinct id_b side, anti-joined back."""
    pairs = semantic_dedup_pairs(
        embeddings, centroids, threshold, id_col, vec_col, max_cluster_size
    )
    by_b = pairs.groupBy(F.col("id_b").alias("id")).agg(
        F.count(F.lit(1)).alias("n_dup_neighbors")
    )
    ids = embeddings.select(F.col(id_col).alias("id"))
    return (
        ids.join(by_b, "id", "left")
        .select(
            "id",
            F.coalesce("n_dup_neighbors", F.lit(0)).cast("long").alias("n_dup_neighbors"),
            (F.coalesce("n_dup_neighbors", F.lit(0)) == 0).alias("kept"),
        )
    )
