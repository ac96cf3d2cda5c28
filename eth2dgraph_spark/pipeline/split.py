"""Deterministic dataset splitting for training-data pipelines.

A 100 TB corpus can't be split with `randomSplit` (nondeterministic across
reruns/partitionings, and resplitting after an append reshuffles history).
Both operators here are pure functions of the row's id:

  - hash_split: label = f(md5(id)) — stable under appends, repartitioning,
    and engine version; expected proportions, exact independence between
    rows. The industry-standard split for web-scale corpora.
  - stratified_split: exact per-stratum proportions via a rank within the
    stratum ordered by the same hash — one window shuffle per call, used
    when eval sets must hit quotas exactly (e.g. per-language).

md5 (not xxhash64) so any engine can reproduce the assignment — the DuckDB
oracle gates `train_split` / `stratified_split` in __spark_entry__.py prove
bit-equality of the labeling.

Reference parity note: the reference has no split operator (its analyse jobs
consume everything); this is part of the training-pipeline surface the
engine adds on top (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT = "split-v1"
_BUCKETS = 10_000


def _hash_bucket(id_col: str, salt: str):
    """Deterministic bucket in [0, 10000) from md5(id:salt) — first 8 hex
    chars as an int. Engine-portable (md5 is everywhere; xxhash64 is not).

    A null id fails LOUD: its hash is null, so every comparison would be
    null — hash_split's when-chain would silently dump ALL id-less rows
    into the last label (contaminating the eval split with exactly the
    malformed rows) while sample_fraction would silently drop them. Split
    membership must be a total function of the id; reject rows that don't
    have one."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % _BUCKETS
    return F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(f"null {id_col}: deterministic split/sample membership undefined")
        ).cast("long"),
    ).otherwise(bucket)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = DEFAULT_SALT,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label with probability ~fractions[label],
    deterministically in the row id. Labels are assigned in the given dict
    order by cumulative bucket ranges, so the same (id, salt, fractions)
    always lands in the same split — across runs, appends, and engines."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    bucket = _hash_bucket(id_col, salt)
    expr = None
    hi = 0.0
    labels = list(fractions.items())
    for name, frac in labels[:-1]:
        hi += frac
        cond = bucket < int(round(hi * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sample_by_source(
    df: DataFrame,
    source_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_rate: float = 1.0,
) -> DataFrame:
    """Domain mixing: deterministic per-source downsampling — keep a row iff
    its md5 bucket falls under its source's rate. Unlike df.sampleBy,
    membership is a pure function of (id, salt): append-stable,
    partitioning-independent, engine-portable, and a source's kept set at
    rate r is a SUBSET of its kept set at any r' > r (nested thresholds),
    so re-weighting a domain never churns the rows of the others."""
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1], got {r}")
    bucket = _hash_bucket(id_col, salt)
    thresh = F.lit(int(round(default_rate * _BUCKETS)))
    for name, r in rates.items():
        thresh = F.when(F.col(source_col) == name, int(round(r * _BUCKETS))).otherwise(thresh)
    return df.filter(bucket < thresh)


def sample_fraction(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash bucket falls
    below the threshold. Re-running, repartitioning, or appending new rows
    never changes which existing rows are kept."""
    return df.filter(_hash_bucket(id_col, salt) < int(round(fraction * _BUCKETS)))


def stratified_split(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = DEFAULT_SALT,
    out_col: str = "split",
) -> DataFrame:
    """Exact per-stratum proportions: rank rows inside each stratum by their
    hash bucket (id tie-break) and cut at ceil(frac * stratum_size)
    boundaries. One window shuffle, keyed by the stratum — at corpus scale
    strata (language, source, license) are few and large, so this
    partitions cleanly; skew within a stratum is a sort, not a hotspot."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    w = Window.partitionBy(strata_col).orderBy(_hash_bucket(id_col, salt), F.col(id_col))
    ws = Window.partitionBy(strata_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(ws)
    expr = None
    hi = 0.0
    labels = list(fractions.items())
    for name, frac in labels[:-1]:
        # float-accumulation guard: 0.9 + 0.05 = 0.9500000000000001 in
        # doubles, and ceil(60 * that) = 58 instead of ceil(60*0.95) = 57 —
        # one row leaks across the quota boundary. Round the accumulated
        # fraction, and round the product before ceil, so the boundary is
        # the exact rational in BOTH engines (the oracle mirrors this).
        hi = round(hi + frac, 12)
        cond = rn <= F.ceil(F.round(n * F.lit(hi), 9))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    salt: str = "cap-v1",
) -> DataFrame:
    """Deterministic uniform k-per-key sample: keep the k rows with the
    smallest md5(id || salt) within each key — the distributed equivalent
    of per-key reservoir sampling (Broder-style bottom-k / consistent
    sampling), but a pure function of row ids: independent of partitioning,
    input order, and cluster size, and stable under appends (a new row
    displaces the current max only if its hash is smaller — exactly the
    reservoir update rule, replayed consistently on every rerun).

    The standard web-curation cap: "at most k documents per domain /
    license / language" without favoring crawl order. Uniformity comes
    from md5 being a PRF of the id: ranking by hash is a uniformly random
    permutation of each key's rows, so the kept set is a uniform
    without-replacement sample of size k.

    One shuffle (the window on key_cols); hot keys spill in WindowExec's
    group buffer rather than OOM. At 100 TB with per-key populations far
    above k, a per-partition bottom-k pre-prune before the shuffle gives
    the same result while shuffling only k x partitions rows per key; it
    is not applied by default because it adds a pass whose benefit
    depends on the population/k ratio (unmeasured here — measure before
    enabling, the repo's standing rule)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy(*key_cols).orderBy(order, F.col(id_col))
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .where(F.col("_cap_rn") <= k)
        .drop("_cap_rn")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard-v1",
) -> DataFrame:
    """Deterministic training-shard assignment (the WebDataset/MDS layout
    step): shard = hash(id) mod n_shards, position-in-shard = rank by a
    SECOND independent hash — so the global order is a hash shuffle (the
    standard 'shuffle once at materialization' for training), every rerun
    produces byte-identical shards, and appends never reorder existing
    shards' relative positions among surviving rows.

    One window shuffle keyed by the shard id (n_shards partitions of
    ~equal size by the PRF property); there is deliberately NO global
    position — cross-shard order is the reader's interleave, which is the
    point of sharding. Adds (shard, pos_in_shard)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    ids = F.col(id_col).cast("string")
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.concat(ids, F.lit(":" + salt))), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_shards),
    ).cast("int")
    order = F.md5(F.concat(ids, F.lit(":" + salt + ":pos")))
    w = Window.partitionBy("shard").orderBy(order, F.col(id_col))
    return (
        df.withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
    )


def temperature_mix_rates(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.3,
    budget: int = 1_000_000,
) -> DataFrame:
    """(source_col, n_docs, p, mix_weight, sample_rate): temperature-scaled
    multinomial source mixing (the multilingual-pretraining standard —
    Conneau & Lample NeurIPS'19, XLM-R: q_i ∝ p_i^alpha with alpha < 1
    upweighting low-resource sources), solved into per-source sampling
    rates for a `budget`-document corpus: rate_i = min(1, budget * q_i /
    n_i). Feed the collected rates to `sample_by_source` (bounded by the
    source count) — `temperature_sample` composes the two.

    Two bounded aggregates (per-source counts, then the normalizer), each
    broadcast back — nothing row-scale leaves the first groupBy."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = F.broadcast(counts.agg(F.sum("n_docs").alias("_N")))
    w = counts.crossJoin(tot).withColumn(
        "p", F.col("n_docs") / F.col("_N")
    ).withColumn("_pa", F.pow(F.col("p"), F.lit(float(alpha))))
    z = F.broadcast(w.agg(F.sum("_pa").alias("_Z")))
    return w.crossJoin(z).select(
        source_col,
        "n_docs",
        "p",
        (F.col("_pa") / F.col("_Z")).alias("mix_weight"),
        F.least(
            F.lit(1.0),
            F.lit(float(budget)) * (F.col("_pa") / F.col("_Z")) / F.col("n_docs"),
        ).alias("sample_rate"),
    )


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.3,
    budget: int = 1_000_000,
    id_col: str = "doc_id",
    salt: str = "temp-mix-v1",
) -> DataFrame:
    """Temperature mixing end to end: compute rates (bounded collect —
    one row per source) and apply them with sample_by_source's nested
    deterministic thresholds, so re-running with a larger budget only
    ADDS rows per source."""
    rates = {
        r[source_col]: float(r["sample_rate"])
        for r in temperature_mix_rates(df, source_col, alpha, budget).collect()
    }
    return sample_by_source(df, source_col, rates, id_col, salt, default_rate=0.0)


def token_budget_mix(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "tokmix-v1",
) -> DataFrame:
    """Token-budgeted source mixing — the "train on B tokens at these mix
    weights" knob (the unit real data recipes are written in: GPT-3 Table
    2.2, LLaMA Table 1 quote per-source token shares, not doc counts; doc
    counts misallocate whenever sources differ in document length).

    Per source s with normalized weight w_s, keep the md5(id||salt)-ordered
    PREFIX of documents whose cumulative token count first covers
    w_s * budget_tokens: a row stays iff the tokens before it (same source,
    hash order) are still under the source's budget, so each source
    overshoots by at most one document and a short-doc source contributes
    MORE documents for the same token share. The hash order makes the kept
    set a uniform sample of the source (md5 is a PRF of the id — the
    cap_per_key argument), deterministic across reruns/partitionings/
    engines, and NESTED in the budget: the kept set at budget B is a
    subset of the kept set at any B' > B, so scaling a recipe up only adds
    rows. Sources absent from `weights` are dropped (weight 0).

    Tokens come from `token_col` if given, else the repo's whitespace
    convention (size(split(trim(text), '\\s+')) — the token_count gate's
    exact expression, so the DuckDB oracle replays it verbatim). On BOTH
    paths a NULL token count coalesces to a deterministic value (text
    path: '' tokenizes to 1; token_col path: 0 — unknown counts ride
    free) rather than silently dropping the row: NULL < budget filters
    false AND sum() skips NULLs, so without the coalesce a NULL-count row
    would vanish from the mix and shift every later prefix.

    Cost: ONE shuffle (a window per source ordered by the 64-bit hash
    prefix); hot sources spill in WindowExec's group buffer rather than
    OOM. At 100 TB the running sum is the same single-pass prefix-scan
    shape cap_per_key uses — no collect, no driver state.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    if token_col is None:
        # coalesce first: size(split(NULL)) is NULL, and a NULL token count
        # would silently drop the row (NULL < budget filters false) AND be
        # skipped by the running sum — coalescing to '' gives the
        # token_count convention's deterministic 1 in both engines
        n_tok = F.size(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).cast("long")
    else:
        # same NULL hazard on the precomputed path: coalesce to 0 so a
        # NULL-count row passes through (contributing nothing to the
        # running sum) instead of silently vanishing from the mix.
        # Convention: NULL token counts mean "unknown, treat as free".
        n_tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    budget = F.lit(None).cast("double")
    for name, w in weights.items():
        budget = F.when(
            F.col(source_col) == name,
            F.lit(float(w) / total_w * budget_tokens),
        ).otherwise(budget)
    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w_spec = (
        Window.partitionBy(source_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_tb_n", n_tok)
        .withColumn("_tb_budget", budget)
        .withColumn("_tb_cum", F.sum("_tb_n").over(w_spec))
        .filter(
            F.col("_tb_budget").isNotNull()
            & ((F.col("_tb_cum") - F.col("_tb_n")) < F.col("_tb_budget"))
        )
        .drop("_tb_budget", "_tb_cum")
        .withColumnRenamed("_tb_n", "n_tokens_ws")
    )
