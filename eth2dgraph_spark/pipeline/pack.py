"""Sequence packing: assign documents to fixed-token-budget training
sequences — the concat-then-chunk step a pretraining data loader runs
after curation (docs are concatenated in a deterministic order and the
token stream is cut every `budget` tokens; a document belongs to the chunk
its first token lands in, so chunks can overflow by at most one document).

Scale shape: a single global ordering would funnel the whole corpus
through one reducer (a global window has one partition). Instead the
corpus is hash-sharded first — real loaders shard-then-pack for exactly
this reason — and each shard packs independently under a per-shard window
(partitionBy shard => as many parallel sorts as shards). Order within a
shard is md5-derived (engine-portable, append-stable), the same
determinism design as pipeline/split.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT = "pack-v1"
# pack_id = shard * _PACKS_PER_SHARD + local pack index. 2^40 local packs
# per shard = ~2.2e15 tokens/shard at budget 2048 — beyond any real shard —
# where a 1e9 constant would overflow into the next shard's id range at
# ~100 TB with small pinned shard counts (silently merging packs across
# shards and breaking the unique-offset invariant). 2^63 / 2^40 bounds
# num_shards at 2^23; greedy_pack validates it.
_PACKS_PER_SHARD = 1 << 40
_MAX_SHARDS = 1 << 23


def _order_hash(id_col: str, salt: str):
    # first 8 hex chars of md5 -> 32-bit int; portable to the DuckDB oracle
    return F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8),
        16,
        10,
    ).cast("long")


def greedy_pack(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens_ws",
    budget: int = 2048,
    num_shards: "int | str" = "auto",
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """(id, shard, pack_id, pack_offset, n_tokens) — pack_offset is the
    document's first-token position within its pack.

    Deterministic in (id, salt, budget, num_shards) and independent of
    input partitioning ONLY when num_shards is pinned to an integer:
    num_shards is part of the determinism key (it changes which pack a
    document lands in). The default is the explicit sentinel "auto" — NOT
    a number — precisely so callers see that the default derives the shard
    count from the input's physical partition count (per-shard window
    sorts then parallelize with the cluster instead of being capped at a
    constant), which makes pack assignment depend on file layout. Pipelines
    that must reproduce byte-identical sequences across re-reads pin an
    integer (the gates pin 4).

    Token counts are clamped to >= 1 (null/zero/negative all become 1):
    a zero-width document would otherwise share its pack_offset with the
    next document, breaking the unique-offset invariant that makes
    `materialize_packs`' within-pack ordering a total order."""
    if num_shards == "auto":
        num_shards = max(df.rdd.getNumPartitions(), 1)
        import warnings

        warnings.warn(
            "greedy_pack(num_shards='auto') derives the shard count from the "
            f"input's physical partition count ({num_shards}); pack assignment "
            "then depends on file layout. Pin an integer for byte-identical "
            "packs across re-reads.",
            stacklevel=2,
        )
    elif not isinstance(num_shards, int) or num_shards < 1:
        raise ValueError(f"num_shards must be a positive int or 'auto', got {num_shards!r}")
    if num_shards > _MAX_SHARDS:
        raise ValueError(f"num_shards {num_shards} > {_MAX_SHARDS} overflows the pack_id range")
    h = _order_hash(id_col, salt)
    sharded = df.select(
        F.col(id_col),
        F.greatest(F.coalesce(F.col(token_col).cast("long"), F.lit(1)), F.lit(1)).alias(
            "n_tokens"
        ),
        h.alias("_h"),
        F.pmod(h, F.lit(num_shards)).cast("long").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.asc("_h"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    local_pack = F.floor(cum_excl / F.lit(budget))
    return sharded.select(
        id_col,
        "shard",
        (F.col("shard") * F.lit(_PACKS_PER_SHARD) + local_pack).alias("pack_id"),
        (cum_excl - local_pack * F.lit(budget)).alias("pack_offset"),
        "n_tokens",
    )


def materialize_packs(
    df: DataFrame,
    packed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """(pack_id, n_docs, text): concatenate each pack's member documents in
    offset order — the actual training-sequence materialization. One join
    (pack assignment back to text) and one groupBy(pack_id) shuffle; the
    within-pack order comes from array_sort over (offset, text) structs, so
    the output is deterministic without a sort-within-partitions pass.
    Offsets are unique within a pack (documents tile contiguously), so the
    struct sort is a total order."""
    j = packed.select(id_col, "pack_id", "pack_offset").join(
        df.select(id_col, text_col), id_col
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("pack_offset").alias("o"), F.col(text_col).alias("t")))
        ),
        lambda s: s["t"],
    )
    return j.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(ordered, sep).alias("text"),
    )


def pack_stats(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Per-pack fill report: docs, tokens, fill ratio vs budget (>1 means
    the boundary-straddling overflow doc) — the packing-efficiency metric a
    data job publishes. The +1e-9 before rounding is the repo-wide 6-dp
    tie rule (integer/2^k ratios land exactly on the rounding boundary,
    where engines' tie-breaking differs; the nudge makes half-up the
    deterministic cross-engine behavior — see __spark_entry__._r6e)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)) + F.lit(1e-9), 6).alias(
            "fill_ratio"
        ),
    )
