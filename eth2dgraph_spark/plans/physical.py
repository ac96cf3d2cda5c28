"""Physical-layout helpers for 100 TB plans: bucketed co-located joins and
deterministic salting for skewed keys.

The reference's only physical tuning is task counts and buffer sizes
(src/main.rs:87-95,153-156); Dgraph owns its storage layout. On Spark the
equivalent levers are table layout (bucketing) and key-space shaping
(salting), both of which must be chosen by the engine — Catalyst/AQE cannot
invent a bucketed layout, and AQE's skew-join splitting only handles
sort-merge-join skew, not a skewed aggregation or an already-broadcast-proof
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.
    Two tables bucketed the same way join WITHOUT any exchange — the shuffle
    is paid once at write time and amortized over every subsequent join.
    This is the right layout for the big fact-fact joins (transactions ⋈
    logs ⋈ transfers on block_number; deployments ⋈ skeletons on
    skeleton_hash)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's skewed keys spread over `salt`
    sub-keys. The right side is replicated `salt`× (keep it the smaller
    side); the left side's salt is a DETERMINISTIC hash of the whole row, so
    retries and speculative tasks see the same distribution.

    Use when one join key dominates (the zero-address, a mega-contract):
    a single straggler partition becomes `salt` even ones.

    Right/full outer joins are rejected: the right side is replicated per
    salt value, so an unmatched right row would surface `salt` times as
    null-padded output — silently wrong multiplicity."""
    if how.replace("_", "").lower() in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(
            f"salted_join(how={how!r}): right/full outer would emit each "
            "unmatched right row once per salt value; use an un-salted join"
        )
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("_salt", lsalt)
    r = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))).withColumn(
        "_salt", F.col("_salt").cast("bigint")
    )
    return l.join(r, [key, "_salt"], how).drop("_salt")


def salted_agg_count(df: DataFrame, keys: list[str], salt: int = 16) -> DataFrame:
    """Two-stage count for skewed group keys: partial count per (key, salt),
    then combine per key. Spark's hash-aggregate already does map-side
    partials; this additionally splits a hot REDUCE key across `salt`
    reducers — relevant when one key holds a large share of all rows."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("count"))
