"""Parquet source/sink for the chain tables (SURVEY.md §1.4, §2.1-2.2).

The reference's extract mode writes 10 size-bounded gzip-JSON directories
(src/extraction/extract.rs:300-316, src/extraction/writer.rs:50-447). Our
at-rest layout is partitioned Parquet: dynamic tables (transactions, logs,
transfers, traces) are partitioned by a block *range* bucket so (a) partition
pruning serves block-range queries, (b) the streaming sink can overwrite a
single block's partition idempotently (K4/T3), and (c) partition counts stay
bounded at 100 TB (one dir per 10k blocks, not per block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ETH_TABLES

# One partition directory per 10,000 blocks: at mainnet scale (~20M blocks)
# that is ~2,000 partitions per table — prunable but not a small-files problem.
BLOCK_BUCKET_SIZE = 10_000
BLOCK_BUCKET_COL = "block_bucket"

# Tables carrying a block_number column -> partitioned by block bucket.
_DYNAMIC = {"transactions", "logs", "traces", "token_transfers", "deployments", "destructions", "withdrawals"}


def with_block_bucket(df: DataFrame, block_col: str = "block_number") -> DataFrame:
    return df.withColumn(
        BLOCK_BUCKET_COL, (F.col(block_col) / F.lit(BLOCK_BUCKET_SIZE)).cast("long")
    )


def write_eth_table(
    df: DataFrame,
    table: str,
    base_path: str,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    format: str = "parquet",
    compression: str | None = None,
) -> None:
    """Write one chain table. Dynamic tables are partitioned by block bucket;
    `mode='overwrite'` with dynamic partition overwrite gives the reference's
    delete-then-reinsert idempotency (src/models/block.rs:171-284) per bucket.

    `max_records_per_file` is the Spark analog of the reference's
    size-bounded output files (8 MB buffers, src/main.rs:87-89,
    src/extraction/writer.rs:88-104): it caps file size at write time
    without an extra repartition.

    `format='json'` (default compression gzip) mirrors the reference's
    extract-mode output contract byte-class for byte-class — newline-
    delimited JSON in gzip members, one directory per table
    (src/extraction/writer.rs:26-48) — for consumers of those files.
    Binary columns round-trip as base64 (Spark's JSON writer encodes
    BinaryType to base64; `read_eth_table(format='json')` reads back
    through the table schema, which decodes it). Parquet remains the
    at-rest default — columnar pruning and predicate pushdown don't exist
    on JSON."""
    path = f"{base_path}/{table}"
    block_col = "number" if table == "blocks" else "block_number"
    # ONE partitioned-table predicate: the bucket column, dynamic overwrite,
    # and partitionBy must always travel together (a table in one branch but
    # not the other would silently lose the per-bucket idempotency contract)
    partitioned = table in _DYNAMIC or table == "blocks"
    if partitioned:
        w = with_block_bucket(df, block_col).write.mode(mode).option(
            "partitionOverwriteMode", "dynamic"
        )
    else:  # static entity tables (skeletons, abi, …): globally deduped, unpartitioned
        w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partitioned:
        w = w.partitionBy(BLOCK_BUCKET_COL)
    if format == "json":
        w.option("compression", compression or "gzip").json(path)
    elif format == "parquet":
        if compression:
            w = w.option("compression", compression)
        w.parquet(path)
    else:
        raise ValueError(f"unsupported format {format!r} (parquet or json)")


def read_eth_table(
    spark: SparkSession, table: str, base_path: str, format: str = "parquet"
) -> DataFrame:
    """Read one chain table back. JSON reads go through the declared table
    schema (ETH_TABLES) so types survive the text roundtrip — longs stay
    longs, binary columns decode from base64."""
    path = f"{base_path}/{table}"
    if format == "json":
        df = spark.read.schema(ETH_TABLES[table]).json(path)
    else:
        df = spark.read.parquet(path)
    return df.drop(BLOCK_BUCKET_COL) if BLOCK_BUCKET_COL in df.columns else df


def empty_eth_table(spark: SparkSession, table: str) -> DataFrame:
    """An empty, correctly-schema'd DataFrame for any chain table."""
    return spark.createDataFrame([], ETH_TABLES[table])
