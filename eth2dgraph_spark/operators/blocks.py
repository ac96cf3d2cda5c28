"""Block-level derivations (SURVEY.md §2.5 A1/A2, §2.3 P11/P12, §2.6 W1).

Reference semantics: per-block gas-price stats over transactions with a
non-null gas_price, in Gwei, with **population** std-dev
(src/models/block.rs:34-64); tx_count = number of txs in the block
(src/models/block.rs:75,296).

Scale notes: a single groupBy("block_number") — one shuffle, map-side partial
aggregation is automatic. No window functions, no Python. At 100 TB the only
knob that matters is shuffle partition sizing, which AQE coalesces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ZERO_ADDRESS

GWEI = 1e9


def gas_price_stats(transactions: DataFrame, block_col: str = "block_number") -> DataFrame:
    """A1+A2: per-block (tx_count, gas_price min/max/avg/stddev_pop in Gwei).

    Matches src/models/block.rs:34-64: stats over non-null gas_price only,
    tx_count over all txs; population std-dev (powi/sqrt loop at :57-61).
    """
    gwei = F.col("gas_price") / F.lit(GWEI)
    return transactions.groupBy(block_col).agg(
        F.count(F.lit(1)).alias("tx_count"),
        F.min(gwei).alias("gas_price_min"),
        F.max(gwei).alias("gas_price_max"),
        F.avg(gwei).alias("gas_price_avg"),
        F.stddev_pop(gwei).alias("gas_price_std_dev"),
    )


def enrich_blocks(blocks: DataFrame, transactions: DataFrame) -> DataFrame:
    """Blocks + derived datetime (P11, src/models/block.rs:26-30) + A1 stats.

    Left join keeps empty blocks: gas stats stay null (no priced txs to
    aggregate), but tx_count is 0 — the reference emits txs.len()
    (src/models/block.rs:75), and a null here would make every
    empty-block filter/aggregate silently miss them.
    """
    stats = gas_price_stats(transactions)
    return (
        blocks.withColumn("datetime", F.to_timestamp(F.from_unixtime(F.col("timestamp"))))
        .join(stats, blocks["number"] == stats["block_number"], "left")
        .drop("block_number")
        .withColumn("tx_count", F.coalesce(F.col("tx_count"), F.lit(0)))
    )


def normalize_tx_to(transactions: DataFrame) -> DataFrame:
    """P12: null `to` (contract creation) -> zero address
    (src/models/transaction.rs:38-43)."""
    return transactions.withColumn("to", F.coalesce(F.col("to"), F.lit(ZERO_ADDRESS)))


def tx_bytes4(transactions: DataFrame) -> DataFrame:
    """P9: 4-byte function selector = input[2:10] when input has >= 4 bytes
    (src/models/transaction.rs:59-63). '0x' prefix + 8 hex chars."""
    return transactions.withColumn(
        "bytes4",
        F.when(F.length("input") >= 10, F.concat(F.lit("0x"), F.substring("input", 3, 8))),
    )


def last_indexed_block(blocks: DataFrame) -> DataFrame:
    """W1: max block number (src/extraction/stream.rs:284-300) — an agg, not
    an orderdesc/first:1 scan; no global sort needed."""
    return blocks.agg(F.max("number").alias("last_block"))
