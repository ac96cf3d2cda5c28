"""Structured-Streaming equivalent of the reference's `stream` mode
(SURVEY.md §2.8 T1-T5; src/extraction/stream.rs).

Reference semantics re-expressed:
  T1  head subscription, sequential per-block processing
      -> readStream + foreachBatch; each micro-batch handles a batch of
         blocks (strictly ordered within the sink by block partition).
  T2  catch-up sync from max(indexed)+1, then live
      -> backfill_then_live(): a bounded batch job over the missing range
         first, then the stream starts from the backfill ceiling.
  T3  exactly-once per block via delete-then-reinsert
      -> idempotent dynamic partition overwrite keyed on the block bucket;
         replaying a micro-batch rewrites the same partitions with the same
         rows (src/models/block.rs:171-284 without per-row transactions).
  T4  reorg signal: Log.removed carried through -> kept as a column; a
      reorged block re-enters as a new row for the same number and its
      partition is overwritten.
  T5  skeleton dedup state across the stream -> anti-join each batch's
      skeletons against the already-written skeleton table (the stateless,
      rescalable version of the DashMap at src/extraction/stream.rs:184-246).

The transformation body is the SAME batch derivation pipeline
(operators.extract.derive_all) — foreachBatch exists precisely so batch and
streaming share one code path.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.eth import BLOCK_BUCKET_COL, read_eth_table, with_block_bucket


def last_indexed_block(spark: SparkSession, base_path: str) -> int:
    """W1 over the sink (src/extraction/stream.rs:284-300)."""
    try:
        df = read_eth_table(spark, "blocks", base_path)
    except Exception:  # noqa: BLE001 — empty sink: start from genesis
        return -1
    row = df.agg(F.max("number").alias("m")).collect()[0]
    return -1 if row["m"] is None else int(row["m"])


def process_block_batch(
    batch: DataFrame,
    base_path: str,
    table: str,
    block_col: str = "block_number",
) -> None:
    """T3: idempotent write of one micro-batch — dynamic partition overwrite
    on the block bucket. Replays and reorg re-processing rewrite the same
    partition deterministically (the delete-then-reinsert of
    src/models/block.rs:171-284, minus per-row transactions)."""
    out = with_block_bucket(batch, block_col)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BLOCK_BUCKET_COL)
        .parquet(f"{base_path}/{table}")
    )


def dedup_against_sink(
    batch_skeletons: DataFrame, spark: SparkSession, base_path: str
) -> DataFrame:
    """T5: keep only skeletons not yet in the sink (left-anti against the
    skeleton table), then append. Stateless — state lives in the table."""
    try:
        existing = read_eth_table(spark, "skeletons", base_path).select("skeleton_hash")
    except Exception:  # noqa: BLE001 — no skeleton table yet
        return batch_skeletons
    return batch_skeletons.join(existing, "skeleton_hash", "left_anti")


def backfill_then_live(
    spark: SparkSession,
    source_blocks: Callable[[int, int], DataFrame],
    head: int,
    base_path: str,
    batch_handler: Callable[[DataFrame, str], None],
    backfill_batch: int = 10_000,
) -> int:
    """T2: bounded catch-up from max(indexed)+1 to `head` in bucket-sized
    batch jobs, before any stream starts. `source_blocks(lo, hi)` yields the
    raw block rows for [lo, hi]. Returns the next block to stream from."""
    start = last_indexed_block(spark, base_path) + 1
    lo = start
    while lo <= head:
        hi = min(lo + backfill_batch - 1, head)
        batch_handler(source_blocks(lo, hi), base_path)
        lo = hi + 1
    return head + 1


def start_block_stream(
    stream_df: DataFrame,
    base_path: str,
    derive_and_write: Callable[[DataFrame, int, str], None],
    checkpoint: str,
    trigger_secs: int | None = None,
    available_now: bool = False,
):
    """T1: attach the shared derivation to a block stream via foreachBatch.

    `stream_df` is any streaming DataFrame of raw block rows (file source
    over a landing dir, Kafka of new heads, rate source in tests).
    `derive_and_write(batch_df, batch_id, base_path)` runs the batch
    pipeline + idempotent writes — exactly-once per block partition even if
    a micro-batch replays after failure (T3)."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        derive_and_write(batch_df, batch_id, base_path)

    w = stream_df.writeStream.foreachBatch(_handle).option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_secs:
        w = w.trigger(processingTime=f"{trigger_secs} seconds")
    return w.start()
