"""Event-time streaming features beyond the reference (SURVEY.md §2.8 note:
"No watermarks, no event-time windows ... exist in the reference. We add
watermark-based variants only as engine features").

The reference orders by block number and gets correctness from idempotent
per-block overwrite (T3). These operators add the Structured-Streaming-native
late-data story for consumers that want event-time analytics over the chain
tables (block timestamps are event time):

  - tumbling/sliding/session windowed aggregation with a watermark;
  - streaming dedup with a watermark-bounded state (dropDuplicates);
  - a custom stateful operator via applyInPandasWithState (running
    per-contract counters — the streaming analog of the lifetime RQs).

All take a STREAMING DataFrame and return a streaming DataFrame; the same
calls work on batch frames (Spark's unified semantics) which is how the
oracle-style tests pin the math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_block_stats(
    blocks: DataFrame,
    ts_col: str = "datetime",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if `slide` given) event-time gas/size stats with
    a watermark bounding state. On a stream, late blocks beyond the watermark
    are dropped; on-time late data updates its window (append mode emits a
    window once the watermark passes it)."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        blocks.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("tx_count").alias("n_txs"),
            F.avg("gas_used").alias("avg_gas_used"),
            F.max("base_fee_per_gas").alias("max_base_fee"),
        )
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"),
                "n_blocks", "n_txs", "avg_gas_used", "max_base_fee")
    )


def execute_stream_to_batch(
    stream_df: DataFrame, query_name: str | None = None, timeout_s: int = 300
) -> DataFrame:
    """Physically execute a streaming aggregation over the currently
    available data (trigger=availableNow) into a complete-mode memory sink
    and return the final table — the stream==batch bridge the oracle gate
    needs. Complete mode re-emits every window at the last trigger, so the
    final table equals the batch aggregation regardless of how the watermark
    landed relative to the tail windows (append mode would hold those back).

    Raises if the stream never made progress or missed the deadline, so a
    silently-unexecuted stream can't masquerade as a green gate."""
    import uuid

    spark = stream_df.sparkSession
    name = query_name or f"stream_gate_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise RuntimeError(f"stream {name} did not finish within {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
    if q.lastProgress is None:
        raise RuntimeError(f"stream {name} terminated without making progress")
    return spark.table(name)


def execute_stream_append(
    stream_df: DataFrame,
    checkpoint_dir: "str | None" = None,
    query_name: "str | None" = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Physically execute a watermarked streaming aggregation in APPEND
    mode over the currently available data (trigger=availableNow) into a
    memory sink and return the appended rows. Unlike the complete-mode
    bridge above, append mode exercises the watermark's two REAL effects:
    (1) rows later than the watermark at their micro-batch are dropped
    before the aggregation, and (2) a window is emitted exactly once,
    when the watermark passes its end — so tail windows newer than
    (max event time - delay) are withheld from the result. availableNow
    runs a final no-data micro-batch after the last file, which advances
    the watermark to (global max - delay) and flushes every closed
    window; the emitted set is therefore deterministic given ordered
    input files, independent of wall-clock."""
    import uuid

    spark = stream_df.sparkSession
    name = query_name or f"stream_append_{uuid.uuid4().hex[:8]}"
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    try:
        if not q.awaitTermination(timeout_s):
            raise RuntimeError(f"stream {name} did not finish within {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
    if q.lastProgress is None:
        raise RuntimeError(f"stream {name} terminated without making progress")
    return spark.table(name)


def execute_stream_append_to_files(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 300,
) -> DataFrame:
    """Append-mode execution into a DURABLE parquet file sink (availableNow)
    and return a batch read of the output directory. Unlike the memory-sink
    bridge above, the file sink supports RESTART: re-invoking with the same
    checkpoint_dir after a stop (or crash) resumes from the committed
    offsets and appends only windows not yet emitted — the sink's
    _spark_metadata transaction log plus the checkpoint give end-to-end
    exactly-once, which is what a real cluster job relies on instead of the
    reference's delete-then-reinsert idempotency
    (src/extraction/stream.rs:70-166). The memory sink cannot do this
    (Spark refuses checkpoint recovery for non-fault-tolerant sinks).

    Returns the full emitted-so-far table; raises if the stream missed the
    deadline. A no-new-data resume legitimately reports no progress, so
    unlike the memory-sink helpers this one treats that as success."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise RuntimeError(f"file-sink stream did not finish within {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.read.parquet(out_dir)


def session_windows(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per key: activity bursts separated by >= `gap` of
    silence (e.g. a contract's transaction sessions)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    within: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: rows match on `key` when the right
    event lands within ±`within` of the left event's time.

    The time-bound condition is not an optimization — it is what makes the
    join finite: with both sides watermarked, Spark evicts buffered state
    older than watermark + `within`, so state stays O(rate x horizon) instead
    of O(stream). Outer variants emit the unmatched side only once the
    watermark guarantees no future match (this is why `how='left_outer'`
    requires the event-time constraint at all).

    Column contract: `key` and both ts columns must be uniquely named across
    the two inputs (rename upstream); output carries left's key column.

    The reference never joins two live feeds (its per-block fetches are
    tx-scoped joins resolved within one block — src/extraction/extract.rs:104-141);
    this is the engine feature for correlating independent feeds, e.g. a
    pending-tx stream against the confirmed-log stream.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, f"__r_{key}")
    cond = (
        (lw[key] == rw[f"__r_{key}"])
        & (rw[right_ts] >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (rw[right_ts] <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop(f"__r_{key}")


def streaming_dedup(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-KEY within the watermark horizon: state is bounded —
    keys older than the watermark are evicted (vs. the unbounded DashMap of
    src/extraction/stream.rs:184-246, this survives unbounded streams).

    dropDuplicatesWithinWatermark on the keys ALONE: including ts_col in
    the subset (the dropDuplicates form requires it for state eviction)
    would dedup only exact (key, ts) pairs — the same skeleton_hash
    arriving in a later block has a new timestamp and would pass through,
    which is precisely the duplicate the DashMap analog must stop.
    (That operator exists only for streams; on a batch frame the same
    per-key semantics is a plain dropDuplicates — no state to bound.)"""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def running_contract_counters(events: DataFrame, timeout_s: int = 3600) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-contract
    running (deploy_count, destroy_count) across micro-batches — the
    streaming analog of the lifetime RQ counters (src/analysys/lifetimes.rs).

    Input schema: (contract string, kind string['deploy'|'destroy'], ts timestamp).
    Emits one row per contract per batch with updated totals. State times out
    `timeout_s` after the last event (processing time), bounding memory."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "contract string, deploy_count long, destroy_count long"
    state_schema = "deploys long, destroys long"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        d = s = 0
        for pdf in pdfs:
            d += int((pdf["kind"] == "deploy").sum())
            s += int((pdf["kind"] == "destroy").sum())
        if state.hasTimedOut:
            state.remove()
            return
        prev_d, prev_s = state.get if state.exists else (0, 0)
        state.update((prev_d + d, prev_s + s))
        state.setTimeoutDuration(timeout_s * 1000)
        yield pd.DataFrame(
            {"contract": [key[0]], "deploy_count": [prev_d + d], "destroy_count": [prev_s + s]}
        )

    return events.groupBy("contract").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
